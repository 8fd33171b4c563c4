package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._
  import Multimodal._

  private def media(id: Long, bytes: Array[Byte], kind: String = "image") =
    MediaRow(id, bytes, MediaMeta(kind, "bin", 4, 4, 0, 0L))

  test("extractFeatures is deterministic with fixed dim and stats") {
    val rows = Seq(
      media(1L, Array[Byte](1, 2, 3, 4, 5)),
      media(2L, Array[Byte](9, 9, 9))).toDS()
    val a = extractFeatures(rows, dim = 4).collect().sortBy(_.media_id)
    val b = extractFeatures(rows, dim = 4).collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a(0).n_bytes == 5L && a(1).n_bytes == 3L)
    assert(a(0).fingerprint != a(1).fingerprint)
    assert(a.forall(_.features.length == 4))
  }

  test("batch shape: decoder sees bounded batches, all rows survive") {
    val n = 150
    val rows = (1 to n).map(i => media(i.toLong, Array[Byte](i.toByte))).toDS()
      .repartition(2)
    val got = extractFeatures(rows, batchSize = 32).collect()
    assert(got.length == n)
    assert(got.map(_.media_id).toSet == (1 to n).map(_.toLong).toSet)
  }

  test("resizeAll rewrites meta dims and emits the stub byte contract") {
    val rows = Seq(
      media(1L, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)),
      media(2L, Array.emptyByteArray)).toDS()
    val got = resizeAll(rows, w = 2, h = 2).collect().sortBy(_.media_id)
    assert(got.forall(r => r.meta.width == 2 && r.meta.height == 2))
    assert(got.forall(_.payload.length == 4))
    // nearest-neighbor over raw bytes: offsets 0, 2, 4, 6
    assert(got(0).payload.toSeq == Seq[Byte](10, 30, 50, 70))
    assert(got(1).payload.toSeq == Seq[Byte](0, 0, 0, 0)) // empty source
    // deterministic
    val again = resizeAll(rows, w = 2, h = 2).collect().sortBy(_.media_id)
    assert(again.map(_.payload.toSeq).toSeq == got.map(_.payload.toSeq).toSeq)
  }

  test("sniffFormat reads magic bytes natively") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val wav = "RIFF1234".getBytes
    val other = Array[Byte](0, 1, 2, 3)
    val got = Seq((1, png), (2, jpg), (3, wav), (4, other))
      .toDF("id", "payload")
      .select($"id", sniffFormat($"payload").as("fmt"))
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "png", 2 -> "jpeg", 3 -> "riff", 4 -> "bin"))
  }

  test("frameOffsets fans out a native sampled timeline") {
    val got = Seq((1L, 2500L), (2L, 0L)).toDF("id", "duration_ms")
      .select($"id", frameOffsets($"duration_ms", 1000).as("offs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(0L, 1000L, 2000L))
    assert(got(2L).isEmpty)
  }

  test("rebalanceByBytes sizes partitions by payload bytes") {
    val rows = (1 to 100).map(i => (i.toLong, Array.fill[Byte](1000)(1)))
      .toDF("id", "payload")
    val out = rebalanceByBytes(rows, "payload", targetBytes = 25000L)
    assert(out.rdd.getNumPartitions == 4) // 100 KB / 25 KB
  }

  test("perceptual hash: deterministic, DC-invariant, locality-aware") {
    val rnd = new scala.util.Random(3)
    val base = Array.tabulate(65)(i => math.sin(i * 0.37).toFloat * 10f)
    // identical signal -> identical hash
    assert(phashOf(base.clone()) == phashOf(base.clone()))
    // adding a constant offset only moves the DC coefficient, which the
    // hash drops -> same fingerprint (brightness invariance)
    val brighter = base.map(_ + 5.0f)
    assert(phashOf(brighter) == phashOf(base))
    // small local perturbation stays closer than an unrelated signal
    val near = base.clone(); near(10) += 0.3f; near(40) -= 0.2f
    val far = Array.tabulate(65)(_ => rnd.nextFloat() * 20f - 10f)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h0 = phashOf(base)
    assert(ham(h0, phashOf(near)) < ham(h0, phashOf(far)),
      s"near=${ham(h0, phashOf(near))} far=${ham(h0, phashOf(far))}")
  }

  test("phashNearDups equals brute-force hamming pairs (pigeonhole " +
      "completeness over real banding)") {
    val rnd = new scala.util.Random(9)
    // 30 base signals; every third gets a slightly perturbed sibling
    val rows = (0 until 30).flatMap { g =>
      val base = Array.tabulate(65)(i =>
        math.sin(i * (0.1 + g * 0.07)).toFloat * 10f)
      val sib = base.clone(); sib(g % 65) += 0.15f
      Seq((g.toLong * 2, base)) ++
        (if (g % 3 == 0) Seq((g.toLong * 2 + 1, sib)) else Nil)
    }
    val feats = rows.map { case (id, v) =>
      MediaFeatures(id, 0L, 0L, v) }.toDS()
    val got = Multimodal.phashNearDups(feats, maxHamming = 3, bands = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val hashes = rows.map { case (id, v) => id -> phashOf(v) }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture planted no near pairs - test is vacuous")
  }
}
