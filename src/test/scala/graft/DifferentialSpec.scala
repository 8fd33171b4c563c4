package graft

import graft.ops.{Dedup, Text}
import graft.plans.TopKPerGroup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential tests: each scale operator is
  * compared against an independent brute-force reference computed
  * in-test. Seeds are fixed, so failures are reproducible, and the
  * generators cover shapes the hand-written specs don't (uneven
  * groups, null scores, overlapping shingle sets at varied Jaccard).
  */
class DifferentialSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("TopKPerGroup equals the window formulation on random data " +
      "with nulls and NaNs") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val score: Option[Double] =
        if (rng.nextInt(20) == 0) None
        else if (rng.nextInt(50) == 0) Some(Double.NaN)
        else Some(math.floor(rng.nextDouble() * 20) / 2.0) // forced ties
      (rng.nextInt(17), i.toLong, score)
    }
    val df = rows.toDF("g", "id", "score")
    val viaWindow = df
      .withColumn("rank", row_number().over(Window.partitionBy("g")
        .orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 7)
      .select("g", "id", "rank").as[(Int, Long, Int)].collect().toSet
    val viaTopK = TopKPerGroup.topK(df, Seq("g"), "score", "id", 7)
      .select("g", "id", "rank").as[(Int, Long, Int)].collect().toSet
    assert(viaTopK == viaWindow)
  }

  test("dropNearDups equals brute-force Jaccard clustering at high " +
      "threshold (LSH recall ~1 for J>=0.9 at 64/16 banding)") {
    val rng = new scala.util.Random(11)
    val vocab = ('a' to 'z').map(c => s"w$c")
    // clusters of near-identical docs (1-word perturbations of a 20-word
    // base => J >= 0.9) plus unrelated singletons
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    for (_ <- 0 until 8) {
      val base = Seq.fill(20)(vocab(rng.nextInt(vocab.size)))
      val n = 1 + rng.nextInt(3)
      for (_ <- 0 until n) {
        val words = base.updated(rng.nextInt(20), vocab(rng.nextInt(vocab.size)))
        docs += ((id, words.mkString(" "))); id += 1
      }
    }
    for (_ <- 0 until 10) {
      // distinct length + distinct prefix word => no accidental overlap
      val words = Seq.fill(12)(s"x${rng.nextInt(1000)}")
      docs += ((id, words.mkString(" "))); id += 1
    }
    val df = docs.toSeq.toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(col("text"), 3))

    // brute-force: exact shingle sets → all-pairs Jaccard → union-find
    def shingleSet(text: String): Set[String] = {
      val ws = text.toLowerCase.split("\\s+").toSeq
      ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (i, t) => i -> shingleSet(t) }.toMap
    val ids = docs.map(_._1).toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- ids; b <- ids if a < b) {
      val (sa, sb) = (sets(a), sets(b))
      val inter = (sa & sb).size.toDouble
      val j = inter / (sa.size + sb.size - inter)
      if (j >= 0.9) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expectedKept = ids.filter(i => find(i) == i).toSet

    val kept = Dedup.dropNearDups(df, "doc_id", col("sh"), threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == expectedKept)
  }

  test("asofJoin equals a brute-force latest-at-or-before scan on " +
      "random event streams") {
    val rng = new scala.util.Random(17)
    val leftRows = (0 until 300).map { i =>
      (i.toLong, rng.nextInt(12).toLong, rng.nextInt(5000).toLong)
    } // (event_id, key, t)
    val rightRows = (0 until 400).map { i =>
      (rng.nextInt(12).toLong, rng.nextInt(5000).toLong, i.toDouble)
    }.distinct // (key, t, payload)
      // unique (key, t) so the match is well-defined
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = leftRows.toDF("event_id", "user_id", "ts")
    val right = rightRows.toDF("user_id", "ts", "click_value")
    val got = graft.ops.TemporalJoins.asofJoin(
        left, right, "user_id", "ts", Seq("click_value"))
      .select(col("event_id"), col("click_value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for ((eid, key, t) <- leftRows) {
      val expected = rightRows.filter(r => r._1 == key && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(eid) == expected, s"event $eid (key=$key, t=$t)")
    }
  }

  test("scd2Merge equals a brute-force in-memory merge on random histories") {
    import graft.ops.Cdc
    for (seed <- Seq(3, 11)) {
      val rng = new scala.util.Random(seed)
      // history: per key 0-3 closed versions + maybe a current one
      val hist = (1 to 60).flatMap { key =>
        val nClosed = rng.nextInt(3)
        val closed = (0 until nClosed).map { v =>
          (key.toLong, s"v$v", s"2020-0${v + 1}-01", Some(s"2020-0${v + 2}-01"))
        }
        val current =
          if (rng.nextDouble() < 0.8)
            Seq((key.toLong, s"v$nClosed", s"2020-0${nClosed + 1}-01",
              Option.empty[String]))
          else Seq.empty
        closed ++ current
      }
      // batch: subset of keys + some unseen; half restate, half change
      val currentByKey = hist.filter(_._4.isEmpty).map(r => r._1 -> r._2).toMap
      val batch = (1 to 80).flatMap { key =>
        if (rng.nextDouble() < 0.5) None
        else {
          val v = currentByKey.get(key.toLong) match {
            case Some(cur) if rng.nextBoolean() => cur // no-op restate
            case _ => s"n$key"
          }
          Some((key.toLong, v, "2021-01-01"))
        }
      }
      val histDf = hist.toDF("k", "v", "valid_from", "valid_to")
        .select($"k", $"v", to_timestamp($"valid_from").as("valid_from"),
          to_timestamp($"valid_to").as("valid_to"))
      val batchDf = batch.toDF("k", "v", "effective_at")
        .withColumn("effective_at", to_timestamp($"effective_at"))
      val got = Cdc.scd2Merge(histDf, batchDf, Seq("k"), Seq("v"))
        .select($"k", $"v", date_format($"valid_from", "yyyy-MM-dd").as("f"),
          date_format($"valid_to", "yyyy-MM-dd").as("t"))
        .as[(Long, String, String, Option[String])].collect().sorted.toSeq
      // brute-force reference
      val eff = "2021-01-01"
      val expected = (
        hist.filter(_._4.nonEmpty).map(r => (r._1, r._2, r._3, r._4)) ++
          hist.filter(_._4.isEmpty).map { case (k, v, f, _) =>
            val b = batch.find(_._1 == k)
            val closedBy = b.exists(_._2 != v)
            (k, v, f, if (closedBy) Some(eff) else None)
          } ++
          batch.flatMap { case (k, v, e) =>
            currentByKey.get(k) match {
              case Some(cur) if cur == v => None // no-op
              case _ => Some((k, v, e, Option.empty[String]))
            }
          }
      ).sorted
      assert(got == expected, s"seed $seed")
    }
  }

  test("editDistance1Pairs equals the brute-force levenshtein join " +
      "on random mutated strings") {
    import graft.ops.Text
    val rng = new scala.util.Random(17)
    val alphabet = "abc" // small alphabet forces dense collisions
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    // base strings + mutated copies (sub/insert/delete) + empties
    val strs = (0 until 60).flatMap { _ =>
      val s = randStr(2 + rng.nextInt(5))
      val mutated = rng.nextInt(3) match {
        case 0 => s.updated(rng.nextInt(s.length), alphabet(rng.nextInt(3)))
        case 1 => s.patch(rng.nextInt(s.length), s"${alphabet(rng.nextInt(3))}", 0)
        case _ => s.patch(rng.nextInt(s.length), "", 1)
      }
      Seq(s, mutated.toString)
    } :+ "" :+ "" :+ "a"
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val expected = (for {
      i <- strs.indices; j <- strs.indices if i < j
      if lev(strs(i), strs(j)) <= 1
    } yield (i.toLong, j.toLong, lev(strs(i), strs(j)))).toSet
    val got = Text.editDistance1Pairs(df, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("OneEdit.dist agrees with levenshtein exhaustively over a " +
      "multi-byte alphabet") {
    // 1/2/4-byte UTF-8 code points: 'a', 'é' (2 B), '𝄞' (4 B), 'b'.
    // All strings up to length 3 → 85 strings, all ordered pairs.
    val alpha = Seq("a", "é", new String(Character.toChars(0x1D11E)), "b")
    val strs = Seq("") ++
      alpha ++
      (for (x <- alpha; y <- alpha) yield x + y) ++
      (for (x <- alpha; y <- alpha; z <- alpha) yield x + y + z)
    def levCp(x: String, y: String): Int = {
      val a = x.codePoints().toArray; val b = y.codePoints().toArray
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // interpreted path: the kernel directly
    for (x <- strs; y <- strs) {
      val expect = levCp(x, y) match {
        case 0 => 0
        case 1 => 1
        case _ => -1
      }
      val got = graft.plans.OneEdit.dist(
        org.apache.spark.unsafe.types.UTF8String.fromString(x),
        org.apache.spark.unsafe.types.UTF8String.fromString(y))
      assert(got == expect, s"OneEdit.dist('$x', '$y') = $got, want $expect")
    }
    // codegen path: the expression against Spark's own levenshtein
    val df = strs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    val disagree = df.select(col("i").as("ia"), col("s").as("sa"))
      .crossJoin(df.select(col("i").as("ib"), col("s").as("sb")))
      .select(
        levenshtein(col("sa"), col("sb")).as("lev"),
        graft.plans.OneEditDist.oneEdit(col("sa"), col("sb")).as("one"))
      .filter(
        ((col("lev") <= 1) =!= (col("one") >= 0)) ||
          (col("one") >= 0 && col("one") =!= col("lev")))
      .count()
    assert(disagree == 0)
  }

  test("exactGroups equals a reference groupBy over random duplicates") {
    val rng = new scala.util.Random(13)
    val texts = (0 until 40).map(_ => s"doc ${rng.nextInt(12)}")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val expected = texts.zipWithIndex
      .groupBy(_._1).map { case (_, g) =>
        (g.map(_._2.toLong).min, g.size.toLong)
      }.toSet
    val got = Dedup.exactGroups(docs, Text.fingerprintMd5(col("text")),
        col("doc_id"))
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }
}
