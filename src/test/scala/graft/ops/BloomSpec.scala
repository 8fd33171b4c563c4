package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private val M = 8192 // bits — small on purpose, to make FPs measurable
  private val K = 4

  private lazy val corpus = (0L until 500L).map(i => s"fp_$i").toDF("fp")
  private lazy val bloom = Bloom.build(corpus, col("fp"), M, K)

  test("no false negatives: every corpus fingerprint tests positive") {
    val known = Bloom.withMightContain(corpus, bloom, col("fp"), "hit")
      .filter(!col("hit")).count()
    assert(known == 0L, "a known fingerprint escaped the filter")
  }

  test("false-positive rate on disjoint values matches the sizing math") {
    val novel = (0L until 2000L).map(i => s"other_$i").toDF("fp")
    val fp = Bloom.withMightContain(novel, bloom, col("fp"), "hit")
      .filter(col("hit")).count()
    val rate = fp.toDouble / 2000
    // (1 - e^(-k n / m))^k ≈ 0.002 at n=500, m=8192, k=4; allow 10×
    assert(rate < 0.02, s"FP rate $rate far above the sizing estimate")
  }

  test("filterNovel drops all known rows and keeps (almost) all novel") {
    val stream = ((0L until 500L).map(i => s"fp_$i") ++
      (0L until 100L).map(i => s"new_$i")).toDF("fp")
    val kept = Bloom.filterNovel(stream, bloom, col("fp"))
      .as[String].collect().toSet
    assert(kept.forall(_.startsWith("new_")), "a known row passed the gate")
    assert(kept.size >= 95, s"only ${kept.size}/100 novel rows survived")
  }

  test("bitset build is deterministic and layout-independent") {
    val again = Bloom.build(corpus.repartition(7), col("fp"), M, K)
    assert(java.util.Arrays.equals(bloom.words, again.words))
    assert(bloom.mBits == again.mBits && bloom.k == again.k)
  }

  test("prunedJoin equals the plain inner join (no false negatives)") {
    val probe = (0L until 2000L).map(i => (i % 500, s"p_$i")).toDF("k", "pv")
    val build = (0L until 100L).map(i => (i * 3, s"b_$i")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq
    val pruned = Bloom.prunedJoin(probe, build, Seq("k"), mBits = 1 << 12)
      .select("k", "pv", "bv")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(pruned == plain)
  }

  test("prunedJoin gate drops most non-matching probe rows map-side") {
    val probe = (0L until 2000L).map(i => (i, s"p_$i")).toDF("k", "pv")
    val build = (0L until 20L).map(i => (i, s"b_$i")).toDF("k", "bv")
    def fp(df: org.apache.spark.sql.DataFrame) = xxhash64(df("k"))
    val bits = Bloom.build(build, fp(build), 1 << 12, 5)
    val survivors =
      Bloom.withMightContain(probe, bits, fp(probe), "hit")
        .filter(col("hit")).count()
    // 20 true matches; FP rate at m=4096,n=20,k=5 is ~0 — allow slack
    assert(survivors >= 20 && survivors < 60,
      s"gate passed $survivors of 2000 probe rows")
  }

  test("membership test plans no shuffle of the probe side") {
    val stream = (0L until 100L).map(i => s"s_$i").toDF("fp")
    val plan = Bloom.filterNovel(stream, bloom, col("fp"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"probe side must stay map-side:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), "bitset must broadcast")
  }
}
