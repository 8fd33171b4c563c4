package graft.ops

import graft.WithSpark
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private lazy val df = Seq(
    (Some("a"), Some(1L)), (Some("b"), None),
    (Some("a"), Some(3L)), (None, Some(3L)))
    .toDF("s", "n")

  test("profile: counts, nulls, distincts, min/max as strings") {
    val got = Profile.profile(df, Seq("s", "n"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s") == (("s", 4L, 1L, 2L, "a", "b")))
    assert(got("n") == (("n", 4L, 1L, 2L, "1", "3")))
  }

  test("approx profile agrees on small cardinalities") {
    val got = Profile.profile(df, Seq("s"), approx = true)
      .as[(String, Long, Long, Long, String, String)].collect().head
    assert(got._4 == 2L) // HLL exact at tiny n
  }

  test("sketches from disjoint batches merge to the union's distincts") {
    import org.apache.spark.sql.functions.lit
    val day1 = spark.range(0, 800).toDF("v").withColumn("g", lit("x"))
    val day2 = spark.range(600, 1400).toDF("v").withColumn("g", lit("x"))
    val stored = Profile.distinctSketches(day1, Seq("g"), Seq("v"))
      .unionByName(Profile.distinctSketches(day2, Seq("g"), Seq("v")))
    val est = Profile.mergeDistinctSketches(stored, Seq("g"))
      .select("n_distinct_est").as[Long].collect().head
    // exact union distinct = 1400; HLL default error ~2%
    assert(math.abs(est - 1400L) <= 1400 * 0.05, s"estimate $est")
    // and the state is tiny: one sketch row per (group, column, batch)
    assert(stored.count() == 2)
  }

  test("exact profile is one aggregation pass (single Expand)") {
    val plan = Profile.profile(df, Seq("s", "n"))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Join"), "profiling must not self-join")
  }
}
