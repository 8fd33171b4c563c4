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

  test("exact profile is one aggregation pass (single Expand)") {
    val plan = Profile.profile(df, Seq("s", "n"))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Join"), "profiling must not self-join")
  }
}
