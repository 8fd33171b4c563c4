package graft.plans

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoundaryRankSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("rank = #boundaries <= v: below-first, exact-hit, between, " +
      "above-last, negative ids; codegen and interpreted agree") {
    val bounds = Array(-5L, 0L, 10L, 1000L)
    val vs = Seq(Long.MinValue, -6L, -5L, -1L, 0L, 3L, 10L, 11L,
      999L, 1000L, Long.MaxValue)
    val expected = vs.map(v => v -> bounds.count(_ <= v).toLong).toMap
    // through a dataframe (whole-stage codegen path)
    val got = vs.toDF("v")
      .select(col("v"), BoundaryRank.rank(col("v"), bounds).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected, s"codegen rank diverged: $got")
    // interpreted eval path agrees (nullSafeEval)
    vs.foreach { v =>
      val e = BoundaryRank(
        org.apache.spark.sql.catalyst.expressions.Literal(v), bounds)
      assert(e.eval(null) == expected(v), s"interpreted rank at $v")
    }
    // null input stays null (UnaryExpression default)
    val n = Seq[java.lang.Long](null).toDF("v")
      .select(BoundaryRank.rank(col("v"), bounds)).collect().head
    assert(n.isNullAt(0))
  }

  test("plan size stays O(1) in the boundary count (the when-chain " +
      "regression guard): a 4096-boundary rank plans instantly") {
    val bounds = (1L to 4096L).map(_ * 1000L).toArray
    val t0 = System.nanoTime()
    val got = spark.range(10000)
      .select(BoundaryRank.rank(col("id") * 700L, bounds).as("r"))
      .agg(sum("r")).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    val want = (0L until 10000L).map(i => bounds.count(_ <= i * 700L).toLong).sum
    assert(got == want)
    assert(secs < 30.0,
      f"4096-boundary rank took $secs%.1f s - plan-size blowup is back")
  }
}
