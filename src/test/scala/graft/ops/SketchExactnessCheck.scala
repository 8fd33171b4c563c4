package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the assumption behind q_sketch_distinct's EXACT oracle: HLL
  * sketches in sparse mode give exact estimates at dimension-scale
  * cardinalities (the documents table has ~20 sources per lang at the
  * gate SFs). If a future data drop crosses sparse mode's bound this
  * fails before the oracle gate does. */
class SketchExactnessCheck extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("HLL estimate is exact for cardinalities up to 256") {
    // measured: the estimator drifts by 1 at ~512; exact through 256,
    // an order of magnitude above the gate's ~20 sources per lang
    val df = spark.range(0, 512).toDF("v").withColumn("g", lit("x"))
    for (n <- Seq(1, 20, 100, 256)) {
      val est = Profile.mergeDistinctSketches(
          Profile.distinctSketches(
            df.filter($"v" < n), Seq("g"), Seq("v")), Seq("g"))
        .select("n_distinct_est").as[Long].collect().head
      assert(est == n.toLong, s"HLL not exact at n=$n: $est")
    }
  }
}
