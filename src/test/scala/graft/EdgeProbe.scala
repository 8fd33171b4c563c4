package graft

import org.apache.spark.sql.functions._

/** Dev-only A/B probe for the shared co-purchase edge derivation
  * (GraphQueries.edges): current collect_list+HOF-explode vs a plain
  * self-join. `sbt "Test/runMain graft.EdgeProbe <sfDir> [reps]"`.
  * Checks result equality (both-direction except) before timing.
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = WithSpark.session
    import graft.core.Tables

    def current(sup: Int) = graft.queries.GraphQueries.edges(spark, sfDir, sup)

    def selfJoin(sup: Int) = {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= sup)
        .select(col("a"), col("b"))
    }

    // equality check once at sup=3 and sup=2
    for (sup <- Seq(3, 2)) {
      val d1 = current(sup).exceptAll(selfJoin(sup)).count()
      val d2 = selfJoin(sup).exceptAll(current(sup)).count()
      println(s"[edgeprobe] sup=$sup diff current-vs-selfjoin: $d1 / $d2")
    }
    for (sup <- Seq(3, 2)) {
      (1 to reps).foreach { r =>
        var t0 = System.nanoTime()
        val n1 = current(sup).count()
        val tCur = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val n2 = selfJoin(sup).count()
        val tSj = (System.nanoTime() - t0) / 1e9
        println(f"[edgeprobe] sup=$sup rep $r: current=$tCur%.2f s " +
          f"($n1 edges)  selfjoin=$tSj%.2f s ($n2 edges)")
      }
    }
    spark.stop()
  }
}
