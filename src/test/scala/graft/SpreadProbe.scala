package graft

import org.apache.spark.sql.functions._

/** Dev-only A/B: does a round-robin repartition after the single-row-
  * group parquet scan (guide §2.5 input-skew fix) unlock the 32 cores
  * for compute-heavy per-row ops?
  * `sbt "Test/runMain graft.SpreadProbe <sfDir> [reps]"`. */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = WithSpark.session
    import graft.core.Tables

    val nShuffle = spark.sessionState.conf.numShufflePartitions

    def time(label: String)(f: => Long): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[spread] $label rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

    val docs = Tables.documents(spark, sfDir)
    println(s"[spread] docs scan partitions: ${docs.rdd.getNumPartitions}, shuffle=$nShuffle")

    time("winnow base") {
      graft.ops.Text.winnowNearDupCandidates(
        docs, "doc_id", col("text"), 8, 4, 10, 2).count()
    }
    time("winnow spread") {
      graft.ops.Text.winnowNearDupCandidates(
        docs.repartition(nShuffle), "doc_id", col("text"), 8, 4, 10, 2).count()
    }

    // the shared graph edge derivation: current vs orderkey-partitioned
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    def pairsOf(base: org.apache.spark.sql.DataFrame, sup: Int) = base
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_partkey")).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ps")) - 2),
        i => transform(
          slice(col("ps"), i + lit(2), size(col("ps"))),
          p => struct(
            least(element_at(col("ps"), (i + 1).cast("int")), p).as("a"),
            greatest(element_at(col("ps"), (i + 1).cast("int")), p).as("b"))))))
        .as("e"))
      .select(col("e.a"), col("e.b"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= sup)
      .select(col("a"), col("b"))
    time("edges base sup=2") { pairsOf(li, 2).count() }
    time("edges spread sup=2") { pairsOf(li.repartition(col("l_orderkey")), 2).count() }
    time("edges rr-spread sup=2") { pairsOf(li.repartition(nShuffle), 2).count() }

    spark.stop()
  }
}
