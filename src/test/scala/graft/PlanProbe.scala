package graft

/** Dev-only plan dumper: `sbt "Test/runMain graft.PlanProbe <face>"`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = WithSpark.session
    args.foreach { q =>
      println(s"==== $q ====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
