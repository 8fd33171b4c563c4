package graft

/** Dev-only formatted-plan dumper for the optimization-round evidence:
  * `sbt "Test/runMain graft.PlanDump <sfDir> <outDir> <suffix> <face,face,...>"`
  * writes `<outDir>/<face>_<suffix>.txt` with `.explain("formatted")`
  * output (the analyzed plan pre-execution, AQE initial) for each face.
  * Warms the per-JVM scaffolds first so stored-index faces plan against
  * their real stores.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val faces = args(3).split(",").toSeq
    val spark = WithSpark.session
    graft.queries.SimilarityQueries.warm(spark, sfDir)
    graft.queries.IndexQueries.warm(spark)
    graft.queries.TextQueries.warm(spark, sfDir)
    graft.queries.SourceQueries.warm(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    faces.foreach { q =>
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
        println(s"[plandump] wrote $q")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
