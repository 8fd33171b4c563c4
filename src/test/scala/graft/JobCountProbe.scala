package graft

/** Dev-only job/time profiler for many-small-jobs faces:
  * `sbt "Test/runMain graft.JobCountProbe <sfDir> <face> [reps]"`.
  * Warms the per-JVM scaffolds first (like Bench), then runs the face
  * `reps` times, printing per-rep wall time, Spark job count, and
  * total task count — the three numbers that separate "the refresh
  * got slower" from "the JVM runs more scaffolding jobs". */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val faces = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = WithSpark.session
    graft.queries.SimilarityQueries.warm(spark, sfDir)
    graft.queries.IndexQueries.warm(spark)
    graft.queries.TextQueries.warm(spark, sfDir)
    graft.queries.SourceQueries.warm(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(): Unit
        }
      })
    faces.foreach { face =>
      (1 to reps).foreach { r =>
        jobs.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(face)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async; let the bus drain before reading
        Thread.sleep(300)
        println(f"[probe] $face rep $r: $dt%.2f s, ${jobs.get()} jobs, " +
          s"${tasks.get()} tasks, $n rows")
      }
    }
    spark.stop()
  }
}
