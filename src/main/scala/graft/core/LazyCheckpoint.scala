package graft.core

import org.apache.spark.sql.DataFrame

/** Construction-time-lazy local checkpoint.
  *
  * `df.localCheckpoint(eager = false)` is NOT lazy under adaptive
  * query execution: the checkpoint call executes the physical plan to
  * obtain its RDD, and `AdaptiveSparkPlanExec.execute()` materializes
  * every intermediate query stage — so constructing the frame still
  * runs the fact scan and its shuffle map stages as real Spark jobs,
  * deferring only the final result stage. Planning the checkpointed
  * subtree with AQE disabled restores the documented contract:
  * construction builds an RDD lineage and launches NO job
  * (PlanShapeSpec pins this); the first downstream action computes the
  * subtree once as one classic-scheduler job and every later consumer
  * reads the checkpointed blocks.
  *
  * Trade-offs, deliberate for the dimension-sized partials this engine
  * checkpoints:
  *  - the checkpointed subtree itself forgoes AQE (no dynamic shuffle
  *    coalescing / skew splitting inside it) — its output is small by
  *    construction, so static `spark.sql.shuffle.partitions` is fine;
  *  - local checkpoints store blocks on executors WITHOUT lineage —
  *    executor loss mid-query fails the query instead of recomputing
  *    (a batch retry re-runs the stage; an always-on deployment should
  *    swap in `persist` or a reliable `checkpoint()`);
  *  - the session conf flips for the duration of the (job-free)
  *    planning call, which another driver thread planning concurrently
  *    in the same session could observe — frame construction in this
  *    engine is driver-single-threaded.
  */
object LazyCheckpoint {
  def apply(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val prev = conf.get(key, "true")
    conf.set(key, "false")
    try df.localCheckpoint(eager = false)
    finally conf.set(key, prev)
  }
}
