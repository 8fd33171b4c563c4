package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Output sinks (SURVEY.md §2.1 S6-S8). The reference writes its final
  * indexes as JSON partitioned by study/release and `coalesce(1)`s
  * every non-parquet output (reference: processes/processes.scala:22-38)
  * — a single-writer bottleneck that cannot scale.
  *
  * Here the default instead repartitions BY THE PARTITION COLUMNS, so
  * each Hive partition directory is written by the task that owns that
  * key: one shuffle, full write parallelism, and one file per
  * partition dir (what coalesce(1) was trying to achieve) without
  * serializing the whole job through one task. `singleFile = true`
  * restores the reference's exact behavior for metadata-sized outputs.
  */
object Sinks {

  def partitionedJson(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String],
      singleFile: Boolean = false): Unit = {
    val arranged =
      if (singleFile) df.coalesce(1)
      else if (partitionBy.nonEmpty) df.repartition(partitionBy.map(col): _*)
      else df
    arranged.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionBy: _*)
      .json(path)
  }

  def parquet(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Seq.empty): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionBy: _*)
      .parquet(path)
}
