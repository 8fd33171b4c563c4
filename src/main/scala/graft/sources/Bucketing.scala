package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for co-located joins: both sides pre-hashed into
  * the same number of buckets on the join key join WITHOUT a shuffle
  * (SortMergeJoin reads bucket n against bucket n directly). The
  * write pays one up-front shuffle; every subsequent join/aggregation
  * on the bucket key is exchange-free — the right trade for fact
  * tables joined repeatedly on a stable key at 100 TB.
  *
  * Bucketed tables must live in the session catalog (`saveAsTable`);
  * plain `parquet(path)` writes cannot carry bucket metadata.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // Self-heal a stale warehouse: a previous JVM may have left the
    // table DIRECTORY behind while this session's in-memory catalog
    // has no entry for it — CREATE then fails on LOCATION_ALREADY_
    // EXISTS. Drop any catalog entry, then clear the orphaned
    // location (managed tables live under warehouse.dir/<name>).
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, tableName.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.drop(1): _*)
      .sortBy(bucketCols.head, bucketCols.drop(1): _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  def readBucketed(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
