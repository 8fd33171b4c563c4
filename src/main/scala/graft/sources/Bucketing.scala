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
    // EXISTS. Drop any catalog entry (managed-table drop deletes its
    // data), then clear a truly ORPHANED location only: the path must
    // be the managed location Spark would use AND contain nothing but
    // Spark write artifacts (part files / _SUCCESS / commit markers).
    // A same-named directory holding anything else — an external
    // table, operator data — is refused loudly instead of destroyed,
    // and the drop/delete/write sequence is documented as
    // single-session: concurrent writers sharing a warehouse must
    // scope tables to distinct names or schemas.
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    if (!spark.catalog.tableExists(tableName)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(wh, tableName.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        val sparkArtifact = "part-.*|_SUCCESS|_committed.*|_started.*|" +
          "_temporary|\\.part-.*\\.crc|\\._SUCCESS\\.crc|_metadata|_common_metadata"
        val entries = fs.listStatus(loc).map(_.getPath.getName)
        val foreign = entries.filterNot(_.matches(sparkArtifact))
        require(foreign.isEmpty,
          s"refusing to clear $loc: it contains non-Spark-write entries " +
            s"(${foreign.take(3).mkString(", ")}) — not an orphaned " +
            s"managed table. Move the data or pick another table name.")
        fs.delete(loc, true)
      }
    }
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
