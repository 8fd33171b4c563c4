package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-provided parquet testdata.
  *
  * Mirrors the reference's `DatasetConf` catalog idea
  * (reference: processes/PreProcessETLConfig.scala:9-44) as a thin
  * function over `spark.read.parquet` — the catalog entry is just
  * (name → path); Spark's parquet source gives column pruning +
  * predicate pushdown for free, which is what matters at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` under two physical encodings across
    * testdata generations: TIMESTAMP(NANOS) (read as a raw long when
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which Bench/Verify/
    * WithSpark all set) and plain TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ). Normalize both to the same surface: a session-TZ
    * `ts` timestamp plus the raw epoch nanos as `ts_ns`, so every query
    * downstream is encoding-agnostic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // proper timestamp (micros, NTZ or LTZ); sessions run in UTC
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
