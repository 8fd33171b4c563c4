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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS) which Spark 4 refuses
    * by default; sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * at build time (Bench/Verify/WithSpark all do). The raw nanos arrive
    * as a long (`ts_ns`); a microsecond-truncated proper timestamp is
    * exposed as `ts`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
