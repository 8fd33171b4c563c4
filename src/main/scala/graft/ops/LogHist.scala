package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log-bucketed quantile sketch (the DDSketch shape —
  * Masson et al., VLDB 2019 — on an ENGINE-PORTABLE integer grid):
  * a non-negative long value lands in bucket (bit-length, top-4
  * sub-bits), so bucket width / bucket floor ≤ 2^-4 and any quantile
  * read off the sketch has bounded RELATIVE error ≤ 1/16, at ≤ 1024
  * buckets total regardless of data volume.
  *
  * Why not the exact equi-depth path (`q_equidepth`) everywhere: that
  * one global-ranks the corpus (a full sort-shaped exchange per
  * refresh). This sketch is a per-group count table that MERGES by
  * addition — per-batch sketches fold incrementally like the HLL/CMS
  * state stores, so a 100 TB corpus re-profiles its quantiles at
  * O(day-batch) cost, never O(corpus).
  *
  * Engine-portability: the bucket id is pure integer arithmetic —
  * `length(bin(v))` is the bit length in BOTH Spark and DuckDB, the
  * sub-bucket is a right-shift and mask, and the bucket floor
  * reconstructs by a left-shift — no floats, no logs, so the DuckDB
  * oracle replays the sketch and its quantile walk bit-for-bit.
  * Values < 32 are their own bucket (exact small-value region, ids
  * 0..31); values ≥ 32 have bit length ≥ 6 so ids ≥ 96 — disjoint.
  */
object LogHist {

  /** Sub-bucket bits: 4 → worst-case relative error 1/16. */
  val SubBits = 4

  /** Bucket id of a non-negative long column (SQL twin:
    * [[bucketSql]]). A NEGATIVE value fails loudly at execution: the
    * small-value branch would otherwise give every distinct negative
    * its own bucket — unbounded sketch state, the exact failure mode
    * the ≤1024 bound exists to prevent (snap to a non-negative grid,
    * or offset, before sketching). The guard is a codegen'd branch —
    * zero cost until triggered. */
  def bucketOf(v: Column): Column = {
    val blen = length(bin(v))
    when(v < 0, raise_error(concat(
        lit("LogHist.bucketOf: negative value "), v.cast("string"),
        lit(" — sketch a non-negative grid (offset or abs first)"))))
      .when(v < 32, v)
      .otherwise(
        blen.cast("long") * 16 +
          (call_function("shiftright", v, (blen - 5).cast("int")) % 16))
  }

  /** The DuckDB replay of [[bucketOf]] over SQL expression `v`. */
  def bucketSql(v: String): String =
    s"CASE WHEN $v < 32 THEN $v ELSE length(bin($v)) * 16" +
      s" + (($v >> (length(bin($v)) - 5)) & 15) END"

  /** Inclusive lower edge of a bucket — the quantile estimate
    * (SQL twin: [[floorSql]]). */
  def bucketFloor(b: Column): Column =
    when(b < 32, b).otherwise(
      call_function("shiftleft", (b % 16) + 16,
        (call_function("shiftright", b, lit(4)) - 5).cast("int")))

  /** The DuckDB replay of [[bucketFloor]] over SQL expression `b`. */
  def floorSql(b: String): String =
    s"CASE WHEN $b < 32 THEN $b ELSE (($b & 15) + 16)" +
      s" << (($b // 16) - 5) END"

  /** Per-group sketch: (groupCols…, bucket, n) — ONE aggregation,
    * ≤ 1024 buckets per group. `v` must be a non-negative integral
    * column (snap floats to their exact-decimal grid first). */
  def sketch(df: DataFrame, groupCols: Seq[String], v: Column): DataFrame =
    df.select(groupCols.map(col) :+ bucketOf(v).as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Fold sketches over finer keys down to `groupCols` — counts add;
    * this is the WHOLE merge operation (the mergeability the
    * incremental-profiling story rides on). */
  def merge(sk: DataFrame, groupCols: Seq[String]): DataFrame =
    sk.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Quantile estimates off a sketch: for each requested q (ppm),
    * the FLOOR of the first bucket whose cumulative count reaches
    * rank ceil(q·N / 10^6) — (groupCols…, q_ppm, est). The walk is a
    * per-group cumulative window over ≤ 1024 rows, never a data
    * exchange. */
  def quantiles(
      sk: DataFrame, groupCols: Seq[String], qPpm: Seq[Long]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(wAll))
    val qs = array(qPpm.map(lit): _*)
    cum
      .select(groupCols.map(col) :+ col("bucket") :+ col("cum") :+
        col("total") :+ explode(qs).as("q_ppm"): _*)
      // rank = ceil(total·q/10⁶), split so total·q never materializes:
      // total = a·10⁶ + b → rank = a·q + ceil(b·q/10⁶). The naive
      // (total * q_ppm + 999999) div 10⁶ overflows int64 past ~9.3e12
      // rows per group at q_ppm 990000; the split is exact for any
      // int64 total (b < 10⁶ so b·q < 10¹², a·q < 9.2e18). Mirrored
      // verbatim in the DuckDB oracles (AnalyticsQueries).
      .filter(col("cum") >= expr(
        "(total div 1000000L) * q_ppm" +
          " + ((total % 1000000L) * q_ppm + 999999L) div 1000000L"))
      .groupBy((groupCols :+ "q_ppm").map(col): _*)
      .agg(min(col("bucket")).as("b"))
      .select(groupCols.map(col) :+ col("q_ppm") :+
        bucketFloor(col("b")).as("est"): _*)
  }
}
