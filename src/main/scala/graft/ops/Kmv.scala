package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct sketches over the engine's
  * deterministic md5 draw — the ENGINE-PORTABLE sketch: because the
  * "random" hash is a pure function of the value (first 15 hex chars
  * of md5 → a 60-bit integer), the whole sketch — not just its
  * estimate's distribution — is reproducible bit-for-bit in any
  * engine, so the DuckDB oracle replays the exact k minimum hashes,
  * and set operations (union, Jaccard) reduce to exact integer
  * arithmetic over sketch membership (Beyer et al., SIGMOD'07 shape).
  *
  * Scale: the sketch is `orderBy(hash).limit(k)` — Spark plans a
  * TakeOrderedAndProject (per-partition top-k, then a k-sized merge
  * on one reducer), never a global sort; k rows is the only state
  * that leaves the executors. Sketches are mergeable by construction
  * (min-k of a union of sketches = min-k of the union), so per-batch
  * sketches can fold incrementally like the HLL/CMS state stores.
  */
object Kmv {

  /** 60-bit deterministic hash of a value (md5 prefix — the same
    * draw device as the sampling/export shard draws). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** The hash space size, 16^15 = 2^60 (exactly representable). */
  val Space: Double = math.pow(2.0, 60)

  /** The k minimum distinct hash values of `c`: (hv) ascending,
    * at most k rows. */
  def sketch(df: DataFrame, c: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.select(hash60(c).as("hv")).distinct().orderBy("hv").limit(k)
  }

  /** Distinct-count estimate from a [[sketch]]: one row
    * (n_sketch, kth_hv, est_distinct). Saturated sketch (n = k) →
    * the standard (k-1)·space/kth estimator; undersaturated → the
    * sketch IS the distinct set and the estimate is exact. The only
    * float op is one division of exact integers — bit-identical
    * across engines; rounded to 6 decimals for the hash compare. */
  def distinctEstimate(df: DataFrame, c: Column, k: Int): DataFrame =
    estimateFromSketch(sketch(df, c, k), k)

  /** [[distinctEstimate]] from an already-built sketch frame (one
    * `hv` column, ≤ k rows) — e.g. the streaming KMV state store. */
  def estimateFromSketch(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("n_sketch"), max(col("hv")).as("kth_hv"))
      .select(col("n_sketch"), col("kth_hv"),
        round(
          when(col("n_sketch") < k, col("n_sketch").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(Space) / col("kth_hv")),
          6).as("est_distinct"))

  /** KMV Jaccard of two keyed frames — EXACT INTEGERS end to end: the
    * union's k minimum hashes are computed with per-side membership
    * flags, and the estimate is `n_both·10⁶ div k_used` ppm. One row:
    * (k_used, n_both, jacc_ppm). */
  def jaccardEstimate(
      a: DataFrame, ca: Column, b: DataFrame, cb: Column,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val ha = a.select(hash60(ca).as("hv")).distinct()
      .select(col("hv"), lit(1).as("in_a"), lit(0).as("in_b"))
    val hb = b.select(hash60(cb).as("hv")).distinct()
      .select(col("hv"), lit(0).as("in_a"), lit(1).as("in_b"))
    ha.unionByName(hb)
      .groupBy(col("hv"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .orderBy("hv").limit(k)
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_both"))
      .select(col("k_used"), col("n_both"),
        expr("n_both * 1000000L div k_used").as("jacc_ppm"))
  }
}
