package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — median absolute deviation.
  *
  * The z-score gate (`q_outliers`) breaks down exactly when outliers
  * matter most: mean and stddev are themselves dragged by the
  * outliers (a single 10⁶× corrupt value inflates σ until nothing
  * else flags). MAD's 50% breakdown point is the standard robust
  * alternative for data-quality gates over scraped corpora.
  *
  * Flag: |v − median(v)| > k · median(|v − median(v)|), both medians
  * per group.
  *
  * Cross-engine exactness: run it on an INTEGER grid (cents — the
  * q_outliers device). Exact-percentile interpolation over integers
  * produces only dyadic rationals far below 2⁵², so every
  * intermediate (median, deviation, MAD, k·MAD) is EXACTLY
  * representable and Spark's `a + (b−a)·f` equals DuckDB's
  * `(a+b)/2` with no rounding at all — verdicts are bit-portable
  * without a rounding grid.
  *
  * Scale shape: two grouped EXACT percentiles (each one
  * map-side-partial-free ImperativeAggregate pass — per-group task
  * memory is O(group), the documented exact-percentile trade-off;
  * swap `percentile` for `percentile_approx` + a broadcast threshold
  * when groups are fact-scale, as q_quantile_filter's scale face
  * does) and two broadcast dim joins of the group-stat frames. The
  * deviation frame is consumed by both the MAD aggregate and the
  * verdict — persist it upstream at 100 TB or accept two fact scans.
  */
object Robust {

  /** Rows of `df` whose `value` (integral grid) deviates from its
    * group median by more than `k` MADs. Output = input columns; a
    * group with MAD 0 flags every row off the median (degenerate but
    * deterministic — an all-constant group with one bad row is
    * exactly the case the gate exists for).
    */
  def madOutliers(
      df: DataFrame, group: String, value: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val med = df.groupBy(col(group))
      .agg(percentile(col(value), lit(0.5)).as("__med"))
    val dev = df.join(broadcast(med), Seq(group))
      .withColumn("__dev", abs(col(value) - col("__med")))
    val mad = dev.groupBy(col(group))
      .agg(percentile(col("__dev"), lit(0.5)).as("__mad"))
    dev.join(broadcast(mad), Seq(group))
      .filter(col("__dev") > lit(k) * col("__mad"))
      .select(df.columns.map(col): _*)
  }
}
