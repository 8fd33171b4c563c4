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

  /** Theil-Sen robust trend (Theil 1950, Sen 1968): per-group slope =
    * the median of all pairwise slopes (y_j − y_i)/(x_j − x_i) over
    * x_i < x_j — 29.3% breakdown point where the OLS fit
    * ([[TimeSeries.trendSlopes]], `q_trend_slope`) is dragged by a
    * single corrupt day. Slopes are exact ppm integers (·10^6,
    * truncating div — identical toward-zero truncation in Spark `div`
    * and DuckDB `//`, negative diffs included) and the median is the
    * LOWER median (rank ⌈n/2⌉), so the whole statistic is
    * engine-portable with no float ordering anywhere.
    *
    * Scale shape: the O(n²) pair fan-out is per GROUP — feed it a
    * bounded series (the face aggregates events to daily sums first:
    * 30 points → 435 pairs per group at ANY corpus size; the corpus
    * scan is the one aggregation producing the series). The pair join
    * shuffles on the group key once; the median is a window over the
    * per-group pair rows. The bounded-series contract is ENFORCED:
    * any group wider than `maxPoints` raises loudly (raise_error in
    * the executor, before the pair fan-out) — aggregate the series
    * down (daily/hourly sums) or raise `maxPoints` deliberately,
    * knowing pairs grow as n²/2.
    *
    * @param pts (group, x, y) — one row per x per group, integral x/y
    * @param maxPoints loud per-group series cap (default 10 000 →
    *                  ≤ ~5·10⁷ pairs per group)
    * @return (group, n_pairs, slope_ppm)
    */
  def theilSen(
      pts: DataFrame, group: String, x: String, y: String,
      maxPoints: Int = 10000): DataFrame = {
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
    val p = pts.select(col(group), col(x).as("__x"), col(y).as("__y"))
      .withColumn("__npts", count(lit(1)).over(wg))
      .withColumn("__x", when(col("__npts") > maxPoints,
          raise_error(concat(
            lit("theilSen: group "), col(group).cast("string"),
            lit(" has "), col("__npts").cast("string"),
            lit(s" points > maxPoints=$maxPoints; the pair fan-out is " +
              "O(n²) per group — aggregate the series first or " +
              "raise maxPoints explicitly"))))
        .otherwise(col("__x")))
      .select(col(group), col("__x"), col("__y"))
    val slopes = p.as("a").join(p.as("b"),
        col(s"a.$group") === col(s"b.$group") &&
          col("a.__x") < col("b.__x"))
      .select(col(s"a.$group"),
        expr("((b.__y - a.__y) * 1000000L) div (b.__x - a.__x)")
          .as("__sl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
    slopes
      .withColumn("__rn", row_number().over(w.orderBy(col("__sl"))))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(group), col("__n").as("n_pairs"),
        col("__sl").as("slope_ppm"))
  }
}
