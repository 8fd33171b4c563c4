package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter,
  * JASA 1969; the Splink/dedupe.io model): blocked candidate pairs are
  * compared field-by-field into an agreement vector g ∈ {0,1}^F, and
  * EM estimates, with NO labels, the per-field conditional agreement
  * probabilities m_f = P(agree_f | match) and u_f = P(agree_f |
  * non-match) plus the match prevalence λ (Winkler 1988's unsupervised
  * fit). Pairs are then scored by the posterior match probability of
  * their pattern and classified by thresholds — the match/possible/
  * non-match triage the FS decision rule prescribes.
  *
  * Scale shape: the corpus-sized work is ONE blocked self-join and ONE
  * aggregation down to at most 2^F pattern counts (F ≤ 20 enforced) —
  * the EM itself runs on that O(2^F) table, which is metadata-sized
  * and independent of corpus size, so it runs on the driver (same
  * contract as the dictionary-table and export-manifest collects). A
  * 100 TB corpus changes the count values, not the EM's input shape.
  *
  * Engine-portability: EM is pure integer arithmetic on the ppm
  * (10^-6) grid — products renormalized by truncating `div` after
  * every factor, posteriors `pm·10^6 div (pm+pu)` — so the DuckDB
  * oracle replays the identical fixpoint from the identical pattern
  * counts with chained CTEs (one per iteration) and matches
  * bit-for-bit; no float products, no libm, no summation-order
  * dependence (integer sums commute). Bounds: with shares ≤ 10^6 and
  * weights ≤ 10^6, every intermediate ≤ 8·10^18 < 2^63.
  */
object Linkage {

  /** The ppm grid: all probabilities are integers in [0, 10^6]. */
  val Ppm = 1000000L

  /** Fitted FS parameters on the ppm grid, field order = the
    * agreement-column order passed to the fit. */
  final case class FsParams(lambda: Long, m: Seq[Long], u: Seq[Long])

  /** Agreement-pattern counts: ONE aggregation of the pairs frame
    * down to ≤ 2^F rows (g_1..g_F, n). This is the only corpus-sized
    * stage of the fit. */
  def patternCounts(pairs: DataFrame, agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty && agreeCols.size <= 20,
      s"1..20 agreement fields (got ${agreeCols.size})")
    pairs.groupBy(agreeCols.map(col): _*).agg(count(lit(1)).as("n"))
  }

  /** One EM fixpoint on collected pattern counts — pure driver-side
    * integer arithmetic, O(iters · 2^F). `patterns` maps each
    * agreement vector to its pair count. */
  def emFit(
      patterns: Seq[(Seq[Int], Long)],
      iters: Int,
      initLambda: Long = 100000L,
      initM: Long = 900000L,
      initU: Long = 100000L): FsParams = {
    require(patterns.nonEmpty, "no candidate pairs")
    val f = patterns.head._1.size
    val nTotal = math.max(patterns.map(_._2).sum, 1L)
    // Pattern shares on the ppm grid (the SQL replay's `nh` CTE).
    val nh = patterns.map { case (g, n) => (g, n * Ppm / nTotal) }
    val nhSum = math.max(nh.map(_._2).sum, 1L)
    var lam = initLambda
    var m = Seq.fill(f)(initM)
    var u = Seq.fill(f)(initU)
    for (_ <- 1 to iters) {
      // E-step: posterior w(g) on the ppm grid.
      val w = nh.map { case (g, n) =>
        val pm = classLikelihood(g, lam, m)
        val pu = classLikelihood(g, Ppm - lam, u)
        (g, n, pm * Ppm / math.max(pm + pu, 1L))
      }
      // M-step: responsibility-weighted agreement rates.
      val t = w.map { case (_, n, wg) => n * wg }.sum
      val tu = w.map { case (_, n, wg) => n * (Ppm - wg) }.sum
      lam = t / nhSum
      m = (0 until f).map { i =>
        val a = w.collect { case (g, n, wg) if g(i) == 1 => n * wg }.sum
        a * Ppm / math.max(t, 1L)
      }
      u = (0 until f).map { i =>
        val a =
          w.collect { case (g, n, wg) if g(i) == 1 => n * (Ppm - wg) }.sum
        a * Ppm / math.max(tu, 1L)
      }
    }
    FsParams(lam, m, u)
  }

  /** P(g | class)·P(class) on the ppm grid: prior·Π_f factor, each
    * product renormalized by truncating div — the exact nesting the
    * SQL replay writes as `((prior·f1) div 10^6 · f2) div 10^6 …`. */
  private def classLikelihood(
      g: Seq[Int], prior: Long, rates: Seq[Long]): Long =
    rates.zipWithIndex.foldLeft(prior) { case (acc, (r, i)) =>
      acc * (if (g(i) == 1) r else Ppm - r) / Ppm
    }

  /** Posterior match probability (ppm) of one agreement pattern under
    * fitted params. */
  def posteriorPpm(g: Seq[Int], p: FsParams): Long = {
    val pm = classLikelihood(g, p.lambda, p.m)
    val pu = classLikelihood(g, Ppm - p.lambda, p.u)
    pm * Ppm / math.max(pm + pu, 1L)
  }

  private def collectPatterns(
      pairs: DataFrame, agreeCols: Seq[String]): Seq[(Seq[Int], Long)] =
    patternCounts(pairs, agreeCols)
      .collect() // bounded: ≤ 2^F rows by construction
      .toSeq
      .map(r => (agreeCols.map(c => r.getAs[Number](c).intValue),
        r.getAs[Long]("n")))

  /** Fitted params as the canonical (param, ppm) frame: `lambda`,
    * `m_<col>`, `u_<col>` in the agreement-column order. */
  def paramsFrame(
      s: SparkSession, agreeCols: Seq[String], p: FsParams): DataFrame = {
    import s.implicits._
    (("lambda", p.lambda) +:
      agreeCols.zipWithIndex.flatMap { case (c, i) =>
        Seq((s"m_$c", p.m(i)), (s"u_$c", p.u(i)))
      }).toDF("param", "ppm")
  }

  /** Fit and emit the parameter table — see [[paramsFrame]]. */
  def fsFit(pairs: DataFrame, agreeCols: Seq[String], iters: Int): DataFrame =
    paramsFrame(pairs.sparkSession, agreeCols,
      emFit(collectPatterns(pairs, agreeCols), iters))

  /** Fit, then keep only the pairs whose agreement pattern clears the
    * match threshold — the edge list entity resolution clusters on.
    * The classifier is the O(2^F) accepted-pattern table broadcast
    * back as a LEFT SEMI join on the agreement vector: pair rows
    * stream through map-side, nothing pair-sized ever collects. */
  def fsMatchPairs(
      pairs: DataFrame, agreeCols: Seq[String], iters: Int,
      hiPpm: Long): DataFrame = {
    val s = pairs.sparkSession
    val counts = collectPatterns(pairs, agreeCols)
    val p = emFit(counts, iters)
    val keep = counts.map(_._1).distinct
      .filter(g => posteriorPpm(g, p) >= hiPpm)
    if (keep.isEmpty) pairs.filter(lit(false))
    else {
      val schema = org.apache.spark.sql.types.StructType(agreeCols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.IntegerType, nullable = false)))
      val keepDf = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          keep.map(g => org.apache.spark.sql.Row.fromSeq(g))
            .asJava),
        schema)
      pairs.join(broadcast(keepDf), agreeCols, "left_semi")
    }
  }

  /** Fit, then classify every observed pattern by its posterior:
    * (pattern, n_pairs, posterior_ppm, decision) — `match` above
    * `hiPpm`, `non_match` below `loPpm`, `possible` between (the FS
    * three-way decision rule). Pair-level triage is this table
    * broadcast-joined back on the agreement vector (the pattern table
    * IS the model — 2^F rows regardless of corpus size). */
  def fsScore(
      pairs: DataFrame, agreeCols: Seq[String], iters: Int,
      hiPpm: Long = 990000L, loPpm: Long = 10000L): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val counts = collectPatterns(pairs, agreeCols)
    val p = emFit(counts, iters)
    counts.map { case (g, n) =>
      val post = posteriorPpm(g, p)
      val decision =
        if (post >= hiPpm) "match"
        else if (post <= loPpm) "non_match"
        else "possible"
      (g.mkString(""), n, post, decision)
    }.toDF("pattern", "n_pairs", "posterior_ppm", "decision")
  }
}
