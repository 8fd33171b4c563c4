package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation gates — the Deequ-style "verify the batch
  * before it enters the corpus" step every 100 TB ingest needs (no
  * reference counterpart; SURVEY.md §8 extension surface).
  *
  * Output is long-format, one row per declared check:
  * `(check, n_rows, n_bad, passed)` — a machine-readable gate report a
  * pipeline can join against its promotion decision.
  *
  * Scale shape: every ROW-LEVEL check (not-null, in-set, in-range,
  * regex, uniqueness) fuses into ONE aggregation over ONE scan of the
  * table — `sum(when(violation, 1))` columns inside a single `agg` —
  * so adding a tenth check costs arithmetic, not another 100 TB pass.
  * Uniqueness rides the same pass as `count - countDistinct(struct)`
  * (the struct wrapper keeps NULL-bearing keys countable, matching
  * DuckDB's `count(DISTINCT (a, b))` row semantics). Referential
  * checks ([[fkOrphans]]) are the one genuinely relational case: a
  * LEFT ANTI join against the parent key set (broadcast when the
  * parent is dim-sized) reduced to a single count — still one scan of
  * the child plus one of the parent key column.
  *
  * NULL semantics (documented contract): [[Check.NotNull]] is the only
  * check that counts NULLs as violations; `InSet` / `InRange` /
  * `Matches` pass NULL values through (SQL-style), so the checks
  * compose instead of double-counting the same missing cell.
  */
object Quality {

  sealed trait Check {
    def name: String
    /** 1 when this row violates the check, else 0. */
    private[ops] def violation: Column
  }

  object Check {
    final case class NotNull(c: String) extends Check {
      val name = s"not_null:$c"
      private[ops] def violation = when(col(c).isNull, 1L).otherwise(0L)
    }
    final case class InSet(c: String, allowed: Seq[String]) extends Check {
      val name = s"in_set:$c"
      private[ops] def violation =
        when(col(c).isNotNull && !col(c).cast("string")
          .isin(allowed: _*), 1L).otherwise(0L)
    }
    final case class InRange(c: String, lo: Double, hi: Double)
        extends Check {
      val name = s"in_range:$c"
      private[ops] def violation =
        when(col(c).isNotNull &&
          (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L)
    }
    final case class Matches(c: String, regex: String) extends Check {
      val name = s"matches:$c"
      private[ops] def violation =
        when(col(c).isNotNull && !col(c).rlike(regex), 1L).otherwise(0L)
    }
    /** Key-tuple uniqueness; n_bad = surplus rows beyond one per key. */
    final case class Unique(cols: Seq[String]) extends Check {
      val name = s"unique:${cols.mkString(",")}"
      private[ops] def violation = lit(0L) // aggregated, not row-level
    }
  }

  /** Evaluate all `checks` over `df` in one aggregation pass.
    * Returns `(check, n_rows, n_bad, passed)`, one row per check. */
  def expectations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations needs at least one check")
    val aggs = checks.zipWithIndex.map {
      case (Check.Unique(cols), i) =>
        (count(lit(1)) - countDistinct(struct(cols.map(col): _*)))
          .as(s"__bad_$i")
      case (c, i) => sum(c.violation).as(s"__bad_$i")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"),
        col("__n").as("n_rows"),
        coalesce(col(s"__bad_$i"), lit(0L)).as("n_bad"),
        (coalesce(col(s"__bad_$i"), lit(0L)) === 0L).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** The ZERO-EXTRA-PASS variant of [[expectations]]: attach the
    * row-level checks as OBSERVED metrics (`Dataset.observe`) so they
    * materialize as a side channel of whatever action the caller was
    * already running — at 100 TB the gate rides the production write
    * itself instead of costing a second scan. After the action,
    * `observation.get` yields `n_rows` plus one `bad:<check>` entry
    * per check.
    *
    * Only row-level checks qualify: observed metrics cannot contain
    * DISTINCT aggregates (a Spark restriction), so [[Check.Unique]] —
    * which needs the shuffle pass anyway — stays with
    * [[expectations]]. */
  def observedChecks(
      df: DataFrame, checks: Seq[Check])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(checks.nonEmpty, "observedChecks needs at least one check")
    require(!checks.exists(_.isInstanceOf[Check.Unique]),
      "Unique needs a distinct aggregate, which observed metrics " +
        "cannot carry; run it through expectations()")
    val obs = org.apache.spark.sql.Observation("graft_quality")
    val aggs = checks.map(c => sum(c.violation).as(s"bad:${c.name}"))
    (df.observe(obs, count(lit(1)).as("n_rows"), aggs: _*), obs)
  }

  /** Referential-integrity gate: rows of `child` whose `childKeys`
    * tuple has no match in `parent`'s `parentKeys`. Same report
    * schema as [[expectations]]. NULL child keys never match (SQL
    * join semantics) and so count as orphans — the usual FK reading.
    *
    * Plan: LEFT ANTI join child→distinct parent keys (Catalyst
    * broadcasts the parent side when it is small), reduced to one
    * count; the `n_rows` total shares the child scan via the same
    * two-aggregate union trick (both sides are one-row frames, so the
    * final crossJoin is a broadcast nested loop over 1×1 rows).
    */
  def fkOrphans(
      child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.length == parentKeys.length && childKeys.nonEmpty,
      "fkOrphans needs matching non-empty key lists")
    val name = s"fk:${childKeys.mkString(",")}->${parentKeys.mkString(",")}"
    val p = parent.select(parentKeys.map(col): _*).distinct()
    val cond = childKeys.zip(parentKeys)
      .map { case (ck, pk) => child(ck) === p(pk) }
      .reduce(_ && _)
    val orphans = child.join(p, cond, "left_anti")
      .agg(count(lit(1)).as("n_bad"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    total.crossJoin(broadcast(orphans)).select(
      lit(name).as("check"), col("n_rows"), col("n_bad"),
      (col("n_bad") === 0L).as("passed"))
  }

  /** Functional-dependency check A → B: one row
    * (fd, n_keys, n_violating_keys, holds) — a key VIOLATES when it
    * maps to more than one distinct B. One map-side-combined
    * aggregation keyed by A; the profiling primitive behind schema
    * discovery and dedup-key vetting. */
  def fdCheck(
      df: DataFrame, a: String, b: String): DataFrame =
    df.groupBy(col(a))
      .agg(countDistinct(col(b)).as("__nb"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("__nb") > 1, 1L).otherwise(0L)).as("n_violating_keys"))
      .select(lit(s"$a->$b").as("fd"), col("n_keys"),
        col("n_violating_keys"),
        (col("n_violating_keys") === 0L).as("holds"))

  /** Golden-record survivorship over duplicate clusters: for every
    * cluster, the representative id (min member id), the member
    * count, and per-field CANONICAL values — the modal value with
    * ties broken to the smallest value, nulls never winning over a
    * present value (rows where the field is null simply don't vote).
    * One (cluster, field) count aggregation + one rank per field;
    * fields are enumerated, so the plan is a fixed-width join chain
    * of cluster-dim-sized frames over a single fact pass per field.
    */
  def survivorship(
      df: DataFrame, id: String, cluster: Column,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "survivorship needs at least one field")
    val base = df.withColumn("__c", cluster)
    val core = base.groupBy(col("__c"))
      .agg(min(col(id)).as("rep_id"), count(lit(1)).as("n_members"))
    fields.foldLeft(core) { (acc, f) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__c"))
        .orderBy(col("__n").desc, col(f).asc)
      val canon = base.filter(col(f).isNotNull)
        .groupBy(col("__c"), col(f))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__c"), col(f).as(s"${f}_canon"))
      acc.join(canon, Seq("__c"), "left")
    }.drop("__c")
  }

  /** Split-conformal screening threshold for a score-based keep/drop
    * gate (Vovk et al. 2005; Angelopoulos & Bates 2021 survey,
    * arXiv:2107.07511): given a CALIBRATION sample of scores from
    * the population the gate must not lose (e.g. known-good docs),
    * the k-th smallest calibration score with k = ⌊(n+1)·α⌋ is the
    * keep threshold — under exchangeability, `score ≥ q̂` drops a
    * new good document with probability ≤ α, a finite-sample
    * guarantee no eyeballed threshold gives. This is the principled
    * way to SET the cutoff the model-score gate (q_model_score)
    * then applies.
    *
    * Scores arrive on the nano grid (BIGINT — the calibrationBins
    * snap convention) so the order statistic is exact; α = num/den
    * in integers, k by integer division. k = 0 (calibration too
    * small for the requested α) yields q̂ = Long.MinValue — keep
    * everything, the honest answer. Output: ONE row
    * (n_cal, k, qhat_nano).
    *
    * Shape: calibration sets are dimension-sized by definition — the
    * rank runs as one ordered window over the calibration slice
    * only; the result is a one-row broadcast carrier for the
    * corpus-side keep filter.
    */
  def conformalThreshold(
      cal: DataFrame, scoreNano: Column,
      alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0,1): got $alphaNum/$alphaDen")
    val s = cal.select(scoreNano.cast("long").as("__s"))
    val n = s.agg(count(lit(1)).as("n_cal"))
      .select(col("n_cal"),
        expr(s"(n_cal + 1) * $alphaNum div $alphaDen").as("k"))
    val ranked = s.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("__s"))))
    broadcast(n).join(ranked, col("__rn") === col("k"), "left")
      .select(col("n_cal"), col("k"),
        coalesce(col("__s"), lit(Long.MinValue)).as("qhat_nano"))
  }
}
