package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture primitives for incremental pipelines: snapshot
  * diffing, SCD type-1 upsert, and SCD type-2 history merge — the
  * operations a periodic 100 TB re-crawl/re-export needs so downstream
  * consumers reprocess only what CHANGED, not the whole corpus.
  *
  * Scale shapes (all three are single equi-join passes on the key):
  *  - [[diffSnapshots]] is ONE full-outer hash join — the minimal
  *    shape for a diff; both sides shuffle on the key once. Bucketed
  *    snapshots ([[graft.sources.Bucketing]]) make it exchange-free.
  *  - [[scd1Merge]] is one anti join + union: the target never
  *    rewrites rows the batch didn't touch.
  *  - [[scd2Merge]] joins ONLY the current slice (one row per live
  *    key) against the batch; closed history rows pass through
  *    untouched — per-batch cost is O(live keys + batch), never
  *    O(history).
  *
  * Change detection is null-safe (`<=>`) column equality, so a
  * null→value or value→null transition counts as a change and a
  * null→null one does not — matching what the relational oracles
  * (`IS [NOT] DISTINCT FROM`) compute.
  *
  * Both sides of a diff/merge routinely derive from the SAME lineage
  * (today's scan filtered two ways), which trips Spark's ambiguous-
  * self-join analyzer check if the join reuses raw attributes. Each
  * operator therefore re-aliases its inputs behind fresh prefixed
  * projections (new expression ids) before joining — callers never
  * need to `.alias()` anything.
  */
object Cdc {

  /** Fresh-exprId projection: every column aliased under `prefix`. */
  private def prefixed(df: DataFrame, cols: Seq[String], prefix: String): DataFrame =
    df.select(cols.map(c => col(c).as(s"$prefix$c")): _*)

  private def anyDiffers(attrs: Seq[String], p1: String, p2: String): Column =
    attrs.map(a => !(col(s"$p1$a") <=> col(s"$p2$a"))).reduce(_ || _)

  /** Diff two snapshots of the same keyed table: one row per key whose
    * presence or compared attributes changed, with
    * `op ∈ {insert, delete, update}` and the old/new attribute values
    * (`old_<a>` / `new_<a>`). Unchanged keys produce no row — the
    * output is batch-sized, not corpus-sized, which is the point of
    * shipping a diff instead of a snapshot.
    */
  def diffSnapshots(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diffSnapshots needs at least one key column")
    require(attrs.nonEmpty, "diffSnapshots needs at least one compare column")
    // the presence markers live in the same prefixed namespace as the
    // data columns — a data column named "present" would be silently
    // overwritten and its changes never detected
    require(!(keys ++ attrs).contains("present"),
      "diffSnapshots: column name 'present' is reserved (presence markers)")
    // a column listed as both key and attr would be compared against
    // itself and duplicate in the output projection — reject loudly
    require(keys.intersect(attrs).isEmpty,
      s"diffSnapshots: keys and attrs must be disjoint, both contain " +
        s"${keys.intersect(attrs).mkString(",")}")
    // explicit presence markers: a row whose key columns are ALL null
    // is still a present row, so probing the key columns after the
    // join cannot distinguish it from an absent side
    val o = prefixed(oldDf, keys ++ attrs, "__o_")
      .withColumn("__o_present", lit(true))
    val n = prefixed(newDf, keys ++ attrs, "__n_")
      .withColumn("__n_present", lit(true))
    val joined = o.join(
      n, keys.map(k => col(s"__o_$k") <=> col(s"__n_$k")).reduce(_ && _),
      "full_outer")
    val oPresent = col("__o_present").isNotNull
    val nPresent = col("__n_present").isNotNull
    val op = when(!oPresent, lit("insert"))
      .when(!nPresent, lit("delete"))
      .when(anyDiffers(attrs, "__o_", "__n_"), lit("update"))
    joined
      .withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k)) ++
          Seq(col("op")) ++
          attrs.map(a => col(s"__o_$a").as(s"old_$a")) ++
          attrs.map(a => col(s"__n_$a").as(s"new_$a")): _*)
  }

  /** Apply a [[diffSnapshots]] delta to the snapshot it was computed
    * FROM, reconstructing the new snapshot exactly (the consumer side
    * of shipping diffs: `applyDiff(old, diff(old, new)) == new`,
    * property-tested). Deletes and updates anti-join the old rows out;
    * updates and inserts come back from the diff's `new_` columns —
    * one anti join + one union, both delta-driven, so applying a
    * day's diff to a 100 TB snapshot costs the day, not the corpus.
    */
  def applyDiff(
      snapshot: DataFrame,
      diff: DataFrame,
      keys: Seq[String],
      attrs: Seq[String]): DataFrame = {
    // the anti join must be null-safe like the diff's own join, or a
    // null-key delete/update is never applied and the round-trip
    // property breaks exactly where diffSnapshots promises null keys
    // are legitimate
    val touched = diff.filter(col("op").isin("delete", "update"))
      .select(keys.map(k => col(k).as(s"__t_$k")): _*)
    val incoming = diff.filter(col("op").isin("insert", "update"))
      .select(keys.map(col) ++ attrs.map(a => col(s"new_$a").as(a)): _*)
    snapshot.select((keys ++ attrs).map(col): _*)
      .join(touched,
        keys.map(k => col(k) <=> col(s"__t_$k")).reduce(_ && _),
        "left_anti")
      .unionByName(incoming)
  }

  /** SCD type-1 upsert: batch rows replace target rows with the same
    * key; target rows the batch doesn't touch survive as-is. The
    * classic `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
    * INSERT` collapsed to anti-join + union. Both frames must share
    * the schema `keys ++ attrs`.
    */
  def scd1Merge(
      target: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.toSeq == batch.columns.toSeq,
      "scd1Merge: target and batch schemas must match " +
        s"(${target.columns.mkString(",")} vs ${batch.columns.mkString(",")})")
    // null-safe anti join (a batch row with a null key must still
    // replace the target's null-key row); the batch side is prefixed
    // for fresh exprIds, same as the other operators
    val b = prefixed(batch, keys, "__b_")
    target
      .join(b, keys.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _),
        "left_anti")
      .unionByName(batch)
  }

  /** SCD type-2 history merge. `history` rows are versioned
    * `keys ++ attrs ++ (valid_from, valid_to)` with `valid_to IS NULL`
    * marking the current version; `batch` rows are
    * `keys ++ attrs ++ effectiveCol` (the batch's non-null observation
    * time).
    *
    * Semantics (standard slowly-changing-dimension type 2):
    *  - a batch row whose attrs differ from the key's current version
    *    CLOSES it (`valid_to := effective`) and opens a new current
    *    version (`valid_from := effective`);
    *  - a batch row for an unseen key opens its first version;
    *  - a no-op batch row (attrs null-safely equal) changes nothing;
    *  - closed history rows pass through untouched.
    *
    * The batch must hold at most one row per key (enforce upstream
    * with e.g. latest-per-key; a multi-version batch needs a fold,
    * not a merge).
    */
  def scd2Merge(
      history: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      effectiveCol: String = "effective_at"): DataFrame = {
    require(!(keys ++ attrs).contains("present"),
      "scd2Merge: column name 'present' is reserved (presence markers)")
    // the output schema appends valid_from/valid_to (and the batch
    // carries effectiveCol): a key/attr with one of those names would
    // produce duplicate columns and a confusing analysis error later
    val reserved = Seq("valid_from", "valid_to", effectiveCol)
    require((keys ++ attrs).intersect(reserved).isEmpty,
      s"scd2Merge: ${reserved.mkString("/")} are reserved version " +
        s"columns; found ${(keys ++ attrs).intersect(reserved).mkString(",")}" +
        " in keys/attrs")
    require(keys.intersect(attrs).isEmpty,
      s"scd2Merge: keys and attrs must be disjoint, both contain " +
        s"${keys.intersect(attrs).mkString(",")}")
    val closed = history.filter(col("valid_to").isNotNull)
    // explicit presence markers: a null KEY column must not read as
    // "side absent" after the full-outer join
    val current = prefixed(
      history.filter(col("valid_to").isNull),
      keys ++ attrs :+ "valid_from", "__c_")
      .withColumn("__c_present", lit(true))
    val b = prefixed(batch, keys ++ attrs :+ effectiveCol, "__b_")
      .withColumn("__b_present", lit(true))
    val joinCond =
      keys.map(k => col(s"__c_$k") <=> col(s"__b_$k")).reduce(_ && _)
    val eff = col(s"__b_$effectiveCol")
    val cPresent = col("__c_present").isNotNull
    val bPresent = col("__b_present").isNotNull
    val changed = cPresent && bPresent && anyDiffers(attrs, "__c_", "__b_")
    val validToType = history.schema("valid_to").dataType
    // ONE full-outer join emits both outputs per joined row via a
    // generator (0-2 rows each): the kept/closed current version and
    // the opening batch version. The two-join formulation shuffled
    // current and batch twice for the same information.
    val kept = when(cPresent, struct(
      (keys ++ attrs).map(c => col(s"__c_$c").as(c)) :+
        col("__c_valid_from").as("valid_from") :+
        when(changed, eff).cast(validToType).as("valid_to"): _*))
    val opening = when(bPresent && (!cPresent || changed),
      struct(
        (keys ++ attrs).map(c => col(s"__b_$c").as(c)) :+
          eff.as("valid_from") :+
          lit(null).cast(validToType).as("valid_to"): _*))
    val merged = current.join(b, joinCond, "full_outer")
      .select(explode(filter(array(kept, opening), c => c.isNotNull))
        .as("__r"))
      .select(col("__r.*"))
    closed.unionByName(merged)
  }

  /** Point-in-time (time-travel) read of an SCD2 history: the single
    * version of each key live at `at` — valid_from <= at < valid_to,
    * with open versions carrying null valid_to. [[scd2Merge]]
    * guarantees version intervals per key are disjoint, so the read
    * returns at most one row per key (spec'd). Pure map-side filter —
    * at 100 TB, store the history partitioned on a valid_to bucket
    * (open vs year-closed) so a current-state read partition-prunes
    * the closed bulk.
    */
  def scd2AsOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** Incremental maintenance of a grouped COUNT/SUM rollup — the
    * materialized-view refresh path: fold one arriving batch into the
    * persisted per-key state without re-scanning the corpus. count and
    * sum are associative+commutative, so
    * `aggRefresh(aggRefresh(state, b1), b2) == aggState(b1 ∪ b2)`
    * for ANY batch split (property-spec'd); avg/rates derive from the
    * pair downstream. Cost per refresh: one map-side-combined
    * aggregation of the BATCH plus a key-sized outer fold — O(batch +
    * |keys|), never O(corpus). Corrections arrive as retraction rows
    * with `weight = -1` (count folds the weight, sum folds
    * weight·value), so an upstream fix is two rows — retract old,
    * assert new — the standard changelog convention.
    *
    * State schema: (keys..., n, total). Empty groups (n = 0 after
    * retractions) are dropped so the state never accretes dead keys.
    */
  def aggRefresh(
      state: DataFrame, batch: DataFrame, keys: Seq[String],
      valueCol: String, weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val delta = batch.groupBy(keys.map(col): _*)
      .agg(sum(w).as("__dn"),
        sum(w * col(valueCol)).as("__dt"))
    val s = prefixed(state, keys :+ "n" :+ "total", "__s_")
    val joinCond = keys.map(k => col(s"__s_$k") <=> col(k)).reduce(_ && _)
    s.join(delta, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"__s_$k")).as(k)) :+
          (coalesce(col("__s_n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
            .as("n") :+
          (coalesce(col("__s_total"), lit(0L)) +
            coalesce(col("__dt"), lit(0L))).as("total"): _*)
      .filter(col("n") =!= 0L)
  }

  /** Bootstrap the [[aggRefresh]] state from a first batch. */
  def aggState(
      batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).cast("long").as("total"))

  /** Incremental view maintenance WITH RETRACTION: apply a
    * [[diffSnapshots]] delta to a grouped (n, total) aggregate state
    * so that `aggApplyDiff(aggState(v1), diff(v1, v2)) ==
    * aggState(v2)` exactly (property-tested). Unlike [[aggRefresh]]
    * (insert-only), deletes retract and updates handle the hard case:
    * a row whose GROUP ATTRIBUTE changed contributes −1/−old to the
    * old group AND +1/+new to the new group — the two-sided delta
    * expansion below, which a naive "new − old per key" misses
    * whenever the group moves.
    *
    * Scale shape: the delta expansion and its aggregation are
    * DIFF-sized; the merge is one full-outer join against the
    * group-cardinality state — refreshing a grouped aggregate over a
    * 100 TB snapshot costs the day's diff, never the corpus. Groups
    * whose count reaches 0 drop out of the state (the empty-group
    * case the property test plants).
    *
    * @param oldVal value of a retracted row, over the diff's `old_*`
    *               columns (apply the integer-grid snap here)
    * @param newVal value of an inserted row, over `new_*` columns
    */
  def aggApplyDiff(
      state: DataFrame, diff: DataFrame, groupAttr: String,
      oldVal: Column, newVal: Column): DataFrame = {
    // ONE pass over the diff: each row explodes into its retraction
    // and/or insertion contribution map-side (a two-branch
    // filter+union would execute the diff's plan — itself a
    // full-outer join when derived inline — twice)
    val delta = diff
      .select(explode(array(
        when(col("op").isin("delete", "update"),
          struct(col(s"old_$groupAttr").as("g"),
            lit(-1L).as("dn"), (-oldVal).cast("long").as("dt"))),
        when(col("op").isin("insert", "update"),
          struct(col(s"new_$groupAttr").as("g"),
            lit(1L).as("dn"), newVal.cast("long").as("dt")))))
        .as("__c"))
      .filter(col("__c").isNotNull)
      .groupBy(col("__c.g").as(groupAttr))
      .agg(sum(col("__c.dn")).as("__dn"), sum(col("__c.dt")).as("__dt"))
    val s = prefixed(state, Seq(groupAttr, "n", "total"), "__s_")
    s.join(delta, col(s"__s_$groupAttr") <=> col(groupAttr), "full_outer")
      .select(
        coalesce(col(groupAttr), col(s"__s_$groupAttr")).as(groupAttr),
        (coalesce(col("__s_n"), lit(0L)) +
          coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("__s_total"), lit(0L)) +
          coalesce(col("__dt"), lit(0L))).as("total"))
      .filter(col("n") =!= 0L)
  }
}
