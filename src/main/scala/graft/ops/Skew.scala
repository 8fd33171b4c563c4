package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (stopwords, viral documents,
  * null-ish defaults). AQE's skew handling only rewrites JOINS; a
  * skewed AGGREGATION still funnels each hot key through one reducer,
  * so the classic fix is salting: spread each key over `saltBuckets`
  * partial groups, aggregate, then combine the partials.
  *
  * Only algebraic aggregates (sum/count/min/max and anything with an
  * exact merge step) can ride this; the helpers below expose the
  * common count/sum cases with the merge applied for you.
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets): the input partition id
    * mod saltBuckets, so the same key occurring on different input
    * partitions lands in different partial groups without any RNG
    * (reproducible plans).
    *
    * Effective spread is min(saltBuckets, input partitions): with
    * fewer input partitions than buckets, some buckets stay empty.
    * That bound is irrelevant for the count/sum helpers below — their
    * phase-1 partials are per-input-partition anyway, so reducer-side
    * work per key is already capped by the partition count — but a
    * caller salting something else (e.g. a join key) on a
    * few-partition input should repartition first. */
  def saltCol(saltBuckets: Int): Column =
    pmod(spark_partition_id(), lit(saltBuckets))

  /** Salted count+sum: phase 1 groups by (keys, salt) — map-side
    * combine still applies inside each partial — phase 2 merges the
    * ≤ `saltBuckets` partials per key. The hot key's work now spreads
    * over `saltBuckets` reducers.
    *
    * @param sums value columns to sum, by output name
    */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column] = Map.empty,
      saltBuckets: Int = 16,
      countName: String = "n"): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(saltBuckets))
    val partialAggs =
      count(lit(1)).as(s"__c") +:
        sums.toSeq.map { case (name, c) => sum(c).as(s"__s_$name") }
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.drop(1): _*)
    val finalAggs =
      sum(col("__c")).as(countName) +:
        sums.keys.toSeq.map(name => sum(col(s"__s_$name")).as(name))
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.drop(1): _*)
  }

  /** Heavy-hitter diagnostic: the k most frequent value-combinations
    * of `keys` with counts and rank — the first thing to run when one
    * reducer runs forever. The counting itself rides
    * [[saltedCountSum]] (a hot key IS a skewed aggregation, so plain
    * groupBy would funnel it through one reducer) and the selection
    * uses the bounded-heap TopKPerGroup operator — O(n log k), never a
    * global sort. `tie` breaks equal counts deterministically; it is
    * evaluated over the counted frame (`keys` + `n`) and must be a
    * unique LongType expression, e.g. the key itself or a hash of the
    * keys. */
  def hotKeys(
      df: DataFrame,
      keys: Seq[String],
      k: Int,
      tie: Column,
      saltBuckets: Int = 16): DataFrame =
    graft.plans.TopKPerGroup.topK(
        saltedCountSum(df, keys, saltBuckets = saltBuckets)
          .withColumn("__g", lit(0))
          .withColumn("__score", col("n").cast("double"))
          .withColumn("__tie", tie),
        Seq("__g"), "__score", "__tie", k)
      .drop("__g", "__score", "__tie")

  /** Salted equi-join for a skewed fact key against a dim too large to
    * broadcast: replicate each dim row across `saltBuckets` salt values
    * and give each fact row ONE deterministic salt, so a hot key's fact
    * rows spread over `saltBuckets` reducers instead of funneling
    * through one sort-merge task.
    *
    * Complements AQE skew-join splitting (which rewrites already-
    * planned shuffle joins when runtime sizes reveal skew): salting is
    * the static fix you reach for when the hot keys are KNOWN and AQE's
    * per-partition thresholds won't fire (e.g. one key = 40% of the
    * fact). The dim side pays `saltBuckets`× replication — keep buckets
    * small (8-32) and the dim lean (project first).
    *
    * Fact salt is `pmod(spark_partition_id(), saltBuckets)`: effective
    * spread is min(saltBuckets, fact input partitions) — repartition a
    * few-partition fact first (same caveat as [[saltCol]]).
    *
    * Inner and left joins preserve semantics exactly: each fact row
    * carries one salt and meets each matching dim row exactly once (the
    * replica with its salt). Result is identical to the unsalted join,
    * which is what the oracle checks.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(joinType == "inner" || joinType == "left" ||
        joinType == "left_outer",
      s"saltedJoin preserves semantics only for inner/left joins, got $joinType")
    val saltedFact = fact.withColumn("__salt", saltCol(saltBuckets))
    val explodedDim = dim.withColumn(
      "__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    saltedFact
      .join(explodedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Salted distinct-count: phase 1 dedups (keys, value) within salt
    * buckets, phase 2 dedups across buckets and counts. Exact (not a
    * sketch); for approximate at extreme cardinality use
    * `approx_count_distinct` instead. */
  def saltedCountDistinct(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      saltBuckets: Int = 16,
      as: String = "n_distinct"): DataFrame = {
    val salted = df
      .withColumn("__v", value)
      .withColumn("__salt", saltCol(saltBuckets))
    salted
      .select((keys :+ "__salt" :+ "__v").map(col): _*)
      .distinct()
      .select((keys :+ "__v").map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(as))
  }
}
