package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted connected-component state with BATCH-BOUNDED maintenance
  * — the storage layer [[Graph.incrementalComponents]] needs to be an
  * honest O(batch) contract at 100 TB. The frame-level operator is
  * algebraically O(batch) (quotient CC over a batch-sized graph), but
  * any caller that holds state as ONE frame still pays a full-state
  * read AND a full-state write per batch just to carry the labels
  * forward. At state ×100 that is a ×100 per-batch cost — the
  * round-12 rehearsal measured exactly that (8.78× at 10×→100×).
  *
  * Two devices make the persisted contract batch-bounded:
  *
  *  1. '''Fixed-width range bucketing''' of the (node, component)
  *     rows: `__pt = node >> bits`, Hive-partitioned. Every per-batch
  *     state access (endpoint label lookup, new-node append) prunes
  *     to the buckets the batch's endpoints land in, so per-batch
  *     read/write bytes are ≤ |batch endpoints| × rows-per-bucket —
  *     INDEPENDENT of total state size (`bits` is sized at init for a
  *     target rows-per-bucket from the observed id density, so the
  *     bound holds for dense sequential ids and sparse hash-like ids
  *     alike). Untouched buckets are never listed into the scan, read,
  *     or rewritten.
  *
  *  2. A '''rebase side-table''' (old-canonical → new-canonical, kept
  *     transitively compressed) so MERGES never touch member rows at
  *     all. Relabeling a merged component the eager way rewrites every
  *     member row — a component can be corpus-sized, so that is not
  *     batch-bounded. Instead stored rows keep their as-of-write
  *     component and readers resolve through one broadcast join
  *     against the rebase table ([[read]]); a batch appends only the
  *     batch's own merge pairs. The rebase table is bounded by merge
  *     EVENTS (dim-sized per batch), not membership, and [[compact]]
  *     folds it back into the rows on an amortized schedule — the
  *     log-structured base+delta discipline.
  *
  * Invariant maintained across batches: for every stored raw
  * component value `r`, either `r` is current-canonical or the rebase
  * table maps `r` directly (one hop) to current-canonical — composes
  * stay flattened because a new batch's merge keys are RESOLVED
  * labels, and resolved labels are never pre-existing rebase keys.
  * Canonical labels are min-ids (the quotient CC takes minima of
  * already-minimal labels), so [[read]] after any number of
  * [[applyBatch]] folds is IDENTICAL to one full
  * [[Graph.connectedComponents]] over the union of all edges (spec'd).
  *
  * SINGLE-WRITER contract: batches must be applied serially (the
  * streaming sink's micro-batch loop does this by construction; a
  * workflow scheduler must too). Two concurrent [[applyBatch]] calls
  * would each compose the rebase from the same prior version and the
  * second publish would drop the first's merges — the classic
  * read-modify-write race that optimistic-commit table formats solve
  * with a conditional swap, which plain filesystems cannot express.
  *
  * Crash / re-delivery discipline (callers tag batches, e.g.
  * [[graft.streaming.EventStream.componentStoreSink]]): the rebase
  * publish (atomic, [[graft.sources.Versioned]]) happens BEFORE the
  * new-node partition overwrite. A crash between the two leaves
  * merges visible and appends missing; re-delivering the batch is
  * convergent — already-applied merges resolve to identity quotient
  * edges (no-op republish) and the missing appends are re-computed
  * against the same resolved labels.
  */
object GraphStore {

  final case class Applied(merges: Long, newNodes: Long, buckets: Int)

  /** Above this many touched buckets a literal IN pruning filter costs
    * the planner more than it saves — fall back to full scans (the
    * batch is corpus-scale by then anyway). */
  private val PruneLiteralCap = 10000

  private def labelsDir(dir: String) = s"$dir/labels"
  private def rebaseRoot(dir: String) = s"$dir/rebase"
  private def metaRoot(dir: String) = s"$dir/meta"

  private def emptyRebase(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("__from"), col("id").as("__to"))

  /** Bucket id: arithmetic shift = floor-division by 2^bits, exact on
    * longs (incl. negative ids) — no double round-trip. */
  private def bucketOf(node: Column, bits: Int): Column =
    shiftright(node, bits)

  /** The store's bucket function, read from `dir/meta`: either the
    * fixed-width shift (uniform/hashed id spaces) or quantile
    * BOUNDARY ranks (skew-proof — see [[init]]'s `quantileBuckets`). */
  private final case class Bucketing(bits: Int, bounds: Option[Array[Long]]) {
    def of(node: Column): Column = bounds match {
      case None => bucketOf(node, bits)
      case Some(b) => boundaryRank(node, b)
    }
  }

  /** rank(node) = #boundaries ≤ node — the native
    * [[graft.plans.BoundaryRank]] expression (O(log B) binary search
    * per row over one shared long[] reference, O(1) plan size, inside
    * whole-stage codegen). Buckets are therefore equal-COUNT (not
    * equal-width), immune to id-space skew. The round-14 rehearsal
    * retired the previous when-chain Column form: Column composition
    * cannot share subtrees, so its tree grew 3^⌈log₂ B⌉ — at 76
    * boundaries every applyBatch paid ~45 s of driver planning. */
  private def boundaryRank(node: Column, bounds: Array[Long]): Column =
    if (bounds.isEmpty) lit(0L)
    else graft.plans.BoundaryRank.rank(node, bounds)

  /** Size `bits` so a bucket holds ~`targetRowsPerBucket` rows at the
    * OBSERVED id density: width = target / (n / span). Dense
    * sequential ids get narrow buckets; sparse 64-bit hash ids get
    * wide ones — rows-per-bucket lands near target either way
    * (assuming ids are roughly uniform over their span, which both
    * regimes are).
    *
    * DECISION RULE for `quantileBuckets` (measured, round-14 skew
    * rehearsal — dense pocket + 1% outliers at 2^40): the fixed shift
    * sizes width by the OUTLIER span, so the pocket collapsed into
    * one 19.8M-row bucket (76× target) and applyBatch grew 2.23×
    * from state ×10→×100 (every pocket-touching batch reads O(state));
    * quantile mode held max-bucket at 261,754 ≈ target and 0.96×
    * growth. Use `quantileBuckets = true` whenever the id space is
    * not uniform-or-hashed — concretely, if
    * `labels.groupBy(bucket).count()`'s max under the shift exceeds
    * ~4× `targetRowsPerBucket` at init time, re-init with quantiles.
    * Uniform/hashed ids (what ingest pipelines mint) keep the
    * closed-form shift: no boundary array in consumers. Quantile
    * boundaries are frozen at init from the observed distribution;
    * if the id DISTRIBUTION drifts far from it, later appends can
    * still pool (re-init or [[compact]]-time re-quantile to heal). */
  def init(labels: DataFrame, dir: String,
      targetRowsPerBucket: Long = 1L << 18,
      quantileBuckets: Boolean = false): Unit = {
    require(targetRowsPerBucket >= 1, "targetRowsPerBucket must be >= 1")
    val spark = labels.sparkSession
    val st = labels.agg(count(lit(1)), min(col("node")), max(col("node")))
      .head()
    val n = st.getLong(0)
    require(n > 0, "GraphStore.init needs a non-empty labeling")
    val bk =
      if (!quantileBuckets) {
        val span =
          math.max(1.0, st.getLong(2).toDouble - st.getLong(1).toDouble)
        val width = targetRowsPerBucket.toDouble * span / n.toDouble
        Bucketing(math.min(62, math.max(0,
          math.round(math.log(math.max(1.0, width)) / math.log(2.0)).toInt)),
          None)
      } else {
        // equal-count boundaries from the observed distribution: one
        // approx-quantile pass at init, stored in meta — skew-proof
        val nb = math.max(1L, (n + targetRowsPerBucket - 1)
          / targetRowsPerBucket).toInt
        val probs = (1 until nb).map(_.toDouble / nb).toArray
        val bounds =
          if (probs.isEmpty) Array.empty[Long]
          else labels.stat
            .approxQuantile("node", probs, 1e-4)
            .map(_.toLong).distinct.sorted
        Bucketing(0, Some(bounds))
      }
    labels.select(col("node"), col("component"))
      .withColumn("__pt", bk.of(col("node")))
      .repartition(col("__pt"))
      .write.mode("overwrite").partitionBy("__pt").parquet(labelsDir(dir))
    graft.sources.Versioned.publish(
      spark.range(1).select(lit(bk.bits).as("bits"),
        bk.bounds.map(bs => lit(bs)).getOrElse(
          lit(null).cast("array<bigint>")).as("bounds")),
      metaRoot(dir))
    graft.sources.Versioned.publish(emptyRebase(spark), rebaseRoot(dir)): Unit
  }

  private def bucketingOf(spark: SparkSession, dir: String): Bucketing = {
    val r = graft.sources.Versioned.readCurrent(spark, metaRoot(dir)).head()
    val bounds =
      if (r.length < 2 || r.isNullAt(1)) None
      else Some(r.getSeq[Long](1).toArray)
    Bucketing(r.getInt(0), bounds)
  }

  /** Fold one batch of new edges (`a`, `b`) into the store.
    *
    * Per-batch work, every term batch-bounded: one distinct over the
    * batch's endpoints; one bucket-pruned state read joined to those
    * endpoints; the quotient CC on a batch-sized (component,
    * component) graph; one dim-sized rebase republish; one dynamic
    * partition overwrite of ONLY the buckets gaining new nodes. The
    * accumulated state is never scanned or rewritten.
    */
  def applyBatch(spark: SparkSession, dir: String, newEdges: DataFrame,
      maxIters: Int = 30): Applied = {
    val bk = bucketingOf(spark, dir)
    val rebase = graft.sources.Versioned.readCurrent(spark, rebaseRoot(dir))
      .localCheckpoint() // two consumers: endpoint resolve + compose
    val ep = newEdges.select(col("a").as("node"))
      .unionByName(newEdges.select(col("b").as("node")))
      .distinct()
      .localCheckpoint() // consumed by pts collect, lookup, quotient
    val pts = ep.select(bk.of(col("node")).as("__pt"))
      .distinct().collect().map(_.getLong(0)).toSeq
    // a literal IN list prunes partitions driver-side; past ~10k
    // literals the planner cost exceeds what pruning saves, and a
    // batch touching that many buckets is reading a corpus-scale
    // fraction anyway — fall back to the full scan (correctness
    // unchanged; the batch-bounded guarantee is per-bucket cost ×
    // touched buckets, which this batch has already forfeited)
    def bucketPruned(df: DataFrame, ks: Seq[Long]): DataFrame =
      if (ks.size <= PruneLiteralCap) df.filter(col("__pt").isin(ks: _*))
      else df
    val pruned = bucketPruned(spark.read.parquet(labelsDir(dir)), pts)
      .select(col("node"), col("component").as("__raw"))
    // resolved prior label (or own id for unseen endpoints), one hop
    // through the compressed rebase table
    val resolved = ep.join(pruned, Seq("node"), "left")
      .join(broadcast(rebase), col("__raw") === col("__from"), "left")
      .select(col("node"), col("__raw").isNotNull.as("__found"),
        coalesce(col("__to"), col("__raw"), col("node")).as("comp"))
      .localCheckpoint() // consumed by quotient (×2), merges filter, appends
    val quot = newEdges
      .join(resolved.select(col("node").as("a"), col("comp").as("__ca")),
        Seq("a"))
      .join(resolved.select(col("node").as("b"), col("comp").as("__cb")),
        Seq("b"))
      .select(col("__ca").as("a"), col("__cb").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val merges = Graph.connectedComponents(quot, maxIters = maxIters)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("__from"), col("component").as("__to"))
      .localCheckpoint() // consumed by rebase filter + new-node resolve
    // rebase rows only for PRIOR canonical labels: unseen endpoints are
    // stored already-resolved below, so their quotient ids would be
    // dead keys forever — keep the side table bounded by real merges
    val keepMerges = merges.join(
      resolved.filter(col("__found")).select(col("comp").as("__from"))
        .distinct(),
      Seq("__from"), "left_semi")
    val composed = rebase
      .join(keepMerges.select(col("__from").as("__mf"), col("__to").as("__mt")),
        col("__to") === col("__mf"), "left")
      .select(col("__from"), coalesce(col("__mt"), col("__to")).as("__to"))
      .unionByName(keepMerges)
    val nMerges = merges.count()
    graft.sources.Versioned.publish(composed, rebaseRoot(dir), keep = 2)
    val newNodes = resolved.filter(!col("__found"))
      .join(broadcast(merges), col("comp") === col("__from"), "left")
      .select(col("node"),
        coalesce(col("__to"), col("comp")).as("component"))
      .withColumn("__pt", bk.of(col("node")))
      .localCheckpoint() // consumed by pts collect + the overwrite union
    val nNew = newNodes.count()
    if (nNew > 0) {
      val writePts = newNodes.select(col("__pt")).distinct()
        .collect().map(_.getLong(0)).toSeq
      // sever lineage from labelsDir before overwriting it (Spark
      // refuses to overwrite a path the plan also reads); the pinned
      // rows are bucket-pruned, i.e. batch-bounded (past the literal
      // cap the fallback re-reads and rewrites every bucket — correct,
      // at the full-rewrite cost such a corpus-scale batch implies)
      val keep = bucketPruned(spark.read.parquet(labelsDir(dir)), writePts)
        .select(col("node"), col("component"), col("__pt"))
        .unionByName(newNodes)
        .localCheckpoint()
      graft.sources.Sinks.overwritePartitions(
        keep, labelsDir(dir), Seq("__pt"))
    }
    Applied(nMerges, nNew, pts.size)
  }

  /** The full resolved (node, component) labeling — the EXPORT path
    * (one bucket-pruned-free scan + one broadcast join), linear in
    * state by definition of the output; maintenance never calls it. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val rebase = graft.sources.Versioned.readCurrent(spark, rebaseRoot(dir))
    spark.read.parquet(labelsDir(dir))
      .join(broadcast(rebase), col("component") === col("__from"), "left")
      .select(col("node"),
        coalesce(col("__to"), col("component")).as("component"))
  }

  /** Rows in the current rebase side table — the store's compaction
    * pressure gauge (grows with merge EVENTS since the last
    * [[compact]], bounded per batch by the batch's component count). */
  def rebaseSize(spark: SparkSession, dir: String): Long =
    graft.sources.Versioned.readCurrent(spark, rebaseRoot(dir)).count()

  /** The amortization policy in one call: [[compact]] iff the rebase
    * table has outgrown `maxRebaseRows` (default 1M rows ≈ 16 MB —
    * far below any broadcast-join threshold concern, reached only
    * after ~that many component-merge events). Run it after
    * [[applyBatch]] on whatever cadence the pipeline already has; the
    * full-rewrite cost stays amortized across the batches that grew
    * the table. Returns whether a compaction ran. */
  def maybeCompact(spark: SparkSession, dir: String,
      maxRebaseRows: Long = 1000000L): Boolean = {
    val n = rebaseSize(spark, dir)
    if (n > maxRebaseRows) { compact(spark, dir); true } else false
  }

  /** Fold the rebase table back into the stored rows (full rewrite —
    * run amortized, e.g. when |rebase| crosses a threshold), then
    * publish an empty rebase. Equivalent to re-[[init]] from
    * [[read]] with the stored bucket width. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val bk = bucketingOf(spark, dir)
    val resolved = read(spark, dir)
      .withColumn("__pt", bk.of(col("node")))
      .localCheckpoint() // sever lineage from the dir being overwritten
    resolved.repartition(col("__pt"))
      .write.mode("overwrite").partitionBy("__pt").parquet(labelsDir(dir))
    graft.sources.Versioned.publish(emptyRebase(spark), rebaseRoot(dir)): Unit
  }
}
