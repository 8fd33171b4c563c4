package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Structured-Streaming extension (SURVEY.md §2.8 records the reference
  * has none; §7 lists streaming ingest as the natural extension for a
  * continuously-arriving corpus). The transforms are written against
  * plain DataFrames so the SAME code runs in batch (where the DuckDB
  * oracle can check it) and behind `readStream` (where the watermark
  * bounds state).
  *
  * Scale notes: event-time windowed aggregation shuffles on
  * (window, key) with map-side partial aggregation; the watermark caps
  * in-flight state so a 100 TB/day stream holds only
  * watermark-horizon × key-cardinality rows of state per executor.
  * Sessionization keeps one small state object per active user key and
  * times out on event time — no unbounded growth.
  */
object EventStream {

  /** Event-time hourly stats per event type. Batch and streaming share
    * this plan; callers on the streaming side apply
    * `.withWatermark("ts", ...)` first (required for append-mode
    * output, harmless in batch). */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding event-time windows (`length` > `slide`): each event lands
    * in length/slide overlapping windows — `window()` plans ONE
    * generator (the Expand-like window fan-out) + one aggregation, the
    * same single shuffle as the tumbling face; state under a watermark
    * is bounded by (horizon / slide) × key cardinality. Same plan in
    * batch and behind `readStream`. */
  def slidingStats(
      events: DataFrame,
      length: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: keep the first arrival per key, holding
    * per-key state only for the watermark horizon (the streaming face
    * of [[graft.ops.Dedup.dropExact]] — bounded state instead of a
    * global group-by, which is the only dedup a 100 TB/day unbounded
    * stream can afford). Input must carry a watermark. */
  def dedupWithinWatermark(
      events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicatesWithinWatermark(keyCols.head, keyCols.drop(1): _*)

  /** Streaming exact-dedup against a STATIC historical corpus: anti
    * join on the fingerprint — stateless, so the stream holds zero
    * dedup state for the corpus however large it is. The static side's
    * strategy is the planner's choice: dimension-sized fingerprint
    * sets broadcast, a 100 TB corpus's fingerprints shuffle-join per
    * micro-batch (keep them as a compact fingerprint-only parquet).
    * Chain with [[dedupWithinWatermark]] for in-stream duplicates;
    * together they are the streaming face of [[graft.ops.Dedup]]'s
    * incremental ingest. */
  def filterKnown(
      stream: DataFrame, corpusFingerprints: DataFrame,
      fpCol: String): DataFrame =
    stream.join(corpusFingerprints.select(fpCol).distinct(),
      Seq(fpCol), "left_anti")

  /** NEAR-duplicate gate for a stream of 64-bit fingerprints
    * (SimHash / perceptual hash): drop every arriving row whose hash
    * is within `maxHamming` of ANY corpus fingerprint. The exact-match
    * gate ([[filterKnown]]) can't see a re-encoded image or a
    * lightly-edited document; this one can — the streaming face of
    * [[graft.ops.Dedup.hammingNearDups]].
    *
    * Shape: the stream side explodes each hash into `bands` chunk keys
    * map-side; a stream-static equi-join on (band, chunk) against the
    * pre-banded corpus (store it banded: `bands` rows per corpus hash,
    * bucketed by (band, chunk)) surfaces candidates; the exact Hamming
    * filter re-judges them, and a left-anti against the surviving
    * candidate ids keeps only genuinely-novel rows. Pigeonhole
    * complete for `maxHamming < bands` — a qualifying pair MUST share
    * a chunk, so no near-dup slips through. Stateless: per-batch cost
    * is O(batch × bands) join probes, zero stream-held state.
    *
    * In a streaming query, run it INSIDE `foreachBatch` (the
    * micro-batch is a plain batch frame there): the anti-join's right
    * side derives from the batch itself, which Spark's continuous
    * planner rejects (`LeftAnti ... streaming ... on the right`) but
    * the per-batch plan runs unchanged — same pattern as the engine's
    * idempotent sinks. Spec'd both ways.
    */
  def filterNearKnown(
      stream: DataFrame, corpusHashes: DataFrame, hashCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming ($maxHamming) must be < bands ($bands) for the " +
        "pigeonhole banding to guarantee recall; raise bands")
    require(64 % bands == 0, s"bands ($bands) must divide 64")
    val bitsPerBand = 64 / bands
    val mask = (1L << bitsPerBand) - 1
    def banded(df: DataFrame, out: String): DataFrame = df
      .select(col(hashCol).as(out),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col(hashCol), b * bitsPerBand).bitwiseAND(lit(mask))
              .as("chunk"))
        }: _*)).as("bb"))
      .select(col(out), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
    val corpus = banded(corpusHashes, "__corpus_h")
    // candidate hashes in THIS batch that near-match the corpus
    val hit = banded(stream.select(hashCol), "__h")
      .join(corpus, Seq("band", "chunk"))
      .filter(bit_count(col("__h").bitwiseXOR(col("__corpus_h")))
        <= maxHamming)
      .select(col("__h").as(hashCol)).distinct()
    stream.join(hit, Seq(hashCol), "left_anti")
  }

  /** Gap-based sessions via Spark's native `session_window` — the
    * declarative sibling of [[sessionize]] that runs identically in
    * batch (oracle-checkable) and behind readStream (watermark evicts
    * closed sessions). A session extends while each event arrives
    * within `gap` of the last — INCLUSIVE: an event at exactly
    * last + gap still extends (measured; the window end is treated as
    * closed for the merge). `session_end` = last event + gap. Shuffles
    * once on the user key; windows merge inside the aggregation. */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Stream-stream (or batch-batch — same plan) interval join: each
    * left event paired with every right event for the same key whose
    * time falls in [left.ts - lookback, left.ts]. In streaming, both
    * sides carry watermarks and the time-range condition bounds the
    * join state each side must retain — the canonical bounded
    * stream-stream join shape. In batch it plans as one equi-shuffle
    * on the key plus a local range filter (no nested-loop).
    *
    * Column contract: left has (`keyCol`, `timeCol`, ...), right has
    * (`keyCol`, `rightTimeCol`, payload...); right columns are
    * returned alongside the left's.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, rightTimeCol: String,
      lookback: String): DataFrame =
    intervalJoinImpl(left, right, keyCol, timeCol, rightTimeCol,
      lookback, "inner")

  /** LEFT-OUTER [[intervalJoin]]: every left event survives; one with
    * no in-window partner comes back with nulls. In streaming this is
    * the join shape whose null rows emit only once the WATERMARK
    * passes the left event's window (the engine must prove no match
    * can still arrive before it may emit the null) — state stays
    * bounded exactly as in the inner form; spec'd in EventStreamSpec
    * with an unmatched-left + watermark-advance drive. */
  def intervalJoinOuter(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, rightTimeCol: String,
      lookback: String): DataFrame =
    intervalJoinImpl(left, right, keyCol, timeCol, rightTimeCol,
      lookback, "left_outer")

  private def intervalJoinImpl(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, rightTimeCol: String,
      lookback: String, joinType: String): DataFrame = {
    // Explicit side aliases: both sides often derive from the same scan
    // (batch face), where bare df(col) references share expr-ids and the
    // key equality would need Spark's self-join rescue to disambiguate.
    val lookbackExpr = expr(s"INTERVAL $lookback")
    left.alias("gl").join(right.alias("gr"),
      col(s"gl.$keyCol") === col(s"gr.$keyCol") &&
        col(s"gr.$rightTimeCol") >=
          col(s"gl.$timeCol").cast("timestamp") - lookbackExpr &&
        col(s"gr.$rightTimeCol") <= col(s"gl.$timeCol"),
      joinType)
      .drop(col(s"gr.$keyCol"))
  }

  /** Stream-static dimension enrichment: each micro-batch broadcast-
    * joins the static dim — no streaming state at all (the third join
    * shape next to windowed aggs and stream-stream joins). At scale
    * the dim re-broadcasts per batch, so keep it dimension-sized; a
    * 100 TB/day stream enriches map-side with zero shuffle of the
    * stream. Left join: unmatched events pass through with nulls
    * rather than silently dropping. */
  def enrichWithDim(
      events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")
      .drop(dimKey)

  /** Idempotent micro-batch file sink for `foreachBatch`: each batch
    * overwrites its own `batch_id=` partition directory, so a batch
    * re-delivered after a failure replaces itself instead of
    * duplicating — the standard exactly-once recipe for sinks without
    * a transaction log, and the partition column doubles as lineage
    * (which batch produced which rows). Readers see
    * `basePath`-partitioned parquet; compaction can fold old batch
    * dirs without touching the live head. */
  def idempotentParquetSink(outDir: String)(
      batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite")
      .parquet(s"$outDir/batch_id=$batchId")

  /** Streaming SCD1 upsert sink — the streaming face of
    * [[graft.ops.Cdc.scd1Merge]]: maintains a keyed snapshot table
    * under `dir` where each micro-batch's rows replace same-key rows
    * and new keys append (a changelog stream folded into current
    * state).
    *
    * Layout: versioned snapshot dirs `snapshot_v<batchId>` plus a
    * `_current` pointer file committed by temp-write + rename (the
    * [[cmsSink]] recipe). Exactly-once under restart replay: a
    * re-delivered batch (id ≤ committed) is a no-op; a crash BEFORE
    * the pointer commit leaves the old pointer valid and the old
    * snapshot dir intact (it is pruned only after the commit), so the
    * replay rebuilds from exactly the state the failed attempt read. A
    * crash between pointer-delete and rename is healed at the next
    * read (the tmp is the durable copy).
    *
    * Per-batch cost: one anti-join (snapshot × batch) + a full
    * snapshot rewrite — the honest trade-off of a table without a
    * transaction log. At 100 TB partition the snapshot by a key hash
    * and rewrite only the partitions the batch touches
    * ([[graft.ops.Cdc.diffSnapshots]] tells you which), or use a
    * MERGE-capable table format; this sink covers the
    * dimension-to-moderate-fact sizes where a rewrite is one job.
    * The batch must hold at most one row per key (same contract as
    * scd2Merge — fold multi-version batches upstream).
    */
  def upsertSink(dir: String, keys: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = recoverPointer(fs, dir)
    if (committed.exists(_ >= batchId)) return // replayed, already folded
    val merged = committed match {
      case Some(v) =>
        val target = spark.read.parquet(s"$dir/snapshot_v$v")
          .select(batch.columns.map(org.apache.spark.sql.functions.col): _*)
        graft.ops.Cdc.scd1Merge(target, batch, keys)
      case None => batch
    }
    merged.write.mode("overwrite").parquet(s"$dir/snapshot_v$batchId")
    commitSnapshotPointer(fs, dir, batchId)
  }

  /** The snapshot-commit tail shared by the versioned-snapshot sinks
    * ([[upsertSink]], [[chatRenderSink]]): atomic pointer flip via
    * temp-write + rename (healing the reader-promoted-our-tmp race),
    * then prune superseded `snapshot_v*` dirs — only AFTER the
    * commit, so a crash mid-prune just leaves orphans for the next
    * batch's sweep. */
  private def commitSnapshotPointer(
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val pointer = new Path(dir, PointerFileName)
    val tmp = new Path(dir, s"._current_$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(batchId) finally out.close()
    if (fs.exists(pointer) && !fs.delete(pointer, false))
      throw new java.io.IOException(
        s"snapshot commit: failed to clear previous pointer $pointer")
    if (!fs.rename(tmp, pointer)) {
      // a reader's recoverPointer racing inside our delete->rename
      // window may have promoted OUR tmp already — that is the same
      // commit, not a failure. Only throw if the pointer isn't there
      // or names a different batch.
      val healed = fs.exists(pointer) && {
        val in = fs.open(pointer)
        try in.readLong() == batchId finally in.close()
      }
      if (!healed)
        throw new java.io.IOException(
          s"snapshot commit: rename $tmp -> $pointer failed; " +
            "re-deliver the batch")
    }
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter { p =>
        val v = p.getName.stripPrefix("snapshot_v")
        p.getName.startsWith("snapshot_v") &&
          v.nonEmpty && v.forall(_.isDigit) && v.toLong != batchId
      }
      .foreach(p => fs.delete(p, true))
  }

  private val PointerFileName = "_current"

  /** Committed snapshot version, healing an interrupted pointer
    * commit (highest complete `._current_*.tmp` renamed into place)
    * first. A tmp is promotable only if it holds exactly the 8 bytes
    * of its batch-id long — a crash between `fs.create(tmp)` and a
    * durable `writeLong` leaves a shorter file, and promoting that
    * would poison every subsequent read with EOFException. Truncated
    * tmps are deleted, not promoted (their batch never committed its
    * pointer, so the source will re-deliver it). */
  private def recoverPointer(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val pointer = new Path(dir, PointerFileName)
    def readPtr(): Option[Long] = {
      val in = fs.open(pointer)
      try Some(in.readLong()) finally in.close()
    }
    if (fs.exists(pointer)) readPtr()
    else if (!fs.exists(new Path(dir))) None
    else {
      val (tmps, truncated) = fs.listStatus(new Path(dir)).toSeq
        .filter { st =>
          val n = st.getPath.getName
          val v = n.stripPrefix("._current_").stripSuffix(".tmp")
          n.startsWith("._current_") && n.endsWith(".tmp") &&
            v.nonEmpty && v.forall(_.isDigit)
        }
        .partition(_.getLen == java.lang.Long.BYTES)
      truncated.foreach(st => fs.delete(st.getPath, false))
      if (tmps.isEmpty) None
      else {
        val newest = tmps.map(_.getPath).maxBy(
          _.getName.stripPrefix("._current_").stripSuffix(".tmp").toLong)
        if (!fs.rename(newest, pointer) && !fs.exists(pointer))
          throw new java.io.IOException(
            s"upsertSink recovery: rename $newest -> $pointer failed")
        tmps.map(_.getPath).filterNot(_ == newest)
          .foreach(p => fs.delete(p, false))
        readPtr()
      }
    }
  }

  /** Streaming conversation-render maintenance — the post-training
    * ingest shape: TURNS trickle in (a conversation's messages may
    * span many micro-batches, arrive out of order across batches) and
    * the sink maintains the [[graft.ops.Chat.renderChat]] snapshot of
    * every conversation seen so far, incrementally.
    *
    * Layout: raw turns accumulate under `turns/batch_<id>/bucket=<b>`
    * (bucket = conv_id mod `nBuckets`, a PARTITION dir — so per batch
    * only the touched buckets' history is re-read, partition-pruned,
    * and only their conversations re-rendered; untouched buckets'
    * rendered rows carry forward from the prior snapshot by a bucket
    * filter, never re-deriving them). Batch turn dirs are overwritten
    * per batch id (re-delivery replaces itself) and the snapshot
    * commits through the [[upsertSink]] discipline (versioned dir →
    * atomic pointer flip → post-commit prune), so a crash anywhere
    * re-folds the batch against exactly the state the failed attempt
    * saw. An EMPTY batch flows through the same path: no touched
    * buckets, prior snapshot carried forward whole, pointer still
    * advances (the round-15 empty-batch wedge lesson).
    *
    * Per-batch cost: the touched buckets' turn history + one snapshot
    * rewrite (the honest no-transaction-log trade-off, as
    * [[upsertSink]]). The turn-dir count is BOUNDED by
    * `maxTurnDirs`: crossing it folds the whole history into one
    * bucket-partitioned dir — a full-history fold every
    * ~maxTurnDirs batches is amortized O(history/maxTurnDirs) per
    * batch, strictly dominated by the per-batch snapshot rewrite the
    * sink already pays, so (unlike the export sink) single-level
    * folding needs no tiers here. The LIVE dir set is tracked in a
    * `turn_dirs_v<id>` sidecar committed under the same pointer as
    * the snapshot (history reads NEVER trust a raw listing, so a
    * crash mid-prune leaves only unreferenced orphans); a store
    * written before the sidecar existed falls back to listing
    * `batch_*` dirs once and self-upgrades at its next batch.
    * Delivery contract: each turn is assigned to exactly ONE batch id
    * by the source (standard append-only stream); the sink makes
    * re-delivery of a batch idempotent but does not dedup a turn the
    * source emits under two different batch ids.
    */
  def chatRenderSink(dir: String, nBuckets: Int = 16,
      maxTurnDirs: Int = 64)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    require(nBuckets > 0, "nBuckets must be positive")
    require(maxTurnDirs >= 2, "maxTurnDirs must be >= 2")
    val spark = batch.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = recoverPointer(fs, dir)
    if (committed.exists(_ >= batchId)) return // replayed, already folded
    val b = batch
      .select(col("conv_id"), col("turn_idx"), col("role"), col("content"))
      .withColumn("bucket",
        pmod(col("conv_id"), lit(nBuckets)).cast("int"))
      .localCheckpoint()
    val touched = b.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ nBuckets driver rows
    // an empty batch writes NO turn dir (a zero-file dir would break
    // schema inference for every later batch's history read)
    if (touched.nonEmpty)
      b.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$dir/turns/batch_$batchId")
    // the current batch's dir never counts as PRIOR state: the legacy
    // raw-listing fallback (and a crashed earlier attempt of this very
    // batch) would otherwise hand it back and double the batch's turns
    val priorDirs = (committed match {
      case Some(v) => readTurnDirs(fs, dir, v)
      case None => Seq.empty[String]
    }).filterNot(p =>
      new org.apache.hadoop.fs.Path(p).getName == s"batch_$batchId")
    val withBatch =
      if (touched.isEmpty) priorDirs
      else priorDirs :+ s"$dir/turns/batch_$batchId"
    def readDirs(dirs: Seq[String]): DataFrame =
      // allowMissingColumns: a store whose later batches carry an
      // extra column (schema evolution) must still read its older
      // dirs — the round-15 retractShards lesson; renderChat touches
      // only the four turn columns, present in every generation
      dirs.map(p => spark.read.option("basePath", p).parquet(p))
        .reduce(_.unionByName(_, allowMissingColumns = true))
    // fold when the live set outgrows the bound: ONE dir holds the
    // whole history afterwards; deterministic on replay (the fold is
    // a pure function of the committed dir list + the overwritten
    // batch dir, and lands at a batch-id-derived name)
    val liveDirs =
      if (withBatch.size <= maxTurnDirs) withBatch
      else {
        val fold = s"$dir/turns/fold_$batchId"
        readDirs(withBatch).write.mode("overwrite")
          .partitionBy("bucket").parquet(fold)
        Seq(fold)
      }
    val rendered =
      if (touched.isEmpty)
        spark.emptyDataFrame
          .select(lit(0L).as("conv_id"), lit("").as("rendered"),
            lit(0L).as("n_chars"), lit(0).as("bucket"))
          .limit(0)
      else {
        val hist = readDirs(liveDirs)
          .filter(col("bucket").isin(touched: _*))
        graft.ops.Chat.renderChat(hist.drop("bucket"))
          .withColumn("bucket",
            pmod(col("conv_id"), lit(nBuckets)).cast("int"))
      }
    val merged = committed match {
      case Some(v) =>
        spark.read.parquet(s"$dir/snapshot_v$v")
          .filter(if (touched.isEmpty) lit(true)
            else !col("bucket").isin(touched: _*))
          .unionByName(rendered)
      case None => rendered
    }
    merged.write.mode("overwrite").parquet(s"$dir/snapshot_v$batchId")
    writeTurnDirs(fs, dir, batchId, liveDirs)
    commitSnapshotPointer(fs, dir, batchId)
    pruneTurnState(fs, dir, batchId, liveDirs)
  }

  /** Live turn-dir list of snapshot version `v`. Falls back to a raw
    * `batch_*` listing for stores written before the sidecar existed
    * (they self-upgrade at their next batch). */
  private def readTurnDirs(
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      v: Long): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val sidecar = new Path(dir, s"turn_dirs_v$v")
    if (fs.exists(sidecar)) {
      val in = fs.open(sidecar)
      val raw =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      raw.split('\n').toSeq.filter(_.nonEmpty)
    } else {
      val turnsRoot = new Path(s"$dir/turns")
      if (!fs.exists(turnsRoot)) Seq.empty
      else fs.listStatus(turnsRoot).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("batch_")).map(_.toString).sorted
    }
  }

  private def writeTurnDirs(
      fs: org.apache.hadoop.fs.FileSystem, dir: String, batchId: Long,
      dirs: Seq[String]): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, s"turn_dirs_v$batchId"), true)
    try out.write(dirs.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Post-commit sweep: superseded sidecars and any turn dir the
    * committed list no longer references (folded-away batch dirs,
    * crash orphans). Reads never trust a listing, so a crash here
    * only leaves unreferenced garbage for the next batch's sweep. */
  private def pruneTurnState(
      fs: org.apache.hadoop.fs.FileSystem, dir: String, batchId: Long,
      live: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter { p =>
        val v = p.getName.stripPrefix("turn_dirs_v")
        p.getName.startsWith("turn_dirs_v") &&
          v.nonEmpty && v.forall(_.isDigit) && v.toLong != batchId
      }
      .foreach(p => fs.delete(p, false))
    val turnsRoot = new Path(s"$dir/turns")
    if (fs.exists(turnsRoot)) {
      val liveNames = live.map(p => new Path(p).getName).toSet
      fs.listStatus(turnsRoot).toSeq.map(_.getPath)
        .filterNot(p => liveNames.contains(p.getName))
        .foreach(p => fs.delete(p, true))
    }
  }

  /** Current rendered-conversation snapshot of a [[chatRenderSink]]
    * store: (conv_id, rendered, n_chars). */
  def readChatRendered(
      spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = recoverPointer(fs, dir).getOrElse(
      sys.error(s"chatRenderSink store at $dir has no committed snapshot"))
    spark.read.parquet(s"$dir/snapshot_v$v")
      .select("conv_id", "rendered", "n_chars")
  }

  /** Streaming CONNECTED-COMPONENTS maintenance — a continuously-
    * ingesting edge stream (near-dup pairs, citation links, entity
    * co-references) folded into a persisted (node, component)
    * clustering, one micro-batch at a time, through
    * [[graft.ops.Graph.incrementalComponents]]: per batch the work is
    * the batch-bounded quotient CC plus one map-side relabel — the
    * accumulated 100 TB edge history is NEVER re-clustered.
    *
    * Same exactly-once discipline as [[upsertSink]] (snapshot write →
    * atomic pointer flip → prune): a re-delivered batch sees the
    * pointer at-or-past its id and no-ops; a crash between snapshot
    * and pointer leaves the old clustering current and the replay
    * redoes the batch against exactly the state the failed attempt
    * saw. Labels are canonical min-ids, so the folded state after N
    * batches is IDENTICAL to one full CC over the union (the
    * q_stream_components face's oracle recomputes exactly that).
    */
  def componentSink(dir: String, maxIters: Int = 30)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = recoverPointer(fs, dir)
    if (committed.exists(_ >= batchId)) return // replayed, already folded
    val merged = committed match {
      case Some(v) =>
        graft.ops.Graph.incrementalComponents(
          spark.read.parquet(s"$dir/snapshot_v$v"), batch, maxIters)
      case None =>
        graft.ops.Graph.connectedComponents(batch, maxIters = maxIters)
    }
    merged.write.mode("overwrite").parquet(s"$dir/snapshot_v$batchId")
    val pointer = new Path(dir, PointerFileName)
    val tmp = new Path(dir, s"._current_$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(batchId) finally out.close()
    if (fs.exists(pointer) && !fs.delete(pointer, false))
      throw new java.io.IOException(
        s"componentSink: failed to clear previous pointer $pointer")
    if (!fs.rename(tmp, pointer)) {
      val healed = fs.exists(pointer) && {
        val in = fs.open(pointer)
        try in.readLong() == batchId finally in.close()
      }
      if (!healed)
        throw new java.io.IOException(
          s"componentSink: rename $tmp -> $pointer failed; re-deliver")
    }
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter { p =>
        val v = p.getName.stripPrefix("snapshot_v")
        p.getName.startsWith("snapshot_v") &&
          v.nonEmpty && v.forall(_.isDigit) && v.toLong != batchId
      }
      .foreach(p => fs.delete(p, true))
  }

  /** [[componentSink]]'s BATCH-BOUNDED successor: folds each edge
    * micro-batch into a persisted [[graft.ops.GraphStore]] instead of
    * rewriting a full (node, component) snapshot per batch.
    * [[componentSink]]'s per-batch WORK is batch-bounded (the quotient
    * CC), but its per-batch WRITE is the whole state — at 100 TB of
    * accumulated nodes that is a full-corpus rewrite per micro-batch.
    * Here the per-batch write is the rebase side table (dim-sized) +
    * only the buckets gaining new nodes; the accumulated labeling is
    * never scanned or rewritten (the round-13 inc100_cc rehearsal row:
    * 1.01× at state ×10→×100).
    *
    * Exactly-once: the same atomic batch-id pointer as the other
    * sinks, but the STATE commit is the store's own discipline —
    * rebase publish before append, both idempotent under replay
    * (GraphStoreSpec) — so a crash ANYWHERE between state mutation and
    * pointer commit is healed by re-delivering the batch: already-
    * applied merges resolve to identity quotient edges and
    * already-appended nodes are found, not duplicated. Read the folded
    * labeling with [[graft.ops.GraphStore.read]]`(spark, s"$$dir/store")`.
    *
    * Compaction rides the sink: after each pointer commit the sink
    * calls [[graft.ops.GraphStore.maybeCompact]] with
    * `compactAtRebaseRows` — a long-lived stream is precisely the
    * caller with no natural manual hook, and without it the rebase
    * side table grows with accumulated merges forever (every batch
    * re-reads and re-broadcasts it). Running AFTER the commit keeps
    * the crash story unchanged: compaction is idempotent and
    * read-view-invariant, so a crash mid-compact replays the batch as
    * a no-op fold and simply re-attempts the compact.
    */
  def componentStoreSink(dir: String, maxIters: Int = 30,
      compactAtRebaseRows: Long = 1000000L)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = recoverPointer(fs, dir)
    if (committed.exists(_ >= batchId)) return // replayed, already folded
    committed match {
      case Some(_) =>
        graft.ops.GraphStore.applyBatch(
          spark, s"$dir/store", batch, maxIters): Unit
      case None =>
        graft.ops.GraphStore.init(
          graft.ops.Graph.connectedComponents(batch, maxIters = maxIters),
          s"$dir/store")
    }
    val pointer = new Path(dir, PointerFileName)
    val tmp = new Path(dir, s"._current_$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(batchId) finally out.close()
    if (fs.exists(pointer) && !fs.delete(pointer, false))
      throw new java.io.IOException(
        s"componentStoreSink: failed to clear previous pointer $pointer")
    if (!fs.rename(tmp, pointer)) {
      val healed = fs.exists(pointer) && {
        val in = fs.open(pointer)
        try in.readLong() == batchId finally in.close()
      }
      if (!healed)
        throw new java.io.IOException(
          s"componentStoreSink: rename $tmp -> $pointer failed; re-deliver")
    }
    graft.ops.GraphStore.maybeCompact(
      spark, s"$dir/store", compactAtRebaseRows): Unit
  }

  /** STREAMING sharded training-data export — the micro-batch
    * complement of [[graft.sources.Export.exportShards]] for a corpus
    * that arrives continuously. A batch sink cannot size shards from a
    * total it will never see, so the shard count is FIXED at sink
    * creation and each batch folds in:
    *
    *  - rows route to shards by the same portable md5 draw
    *    ([[graft.sources.Export.shardOf]]) — a row's shard never
    *    depends on when it arrived;
    *  - the batch's rows land in a BATCH-SCOPED dir
    *    (`data/batch_<id>/shard=k/`, one file per shard per batch,
    *    overwrite = idempotent under replay); readers see a batch only
    *    once the manifest lists it, so a crash after the data write
    *    leaves an invisible orphan that the replay overwrites;
    *  - the cumulative per-shard manifest (n_rows, bytes, checksum —
    *    all sums, so batch aggregates FOLD into the prior manifest
    *    without rereading data) republishes through
    *    [[graft.sources.Versioned]] with the committed batch-id list
    *    on board.
    *
    * Exactly-once: pointer-gated replays no-op; a crash between the
    * manifest publish and the pointer commit re-delivers the batch,
    * which sees its id already in the manifest's batch list, rewrites
    * only the (idempotent) data dir, and re-commits the pointer — the
    * manifest is never double-folded. `format` picks the shard file
    * layout — parquet (default) or loader-consumable gzip JSON-lines
    * (`"json"`), the streaming complement of
    * [[graft.sources.Export.exportJsonlShards]]; the manifest records
    * it and every read/compact path dispatches on the record, so a
    * store can never silently mix layouts (continuing a store under a
    * different format fails loudly). Compaction of many small
    * per-batch files into per-shard files rides the sink itself
    * ([[maybeCompactStreamShards]], after each pointer commit): once
    * the manifest lists more than `compactAtDirs` dirs they fold into
    * ONE compacted dir, so files-per-shard — and with it the read
    * path's listing cost — stays bounded for the life of the stream.
    */
  def exportShardsSink(dir: String, nShards: Int,
      id: org.apache.spark.sql.Column, sizeOf: org.apache.spark.sql.Column,
      checksumCols: Seq[String], compactAtDirs: Int = 64,
      format: String = "parquet")(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.sources.{Export, Versioned}
    require(format == "parquet" || format == "json",
      s"exportShardsSink format must be parquet or json: $format")
    val spark = batch.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = recoverPointer(fs, dir)
    if (committed.exists(_ >= batchId)) return // replayed, already folded
    val staged = batch.withColumn("shard", Export.shardOf(id, nShards))
    val writer = staged.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard")
    format match {
      case "json" => writer.option("compression", "gzip")
        .json(s"$dir/data/batch_$batchId")
      case _ => writer.parquet(s"$dir/data/batch_$batchId")
    }
    // gate the prior manifest on the MANIFEST's own pointer, not the
    // sink's batch pointer: an all-empty-batches prefix advances the
    // batch pointer without ever publishing a manifest, and reading
    // through the batch pointer would throw FileNotFoundException on
    // the first non-empty batch — and on every re-delivery after it,
    // wedging the stream permanently (round-14 advice)
    val prior = Versioned.currentVersion(spark, s"$dir/manifest")
      .map(_ => Versioned.readCurrent(spark, s"$dir/manifest"))
    val alreadyFolded = prior.exists(_
      .select(array_contains(col("batch_ids"), batchId)).head().getBoolean(0))
    // an EMPTY batch folds nothing and is not listed (readers read
    // only listed dirs; the pointer still advances so replays no-op)
    if (!alreadyFolded && !batch.isEmpty) {
      // a store never switches formats mid-stream: the dir list mixes
      // layouts and every read path would have to re-dispatch per dir
      prior.map(storedFormat).foreach(f => require(f == format,
        s"exportShardsSink: store at $dir was written as $f; " +
          s"cannot continue it as $format"))
      val agg = Export.shardAggregates(staged, sizeOf, checksumCols)
      val folded = prior.map(withDirs) match {
        case None =>
          agg.withColumn("batch_ids", array(lit(batchId)))
            .withColumn("dirs", array(lit(s"batch_$batchId")))
            .withColumn("format", lit(format))
        case Some(m) =>
          m.select(col("shard"), col("n_rows"), col("bytes"),
              col("checksum"))
            .unionByName(agg)
            .groupBy(col("shard"))
            .agg(sum(col("n_rows")).as("n_rows"),
              sum(col("bytes")).as("bytes"),
              sum(col("checksum")).as("checksum"))
            .crossJoin(broadcast(
              m.select(col("batch_ids"), col("dirs")).limit(1)))
            .withColumn("batch_ids",
              array_sort(array_union(col("batch_ids"),
                array(lit(batchId)))))
            .withColumn("dirs",
              array_sort(array_union(col("dirs"),
                array(lit(s"batch_$batchId")))))
            .withColumn("format", lit(format))
      }
      Versioned.publish(folded, s"$dir/manifest", keep = 2): Unit
    }
    val pointer = new Path(dir, PointerFileName)
    val tmp = new Path(dir, s"._current_$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(batchId) finally out.close()
    if (fs.exists(pointer) && !fs.delete(pointer, false))
      throw new java.io.IOException(
        s"exportShardsSink: failed to clear previous pointer $pointer")
    if (!fs.rename(tmp, pointer)) {
      val healed = fs.exists(pointer) && {
        val in = fs.open(pointer)
        try in.readLong() == batchId finally in.close()
      }
      if (!healed)
        throw new java.io.IOException(
          s"exportShardsSink: rename $tmp -> $pointer failed; re-deliver")
    }
    // compaction rides the sink AFTER the commit, same recipe as
    // componentStoreSink: idempotent and read-view-invariant, so a
    // crash mid-compact replays the batch as a pointer no-op and
    // simply re-attempts the compact
    maybeCompactStreamShards(spark, dir, nShards, compactAtDirs): Unit
  }

  /** Upgrade an older manifest (pre-dirs, batch_ids only) in place:
    * the dir list was then exactly `batch_<id>` per committed id. A
    * store written before the dirs column existed must keep folding
    * and reading after the upgrade — otherwise the first post-upgrade
    * batch wedges the stream on an unresolved column. */
  private def withDirs(m: DataFrame): DataFrame =
    if (m.columns.contains("dirs")) m
    else m.withColumn("dirs",
      transform(col("batch_ids"),
        b => concat(lit("batch_"), b.cast("string"))))

  /** The store's data format; manifests that predate the column were
    * all parquet. */
  private def storedFormat(m: DataFrame): String =
    if (m.columns.contains("format"))
      m.select(col("format")).head().getString(0)
    else "parquet"

  private def readDataDir(
      spark: SparkSession, path: String, format: String): DataFrame =
    format match {
      case "json" => spark.read.json(path)
      case _      => spark.read.parquet(path)
    }

  /** The compaction tier a data dir belongs to: per-batch dirs are
    * tier 0, `compact_b<id>` (the round-15 single-tier name, kept for
    * tier 1 so legacy stores fold seamlessly) is tier 1,
    * `compact_t<k>_b<id>` is tier k. */
  private def tierOf(name: String): Int =
    if (name.startsWith("batch_")) 0
    else "compact_t(\\d+)_b".r.findFirstMatchIn(name)
      .map(_.group(1).toInt).getOrElse(1)

  private def tierName(tier: Int, maxBatch: Long): String =
    if (tier == 1) s"compact_b$maxBatch" else s"compact_t${tier}_b$maxBatch"

  /** TIERED fold of the streamed export's shard dirs once the
    * manifest lists more than `maxDirs` — without compaction every
    * shard accretes one file per micro-batch forever and the read
    * path degrades on LISTING, the super-linear trap the clinical
    * catalog and componentStoreSink already fixed (round-14 verdict
    * item 2). Round 16 made the fold LSM-style: tier-0 (batch) dirs
    * fold into ONE tier-1 dir, and when a tier itself accumulates
    * more than `maxDirs` dirs it folds into one dir of the next tier
    * — earlier compacted dirs are NOT rewritten by later batch folds.
    * The round-15 single-tier fold rewrote the WHOLE store at every
    * compaction point, so a stream's total compaction writes grew
    * quadratically with its lifetime (O(n²/maxDirs) rows); tiered,
    * each row is rewritten once per tier ≈ log_maxDirs(n) times, and
    * the listing stays bounded by ~maxDirs·tiers. Each fold is one
    * hash shuffle on the shard id (one file per shard, writers
    * parallel); the manifest republishes with IDENTICAL aggregates
    * and batch-id list (the replay guard is unmoved) and `dirs`
    * updated per fold. Fold targets are named by tier + the max
    * committed batch id, so a crash-retry overwrites the same dirs
    * (idempotent) while later fold points get fresh names; superseded
    * dirs stay on disk until no surviving manifest version references
    * them (sweep) — a reader pinned to the previous version never
    * loses files mid-read. Returns true iff a compaction ran. */
  def maybeCompactStreamShards(spark: SparkSession, dir: String,
      nShards: Int, maxDirs: Int): Boolean = {
    import graft.sources.Versioned
    val mroot = s"$dir/manifest"
    if (Versioned.currentVersion(spark, mroot).isEmpty) return false
    val m = withDirs(Versioned.readCurrent(spark, mroot))
    val head = m.select(col("dirs"), col("batch_ids")).head()
    val dirs0 = head.getSeq[String](0)
    if (dirs0.size <= maxDirs) return false
    val format = storedFormat(m)
    val maxBatch = head.getSeq[Long](1).max
    def fold(names: Seq[String], target: String): Unit = {
      val writer = names
        .map(n => readDataDir(spark, s"$dir/data/$n", format))
        .reduce(_.unionByName(_))
        .repartition(nShards, col("shard"))
        .write.mode("overwrite").partitionBy("shard")
      format match {
        case "json" => writer.option("compression", "gzip")
          .json(s"$dir/data/$target")
        case _ => writer.parquet(s"$dir/data/$target")
      }
    }
    // cascade: fold the batch tier into one tier-1 dir, then any tier
    // that exceeds maxDirs into the next. All folds land before ONE
    // publish, so a crash anywhere replays the whole cascade onto the
    // same deterministic names (freshName is a pure function of the
    // pre-cascade dir list, which a retry re-reads unchanged).
    var dirs = dirs0
    // a fold target must never overwrite a dir the CURRENT manifest
    // references (a pinned reader would tear mid-overwrite): if the
    // deterministic name is taken — possible only under driver-issued
    // re-compaction at an unmoved max batch id — roll a suffix
    def freshName(tier: Int): String = {
      val base = tierName(tier, maxBatch)
      (Iterator(base) ++ Iterator.from(1).map(i => s"${base}r$i"))
        .find(n => !dirs.contains(n)).get
    }
    val batch = dirs.filter(tierOf(_) == 0)
    if (batch.nonEmpty) {
      val target = freshName(1)
      fold(batch, target)
      dirs = dirs.filterNot(batch.contains) :+ target
    }
    var tier = 1
    while (dirs.count(tierOf(_) == tier) > maxDirs) {
      val folding = dirs.filter(tierOf(_) == tier)
      val target = freshName(tier + 1)
      fold(folding, target)
      dirs = dirs.filterNot(folding.contains) :+ target
      tier += 1
    }
    if (dirs.toSet == dirs0.toSet) return false // all-compact store,
      // no tier over threshold: publishing would mint a no-op version
    Versioned.publish(
      m.withColumn("dirs",
        array(dirs.sorted.map(lit): _*)), mroot, keep = 2): Unit
    sweepStreamDirs(spark, dir)
    true
  }

  /** Reference-counting sweep of `data/` subdirs no surviving
    * manifest version references (superseded batch dirs after a
    * compaction, orphans recreated by post-compaction re-deliveries).
    * O(dirs) driver metadata; runs after a successful compaction
    * publish, so the current read view is never touched. */
  private def sweepStreamDirs(spark: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataRoot = new Path(s"$dir/data")
    if (!fs.exists(dataRoot)) return
    val mroot = new Path(s"$dir/manifest")
    val referenced = fs.listStatus(mroot).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v_"))
      .flatMap { p =>
        // upgrade PER VERSION: a surviving pre-dirs manifest (batch_ids
        // only — the case withDirs exists for) must sweep-resolve too,
        // or the first post-upgrade compaction throws on the missing
        // column and wedges the sink (round-15 advice)
        withDirs(spark.read.parquet(p.toString))
          .select(explode(col("dirs")).as("d")).distinct()
          .collect().map(_.getString(0))
      }.toSet
    fs.listStatus(dataRoot).toSeq.map(_.getPath)
      .filter(p => !referenced.contains(p.getName))
      .foreach(p => fs.delete(p, true))
  }

  /** The streamed export's committed rows (`shard` column included):
    * exactly the batch dirs the current manifest lists — an orphan
    * dir from a crashed batch is invisible. */
  def readStreamShards(spark: SparkSession, dir: String): DataFrame = {
    val m = withDirs(graft.sources.Versioned
      .readCurrent(spark, s"$dir/manifest"))
    val dirs = m.select(col("dirs")).head().getSeq[String](0)
    val format = storedFormat(m)
    // one read per listed dir (each discovers its own shard partition
    // column) — dir count is bounded by the sink's compaction
    // threshold, so the listing stays metadata-sized for the life of
    // the stream
    dirs.map(n => readDataDir(spark, s"$dir/data/$n", format))
      .reduce(_.unionByName(_))
  }

  /** The streamed export's cumulative per-shard manifest. */
  def readStreamShardManifest(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Versioned.readCurrent(spark, s"$dir/manifest")

  /** Streaming CUSUM ([[graft.ops.TimeSeries.cusum]] folded across
    * micro-batches): the per-key Page statistic carries ONE long of
    * state (S at the key's last seen row), and each batch resumes the
    * recursion exactly via the carried-initial closed form
    *
    *   S_t = max(S₀ + cs_t, cs_t − min_{1≤j≤t} cs_j)
    *
    * (j = 0 is the carried S₀ branch; any later restart-to-zero is a
    * j ≥ 1 term; all-negative runs hit the j = t floor of 0) — so the
    * stream's alarms are IDENTICAL to one batch CUSUM over the
    * concatenated history (spec'd), provided batches arrive in key
    * order time (append-only event streams do).
    *
    * Layout & exactly-once: scored rows land in `out/batch_id=N`
    * (per-batch overwrite), the state snapshot commits through the
    * same atomic-pointer discipline as [[upsertSink]]; a re-delivered
    * batch no-ops, a crash between snapshot and pointer replays
    * against exactly the state the failed attempt saw.
    *
    * Per-batch cost: one shuffle on the key, two ordered windows, a
    * broadcast-or-shuffle join against the |keys|-sized state.
    *
    * The state join is broadcast ONLY when the snapshot is small: the
    * sink is generic over `key`, and while a metric-keyed stream's
    * state is dim-sized, a per-user or per-document key makes the
    * state corpus-keyed — an unconditional `broadcast(state)` there
    * is a driver/executor OOM at scale. Same stats-gated-with-
    * override contract as [[graft.ops.TemporalJoins]]'s binned range
    * join: `broadcastState = Some(true)` forces the hint,
    * `Some(false)` forces the shuffle join, `None` (default)
    * broadcasts only when the snapshot's on-disk bytes × a 4×
    * parquet-decode inflation allowance fit
    * `spark.sql.autoBroadcastJoinThreshold`.
    */
  def cusumSink(
      dir: String, key: String, order: Seq[String],
      value: org.apache.spark.sql.Column, drift: Long, threshold: Long,
      broadcastState: Option[Boolean] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = recoverPointer(fs, dir)
    if (committed.exists(_ >= batchId)) return // replayed, already folded
    // on-disk snapshot bytes — exact, and already at hand via the fs;
    // 0 for the fresh-state (no snapshot yet) branch
    val stateBytes = committed.map { v =>
      fs.getContentSummary(new Path(s"$dir/snapshot_v$v")).getLength
    }.getOrElse(0L)
    val state = committed match {
      case Some(v) => spark.read.parquet(s"$dir/snapshot_v$v")
      case None => spark.emptyDataFrame
        .withColumn(key, lit(null).cast(batch.schema(key).dataType))
        .withColumn("s0", lit(0L))
    }
    val stateSel = state.select(col(key), col("s0"))
    val stateCarrier = broadcastState match {
      case Some(true) => broadcast(stateSel)
      case Some(false) => stateSel.hint("merge")
      case None =>
        val raw = spark.conf
          .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        val bcThreshold =
          if (raw.trim.startsWith("-")) -1L
          else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        // ×4: parquet (key, s0) pairs are dictionary/RLE-compressed;
        // decoded UnsafeRows run a few× larger. Conservative so a
        // corpus-keyed state never sneaks under the bar.
        if (bcThreshold > 0 && stateBytes * 4 <= bcThreshold)
          broadcast(stateSel)
        // declining the hint is not enough — force the shuffle join so
        // the planner cannot auto-broadcast off its own (row-count-
        // blind) snapshot estimate
        else stateSel.hint("merge")
    }
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = batch
      .join(stateCarrier, Seq(key), "left")
      .withColumn("__s0", coalesce(col("s0"), lit(0L))).drop("s0")
      .withColumn("__cs", sum(value.cast("long") - lit(drift)).over(w))
      .withColumn("s_u",
        greatest(col("__s0") + col("__cs"),
          col("__cs") - min(col("__cs")).over(w)))
      .withColumn("alarm", col("s_u") > lit(threshold))
      .drop("__cs", "__s0")
      .localCheckpoint() // consumed by the output write AND the state fold
    scored.write.mode("overwrite").parquet(s"$dir/out/batch_id=$batchId")
    // new state: each key's S at its LAST row this batch, carried keys
    // that were silent this batch survive unchanged
    val lastS = scored
      .groupBy(col(key))
      .agg(max(struct((order.map(col) :+ col("s_u")): _*)).as("__m"))
      .select(col(key), col("__m").getField("s_u").as("s0"))
    val newState = state.select(col(key), col("s0"))
      .join(lastS.select(col(key).as("__k")), col(key) === col("__k"),
        "left_anti")
      .unionByName(lastS)
    newState.write.mode("overwrite").parquet(s"$dir/snapshot_v$batchId")
    val pointer = new Path(dir, PointerFileName)
    val tmp = new Path(dir, s"._current_$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(batchId) finally out.close()
    if (fs.exists(pointer) && !fs.delete(pointer, false))
      throw new java.io.IOException(
        s"cusumSink: failed to clear previous pointer $pointer")
    if (!fs.rename(tmp, pointer)) {
      val healed = fs.exists(pointer) && {
        val in = fs.open(pointer)
        try in.readLong() == batchId finally in.close()
      }
      if (!healed)
        throw new java.io.IOException(
          s"cusumSink: rename $tmp -> $pointer failed; re-deliver")
    }
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter { p =>
        val v = p.getName.stripPrefix("snapshot_v")
        p.getName.startsWith("snapshot_v") &&
          v.nonEmpty && v.forall(_.isDigit) && v.toLong != batchId
      }
      .foreach(p => fs.delete(p, true))
  }

  /** All rows scored by [[cusumSink]] so far. */
  def readCusumScored(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", s"$dir/out").parquet(s"$dir/out")

  /** Read the current upsert snapshot maintained by [[upsertSink]],
    * completing an interrupted pointer commit if one is pending. */
  def readSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = recoverPointer(fs, dir).getOrElse(
      throw new java.io.FileNotFoundException(s"no upsert snapshot in $dir"))
    spark.read.parquet(s"$dir/snapshot_v$v")
  }

  /** Streaming frequency state — the streaming face of
    * [[graft.ops.Profile]]'s count-min sketches: each micro-batch
    * aggregates once into a KB-sized sketch, which folds into a
    * persisted running sketch. Downstream heavy-hitter gates
    * ([[graft.ops.Profile.estimateHot]]) read the state file; the
    * stream itself is never re-scanned.
    *
    * Exactly-once under restart replay: the state file carries the
    * last folded batch id, and a re-delivered batch (id ≤ last) is
    * skipped — folding it twice would double-count, the failure mode
    * the parquet sink's overwrite-by-batch-dir avoids structurally.
    * The fold commits by temp-write + rename with loud failure on a
    * false FileSystem return, never an in-place update.
    */
  def cmsSink(
      stateDir: String, key: String,
      eps: Double = 1e-4, confidence: Double = 0.99, seed: Int = 42)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stateDir)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val prev = recoverState(fs, stateDir)
    if (!prev.exists(_._1 >= batchId)) {
      val batchSketch =
        graft.ops.Profile.cmsOf(batch, key, eps, confidence, seed)
      val merged = prev match {
        case Some((_, bytes)) => graft.ops.Profile.cmsMerge(bytes, batchSketch)
        case None => batchSketch
      }
      fs.mkdirs(new Path(stateDir))
      val stateFile = new Path(stateDir, StateFileName)
      val tmp = new Path(stateDir, s".cms_state_$batchId.tmp")
      val out = fs.create(tmp, true)
      try { out.writeLong(batchId); out.write(merged) } finally out.close()
      // Commit = delete old + rename tmp into place. A crash between
      // the delete and the rename leaves NO state file but a fully-
      // written tmp — recoverState completes that rename on the next
      // read, so the accumulated sketch is never lost (the tmp is the
      // durable copy from the moment it is closed).
      if (fs.exists(stateFile) && !fs.delete(stateFile, false))
        throw new java.io.IOException(
          s"cmsSink: failed to clear previous state $stateFile")
      if (!fs.rename(tmp, stateFile))
        throw new java.io.IOException(
          s"cmsSink: rename $tmp -> $stateFile failed; state is in the " +
            "temp file — re-deliver the batch to retry")
    }
  }

  /** Streaming KMV fold — a running distinct-count sketch over an
    * unbounded key stream in k·8 bytes of persisted state: each
    * micro-batch's k minimum hashes merge with the stored minima
    * (min-k of a union = union of min-k's, the mergeability
    * [[graft.ops.Kmv]] specs pin), so after N batches the state
    * equals ONE sketch over the concatenated history exactly — the
    * q_kmv_stream face's oracle recomputes precisely that. Same
    * crash/replay discipline as [[cmsSink]] (the tmp is the durable
    * copy; a replayed batch id is a no-op; merging a replayed batch
    * would anyway be IDEMPOTENT — min-k is — but the guard keeps the
    * batch-id watermark honest). */
  def kmvSink(stateDir: String, key: String, k: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stateDir)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val prev = recoverState(fs, stateDir)
    if (!prev.exists(_._1 >= batchId)) {
      val batchMins = graft.ops.Kmv
        .sketch(batch, org.apache.spark.sql.functions.col(key), k)
        .collect().map(_.getLong(0)) // ≤ k driver rows
      val prevMins = prev.map(p => bytesToLongs(p._2))
        .getOrElse(Array.empty[Long])
      val merged = (prevMins ++ batchMins).distinct.sorted.take(k)
      fs.mkdirs(new Path(stateDir))
      val stateFile = new Path(stateDir, StateFileName)
      val tmp = new Path(stateDir, s".cms_state_$batchId.tmp")
      val out = fs.create(tmp, true)
      try { out.writeLong(batchId); out.write(longsToBytes(merged)) }
      finally out.close()
      if (fs.exists(stateFile) && !fs.delete(stateFile, false))
        throw new java.io.IOException(
          s"kmvSink: failed to clear previous state $stateFile")
      if (!fs.rename(tmp, stateFile))
        throw new java.io.IOException(
          s"kmvSink: rename $tmp -> $stateFile failed; state is in the " +
            "temp file — re-deliver the batch to retry")
    }
  }

  /** Streaming log-histogram fold — a running QUANTILE sketch over an
    * unbounded value stream in ≤ 1024·16 bytes of persisted state:
    * each micro-batch aggregates to its own (bucket, count) table
    * ([[graft.ops.LogHist]] — one aggregation, bounded output) and
    * counts ADD into the stored table, so after N batches the state
    * equals ONE sketch over the concatenated history exactly — the
    * q_loghist_stream face's oracle recomputes precisely that.
    * Same crash/replay discipline as [[cmsSink]]/[[kmvSink]]; here
    * the batch-id guard is LOAD-BEARING for exactness, not just the
    * watermark: count addition is NOT idempotent, so a replayed
    * batch id must be (and is) a no-op. */
  def logHistSink(stateDir: String, valueCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stateDir)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val prev = recoverState(fs, stateDir)
    if (!prev.exists(_._1 >= batchId)) {
      val bs = graft.ops.LogHist
        .sketch(batch, Seq.empty,
          org.apache.spark.sql.functions.col(valueCol))
        .collect().map(r => (r.getLong(0), r.getLong(1))) // ≤ 1024 rows
      val prevPairs = prev.map(p => bytesToLongs(p._2).grouped(2)
        .map(a => (a(0), a(1))).toSeq).getOrElse(Seq.empty)
      val merged = (prevPairs ++ bs).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val flat = merged.flatMap { case (b, n) => Seq(b, n) }.toArray
      fs.mkdirs(new Path(stateDir))
      val stateFile = new Path(stateDir, StateFileName)
      val tmp = new Path(stateDir, s".cms_state_$batchId.tmp")
      val out = fs.create(tmp, true)
      try { out.writeLong(batchId); out.write(longsToBytes(flat)) }
      finally out.close()
      if (fs.exists(stateFile) && !fs.delete(stateFile, false))
        throw new java.io.IOException(
          s"logHistSink: failed to clear previous state $stateFile")
      if (!fs.rename(tmp, stateFile))
        throw new java.io.IOException(
          s"logHistSink: rename $tmp -> $stateFile failed; state is in " +
            "the temp file — re-deliver the batch to retry")
    }
  }

  /** Streaming Fellegi-Sunter pattern fold — incremental maintenance
    * of the linkage model's sufficient statistics: each micro-batch
    * of candidate PAIRS aggregates to its ≤ 2^F agreement-pattern
    * counts ([[graft.ops.Linkage.patternCounts]]) and counts ADD into
    * ≤ 2^F·16 bytes of persisted state, so the EM refit
    * ([[graft.ops.Linkage.emFit]] over [[readFsPatterns]]) equals a
    * fit over the concatenated pair history exactly — the model
    * retrains at O(batch) + O(iters·2^F) cost, never re-scanning the
    * pair corpus. Pattern key = Σ g_i·2^i. Same crash/replay
    * discipline as [[logHistSink]] (count addition is not idempotent
    * — the batch-id guard is load-bearing). */
  def fsPatternSink(stateDir: String, agreeCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stateDir)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val prev = recoverState(fs, stateDir)
    if (!prev.exists(_._1 >= batchId)) {
      val bs = graft.ops.Linkage.patternCounts(batch, agreeCols)
        .collect().map { r => // ≤ 2^F driver rows by construction
          val bits = agreeCols.zipWithIndex.map { case (c, i) =>
            r.getAs[Number](c).longValue << i
          }.sum
          (bits, r.getAs[Long]("n"))
        }
      val prevPairs = prev.map(p => bytesToLongs(p._2).grouped(2)
        .map(a => (a(0), a(1))).toSeq).getOrElse(Seq.empty)
      val merged = (prevPairs ++ bs).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val flat = merged.flatMap { case (b, n) => Seq(b, n) }.toArray
      fs.mkdirs(new Path(stateDir))
      val stateFile = new Path(stateDir, StateFileName)
      val tmp = new Path(stateDir, s".cms_state_$batchId.tmp")
      val out = fs.create(tmp, true)
      try { out.writeLong(batchId); out.write(longsToBytes(flat)) }
      finally out.close()
      if (fs.exists(stateFile) && !fs.delete(stateFile, false))
        throw new java.io.IOException(
          s"fsPatternSink: failed to clear previous state $stateFile")
      if (!fs.rename(tmp, stateFile))
        throw new java.io.IOException(
          s"fsPatternSink: rename $tmp -> $stateFile failed; state is " +
            "in the temp file — re-deliver the batch to retry")
    }
  }

  /** The folded pattern counts of a [[fsPatternSink]] state dir,
    * decoded back to agreement vectors — feed
    * [[graft.ops.Linkage.emFit]]. */
  def readFsPatterns(
      spark: SparkSession, stateDir: String,
      nFields: Int): Seq[(Seq[Int], Long)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, bytes) = recoverState(fs, stateDir).getOrElse(
      sys.error(s"fsPatternSink state at $stateDir has no committed fold"))
    bytesToLongs(bytes).grouped(2).map { a =>
      ((0 until nFields).map(i => ((a(0) >> i) & 1L).toInt), a(1))
    }.toSeq
  }

  /** The folded bucket table of a [[logHistSink]] state dir as a
    * (bucket, n) frame — feed [[graft.ops.LogHist.quantiles]]. */
  def readLogHistState(spark: SparkSession, stateDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, bytes) = recoverState(fs, stateDir).getOrElse(
      sys.error(s"logHistSink state at $stateDir has no committed fold"))
    import spark.implicits._
    bytesToLongs(bytes).grouped(2).map(a => (a(0), a(1))).toSeq
      .toDF("bucket", "n")
  }

  /** The folded KMV minima of a [[kmvSink]] state dir as a one-column
    * (hv) frame — feed [[graft.ops.Kmv.estimateFromSketch]]. */
  def readKmvMins(spark: SparkSession, stateDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, bytes) = recoverState(fs, stateDir).getOrElse(
      sys.error(s"kmvSink state at $stateDir has no committed fold"))
    import spark.implicits._
    bytesToLongs(bytes).toSeq.toDF("hv")
  }

  private def longsToBytes(xs: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(xs.length * 8)
    xs.foreach(bb.putLong)
    bb.array()
  }

  private def bytesToLongs(bs: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    Array.fill(bs.length / 8)(bb.getLong)
  }

  private val StateFileName = "cms_state.bin"

  /** Read (lastFoldedBatchId, sketchBytes) from one file. */
  private def readStateFile(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): (Long, Array[Byte]) = {
    val in = fs.open(p)
    try {
      val last = in.readLong()
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      (last, bytes.toByteArray)
    } finally in.close()
  }

  /** Load the committed state, finishing an interrupted commit first:
    * if the state file is absent but committed `.cms_state_*.tmp`
    * files exist (crash between the delete and the rename), the
    * highest-batch tmp is renamed into place and older tmps removed —
    * the accumulated sketch survives any single-point crash. */
  private def recoverState(
      fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String): Option[(Long, Array[Byte])] = {
    import org.apache.hadoop.fs.Path
    val stateFile = new Path(stateDir, StateFileName)
    if (fs.exists(stateFile)) Some(readStateFile(fs, stateFile))
    else if (!fs.exists(new Path(stateDir))) None
    else {
      val tmps = fs.listStatus(new Path(stateDir)).toSeq
        .map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.startsWith(".cms_state_") && n.endsWith(".tmp") &&
            n.stripPrefix(".cms_state_").stripSuffix(".tmp")
              .forall(_.isDigit)
        }
      if (tmps.isEmpty) None
      else {
        val newest = tmps.maxBy(
          _.getName.stripPrefix(".cms_state_").stripSuffix(".tmp").toLong)
        if (!fs.rename(newest, stateFile))
          throw new java.io.IOException(
            s"cmsSink recovery: rename $newest -> $stateFile failed")
        tmps.filterNot(_ == newest).foreach(p => fs.delete(p, false))
        Some(readStateFile(fs, stateFile))
      }
    }
  }

  /** Read the running sketch written by [[cmsSink]]:
    * (lastFoldedBatchId, sketchBytes). Completes an interrupted
    * commit if one is pending. */
  def readCmsState(
      spark: SparkSession, stateDir: String): (Long, Array[Byte]) = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverState(fs, stateDir).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no cms state in $stateDir"))
  }

  /** Streaming near-dup-aware corpus ingest — the continuous version
    * of the batch incremental dedup ([[graft.ops.Dedup
    * .incrementalCandidates]]): each micro-batch is MinHash-banded,
    * checked against the accumulated accepted-corpus band state, and
    * only novel documents (plus their bands) are appended. The state
    * a 100 TB corpus accretes is the compact (id, band, bucket) table
    * — never the documents themselves.
    *
    * Drop rule (deterministic, one pass): a new document is rejected
    * if any of its LSH buckets collides with (i) an already-accepted
    * document or (ii) a smaller-id document of the same batch. This
    * is bucket-granularity dedup — the standard streaming trade
    * (collision probability follows the banding parameters; rescore
    * offline with [[graft.ops.Dedup.jaccard]] if exactness matters,
    * fetching just the collided docs).
    *
    * Layout & exactly-once: survivors land in `docs/batch_id=N`,
    * their bands in `bands/batch_id=N` — both written with per-batch
    * OVERWRITE, so a re-delivered batch replaces its own previous
    * (possibly partial) output instead of duplicating it
    * ([[idempotentParquetSink]]'s discipline). The state read
    * partition-prunes the replayed batch's own directory out, so the
    * replay decides against exactly the state the failed attempt saw.
    *
    * Per-batch cost: one LSH pass over the batch + one equi-join of
    * batch bands against state bands (shuffle bounded by collisions;
    * the state side is a compact columnar scan) — O(batch) work,
    * never O(corpus) rewrite.
    */
  def nearDupIngestSink(
      dir: String, id: String, shingleCol: String,
      numHashes: Int = 64, bands: Int = 16)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val bandsRoot = s"$dir/bands"
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newBanded = graft.ops.Dedup.bandedBuckets(
        batch, id, col(shingleCol), numHashes, bands)
      .localCheckpoint() // consumed by 2-3 joins below
    val dupVsState: Option[DataFrame] =
      if (fs.exists(new Path(bandsRoot))) {
        val state = spark.read.option("basePath", bandsRoot)
          .parquet(bandsRoot)
          .filter(col("batch_id") =!= batchId) // replay sees prior state only
        Some(newBanded
          .join(state.select(col(id).as("__sid"), col("band"),
            col("bucket")), Seq("band", "bucket"))
          .filter(col(id) =!= col("__sid"))
          .select(id))
      } else None
    val dupInBatch = newBanded.select(col(id).as("__a"), col("band"),
        col("bucket"))
      .join(newBanded.select(col(id).as("__b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("__a") < col("__b"))
      .select(col("__b").as(id))
    val dropIds = dupVsState.fold(dupInBatch)(dupInBatch.unionByName(_))
      .distinct().localCheckpoint()
    val kept = batch.join(dropIds, Seq(id), "left_anti")
    kept.write.mode("overwrite").parquet(s"$dir/docs/batch_id=$batchId")
    newBanded.join(dropIds, Seq(id), "left_anti")
      .write.mode("overwrite").parquet(s"$bandsRoot/batch_id=$batchId")
  }

  /** The corpus accepted so far by [[nearDupIngestSink]]. */
  def readAccepted(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", s"$dir/docs").parquet(s"$dir/docs")

  /** Per-source token-budget quota enforcement on the MODERN arbitrary-
    * state API (`transformWithState`, Spark 4 / RocksDB state store) —
    * the streaming face of [[graft.ops.Sampling.takeTokenBudget]]: a
    * continuously-ingesting corpus stops accepting a source's
    * documents once that source's running token sum would exceed
    * `budget`, forever (the state survives across micro-batches and
    * restarts via the checkpoint).
    *
    * Input rows are (source, doc_id, tokens) — keyed by source, so
    * each key holds ONE long of state (the spent budget), the smallest
    * possible state footprint; a 100 TB stream carries
    * |sources| × 8 bytes. Rows within a micro-batch fold in doc_id
    * order (the iterator's arrival order is partition-dependent, so
    * the fold sorts first — determinism over layout, the engine-wide
    * contract). A document that would cross the budget is dropped but
    * later smaller documents may still fit — greedy by id order, the
    * same rule as the batch face's running-sum window.
    */
  class TokenQuotaProcessor(budget: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long), (String, Long)] {
    @transient private var used:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      used = getHandle.getValueState[Long]("used",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[(String, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long)] = {
      var u = if (used.exists()) used.get() else 0L
      val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      rows.toSeq.sortBy(_._2).foreach { case (_, id, toks) =>
        if (u + toks <= budget) { u += toks; kept += ((key, id)) }
      }
      used.update(u)
      kept.iterator
    }
  }

  /** Run the quota gate over a (source, doc_id, tokens) stream.
    * Requires the RocksDB state store provider (transformWithState's
    * backend): set `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` on the session. */
  def tokenQuotaFilter(
      docs: Dataset[(String, Long, Long)],
      budget: Long): Dataset[(String, Long)] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .transformWithState(new TokenQuotaProcessor(budget),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** One user session: bounded event run with < `gap` between events. */
  final case class Session(
      user_id: Long, n_events: Long, first_ts: Long, last_ts: Long)

  /** Internal running state (public: codegen'd encoders need access). */
  final case class SessionState(n: Long, first: Long, last: Long)

  /** Event-time sessionization via mapGroupsWithState: emits one
    * closed session per user when no event arrives within `gapMs`
    * (state times out on the event-time watermark). Demonstrates the
    * custom-state surface; at scale, state is one tiny object per
    * ACTIVE user, evicted by timeout.
    *
    * Input must be a streaming Dataset of (user_id, event timestamp)
    * whose timestamp column carries the watermark — keep the
    * watermarked column itself (projecting it into epoch numbers
    * upstream severs the watermark and fails analysis).
    */
  def sessionize(
      events: Dataset[(Long, java.sql.Timestamp)],
      gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, Session](
        GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(user, s.n, s.first, s.last)
          } else {
            val ts = rows.map(_._2.getTime).toSeq
            val prev = state.getOption.getOrElse(
              SessionState(0L, ts.min, ts.max))
            val next = SessionState(
              prev.n + ts.size, math.min(prev.first, ts.min),
              math.max(prev.last, ts.max))
            state.update(next)
            state.setTimeoutTimestamp(next.last + gapMs)
            Session(user, -1L, 0L, 0L) // interim marker, filtered by caller
          }
      }
      .filter(_.n_events >= 0)
  }
}
