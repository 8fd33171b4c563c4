package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (fingerprint group-by) and near-duplicate (MinHash + LSH banding).
  *
  * Everything is native `functions._` — the MinHash signature is a
  * higher-order `transform`/`array_min` over `xxhash64`, so signature
  * computation is per-row, codegen'd, and shuffle-free. The only
  * shuffles are the (band, bucket) self-join and the final distinct —
  * both equi-operations that scale linearly with data (never the
  * all-pairs cross product; at 100 TB, all-pairs is impossible and
  * bucketing is the whole point of LSH).
  *
  * Determinism: MinHash here is seeded by band/row index, not RNG, so
  * the same input always yields the same signature, bucket assignment,
  * and candidate set — results are reproducible and oracle-checkable.
  */
object Dedup {

  /** Exact-dedup groups: one row per distinct fingerprint with the
    * minimum id as the deterministic surviving representative and the
    * duplicate count. Map-side partial agg collapses heavy duplicate
    * clusters before the shuffle, so a 100 TB corpus with a few viral
    * documents doesn't skew the exchange.
    */
  def exactGroups(df: DataFrame, fingerprint: Column, id: Column): DataFrame =
    df.groupBy(fingerprint.as("fingerprint"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep exactly one deterministic representative (min id) per
    * fingerprint: the scalable alternative to `dropDuplicates`, whose
    * surviving row is partition-order-dependent.
    */
  def dropExact(df: DataFrame, fingerprint: Column, id: Column): DataFrame = {
    val reps = exactGroups(df, fingerprint, id)
      .select(col("keep_id").as("__keep_id"))
    df.join(reps, id === col("__keep_id"), "left_semi")
  }

  /** MinHash signature as a per-row expression: `numHashes`
    * permutations approximated by seeded hashes, h_s(doc) = min over
    * shingles of xxhash64(s, xxhash64(shingle)). Null (not empty)
    * when the doc has no shingles.
    *
    * TEST/REFERENCE variant: inside the outer lambda, Catalyst cannot
    * subexpression-eliminate the captured shingle column, so an
    * upstream shingle EXPRESSION is re-evaluated once per seed after
    * projection collapse — fine on a materialized array column, ruinous
    * stacked on `Text.shingles`. The production path is
    * [[minhashSignatures]], which hashes each shingle exactly once.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column = {
    val distinctSh = array_distinct(shingles)
    when(size(distinctSh) === 0, lit(null).cast("array<bigint>")).otherwise(
      transform(
        sequence(lit(0), lit(numHashes - 1)),
        s => array_min(transform(distinctSh, sh => xxhash64(s, xxhash64(sh))))))
  }

  /** MinHash signatures, aggregation-formulated — the scale path:
    * explode distinct shingles, hash each ONCE to a long, then take
    * `numHashes` seeded mins as map-side-combined aggregates. Each
    * input shingle costs one string hash + `numHashes` fixed-width
    * long hashes (vs. re-hashing the string per seed), everything
    * stays in codegen, and the only shuffle carries one partial
    * signature row per doc per partition. Docs with no shingles
    * produce no row (same contract as a null signature).
    *
    * Agrees value-for-value with [[minhashSignature]] (asserted in
    * DedupSpec).
    */
  def minhashSignatures(
      docs: DataFrame, id: String, shingles: Column,
      numHashes: Int): DataFrame = {
    val exploded = docs
      .select(col(id), explode(array_distinct(shingles)).as("__sh"))
      .select(col(id), xxhash64(col("__sh")).as("__h"))
    val mins = (0 until numHashes)
      .map(s => min(xxhash64(lit(s), col("__h"))).as(s"__m$s"))
    exploded
      .groupBy(col(id))
      .agg(mins.head, mins.drop(1): _*)
      .select(col(id),
        array((0 until numHashes).map(s => col(s"__m$s")): _*).as("sig"))
  }

  /** LSH banding: split a signature into `bands` rows of
    * `signatureLen / bands` hashes each and hash every row to a
    * bucket. Emits array of (band, bucket); docs sharing a bucket in
    * ANY band become candidates.
    */
  def lshBuckets(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(slice(signature, b * rowsPerBand + lit(1), lit(rowsPerBand)))
          .as("bucket")))

  /** Candidate near-duplicate pairs via MinHash-LSH: explode each
    * doc into its `bands` (band, bucket) keys and self-join on them.
    * Output: (a, b) with a < b, distinct.
    *
    * Scale: the join key space is bands × buckets, so co-bucketed
    * groups are tiny unless documents genuinely collide; the join and
    * the distinct are the only shuffles. A pathological bucket (e.g.
    * boilerplate-heavy corpora) shows up as AQE skew and can be salted
    * by raising `bands`/`numHashes`; all-pairs never happens.
    *
    * @param maxBucketSize when > 0, drop (band, bucket) groups larger
    *   than this before the self-join — the standard production guard
    *   for boilerplate corpora, where one shared template floods a
    *   bucket and its pair fan-out goes quadratic. Dropping a bucket
    *   only loses recall for pairs whose EVERY band collides
    *   oversized; genuine near-dups still meet in their other bands.
    *   0 (default) disables the cap.
    */
  def candidatePairs(
      docs: DataFrame,
      id: String,
      shingles: Column,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketSize: Int = 0): DataFrame = {
    // The self-join consumes the tiny (id, band, bucket) frame twice;
    // without a pin each side would re-scan the corpus and recompute
    // every signature. localCheckpoint (not persist): persist registers
    // in the session CacheManager and is pinned until an explicit
    // unpersist — impossible from a lazy-returning API — whereas the
    // checkpoint's RDD blocks are reclaimed by the ContextCleaner once
    // the returned frame is unreachable. Cost: one eager job here.
    val bandedAll = bandedBuckets(docs, id, shingles, numHashes, bands)
      .localCheckpoint()
    val banded =
      if (maxBucketSize <= 0) bandedAll
      else {
        val ok = bandedAll.groupBy("band", "bucket")
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize)
          .select("band", "bucket")
        bandedAll.join(ok, Seq("band", "bucket"), "left_semi")
      }
    val l = banded.select(col(id).as("a"), col("band"), col("bucket"))
    val r = banded.select(col(id).as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** SimHash fingerprints, aggregation-formulated like
    * [[minhashSignatures]]: explode distinct features (shingles or
    * tokens), hash each once, then for every one of the 64 bit
    * positions sum +1/-1 votes map-side; the fingerprint re-assembles
    * the sign bits. Near-duplicates differ in few bits (small Hamming
    * distance). One shuffle carrying one partial vote row per doc per
    * partition.
    */
  def simhashes(
      docs: DataFrame, id: String, features: Column): DataFrame = {
    val exploded = docs
      .select(col(id), explode(array_distinct(features)).as("__f"))
      .select(col(id), xxhash64(col("__f")).as("__h"))
    val votes = (0 until 64).map { j =>
      sum(when(col("__h").bitwiseAND(lit(1L << j)) =!= 0, 1)
        .otherwise(-1)).as(s"__v$j")
    }
    val bits = (0 until 64).map { j =>
      when(col(s"__v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }
    exploded
      .groupBy(col(id))
      .agg(votes.head, votes.drop(1): _*)
      .select(col(id), bits.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by SimHash: band each fingerprint into
    * `bands` bit-chunks and self-join on any exact chunk match (two
    * fingerprints within Hamming distance < bands must share a chunk
    * — pigeonhole), then keep pairs within `maxHamming`. Same bucketed
    * shape as MinHash-LSH: never all-pairs.
    */
  def simhashNearDups(
      docs: DataFrame, id: String, features: Column,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    // localCheckpoint, not persist: see candidatePairs — self-join reads
    // it twice, blocks are GC-reclaimed with the returned frame.
    hammingNearDups(simhashes(docs, id, features).localCheckpoint(),
      id, "simhash", maxHamming, bands)

  /** Near-duplicate pairs over ANY 64-bit fingerprint column by
    * pigeonhole banding — the fingerprint-agnostic core of
    * [[simhashNearDups]], reused by perceptual-hash media dedup
    * ([[Multimodal.phashNearDups]]): band each hash into `bands`
    * bit-chunks, self-join on any exact chunk match, rescore with
    * exact Hamming distance. Never all-pairs.
    */
  def hammingNearDups(
      hashes: DataFrame, id: String, hashCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    // Pigeonhole guarantee only holds below `bands` differing bits: two
    // fingerprints within Hamming distance < bands MUST share a chunk.
    // A maxHamming >= bands would silently miss qualifying pairs.
    require(maxHamming < bands,
      s"maxHamming ($maxHamming) must be < bands ($bands) for the " +
        "pigeonhole banding to guarantee recall; raise bands")
    require(64 % bands == 0, s"bands ($bands) must divide 64")
    val bitsPerBand = 64 / bands
    val mask = (1L << bitsPerBand) - 1
    val banded = hashes.select(col(id), col(hashCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col(hashCol), b * bitsPerBand).bitwiseAND(lit(mask))
            .as("chunk"))
      }: _*)).as("bb"))
      .select(col(id), col(hashCol),
        col("bb.band").as("band"), col("bb.chunk").as("chunk"))
    val l = banded.select(col(id).as("a"), col(hashCol).as("__sa"),
      col("band"), col("chunk"))
    val r = banded.select(col(id).as("b"), col(hashCol).as("__sb"),
      col("band"), col("chunk"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        hammingDistance(col("__sa"), col("__sb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected-component labels over an undirected pair graph
    * (a, b): every node gets its component's minimum id as `cluster`.
    * Iterative min-label propagation — one join + one aggregate per
    * round, converging in O(graph diameter) rounds (near-dup clusters
    * are almost always dense cliques, so 1-2 rounds in practice;
    * `maxIters` bounds pathological chains). Each round shuffles only
    * the label frame (2 longs per node) — at 100 TB of documents the
    * pair graph is the sparse minority that actually collided in LSH.
    */
  def clusterLabels(
      nodes: DataFrame, // single column: the node id
      pairs: DataFrame, // columns a, b
      maxIters: Int = 20): DataFrame = {
    val idCol = nodes.columns.head
    // materialize the pair list ONCE before the symmetric union — both
    // union branches share the pairs subtree, and without the pin the
    // whole upstream pipeline (for dropNearDups: the entire LSH +
    // rescore chain) executes twice to build the edge list
    val p = pairs.select(col("a"), col("b")).localCheckpoint()
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Iterate ONLY over nodes that appear in the collision graph: a
    // node with no edge can never change label, so the per-round joins
    // and counts touch the (tiny) collided subgraph, not the corpus —
    // at 100 TB the difference between shuffling every document id per
    // round and shuffling just the near-dup candidates. Isolated nodes
    // are stitched back with one left join at the end.
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("cluster", col("node"))
    // Each round eagerly localCheckpoints its label frame: that both
    // truncates lineage (round N's job never replays rounds 1..N-1) and
    // caches the frame for the two consumers (next round's join + the
    // convergence count). The superseded round's blocks are released as
    // soon as the new frame is materialized — at no point are more than
    // two label frames (2 longs per graph node each) held.
    var prevCkpt: Option[DataFrame] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("node"))
        .groupBy(col("src").as("node2"))
        .agg(min(col("cluster")).as("nmin"))
      // carry the old label through so convergence is a filter over the
      // checkpointed frame, not another join against the previous round
      val nextWide = labels
        .join(neighborMin, labels("node") === col("node2"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster")))
            .as("next_cluster"),
          col("cluster").as("old_cluster"))
        .localCheckpoint() // eager: materializes before prev is released
      val changed = nextWide
        .filter(col("next_cluster") =!= col("old_cluster")).count()
      prevCkpt.foreach(_.unpersist(false)) // superseded, never read again
      prevCkpt = Some(nextWide)
      labels = nextWide.select(col("node"),
        col("next_cluster").as("cluster"))
      converged = changed == 0
      i += 1
    }
    edges.unpersist(false)
    // Stitch isolated nodes back: their cluster is themselves. The
    // graph labels stay cached (lineage-free after the checkpoint) and
    // are ContextCleaner-reclaimed when the result is dropped.
    nodes.select(col(idCol).as("node"))
      .join(labels.withColumnRenamed("node", "__gn"),
        col("node") === col("__gn"), "left")
      .select(col("node"),
        coalesce(col("cluster"), col("node")).as("cluster"))
  }

  /** Drop near-duplicates: LSH candidate pairs → exact-Jaccard filter
    * → connected components → keep each cluster's min-id row. The
    * companion of [[dropExact]] for the near-dup regime. */
  def dropNearDups(
      docs: DataFrame,
      id: String,
      shingles: Column,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val pairs = nearDupPairs(docs, id, shingles, threshold, numHashes, bands)
      .select("a", "b")
    val labels = clusterLabels(docs.select(col(id)), pairs)
    docs.join(labels,
        docs(id) === labels("node") && labels("cluster") === docs(id),
        "left_semi")
  }

  /** Near-dup collapse keeping each cluster's BEST row (max `score`,
    * ties to the smaller id) instead of [[dropNearDups]]'s min-id —
    * the representative selection real pipelines run (keep the
    * longest / highest-quality page of a near-dup family, not the one
    * that happened to crawl first).
    *
    * Scale shape: identical to [[dropNearDups]] (pair graph → O(log²)
    * components) plus ONE extra aggregation over the label frame: the
    * per-cluster argmax rides a lexicographic struct max — max(score,
    * −id) — one map-side-combined shuffle keyed by cluster, then a
    * semi-join back. No window function, no per-cluster sort.
    */
  def keepBestPerCluster(
      docs: DataFrame,
      id: String,
      score: Column,
      pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val labels = clusterLabels(docs.select(col(id)), pairs, maxIters)
    val scored = docs.select(col(id).as("__kid"), score.as("__score"))
      .join(labels, col("__kid") === col("node"))
    val best = scored
      .groupBy(col("cluster"))
      .agg(max(struct(col("__score"), (-col("__kid")).as("__negid")))
        .as("__m"))
      .select((-col("__m.__negid")).as("__keep"))
    docs.join(best, docs(id) === col("__keep"), "left_semi")
  }

  /** Provenance-preserving collapse: one row per near-dup cluster
    * carrying the representative (min id), the SORTED member-id array,
    * and the member count — the lineage record a curation pipeline
    * must keep when it drops duplicates (dataset cards, takedown /
    * opt-out propagation: removing one member means re-checking its
    * whole cluster; pure [[dropNearDups]] discards that trace).
    *
    * Scale shape: the CC label frame (2 longs per collided node)
    * aggregates once on the cluster key with map-side combine. The
    * member ARRAY is cluster-sized by construction — bound pathological
    * boilerplate clusters upstream with [[candidatePairs]]'
    * bucket-size cap, exactly as the collapse ops do; the count column
    * is the cheap signal consumers should filter on first.
    */
  def collapseProvenance(
      docs: DataFrame,
      id: String,
      pairs: DataFrame,
      maxIters: Int = 20): DataFrame =
    clusterLabels(docs.select(col(id)), pairs, maxIters)
      .groupBy(col("cluster").as("rep_id"))
      .agg(sort_array(collect_list(col("node"))).as("members"),
        count(lit(1)).as("n_members"))

  /** The persistent LSH state for incremental ingest: the corpus as
    * (id, band, bucket) rows — what [[candidatePairs]] builds
    * internally, exposed so a long-lived pipeline can persist it
    * (parquet, bucketed by (band, bucket)) and dedupe each arriving
    * batch WITHOUT re-shingling 100 TB of existing corpus. */
  def bandedBuckets(
      docs: DataFrame, id: String, shingles: Column,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    minhashSignatures(docs, id, shingles, numHashes)
      .select(col(id),
        explode(lshBuckets(col("sig"), bands, numHashes / bands)).as("bb"))
      .select(col(id), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  /** Incremental near-dup candidates for one arriving batch: LSH only
    * the NEW docs, join their banded rows against the persisted corpus
    * state, and self-join the batch against itself. Output: distinct
    * (a, b) where b is always a new doc and a is an existing doc or a
    * smaller new id — existing-vs-existing pairs are never re-reported.
    * Also returns the batch's banded rows so the caller appends them
    * to the state (one LSH pass per batch, total cost O(batch), never
    * O(corpus)). Rescore candidates with [[jaccard]] by fetching just
    * the matched docs' shingles — a targeted semi-join, not a corpus
    * scan. */
  def incrementalCandidates(
      corpusBanded: DataFrame, newDocs: DataFrame, id: String,
      shingles: Column, numHashes: Int = 64,
      bands: Int = 16): (DataFrame, DataFrame) = {
    val newBanded =
      bandedBuckets(newDocs, id, shingles, numHashes, bands)
        .localCheckpoint() // consumed three times below; see candidatePairs
    val oldNew = corpusBanded.select(col(id).as("a"), col("band"),
        col("bucket"))
      .join(newBanded.select(col(id).as("b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a") =!= col("b")) // re-ingested id is not its own dup
    val newNew = newBanded.select(col(id).as("a"), col("band"), col("bucket"))
      .join(newBanded.select(col(id).as("b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
    (oldNew.select("a", "b").unionByName(newNew.select("a", "b")).distinct(),
      newBanded)
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo,
    * SIGMOD'95): rank the corpus by a blocking key, compare each row
    * only against the next `window` rows in that order. The classic
    * complement to LSH blocking — catches near-dups whose PREFIX
    * agrees (title/lead-sentence clones, id-adjacent exports) at cost
    * O(n·window) regardless of how hot any key value is, where a
    * key-equality block would square on a heavy key.
    *
    * Scale shape: the global rank comes from the range-partitioned
    * ranker ([[Layout.globalRowNumber]] — never a single-partition
    * window); the window expansion is a map-side `explode` of the
    * `window` offsets followed by ONE rank equi-join. Emits (a, b)
    * with a the earlier row in sort order; rescore with [[jaccard]].
    * Total order (key, id) makes the pair set deterministic and
    * layout-independent. Null keys rank LAST (Spark's ASC default is
    * NULLS FIRST; pinned to NULLS LAST here so the rank agrees with
    * ANSI/DuckDB default ordering when the blocking key is null).
    */
  def sortedNeighborhoodPairs(
      docs: DataFrame, id: String, sortKey: Column, window: Int,
      numPartitions: Int = 32): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ranked = Layout.globalRowNumber(
        docs.select(col(id).as("__sid"), sortKey.as("__key")),
        Seq(col("__key").asc_nulls_last, col("__sid").asc), numPartitions,
        as = "__rn")
      .localCheckpoint() // two consumers: probe side + build side
    val probes = ranked
      .withColumn("__o", explode(sequence(lit(1), lit(window))))
      .select(col("__sid").as("a"), (col("__rn") + col("__o")).as("__rn2"))
    val build = ranked.select(col("__sid").as("b"), col("__rn").as("__rn2"))
    probes.join(build, "__rn2").select(col("a"), col("b"))
  }

  /** Exact Jaccard similarity of two shingle-set columns:
    * |A ∩ B| / (|A| + |B| - |A ∩ B|), on distinct shingles. NaN when
    * both sets are empty (0/0) — callers comparing against a
    * threshold must exclude empty-shingle rows first.
    */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da) + size(db) - inter)
  }

  /** EXACT n-gram Jaccard similarity join via prefix filtering — the
    * completeness-guaranteed counterpart to [[nearDupPairs]]: LSH can
    * miss a qualifying pair (banding is probabilistic); this operator
    * provably cannot, and still never goes all-pairs.
    *
    * The AllPairs principle (Bayardo et al., WWW'07): order every
    * document's distinct shingles by a global canonical order —
    * rarest-first by corpus document frequency — and keep only each
    * document's PREFIX of length |d| - ceil(t·|d|) + 1. Two sets with
    * Jaccard ≥ t must overlap in ≥ ceil(t·|d|) shingles, so by
    * pigeonhole they share at least one prefix shingle: an equi-join
    * on prefix shingles finds every qualifying pair. A length filter
    * (t·|a| ≤ |b| ≤ |a|/t, another Jaccard necessity) prunes
    * candidates before the exact rescore.
    *
    * Scale shape: one aggregation for document frequencies, one
    * re-group to per-doc sorted arrays, one equi-join on prefix
    * shingles. Rarest-first ordering is what bounds the join fan-out:
    * prefixes preferentially hold the corpus's RARE shingles, so
    * bucket sizes stay small even when stop-word shingles are
    * corpus-wide hot keys — the frequent shingles end up outside the
    * prefix, exactly where the pigeonhole argument lets them be
    * ignored. Candidate count ≈ Σ_rare df², orders of magnitude under
    * all-pairs; every candidate is rescored with exact [[jaccard]].
    * Output: (a, b, jaccard) with a < b, identical contract to
    * [[nearDupPairs]].
    *
    * Two further prunes run INSIDE the join condition, before the
    * candidate distinct (PPJoin, Xiao et al., WWW'08):
    *  - length filter: Jaccard ≥ t forces t·|a| ≤ |b| ≤ |a|/t;
    *  - positional filter: a shared prefix token at (0-based)
    *    positions (px, py) caps the possible overlap at
    *    min(|a|−px, |b|−py), which must reach the tight requirement
    *    ceil(t/(1+t)·(|a|+|b|)). Complete because every qualifying
    *    pair's FIRST shared token (all common tokens at-or-after it
    *    in both sorted sets) satisfies the cap.
    * Low-diversity corpora — where nothing is rare and prefix buckets
    * are forced large — are exactly where the positional filter keeps
    * the candidate set near the true pair count.
    *
    * Float-safety: every ceil() argument subtracts 1e-9 so a
    * last-ulp-high product can never round a boundary count UP and
    * silently shorten a prefix / tighten a bound past correctness —
    * the slack only ever admits extra candidates.
    */
  def exactNearDupPairs(
      docs: DataFrame,
      id: String,
      shingles: Column,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    // One shingle pass, not three: the set frame feeds the token
    // pipeline (df → canonical order → prefixes) AND both sides of
    // the candidate rescore; without a materialization the shingle
    // regex — the single most expensive map-side step — re-runs per
    // consumer. Lazy local checkpoint: first action materializes,
    // the rest read executor-local blocks.
    val sets = graft.core.LazyCheckpoint(docs
      .select(col(id).as("__id"), array_distinct(shingles).as("__sh"))
      .filter(size(col("__sh")) > 0))
    val ordered = orderedTokenHashes(sets)
    val prefixed = ordered.select(
      col("__id"),
      size(col("__ord")).as("__n"),
      posexplode(slice(col("__ord"), lit(1),
        (size(col("__ord"))
          - ceil(lit(threshold) * size(col("__ord")) - lit(1e-9)) + 1)
          .cast("int")))
        .as(Seq("__pos", "__tok")))
    // tight overlap requirement for Jaccard ≥ t: ceil(t/(1+t)·(nx+ny))
    val q = threshold / (1.0 + threshold)
    val cand = prefixed.as("x")
      .join(prefixed.as("y"),
        col("x.__tok") === col("y.__tok") &&
          col("x.__id") < col("y.__id") &&
          // length filter: t·|a| ≤ |b| (x,y sides both orders)
          col("y.__n") >= ceil(lit(threshold) * col("x.__n") - lit(1e-9)) &&
          col("x.__n") >= ceil(lit(threshold) * col("y.__n") - lit(1e-9)) &&
          // positional filter: remaining-suffix cap must reach the
          // tight overlap requirement
          least(col("x.__n") - col("x.__pos"), col("y.__n") - col("y.__pos"))
            >= ceil(lit(q) * (col("x.__n") + col("y.__n")) - lit(1e-9)))
      .select(col("x.__id").as("a"), col("y.__id").as("b"))
      .distinct()
    cand
      .join(sets.select(col("__id").as("a"), col("__sh").as("__sha")),
        Seq("a"))
      .join(sets.select(col("__id").as("b"), col("__sh").as("__shb")),
        Seq("b"))
      .select(col("a"), col("b"),
        jaccard(col("__sha"), col("__shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** [[exactNearDupPairs]] restricted to pairs with AT LEAST ONE
    * endpoint in an anchor set — the scale-safe truth side for
    * blocker-quality evaluation (`q_blocking_recall_sampled`). The
    * full exact join's candidate volume grows ≈ Σ_token df², which is
    * super-linear in corpus size (round-11 rehearsal measured 4.33×
    * wall at 10× data) and uncomputable at real corpus scale; recall
    * however is a RATIO, and every unordered pair has the same
    * probability of touching a fixed-rate anchor sample (1−(1−p)²),
    * so the caught/true ratio over anchored pairs is a consistent
    * estimator of pair completeness — with a bootstrap CI from
    * [[graft.ops.Profile.poissonBootstrap]] over the pair-level hit
    * indicators.
    *
    * Completeness over the anchored stratum is still EXACT, by a
    * ONE-SIDED prefix argument: a qualifying pair (a anchored, b any)
    * overlaps in ≥ ceil(t·|a|) tokens, while a has only
    * ceil(t·|a|) − 1 tokens OUTSIDE its prefix — so at least one
    * overlap token lies in a's prefix, and that token is somewhere in
    * b. Joining the ANCHORS' prefixes against the corpus's plain
    * postings therefore finds every qualifying pair with an anchored
    * endpoint (both-anchored pairs arrive twice and collapse in the
    * distinct). The one-sided positional filter still applies: common
    * tokens cannot precede the pair's first shared token in a's
    * canonical order, so overlap ≤ |a| − pos, which must reach the
    * tight requirement ceil(t/(1+t)·(|a|+|b|)).
    *
    * Scale shape — and why the corpus side is deliberately NOT given
    * the full AllPairs treatment: [[exactNearDupPairs]] pays two
    * corpus-sized token shuffles (df join-back + the per-doc sorted-
    * array build) before its join, which is exactly the machinery
    * that dominates when the anchor budget keeps the join itself
    * small. Here the corpus side is a MAP-SIDE postings frame
    * (id, token-hash, set size) — no df join, no per-doc sort; only
    * the budget-sized anchor set builds rarest-first prefix arrays
    * (ordered by CORPUS df, one map-side-combined aggregation). The
    * join costs Σ_token df_S,prefix(t)·df(t) ≤ (|S|/n)·Σ df² — under
    * a FIXED anchor budget |S|, linear in corpus size where the
    * symmetric join is quadratic; the one-sided prefix trades ~1/t
    * more candidates for the removal of both corpus-sized shuffles,
    * the right trade whenever |S| ≪ n.
    *
    * @param anchor boolean column over `docs` selecting the anchor
    *               set — deterministic md5 draws
    *               ([[graft.ops.Sampling.sampleByHash]]'s predicate)
    *               keep it engine-replayable
    * @return (a, b, jaccard) with a < b and a or b anchored
    */
  def anchoredExactNearDupPairs(
      docs: DataFrame,
      id: String,
      shingles: Column,
      threshold: Double,
      anchor: Column): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val sets = graft.core.LazyCheckpoint(docs
      .select(col(id).as("__id"), array_distinct(shingles).as("__sh"),
        anchor.as("__anc"))
      .filter(size(col("__sh")) > 0))
    // anchor token universe (budget-scaled): restricts the corpus df
    // aggregation to tokens that can matter — counts are still GLOBAL
    // occurrence counts of those tokens, and one-sided completeness
    // needs only SOME total order per anchor doc, so dropping
    // non-anchor tokens from the ordering input changes nothing
    val anchorTokSet = sets.filter(col("__anc"))
      .select(explode(col("__sh")).as("__tok"))
      .select(xxhash64(col("__tok")).as("__th")).distinct()
    val toks = sets
      .select(col("__id"), explode(col("__sh")).as("__tok"))
      .withColumn("__th", xxhash64(col("__tok")))
    val dfreq = toks
      .join(broadcast(anchorTokSet), Seq("__th"), "left_semi")
      .groupBy("__th").agg(count(lit(1)).as("__df"))
    // rarest-first sorted token arrays for the ANCHORS ONLY
    val anchorOrd = sets.filter(col("__anc"))
      .select(col("__id"), explode(col("__sh")).as("__tok"))
      .withColumn("__th", xxhash64(col("__tok")))
      .join(dfreq, "__th")
      .groupBy("__id")
      .agg(sort_array(collect_list(
        struct(col("__df"), col("__th"), col("__tok"))))
        .getField("__th").as("__ord"))
    // pinned: consumed by the prefix-token broadcast AND the join
    val prefixed = graft.core.LazyCheckpoint(anchorOrd.select(
      col("__id"),
      size(col("__ord")).as("__n"),
      posexplode(slice(col("__ord"), lit(1),
        (size(col("__ord"))
          - ceil(lit(threshold) * size(col("__ord")) - lit(1e-9)) + 1)
          .cast("int")))
        .as(Seq("__pos", "__tok"))))
    // corpus postings, PRUNED MAP-SIDE to the anchors' prefix tokens
    // before any exchange: the broadcast semi-join keeps only
    // occurrences of the (rare, budget-scaled) prefix tokens, so the
    // join shuffle carries ≈ the candidate volume, not the corpus's
    // full token stream
    val prefixTokSet = prefixed.select(col("__tok").as("__yth")).distinct()
    val posts = sets.select(col("__id").as("__yid"),
        size(col("__sh")).as("__yn"), explode(col("__sh")).as("__ytok"))
      .select(col("__yid"), col("__yn"), xxhash64(col("__ytok")).as("__yth"))
      .join(broadcast(prefixTokSet), Seq("__yth"), "left_semi")
    val q = threshold / (1.0 + threshold)
    val cand = prefixed.as("x")
      .join(posts,
        col("x.__tok") === col("__yth") &&
          col("x.__id") =!= col("__yid") &&
          col("__yn") >= ceil(lit(threshold) * col("x.__n") - lit(1e-9)) &&
          col("x.__n") >= ceil(lit(threshold) * col("__yn") - lit(1e-9)) &&
          (col("x.__n") - col("x.__pos"))
            >= ceil(lit(q) * (col("x.__n") + col("__yn")) - lit(1e-9)))
      .select(least(col("x.__id"), col("__yid")).as("a"),
        greatest(col("x.__id"), col("__yid")).as("b"))
      .distinct()
    cand
      .join(sets.select(col("__id").as("a"), col("__sh").as("__sha")),
        Seq("a"))
      .join(sets.select(col("__id").as("b"), col("__sh").as("__shb")),
        Seq("b"))
      .select(col("a"), col("b"),
        jaccard(col("__sha"), col("__shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Shared AllPairs token pipeline over a (__id, __sh) set frame:
    * per-document canonical rarest-first token sequence, emitted as
    * xxhash64 LONGS. Tokens travel the df aggregation and the
    * candidate equi-join as 8-byte hashes instead of shingle strings —
    * a multi-token shingle easily runs 20-40 bytes, so hashing shrinks
    * the two corpus-sized shuffles several-fold. Correctness is
    * untouched: a given token always maps to the same hash (no false
    * negatives — the completeness proof transfers verbatim), and a
    * hash collision between distinct tokens only ADDS a candidate
    * pair, which the exact rescore on the original shingle sets then
    * scores truthfully. The canonical order is (df-of-hash, hash,
    * token) — total and globally consistent, so per-document positions
    * are well-defined and the positional filter's first-shared-token
    * argument still holds; merging collided tokens' df counts can only
    * perturb ordering QUALITY (bucket sizes), never completeness.
    */
  private def orderedTokenHashes(sets: DataFrame): DataFrame = {
    val toks = sets
      .select(col("__id"), explode(col("__sh")).as("__tok"))
      .withColumn("__th", xxhash64(col("__tok")))
    val dfreq = toks.groupBy("__th").agg(count(lit(1)).as("__df"))
    toks
      .join(dfreq, "__th")
      .groupBy("__id")
      .agg(sort_array(collect_list(
        struct(col("__df"), col("__th"), col("__tok"))))
        .getField("__th").as("__ord"))
  }

  /** Containment of `a` in `b`: |Sa ∩ Sb| / |Sa|. */
  def containment(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / size(a)
  }

  /** EXACT directed containment join — the asymmetric sibling of
    * [[exactNearDupPairs]] for TEMPLATE detection: emit (a, b) whenever
    * |Sa ∩ Sb| / |Sa| ≥ t, i.e. document `a` is (mostly) contained in
    * document `b`. Jaccard misses this workload structurally: a 50-line
    * boilerplate header inside a 5 000-line page has near-zero Jaccard
    * but containment 1.0 — and boilerplate/template discovery over a
    * crawl is a containment question, not a similarity one.
    *
    * Prefix filtering adapts asymmetrically (Bayardo et al. WWW'07 §5):
    * a qualifying pair shares ≥ ceil(t·|a|) shingles, so the CONTAINED
    * side keeps the same rarest-first prefix of length
    * |a| − ceil(t·|a|) + 1 — but the containing side has no lower bound
    * on its own overlap fraction, so `b` indexes its FULL ordered
    * shingle list. Completeness: both sets are sorted by the same
    * global (df, tok) order, so the pair's first shared token is first
    * in both; it sits inside a's prefix (pigeonhole) and somewhere in
    * b's full postings — the equi-join cannot miss it. Two prunes run
    * inside the join, both necessary conditions of containment ≥ t:
    *  - size filter: |b| ≥ overlap ≥ ceil(t·|a|);
    *  - positional filter: a shared token at 0-based (px, py) caps
    *    overlap at min(|a|−px, |b|−py), which must reach ceil(t·|a|).
    *
    * Scale shape: identical shuffle count to [[exactNearDupPairs]] (one
    * df aggregation, one regroup, one equi-join) — the asymmetry costs
    * join fan-in, not shuffles: bucket sizes are df_prefix(tok)·df(tok)
    * instead of df_prefix², and rarest-first ordering keeps
    * df_prefix(tok) near zero exactly for the corpus-hot tokens whose
    * full postings are large. At crawl scale, partition the full-
    * postings side by set-size range on top of this (LSH Ensemble,
    * Zhu et al. VLDB'16) — the join condition already carries the size
    * filter that makes those partitions prunable.
    *
    * Output: (a, b, containment), a ≠ b, both directions evaluated
    * independently (containment is not symmetric).
    */
  def containmentJoinExact(
      docs: DataFrame,
      id: String,
      shingles: Column,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val sets = graft.core.LazyCheckpoint(docs
      .select(col(id).as("__id"), array_distinct(shingles).as("__sh"))
      .filter(size(col("__sh")) > 0))
    val ordered = orderedTokenHashes(sets)
    // contained side: rarest-first prefix; containing side: full list.
    // Both posexplode the same ordered array — one generator each, the
    // prefix is a slice of the same order, so positions line up.
    val full = ordered.select(
      col("__id"), size(col("__ord")).as("__n"),
      posexplode(col("__ord")).as(Seq("__pos", "__tok")))
    val prefixed = full.filter(
      col("__pos") < col("__n")
        - ceil(lit(threshold) * col("__n") - lit(1e-9)) + 1)
    val minOverlap = ceil(lit(threshold) * col("x.__n") - lit(1e-9))
    val cand = prefixed.as("x")
      .join(full.as("y"),
        col("x.__tok") === col("y.__tok") &&
          col("x.__id") =!= col("y.__id") &&
          col("y.__n") >= minOverlap &&
          least(col("x.__n") - col("x.__pos"), col("y.__n") - col("y.__pos"))
            >= minOverlap)
      .select(col("x.__id").as("a"), col("y.__id").as("b"))
      .distinct()
    cand
      .join(sets.select(col("__id").as("a"), col("__sh").as("__sha")),
        Seq("a"))
      .join(sets.select(col("__id").as("b"), col("__sh").as("__shb")),
        Seq("b"))
      .select(col("a"), col("b"),
        containment(col("__sha"), col("__shb")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Near-duplicate pairs: LSH candidates re-scored with exact
    * Jaccard and thresholded. The expensive exact comparison runs
    * only on the candidate set (linear-ish), not all pairs
    * (quadratic). Output: (a, b, jaccard) with a < b.
    */
  def nearDupPairs(
      docs: DataFrame,
      id: String,
      shingles: Column,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    // shingle ONCE (same discipline as [[exactNearDupPairs]]): the
    // distinct-shingle frame feeds signature banding and both rescore
    // sides — minhash over the distinct set equals minhash over the
    // raw bag, so candidates are unchanged
    val sets = graft.core.LazyCheckpoint(
      docs.select(col(id), array_distinct(shingles).as("__sh")))
    val cand = candidatePairs(sets, id, col("__sh"), numHashes, bands)
    cand
      .join(sets.select(col(id).as("a"), col("__sh").as("__sha")), Seq("a"))
      .join(sets.select(col(id).as("b"), col("__sh").as("__shb")), Seq("b"))
      .select(col("a"), col("b"), jaccard(col("__sha"), col("__shb"))
        .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Eval-set decontamination: drop every training document sharing
    * ANY word n-gram with the eval corpus — the standard leakage
    * guard before training (exact-substring flavor; near-dup leakage
    * is [[nearDupPairs]] against the eval side).
    *
    * Shape: the eval side's distinct n-grams are dimension-sized
    * (eval sets are small by definition) so the semi-join against the
    * exploded training shingles broadcasts; the anti-join back to the
    * training rows keys on `id`. Two equi-joins, nothing all-pairs;
    * the training text is shingled once, map-side.
    */
  def decontaminate(
      train: DataFrame, id: String, text: Column,
      eval: DataFrame, evalText: Column, n: Int = 5): DataFrame = {
    val evalGrams = eval
      .select(explode(Text.shingles(evalText, n)).as("__g"))
      .distinct()
    val contaminated = train
      .select(col(id), explode(Text.shingles(text, n)).as("__g"))
      .join(evalGrams, Seq("__g"), "left_semi")
      .select(id)
      .distinct()
    train.join(contaminated, Seq(id), "left_anti")
  }

  /** NEAR-duplicate eval-set decontamination: drop every training
    * document whose exact n-shingle Jaccard against ANY eval document
    * reaches `threshold` — the paraphrase-grade leakage guard the
    * exact-n-gram screen ([[decontaminate]]) misses (GPT-3 App. C /
    * Brown et al. 2020 run exactly this pair: substring overlap AND
    * near-dup overlap against benchmarks before training).
    *
    * Shape: CROSS-CORPUS LSH — both sides band with the SAME seeded
    * minhash ([[bandedBuckets]]), candidates come from the
    * (band, bucket) equi-join restricted to train×eval (never
    * train×train — this is what keeps the screen linear in the
    * corpus even when the corpus self-similar), and only candidates
    * pay the exact-Jaccard rescore. The eval side is dimension-sized
    * by definition, so its banded rows and shingle sets broadcast;
    * the verdict anti-joins back on `id`. Recall follows the LSH
    * S-curve (64/16 at t=0.8: ≥ 0.9998 per pair at the threshold,
    * →1 above it — same contract as [[nearDupPairs]], and a missed
    * borderline pair fails SAFE-ish for dedup but leaks here, so
    * raise numHashes before lowering the threshold if the eval set
    * is adversarial).
    */
  /** Per-document n-gram NOVELTY against a reference corpus — the
    * memorization/novelty audit (Carlini et al. 2021 extraction;
    * McCoy et al. 2021 RAVEN run the same statistic on generations):
    * for each probe document, how many of its distinct n-grams
    * already occur anywhere in the corpus. Near-zero novelty means
    * the document is assembled from corpus text (a memorized or
    * templated generation); the inverse direction of
    * [[decontaminate]] (which asks what the CORPUS leaks of an eval
    * set).
    *
    * Output per probe doc: (id, n_grams, n_known, n_novel,
    * novel_ppm) — exact integer counts, novelty share on the ppm
    * grid by integer division. Docs with fewer than n words have no
    * n-grams and are omitted (nothing to audit).
    *
    * Shape: the corpus's distinct grams are vocabulary-like (big but
    * sublinear in corpus bytes); the membership join shuffles on the
    * gram. At 100 TB swap the exact gram table for
    * [[graft.ops.Bloom]]'s broadcast bitset — novelty becomes a
    * LOWER bound (false positives deflate it) at zero shuffle.
    */
  def gramNovelty(
      probe: DataFrame, id: String, text: Column,
      corpus: DataFrame, corpusText: Column, n: Int = 5): DataFrame = {
    val corpusGrams = corpus
      .select(explode(Text.shingles(corpusText, n)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1L))
    probe
      .select(col(id),
        explode(array_distinct(Text.shingles(text, n))).as("__g"))
      .join(corpusGrams, Seq("__g"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_known"))
      .select(col(id), col("n_grams"), col("n_known"),
        (col("n_grams") - col("n_known")).as("n_novel"),
        expr("(n_grams - n_known) * 1000000 div n_grams")
          .as("novel_ppm"))
  }

  def decontaminateNear(
      train: DataFrame, id: String, text: Column,
      eval: DataFrame, evalId: String, evalText: Column,
      threshold: Double = 0.8, n: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val tSets = graft.core.LazyCheckpoint(train.select(
      col(id), array_distinct(Text.shingles(text, n)).as("__tsh")))
    val eSets = graft.core.LazyCheckpoint(eval.select(
      col(evalId).as("__eid"),
      array_distinct(Text.shingles(evalText, n)).as("__esh")))
    val tBanded = bandedBuckets(tSets, id, col("__tsh"), numHashes, bands)
    val eBanded = bandedBuckets(
      eSets.select(col("__eid"), col("__esh")), "__eid", col("__esh"),
      numHashes, bands)
    val cand = tBanded
      .join(broadcast(eBanded), Seq("band", "bucket"))
      .select(col(id), col("__eid")).distinct()
    val contaminated = cand
      .join(tSets, Seq(id))
      .join(broadcast(eSets), Seq("__eid"))
      .filter(jaccard(col("__tsh"), col("__esh")) >= threshold)
      .select(id).distinct()
    train.join(contaminated, Seq(id), "left_anti")
  }
}
