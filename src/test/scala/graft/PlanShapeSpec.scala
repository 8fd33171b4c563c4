package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan shapes that matter at 100 TB, so a future
  * refactor that silently doubles a fact scan, drops a broadcast, or
  * loses filter pushdown fails CI instead of shipping.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = WithSpark.session
  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String = scrubSpread(
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString)

  /** Drop the deliberate input-spread exchanges (Tables.spread — a
    * round-robin repartition whose child is the parquet scan, guide
    * §2.5 input-skew relief for single-row-group files) before the
    * shape assertions: the pins below guard against ACCIDENTAL
    * shuffles in the operator bodies, and the spread is scan-adjacent
    * by construction, never fires on well-split inputs, and is pinned
    * by its own test. Any repartition NOT directly over a FileScan
    * still counts.
    */
  private def scrubSpread(p: String): String = {
    val lines = p.linesIterator.toVector
    // scan-adjacent = only Filter/Project/ColumnarToRow between the
    // exchange and the FileScan (Catalyst rightly pushes the face's
    // own filters below the spread so the shuffle carries survivors)
    def scanAdjacent(i: Int): Boolean = {
      var j = i + 1
      while (j < lines.length && j <= i + 4 &&
        !lines(j).contains("FileScan") &&
        (lines(j).contains("Filter") || lines(j).contains("Project") ||
          lines(j).contains("ColumnarToRow")))
        j += 1
      j < lines.length && lines(j).contains("FileScan parquet")
    }
    lines.zipWithIndex.filterNot { case (l, i) =>
      l.contains("Exchange RoundRobinPartitioning") &&
        l.contains("REPARTITION_BY_NUM") && scanAdjacent(i)
    }.map(_._1).mkString("\n")
  }

  private def count(p: String, pat: String): Int =
    pat.r.findAllIn(p).length

  test("input spread: deficient single-row-group scans are round-robin " +
    "spread scan-adjacently (and only there)") {
    val raw = SparkEntry.queries("q_gopher_rules")(spark, d)
      .queryExecution.executedPlan.toString
    val lines = raw.linesIterator.toVector
    val idx = lines.indexWhere(l =>
      l.contains("Exchange RoundRobinPartitioning") &&
        l.contains("REPARTITION_BY_NUM"))
    assert(idx >= 0, "documents scan lost its input-spread exchange")
    assert(lines(idx + 1).contains("FileScan parquet"),
      "spread exchange must sit directly over the scan")
    assert(scrubSpread(raw).linesIterator
      .count(_.contains("Exchange")) == 0,
      "q_gopher_rules must stay shuffle-free beyond the input spread")
  }

  test("filters and projection reach the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)"))
    assert(count(p, "Exchange") == 0) // pure scan+filter: no shuffle
  }

  test("dimension joins broadcast; fact table is never shuffled for dims") {
    val p = plan("q_join_dims")
    assert(count(p, "BroadcastHashJoin") == 2)
    assert(count(p, "SortMergeJoin") == 0)
  }

  test("ontology expansion scans the fact side exactly once") {
    val p = plan("q_ontology_expand")
    assert(count(p, "customer.parquet") == 1)
  }

  test("donor index reads each of its inputs exactly once") {
    val p = plan("q_donor_index")
    // the diagnosis fact feeds two branches (diagnoses nest + per-donor
    // MONDO/ICD expansions), each of which scans it — anything beyond
    // those planned scans is a regression
    for (f <- Seq("donor.tsv", "phenotype.tsv", "file.tsv",
        "biospecimen.tsv", "sample_registration.tsv", "study.tsv",
        "treatment.tsv", "follow_up.tsv", "exposure.tsv", "family.tsv",
        "family_history.tsv")) {
      assert(count(p, f) == 1, s"$f scanned more than once")
    }
    assert(count(p, "diagnosis.tsv") <= 3, "diagnosis fact scan fan-out grew")
  }

  test("diagnosis branch: one fact scan, term lookups broadcast") {
    val p = plan("q_diagnosis_nest")
    // main categories resolve on the term dimension and broadcast back —
    // the diagnosis fact is scanned once and never shuffled for ontology
    assert(count(p, "diagnosis.tsv") == 1, "diagnosis fact scanned once")
    assert(count(p, "BroadcastHashJoin") >= 2) // mondo + icd lookups
  }

  test("study summary builds both category matrices from one donor⋈file scan") {
    // the eager localCheckpoint inside latticeUnpivot hides these scans
    // from q_study_summary's executed plan, so the single-scan property
    // is pinned on the un-checkpointed partial itself
    val fixtures = "/root/repo/src/test/resources/clinical"
    val p = graft.etl.Indexes
      .studySummaryPartial(
        graft.etl.Indexes.ClinicalInputs.fromDir(spark, fixtures))
      .queryExecution.executedPlan.toString
    assert(count(p, "file.tsv") == 1, "file.tsv scanned more than once")
    assert(count(p, "donor.tsv") == 1, "donor.tsv scanned more than once")
  }

  test("study index: one visible scan per fact outside the summary checkpoint") {
    val p = plan("q_study_index")
    // the summary subtree is checkpointed (one job, one scan of each
    // fact); the visible plan must scan donor/file once — for the
    // donor-nest and file-nest branches respectively
    assert(count(p, "file.tsv") == 1, "file.tsv re-scanned in study index")
    assert(count(p, "donor.tsv") == 1, "donor.tsv re-scanned in study index")
  }

  test("constructing a summary lattice launches no Spark job") {
    // the partial inside lattice() is localCheckpoint(eager = false):
    // an eager checkpoint would run (and block on) a job right here at
    // construction time, whose completion event must surface within
    // the poll window below — so "no new job id appears" pins laziness
    import org.apache.spark.sql.functions._
    // resolve the source first — parquet file listing / schema read
    // runs its own small jobs, which are read-construction cost, not
    // lattice-construction cost
    val orders = graft.core.Tables.load(spark, d, "orders")
    orders.count()
    // the status store is fed by the async listener bus: wait for the
    // count()'s own job events to drain so they can't masquerade as
    // lattice-construction jobs below
    def ids() = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    var before = ids()
    var stableSince = System.nanoTime()
    while (System.nanoTime() - stableSince < 500L * 1000 * 1000) {
      Thread.sleep(50)
      val now = ids()
      if (now != before) { before = now; stableSince = System.nanoTime() }
    }
    graft.ops.Summary.lattice(
      orders, Seq("o_orderstatus"), "o_orderpriority",
      Map("n_cust" -> col("o_custkey")))
    val deadline = System.nanoTime() + 1500L * 1000 * 1000
    while (System.nanoTime() < deadline) {
      val now = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
      assert((now -- before).isEmpty,
        "constructing lattice() ran a Spark job (eager checkpoint?)")
      Thread.sleep(100)
    }
  }

  test("knn top-k runs through the custom bounded-heap operator") {
    val p = plan("q_knn_topk")
    assert(p.contains("TopKPerGroup"))
    assert(!p.contains("Window"), "window sort crept back into top-k")
  }

  test("collocations and weighted sampling ride the bounded heap, " +
      "not a window sort") {
    for (q <- Seq("q_collocations", "q_weighted_sample")) {
      val p = plan(q)
      assert(p.contains("TopKPerGroup"), s"$q lost the custom operator")
      assert(!p.contains("Window"), s"window sort crept into $q")
    }
  }

  test("ADC scoring expressions stay inside whole-stage codegen") {
    // residualAdcCosine is a 96-lookup element_at chain — the shape
    // the project's notes flag as a codegen-explosion risk. Audited
    // (round 6): it COMPILES and rides inside a WholeStageCodegen
    // span. This pins that; a fallback to interpreted projection
    // (no star on the scoring Project) fails here. NOTE the plan must
    // be EXECUTED first: an unexecuted AdaptiveSparkPlanExec prints
    // its initial plan, which never shows codegen markers.
    val df = SparkEntry.queries("q_knn_ivfpq")(spark, d)
    df.queryExecution.toRdd.count()
    val lines = df.queryExecution.executedPlan.toString.split("\n")
    val starred = "\\*\\(\\d+\\)".r
    assert(lines.exists(l => l.contains("element_at") &&
        starred.findFirstIn(l).isDefined),
      "residual ADC scoring Project fell out of whole-stage codegen")
    assert(lines.exists(l => l.contains("graft_cosine") &&
        starred.findFirstIn(l).isDefined),
      "exact re-rank Project fell out of whole-stage codegen")
    // columnar pruning between the two list scans: the ADC pass must
    // read ONLY codes (16 B/row — the compression is the point), the
    // re-rank pass ONLY vector
    val reads = lines.filter(_.contains("ReadSchema"))
      .map(l => l.substring(l.indexOf("ReadSchema"))).distinct
    assert(reads.exists(r => r.contains("codes") && !r.contains("vector")),
      s"ADC scan no longer prunes the vector column:\n${reads.mkString("\n")}")
    assert(reads.exists(r => r.contains("vector") && !r.contains("codes")),
      s"re-rank scan no longer prunes the codes column:\n${reads.mkString("\n")}")
    assert(!reads.exists(r => r.contains("codes") && r.contains("vector")),
      s"a list scan reads BOTH codes and vector:\n${reads.mkString("\n")}")
  }

  test("epoch order: data path windows BY SHARD; the single-partition " +
      "window sees only the O(shards) MANIFEST counts (the corpus is " +
      "never re-read for offsets — round 16)") {
    val p = plan("q_epoch_order")
    assert(count(p, "SortMergeJoin") == 0) // offsets join back broadcast
    assert(count(p, "BroadcastHashJoin") == 1)
    // exactly ONE single-partition exchange, and it feeds from the
    // manifest's (shard, n_rows) metadata — never from row data: the
    // round-15 shape re-aggregated the corpus for counts (a full
    // re-decode on jsonl/tar stores); the manifest already holds them
    assert(count(p, "Exchange SinglePartition") == 1)
    assert(!p.contains("functions=[count(1)]"),
      "offsets must come from the manifest, not a corpus count pass")
    assert(p.contains("manifest/v_"),
      "the offsets side must scan the manifest")
    assert(p.contains("ReadSchema: struct<shard:int,n_rows:bigint>"))
    // the row-data window is partitioned on the shard id, and the
    // data scan is pruned to the id (+ the shard partition column)
    assert(count(p, "windowspecdefinition\\(shard") == 1)
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"))
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val p = plan("q_agg_pricing")
    assert(count(p, "HashAggregate") >= 2) // partial + final
    // Mixed distinct + non-distinct aggregates (countDistinct(l_orderkey)
    // alongside the sums): Spark's distinct-aggregate rewrite plans
    // partial → Exchange → Exchange → final. Two exchanges is the minimal
    // plan for this shape — three would mean the rewrite regressed.
    assert(count(p, "Exchange") == 2)
  }

  test("snapshot diff is ONE full-outer join, both scans filter-pushed") {
    val p = plan("q_snapshot_diff")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") == 1,
      "diff must be exactly one shuffle join")
    assert(count(p, "orders.parquet") == 2) // old + new side, once each
  }

  test("scd2 merge is ONE join (the generator emits both outputs)") {
    val p = plan("q_scd2_merge")
    // closed-history branch has no join at all; current⋈batch joins once
    assert(count(p, "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") == 1,
      s"scd2 must join current and batch exactly once:\n${p.take(1500)}")
    assert(p.contains("Generate"), "kept/opening generator missing")
  }

  test("sliding chunking is shuffle-free (map-side generator only)") {
    val p = plan("q_chunk_overlap")
    assert(count(p, "Exchange") == 0,
      s"chunking must not shuffle:\n${p.take(1500)}")
    assert(p.contains("Generate"), "chunk generator missing")
  }

  test("pmi generates pairs ONCE: consumers read the checkpointed " +
      "count frame, never re-scanning the corpus") {
    // Catalyst does NOT reuse the count aggregate's exchange across
    // the four consumers (measured: 6 corpus scans without the
    // checkpoint) — the LazyCheckpoint hides the single real scan
    // behind an ExistingRDD, so at most one (in practice zero) corpus
    // scan may be visible in the consuming plan
    val p = plan("q_pmi")
    assert(count(p, "documents.parquet") <= 1,
      s"pair generation re-scans the corpus:\n${p.take(2000)}")
    assert(p.contains("ExistingRDD"),
      "pair-count frame is no longer checkpointed")
  }

  test("gap fill scans the fact table exactly once") {
    val p = plan("q_gap_fill")
    // the bucket aggregate is checkpointed (spine + join both read it);
    // without it each consumer re-scans events.parquet
    assert(count(p, "events.parquet") <= 1,
      s"gapFill must aggregate the fact once:\n${p.take(1500)}")
    assert(p.contains("ExistingRDD"),
      "bucket aggregate is no longer checkpointed")
    assert(p.contains("Generate"), "spine sequence-explode missing")
  }

  test("outlier gate: moment frame broadcasts, verdict is map-side") {
    val p = plan("q_outliers")
    assert(count(p, "BroadcastHashJoin") == 1,
      "per-type moments must broadcast")
    assert(count(p, "SortMergeJoin") == 0)
  }

  test("LM scoring: train folds ONE checkpointed count frame; at most " +
      "the score pass re-reads the corpus") {
    // train's count frame feeds three consumers (bigram join, context
    // margin, vocab) — unchecked, each would re-scan documents and
    // re-generate every pair (the measured Cooccurrence trap). The
    // score pass legitimately scans the corpus once more for its own
    // bigram stream: ≤ 2 total, with the checkpoint visible
    val p = plan("q_perplexity")
    assert(count(p, "documents.parquet") <= 2,
      s"LM train must not re-scan per consumer:\n${p.take(2000)}")
    assert(p.contains("ExistingRDD"),
      "bigram count frame is no longer checkpointed")
  }

  test("covariance: ONE corpus pass through the typed moment kernel") {
    val p = plan("q_covariance")
    assert(count(p, "embeddings.parquet") <= 1,
      s"moment kernel must scan the corpus once:\n${p.take(2000)}")
    assert(p.contains("ExistingRDD"),
      "moment cells frame is no longer checkpointed")
    // the only join inputs are dim-sized partials — never a sort-merge
    assert(count(p, "SortMergeJoin") == 0)
  }

  test("random projection and pca projection stay shuffle-free " +
      "(map-side scan stages)") {
    val pj = plan("q_random_projection")
    assert(count(pj, "Exchange") == 0,
      s"JL projection must not shuffle:\n${pj.take(1500)}")
    val pc = plan("q_pca_project")
    // the axis is a driver-computed literal; the projection plan is a
    // single scan + project (the gram/power stages ran at build time)
    assert(count(pc, "Exchange") == 0,
      s"pca projection must not shuffle:\n${pc.take(1500)}")
  }

  test("sessionize: ONE exchange — lag probe, boundary sum, and " +
      "session aggregation all share the key partitioning") {
    // the groupBy key (user, session_idx) is a superset of the window
    // partition key, so its clustering is satisfied without a second
    // shuffle; a regression here doubles the op's cost at 100 TB
    val p = plan("q_sessionize")
    assert(count(p, "Exchange") == 1,
      s"sessionize must shuffle exactly once:\n${p.take(2000)}")
  }

  test("bucketed join: the only exchange is the final rollup's — " +
      "neither join side shuffles") {
    // both tables are bucketBy(16) on the join key, so the join reads
    // bucket n against bucket n directly (at fixture scale Catalyst
    // rightly broadcasts the dim side instead — a BroadcastExchange is
    // fine; a SHUFFLE of either input is not); a second hash exchange
    // appearing here means bucket metadata stopped lining up and the
    // layout's one-time write shuffle bought nothing
    val p = plan("q_bucketed_join")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"bucketed join must not shuffle its inputs:\n${p.take(2000)}")
    assert(p.contains("Bucketed: true"),
      "both scans must read bucket metadata")
  }

  test("int8 quantization is a pure fused scan stage (no exchange)") {
    // the 4x compression only pays if it rides the vector scan — a
    // shuffle appearing here means the codes stopped fusing into the
    // consumer and the corpus is being rewritten for nothing
    val p = plan("q_embed_quantize")
    assert(count(p, "Exchange") == 0,
      s"quantizeInt8 must not shuffle:\n${p.take(1500)}")
  }

  test("drift gates: fact rows aggregate to bin cardinality before " +
      "any join (map-side partial counts, filters pushed)") {
    val p = plan("q_drift_psi")
    // both slice counts are partial before their exchange — the only
    // row-scale work is two map-side-combined aggregations
    assert(count(p, "partial_count") >= 2,
      s"PSI slice counts must map-side combine:\n${p.take(2000)}")
    assert(p.contains("PushedFilters: [IsNotNull(event_type)"),
      "slice predicate must reach the parquet scan")
  }

  test("parquet footer-aggregate pushdown: COUNT/MIN/MAX answer from " +
      "row-group statistics, zero data pages read (DSv2 path)") {
    // at 100 TB a bare count/min/max should cost a metadata walk, not
    // a table scan — Spark's aggregate pushdown does exactly that when
    // the v2 parquet reader is active. Session confs are restored in
    // finally (the shared WithSpark session must not leak them).
    val conf = spark.conf
    val prevV1 = conf.get("spark.sql.sources.useV1SourceList")
    val prevPd = conf.get("spark.sql.parquet.aggregatePushdown", "false")
    try {
      conf.set("spark.sql.sources.useV1SourceList", "")
      conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val df = spark.read
        .parquet("/root/testdata/sf0.001/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count("*").as("n"),
          org.apache.spark.sql.functions.min("l_orderkey"),
          org.apache.spark.sql.functions.max("l_orderkey"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"aggregation did not push to the parquet footer:\n${p.take(2000)}")
      // and the numbers are still right
      assert(df.collect().head.getLong(0) == 60175L ||
        df.collect().head.getLong(0) > 0L)
    } finally {
      conf.set("spark.sql.sources.useV1SourceList", prevV1)
      conf.set("spark.sql.parquet.aggregatePushdown", prevPd)
    }
  }

  test("temperature mix: corpus scanned once for the filter; " +
      "rates broadcast back") {
    val p = plan("q_temperature_mix")
    // documents appears once for the rate aggregate and once for the
    // filtered read — never a third time
    assert(count(p, "documents.parquet") <= 2,
      "temperatureMix re-scans the corpus")
    assert(count(p, "BroadcastHashJoin") >= 1, "rates must broadcast")
    assert(count(p, "SortMergeJoin") == 0)
  }

  test("ngram diversity: two-level aggregate, no Expand, no join") {
    val p = plan("q_ngram_diversity")
    assert(!p.contains("Expand"), "countDistinct Expand crept in")
    assert(!p.contains("Join"), "diversity counts must not join")
    assert(count(p, "documents.parquet") == 1)
  }

  test("overlap matrix: one corpus scan; grams never re-join it") {
    val p = plan("q_overlap_matrix")
    assert(count(p, "documents.parquet") == 1,
      "contamination matrix must fold slice sets, not self-join grams")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "no join should appear at all")
  }

  test("mmr shortlist ranks on the bounded heap, not a window sort") {
    val p = plan("q_mmr_select")
    assert(p.contains("TopKPerGroup"), "shortlist lost the bounded heap")
    assert(!p.contains("Window"), "a window sort crept into the shortlist")
  }

  test("bootstrap resamples aggregate map-side (partial before the " +
      "exchange), one corpus scan") {
    val p = plan("q_bootstrap_ci")
    assert(count(p, "documents.parquet") == 1)
    // partial HashAggregate under the exchange = B rows per partition
    // on the wire, the op's scale contract. The plan prints root
    // first, so "under the exchange" = the final aggregate appears
    // BEFORE the exchange line and a partial aggregate AFTER it.
    val firstAgg = p.indexOf("HashAggregate")
    val firstEx = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstEx >= 0)
    assert(count(p, "HashAggregate") >= 2, "partial aggregate missing")
    assert(firstAgg < firstEx, "final aggregate not above the exchange")
    assert(p.indexOf("HashAggregate", firstEx) > firstEx,
      "no partial aggregate below the exchange — B rows ship per " +
        "input row instead of per partition")
  }

  test("cusum: all windows share ONE exchange on the key") {
    val p = plan("q_cusum")
    // cumulative sum + running min + the closed-form arithmetic run
    // over the same (key, order) partitioning — a second exchange
    // would mean a window stopped sharing it
    assert(count(p, "Exchange") == 1,
      s"cusum must shuffle once:\n${p.take(1500)}")
    assert(count(p, "events.parquet") <= 1)
  }

  test("gap interpolation still scans the fact table exactly once") {
    val p = plan("q_gap_interp")
    assert(count(p, "events.parquet") <= 1,
      "gapFillLinear must reuse gapFill's checkpointed bucket aggregate")
    assert(p.contains("ExistingRDD"))
  }

  test("t-closeness: the visible plan runs entirely on the " +
      "checkpointed contingency (the one fact scan happened inside " +
      "the eager checkpoint)") {
    val p = plan("q_t_closeness")
    assert(count(p, "orders.parquet") == 0,
      s"a consumer re-scans the fact side past the checkpoint:\n${p.take(1500)}")
    assert(p.contains("ExistingRDD"),
      "contingency frame is no longer checkpointed")
  }

  test("phrase search: each adjacency join side is a filtered slice " +
      "of the SAME tokenization (no per-term corpus rescan beyond " +
      "the two postings branches)") {
    val p = plan("q_phrase_search")
    // a 2-term phrase = anchor + one adjacency join; the in-memory
    // face derives postings twice (one branch per term) — a PERSISTED
    // postings table collapses this to predicate-pushed index reads
    assert(count(p, "documents.parquet") <= 2,
      s"phrase search re-derives postings per term:\n${p.take(1500)}")
    assert(p.contains("term")) // the per-term filter survived pushdown/codegen
  }

  test("rrf fusion: lexical arm reads the checkpointed tokenization; " +
      "dense arm scans embeddings at most twice (corpus + broadcast " +
      "query batch)") {
    val p = plan("q_rrf_fusion")
    assert(count(p, "documents.parquet") == 0,
      "lexical arm must read the LazyCheckpoint, not re-scan documents")
    assert(count(p, "embeddings.parquet") <= 2)
  }

  test("epoch plan: the corpus aggregates once into the checkpointed " +
      "domain table (caught re-aggregating per consumer before the pin)") {
    val p = plan("q_epoch_plan")
    assert(count(p, "documents.parquet") == 0,
      s"a consumer re-aggregates the corpus:\n${p.take(1200)}")
    assert(p.contains("ExistingRDD"))
  }

  test("label propagation: the per-round argmax is a map-side-combined " +
      "HASH aggregate — no Window, no SortAggregate in the plan") {
    val p = plan("q_label_prop")
    // the old row_number() form paid a per-partition SORT every round
    // on top of the exchange; a struct-keyed min_by would fall to
    // SortAggregate (immutable buffer) and re-pay it. The decimal-
    // packed ordering keeps the argmax in HashAggregate with a
    // partial (map-side) phase. Remaining Sort nodes belong to the
    // node-keyed SortMergeJoins, which the window form paid too.
    assert(count(p, "Window") == 0,
      s"LPA argmax regressed to a window:\n${p.take(1500)}")
    assert(count(p, "SortAggregate") == 0,
      s"LPA argmax fell out of hash aggregation:\n${p.take(1500)}")
    assert(p.contains("partial_min_by"),
      "argmax lost its map-side partial combine")
  }

  test("GraphStore read view: labels scan + BROADCAST rebase join — " +
      "no shuffle, no sort-merge (the export path must not repartition " +
      "corpus-scale state to resolve a dim-sized merge table)") {
    Seq("q_cc_store", "q_stream_components_store").foreach { q =>
      val p = plan(q)
      assert(count(p, "BroadcastHashJoin") >= 1,
        s"$q: rebase resolve lost its broadcast:\n${p.take(1200)}")
      assert(count(p, "SortMergeJoin") == 0,
        s"$q: read view fell to a sort-merge join:\n${p.take(1200)}")
      assert(count(p, "Exchange hashpartitioning") == 0,
        s"$q: read view shuffles the state:\n${p.take(1200)}")
    }
  }

  test("paragraph dedup's first-occurrence aggregate is a map-side-" +
      "combined HASH aggregate on the packed ordering scalar — no " +
      "Window, no SortAggregate (min(struct) has an immutable buffer " +
      "and would sort every paragraph row per partition)") {
    val p = plan("q_paragraph_dedup")
    assert(count(p, "Window") == 0,
      s"keep-first regressed to a window:\n${p.take(1500)}")
    assert(count(p, "SortAggregate") == 0,
      s"first-occurrence min fell out of hash aggregation:\n${p.take(1500)}")
    assert(p.contains("partial_min"),
      "first-occurrence min lost its map-side partial combine")
  }

  test("calibration bins are ONE hash-aggregate shuffle keyed by the " +
      "bin; kappa reuses the contingency-cell exchange for both margins") {
    val pc = plan("q_calibration")
    assert(count(pc, "Exchange") == 1 && count(pc, "HashAggregate") >= 2,
      s"calibration grew beyond one bin-keyed shuffle:\n${pc.take(1200)}")
    // every downstream consumer (totals, both margins) must read the
    // CHECKPOINTED cell frame, never the corpus: the checkpoint exists
    // so the null-cell filter cannot push an expensive label
    // expression into the parquet scan's data filters (where it gets
    // no subexpression elimination — measured 5.3 s vs 0.9 s at sf0.1)
    val pk = plan("q_kappa")
    assert(count(pk, "documents.parquet") == 0,
      s"a kappa consumer re-scans the corpus instead of the " +
        s"checkpointed cells:\n${pk.take(1500)}")
    assert(pk.contains("ExistingRDD"),
      "kappa lost its checkpointed cell frame")
  }

  test("blocklist gates are ONE codegen'd corpus scan each: the " +
      "blocklist is an in-plan array literal, no join, no exchange") {
    Seq("q_blocklist", "q_blocklist_phrases").foreach { q =>
      val p = plan(q)
      assert(count(p, "documents.parquet") == 1,
        s"$q: expected exactly one corpus scan:\n${p.take(1200)}")
      assert(count(p, "Join") == 0,
        s"$q: the broadcast-literal blocklist grew a join:\n${p.take(1200)}")
      assert(count(p, "Exchange") == 0,
        s"$q: a map-side filter should not shuffle:\n${p.take(1200)}")
    }
  }

  test("the Gopher rule gate is ONE codegen'd corpus scan: all seven " +
      "rules are scalar expressions — no join, no exchange") {
    val p = plan("q_gopher_rules")
    assert(count(p, "documents.parquet") == 1,
      s"q_gopher_rules: expected exactly one corpus scan:\n${p.take(1200)}")
    assert(count(p, "Join") == 0 && count(p, "Exchange") == 0,
      s"q_gopher_rules: a per-row rule gate must not join or " +
        s"shuffle:\n${p.take(1200)}")
  }

  test("chat validation is ONE hash exchange with map-side partial " +
      "collect; the documents scan is column-pruned") {
    val p = plan("q_chat_validate")
    assert(count(p, "Exchange") == 1,
      s"q_chat_validate grew beyond one shuffle:\n${p.take(1200)}")
    assert(p.contains("partial_collect_list"),
      "turn collection lost its map-side partial aggregation")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "documents scan reads more than (doc_id, text)")
  }

  test("chat mask spans: one exchange, both running sums share one " +
      "window") {
    val p = plan("q_chat_mask")
    assert(count(p, "Exchange") == 1,
      s"q_chat_mask grew beyond one shuffle:\n${p.take(1200)}")
    assert(count(p, "Window") == 1,
      "the two cumulative sums no longer share a single Window node")
  }

  test("KMV sketch plans TakeOrderedAndProject, never a global sort " +
      "exchange") {
    val p = plan("q_kmv_distinct")
    assert(p.contains("TakeOrderedAndProject"),
      s"KMV lost the bounded top-k plan:\n${p.take(1200)}")
    assert(!p.contains("rangepartitioning"),
      s"KMV must not range-shuffle the corpus for k rows:\n${p.take(1200)}")
  }

  test("session paths: the per-session aggregation reuses the window " +
      "exchange; only the dim-sized path count shuffles again") {
    val p = plan("q_session_paths")
    assert(count(p, "Exchange") == 2,
      s"q_session_paths grew beyond two shuffles:\n${p.take(1200)}")
    assert(count(p, "hashpartitioning\\(user_id") == 1,
      "the (user, sid) aggregation no longer reuses the user exchange")
  }

  test("preference pairs are one hash aggregation — no window sort, " +
      "no self-join") {
    val p = plan("q_pref_pairs")
    assert(count(p, "Join") == 0 && count(p, "Window") == 0,
      s"q_pref_pairs must stay a single groupBy:\n${p.take(1200)}")
    assert(count(p, "Exchange") == 1,
      s"q_pref_pairs grew beyond one shuffle:\n${p.take(1200)}")
  }

  test("hard negatives: corpus scanned once beside the broadcast " +
      "query batch; map-side partial heap below ONE k-sized exchange") {
    val p = plan("q_hard_negatives")
    assert(count(p, "embeddings.parquet") == 2, // corpus + query sides
      "embedding scan fan-out grew")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]"),
      "query-batch filter no longer pushed to the scan")
    assert(count(p, "TopKPerGroupPartial") == 1 &&
      count(p, "Exchange hashpartitioning") == 1,
      "bounded-heap partial/final split lost")
    assert(count(p, "SortMergeJoin") == 0)
  }

  test("log-histogram sketch: one fact scan, bounded-state exchanges, " +
      "never a single-partition window funnel") {
    val p = plan("q_loghist_quantile")
    assert(count(p, "lineitem.parquet") == 1)
    assert(count(p, "Exchange SinglePartition") == 0)
    assert(count(p, "Exchange hashpartitioning") <= 2,
      "sketch agg + bucket-table window must stay two exchanges")
  }

  test("hilbert index is pure map-side: zero exchanges, one scan") {
    val p = plan("q_hilbert")
    assert(count(p, "Exchange") == 0, "hilbert must not shuffle")
    assert(count(p, "lineitem.parquet") == 1)
  }

  test("IVM refresh consumes the diff ONCE: exactly two full-outer " +
      "joins (the diff itself + the state merge)") {
    val p = plan("q_ivm_agg")
    // a two-branch delta expansion re-plans the diff's full-outer
    // join per side — the single-pass explode keeps it at two
    assert(count(p, "FullOuter") == 2,
      s"diff plan fan-out changed:\n${p.take(1500)}")
  }

  test("theil-sen: the bounded daily-series self-join broadcasts; " +
      "no sort-merge pair join") {
    val p = plan("q_theil_sen")
    assert(count(p, "BroadcastHashJoin") == 1)
    assert(count(p, "SortMergeJoin") == 0)
  }
}
