package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide plan regression net: every registered query's physical
  * plan is screened for the scale-killers — accidental cartesian
  * products and nested-loop joins. Queries that legitimately use a
  * bounded cross product are allowlisted with the reason; anything
  * new that plans one fails here instead of shipping a quadratic
  * plan to the 100 TB cluster.
  */
class PlanSweepSpec extends AnyFunSuite {
  private lazy val spark = WithSpark.session
  private val d = "/root/testdata/sf0.001"

  // query -> why a cross/nested-loop shape is intended and bounded
  private val allowedCross: Map[String, String] = Map(
    "q_join_cross" -> "the operator under test: broadcast dimension universe",
    "q_store_card" -> ("one-row card × one-row modal-language frame, " +
      "broadcast by construction (storeCard's dim-sized argmax)"),
    "q_store_profile" -> ("one-row manifest totals × one-row KMV " +
      "estimate × one-row quantile pivot — merged-sketch carriers, " +
      "KB-sized whatever the store size"),
    "q_profile_refresh" -> ("same one-row merged-sketch carriers as " +
      "q_store_profile (the read view is shared)"),
    "q_summary_lattice" -> "universe = groups x broadcast(categories), both dimension-sized",
    "q_study_summary" -> "same lattice universe construction per matrix",
    "q_study_index" -> "embeds the study summary lattice",
    "q_embed_neardup" -> "documented exact all-pairs baseline, block-partitioned",
    "q_knn_topk" -> "brute-force baseline: corpus x broadcast(query batch)",
    "q_knn_int8" -> "compressed int8 scan: corpus x broadcast(query batch)",
    "q_hard_negatives" ->
      ("cross-label mining is the knn_topk shape — corpus x " +
        "broadcast(query batch), label-mismatch in the join filter; " +
        "IVF-probe the corpus side at scale like positive retrieval"),
    "q_maxsim" -> "late-interaction scan: corpus x broadcast(query batch)",
    "q_knn_pq" -> "compressed ADC scan: code table x broadcast(query batch)",
    "q_knn_ivfpq" -> "one-row broadcast tables frame (data, not plan literals)",
    "q_bloom_novel" -> "bitset rides a ONE-row broadcast frame (crossJoin by construction)",
    "q_bloom_join" -> "same one-row broadcast bitset gate before the equi-join",
    "q_pmi" -> "grand-total N rides a ONE-row broadcast carrier into the score",
    "q_collocations" -> "embeds q_pmi's one-row grand-total carrier",
    "q_perplexity" -> "vocab size V rides a ONE-row broadcast carrier into the score",
    "q_kappa" ->
      "two ONE-row aggregates (totals, pe_num) meet on a broadcast carrier",
    "q_krippendorff" ->
      "two ONE-row aggregates (totals, do_num) meet on a broadcast carrier",
    "q_bitext_mine" ->
      ("both mining passes are the knn_topk shape — corpus x " +
        "broadcast(query batch); IVF-probe each corpus side at scale"),
    "q_bitext_eval" -> "embeds q_bitext_mine's two mining passes",
    "q_conformal_gate" ->
      ("the ONE-row conformal threshold rides a broadcast carrier " +
        "into the test-slice keep count"),
    "q_release_gate" ->
      "embeds q_conformal_gate's one-row threshold carrier",
    "q_chi2_drift" ->
      ("the completed margin grid is cats x slices — two label-sized " +
        "frames — plus the one-row totals carrier"),
    "q_kn_perplexity" ->
      "bigram-type total T and vocab V ride a ONE-row broadcast carrier into the score",
    "q_dsir_select" ->
      "both LM scores carry q_perplexity's one-row vocab-size V broadcast carrier",
    "q_covariance" -> "row count n rides a ONE-row broadcast carrier into the moments",
    "q_pca_project" -> "embeds q_covariance's one-row n carrier",
    "q_pagerank_directed" ->
      "dangling mass D rides a ONE-row broadcast carrier into each round",
    "q_drift_psi" -> "PSI totals (n_ref, n_cur, B) ride a ONE-row broadcast carrier",
    "q_drift_total" -> "embeds q_drift_psi's one-row totals carrier",
    "q_drift_lang" -> "same one-row PSI totals carrier over string bins",
    "q_equidepth" -> "row count n rides a ONE-row broadcast carrier into the bin arithmetic",
    "q_cutpoint_binning" ->
      "reference cutpoints ride a ONE-row broadcast frame into the map-side stamp",
    "q_drift_ks" -> "KS totals (n_ref, n_cur) ride a ONE-row broadcast carrier",
    "q_drift_quantile" ->
      "cutpoints + PSI totals each ride ONE-row broadcast carriers",
    "q_expectations" ->
      ("n_rows and the FK orphan count are both ONE-row aggregates " +
        "crossed into the report row"),
    "q_ann_recall" ->
      "embeds the brute-force ideal set: corpus x broadcast(query batch)",
    "q_ann_mrr" ->
      "embeds the brute-force ideal set: corpus x broadcast(query batch)",
    "q_rerank" ->
      "stage-1 shortlist is the brute-force scan: corpus x broadcast(queries)",
    "q_mmr_select" ->
      ("relevance stage is the brute-force scan: corpus x " +
        "broadcast(query batch); feed from ivfTopK at corpus scale"),
    "q_ann_ndcg" ->
      "embeds the brute-force ideal set: corpus x broadcast(query batch)",
    "q_rrf_fusion" ->
      ("dense arm is the brute-force scan: corpus x broadcast(query " +
        "batch); feed from ivfTopK at corpus scale — the fusion itself " +
        "only touches top-k lists"),
    "q_t_closeness" ->
      ("the (group x value) lattice is dim-sized aggregates crossed " +
        "(missing cells must still contribute); corpus total N rides a " +
        "ONE-row broadcast carrier"),
    "q_perm_test" ->
      "the observed sum rides a ONE-row broadcast carrier into the exceedance count",
    "q_epoch_plan" ->
      "domain count |S| rides a ONE-row broadcast carrier into the per-domain arithmetic",
    "q_ann_dim_curve" ->
      ("four brute-force scans (one per truncation width): corpus x " +
        "broadcast(query batch); at corpus scale feed per-dim IVF " +
        "shortlists — the curve arithmetic is rank-level only"),
    "q_cluster_eval" ->
      ("the four scalar aggregates of the contingency table (totals, " +
        "per-cluster, per-label) ride ONE-row broadcast carriers into " +
        "the single score row"),
    "q_blocking_recall_sampled" ->
      ("the recall CI denominator rides a ONE-row broadcast aggregate " +
        "(stratum totals collapsed to a single row) crossed into the " +
        "per-resample estimates — both sides provably one row"),
    "q_index_refresh" ->
      ("the category universe rides a ONE-row broadcast aggregate " +
        "(collect_set collapsed to one row) crossed into the changed-" +
        "study summaries — replaces the former driver collect"),
    "q_index_refresh_stored" ->
      ("the store's read view patches docs against the dim-sized " +
        "universe side table collapsed to a ONE-row broadcast " +
        "aggregate — the virtual zero-fill carrier"),
    "q_benford" ->
      ("the digit-share denominator rides a ONE-row broadcast " +
        "aggregate (total count) crossed into the 9-row digit table"),
    "q_distinct_terms" ->
      ("the corpus token total rides a ONE-row broadcast aggregate " +
        "crossed into the (source, token) lift computation"),
    "q_transitivity" ->
      ("two ONE-row broadcast aggregates (triangle count, wedge sum) " +
        "crossed into the single summary row"))

  test("no unplanned CartesianProduct / BroadcastNestedLoopJoin " +
      "in any registered query") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, d).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val crossy = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (crossy && !allowedCross.contains(name)) offenders += name
    }
    assert(offenders.isEmpty,
      s"unplanned cross-product shapes in: ${offenders.mkString(", ")}")
  }
}
