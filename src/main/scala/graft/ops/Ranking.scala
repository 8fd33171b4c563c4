package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical relevance scoring for training-data curation: TF-IDF term
  * weights (rare-term extraction, keyword quality signals) and BM25
  * query scoring (retrieval-style corpus filtering, e.g. "rank the
  * crawl against a topic query before sampling").
  *
  * Everything is native `functions._` over one explode + two
  * aggregations; the per-term statistics table is vocabulary-sized
  * (Zipf: orders of magnitude smaller than the corpus), so the
  * tf⋈df equi-join broadcasts under AQE when it fits and degrades to
  * a shuffle join when a 100 TB corpus's vocabulary doesn't.
  *
  * The corpus document count is a PARAMETER, not a hidden action: the
  * caller usually already knows it (or pays one columnar count()),
  * and keeping it explicit lets incremental pipelines feed a running
  * total instead of rescanning.
  */
object Ranking {

  /** Per-(doc, term) TF-IDF: raw term frequency times the smoothed
    * inverse document frequency `ln((N+1)/(df+1)) + 1` (the +1s keep
    * corpus-universal terms finite and positive). Output columns:
    * (id, term, tf, df, tfidf).
    *
    * Plan shape: explode → (doc, term) count → term-level count for
    * df — the df aggregation consumes the tf aggregation's OUTPUT
    * (not a second corpus scan), and the tf exchange is reused for
    * the join-back, so the corpus is tokenized exactly once.
    */
  def tfIdf(
      docs: DataFrame,
      id: String,
      tokens: org.apache.spark.sql.Column,
      docCount: Long): DataFrame = {
    val tf = docs
      .select(col(id), explode(tokens).as("term"))
      .groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .select(col(id), col("term"), col("tf"), col("df"),
        (col("tf") *
          (log((lit(docCount) + lit(1.0)) / (col("df") + lit(1.0)))
            + lit(1.0))).as("tfidf"))
  }

  /** Top-k TF-IDF terms per document on the bounded heap
    * ([[graft.plans.TopKPerGroup]] — O(n log k), no window sort).
    * Ties broken by xxhash64(term): deterministic run-to-run; a
    * within-document collision is astronomically unlikely and would
    * only swap two equal-scored terms. */
  def topTerms(scored: DataFrame, id: String, k: Int): DataFrame =
    graft.plans.TopKPerGroup.topK(
        scored.withColumn("__tie", xxhash64(col("term"))),
        Seq(id), "tfidf", "__tie", k)
      .drop("__tie")

  /** BM25 relevance of every matching document against a literal
    * query term set (Robertson/Spärck Jones; k1/b defaults are the
    * standard Okapi parameters). A query is human-sized, so the term
    * filter is a broadcast `isin` — the corpus-side scan stays
    * shuffle-free until the per-doc sum.
    *
    * Per-term contributions are summed by an ordered left-fold in
    * term-ascending order (`sort_array(collect_list)` + `aggregate`),
    * NOT a float `sum()`: floating-point addition is not associative,
    * so a plain sum's partial-merge order would make the score differ
    * run-to-run. The fold's addition order is a function of the data
    * alone — deterministic, and exactly reproducible by an oracle
    * that adds the same terms in the same order. (Decimal sums were
    * rejected: Spark casts double→decimal through the shortest
    * decimal string while DuckDB multiplies in binary, so the casts
    * themselves diverge — measured, see MEMORY.) A query is
    * human-sized, so per-doc lists are tiny. Output: (id, bm25) for
    * documents containing at least one query term.
    *
    * `avgDl` (mean token count per document) is a parameter for the
    * same reason `docCount` is — compute it once via
    * `docs.select(sum(size(tokens)), count(lit(1)))` and reuse.
    */
  def bm25(
      docs: DataFrame,
      id: String,
      tokens: org.apache.spark.sql.Column,
      query: Seq[String],
      docCount: Long,
      avgDl: Double,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "empty query")
    val tf = docs
      .select(col(id), size(tokens).cast("long").as("__dl"),
        explode(tokens).as("term"))
      .groupBy(col(id), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf
      .filter(col("term").isin(query: _*))
      .join(dfreq, "term")
      .select(col(id), col("term"),
        (log(lit(1.0) +
            (lit(docCount.toDouble) - col("df") + lit(0.5)) /
              (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgDl))))
          .as("__contrib"))
    contrib
      .groupBy(col(id))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("__contrib")))),
        lit(0.0),
        (acc, x) => acc + x.getField("__contrib")).as("bm25"))
  }

  /** The POSITIONAL inverted index: one (id, pos, term) row per token
    * occurrence. This is the persisted search artifact — build it
    * once (parquet, sorted/bucketed by term so a query's predicate
    * pushdown prunes to its own terms' row groups), query it many
    * times with [[phraseMatches]]. At 100 TB the index is what makes
    * phrase search affordable: query cost is the matched terms'
    * postings, never a corpus text rescan.
    */
  def positionalPostings(
      docs: DataFrame, id: String,
      tokens: org.apache.spark.sql.Column): DataFrame =
    docs.select(col(id), posexplode(tokens).as(Seq("pos", "term")))

  /** Exact phrase matching over a positional postings index
    * ([[positionalPostings]]): docs containing `phrase` as CONSECUTIVE
    * tokens, with the number of occurrences. The classic adjacency
    * intersection: anchor on the first term's postings, then for each
    * later term equi-join on (doc, start-aligned position) — term i
    * at position p matches a start at p − i.
    *
    * Scale shape: each join side is ONE term's postings (the `term =`
    * filter reaches the index scan as predicate pushdown), so the
    * L−1 joins move Σ postings(termᵢ) rows — for any phrase worth
    * searching, orders of magnitude under the corpus. Rarest-first
    * reordering is a further prune the caller can apply by passing
    * the phrase's df-sorted permutation; adjacency offsets make the
    * result order-independent so any permutation is correct.
    *
    * @return (id, n_matches) — one row per doc containing the phrase
    */
  def phraseMatches(
      postings: DataFrame, id: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val anchor = postings.filter(col("term") === phrase.head)
      .select(col(id), col("pos").as("__start"))
    phrase.zipWithIndex.drop(1).foldLeft(anchor) { case (acc, (t, i)) =>
      acc.join(
        postings.filter(col("term") === t)
          .select(col(id), (col("pos") - i).as("__start")),
        Seq(id, "__start"))
    }
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Integer-exact lexical ranking by tf-weighted query-term overlap:
    * score(q, d) = Σ_{t ∈ distinct(q)} tf_d(t) — the coordination-
    * match baseline (BM25 without the floating idf/length terms),
    * kept integer so hybrid fusion downstream ([[rrfFuse]]) stays
    * exact end-to-end. Use [[bm25]] when graded lexical relevance is
    * the product; use this when the ranking feeds a rank-level fusion
    * where only ORDER survives anyway.
    *
    * Scale shape: one postings aggregation over the corpus, one
    * broadcast join against the (request-sized) query term table, one
    * map-side-combined sum, top-k via the heap operator — no window
    * over the corpus. Self-matches (query doc retrieving itself) are
    * excluded, mirroring the dense rankers.
    *
    * @param queries (qid, tokens) — tokenized query docs, request-sized
    * @return (query_id, neighbor_id, overlap, rank), rank 1..k by
    *         (overlap desc, neighbor_id asc)
    */
  def lexicalOverlapTopK(
      docs: DataFrame, id: String, tokens: org.apache.spark.sql.Column,
      queries: DataFrame, qid: String,
      qtokens: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val tf = docs
      .select(col(id).as("neighbor_id"), explode(tokens).as("term"))
      .groupBy(col("neighbor_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val qt = broadcast(queries
      .select(col(qid).as("query_id"),
        explode(array_distinct(qtokens)).as("term")))
    val scored = tf.join(qt, "term")
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("tf")).as("overlap"))
      // the heap operator orders Double keys; long→double is exact
      // far past any real overlap sum (< 2^53)
      .withColumn("__score", col("overlap").cast("double"))
    graft.plans.TopKPerGroup.topK(
        scored, Seq("query_id"), "__score", "neighbor_id", k)
      .select("query_id", "neighbor_id", "overlap", "rank")
  }

  /** Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09) of N ranked
    * lists — the production hybrid-retrieval combiner (lexical ⊕
    * dense): rrf(q, d) = Σ_lists 1/(c + rank_i(q, d)), docs missing
    * from a list contribute nothing. Fusion happens at RANK level, so
    * incomparable score scales (BM25 floats vs cosine) never touch.
    *
    * EXACT arithmetic: the score is a rational with denominator
    * Π(c + rᵢ); both are computed as integers (`rrf_num`, `rrf_den`)
    * and only the final ordering divides them (two longs → the same
    * IEEE double on every engine). Overflow bound: Π(c+rᵢ) must fit a
    * long — fine for any sane (lists ≤ 8, c + k ≤ 10⁶) configuration.
    *
    * Scale shape: inputs are top-k lists (request × k rows); the
    * fusion is one union + one map-side-combined aggregation + the
    * heap top-k. Nothing here touches the corpus.
    *
    * @param lists each (query_id, neighbor_id, rank) — rank ≥ 1
    * @return (query_id, neighbor_id, rrf_num, rrf_den, fused_rank),
    *         fused_rank 1..k by (num/den desc, neighbor_id asc)
    */
  def rrfFuse(
      lists: Seq[DataFrame], k: Int, c: Long = 60L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val u = lists
      .map(_.select(col("query_id"), col("neighbor_id"),
        (col("rank").cast("long") + lit(c)).as("__t")))
      .reduce(_.unionByName(_))
    val fused = u
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sort_array(collect_list(col("__t"))).as("__ts"))
      .withColumn("rrf_den",
        aggregate(col("__ts"), lit(1L), (a, x) => a * x))
      .withColumn("rrf_num",
        // x divides den exactly, and den < 2^53 by the overflow bound
        // above, so the double division is exact before the cast back
        aggregate(col("__ts"), lit(0L),
          (a, x) => a + (col("rrf_den") / x).cast("long")))
      .withColumn("__score",
        col("rrf_num").cast("double") / col("rrf_den"))
    graft.plans.TopKPerGroup.topK(
        fused, Seq("query_id"), "__score", "neighbor_id", k)
      .withColumnRenamed("rank", "fused_rank")
      .select("query_id", "neighbor_id", "rrf_num", "rrf_den",
        "fused_rank")
  }

  /** Bradley-Terry strength fitting (Zermelo 1929; the Hunter 2004
    * MM update) over pairwise preference outcomes — arena-style
    * model ranking and reward-model data curation: given match rows
    * `(a, b, winner)`, estimate each player's strength. Exact ppm
    * integers, FIXED `iters` MM rounds, truncating division — the
    * oracle unrolls the identical rounds as materialized CTEs, so
    * the fit is bit-portable across engines and partitionings:
    *
    *   π⁰_i  = 10⁶
    *   t_ij  = (n_ij · 10¹²) div (π_i + π_j)
    *   π'_i  = (W_i · 10¹²) div Σ_j t_ij       (unchanged if Σ = 0)
    *   π_i   = (π'_i · P · 10⁶) div Σ π'       (mean re-pinned at 10⁶)
    *
    * Scale shape: ONE corpus aggregation collapses matches to the
    * (lo, hi, n, wins_lo) pair-count matrix; the MM fold runs over
    * those ≤ P² rows DRIVER-side (the Linkage.emFit device — the
    * collect is bounded by the loud `maxPlayers` require, default
    * 1000 → ≤ 1M cells). Counts are loudly bounded at 10⁶ total
    * matches so W·10¹² stays in int64 — BT is invariant under
    * jointly scaling W and n, so larger corpora pre-aggregate or
    * downscale counts upstream (documented, not silent).
    *
    * Self-matches (a = b) are dropped: they carry no information.
    * @return (player, wins, n_matches, strength_ppm)
    */
  def btStrengths(matches: DataFrame, a: String, b: String,
      winner: String, iters: Int = 10,
      maxPlayers: Int = 1000): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    val spark = matches.sparkSession
    val cells = matches
      .select(least(col(a), col(b)).as("lo"),
        greatest(col(a), col(b)).as("hi"), col(winner).as("w"))
      .filter(col("lo") =!= col("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("w") === col("lo"), 1L).otherwise(0L)).as("w_lo"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val players = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    require(players.length <= maxPlayers,
      s"btStrengths: ${players.length} players > maxPlayers=" +
        s"$maxPlayers — the pair-count fold is O(P²); raise the cap " +
        "deliberately or bucket players upstream")
    val total = cells.map(_._3).sum
    require(total <= 1000000L,
      s"btStrengths: $total matches > 1e6 — W·10¹² would overflow " +
        "int64; pre-aggregate or downscale counts (BT is invariant " +
        "under jointly scaling wins and match counts)")
    val Scale2 = 1000000000000L
    val wins = scala.collection.mutable.Map(
      players.map(_ -> 0L).toSeq: _*)
    val nm = scala.collection.mutable.Map(
      players.map(_ -> 0L).toSeq: _*)
    cells.foreach { case (lo, hi, n, wLo) =>
      wins(lo) += wLo; wins(hi) += n - wLo
      nm(lo) += n; nm(hi) += n
    }
    var s = players.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val denom = scala.collection.mutable.Map(
        players.map(_ -> 0L).toSeq: _*)
      cells.foreach { case (lo, hi, n, _) =>
        val t = n * Scale2 / (s(lo) + s(hi))
        denom(lo) += t; denom(hi) += t
      }
      val raw = players.map(p =>
        p -> (if (denom(p) > 0) wins(p) * Scale2 / denom(p) else s(p)))
      val ts = raw.map(_._2).sum
      val pc = players.length.toLong
      s = raw.map { case (p, v) => p -> v * pc * 1000000L / ts }.toMap
    }
    import spark.implicits._
    players.map(p => (p, wins(p), nm(p), s(p)))
      .toSeq.toDF("player", "wins", "n_matches", "strength_ppm")
  }

  /** Zipf-law fit per group: OLS slope of ln(freq) on ln(rank) over
    * the top `maxRank` terms — the corpus-health diagnostic next to
    * the per-source distinctive-terms table (natural prose sits near
    * slope −1; template/boilerplate slices flatten, spam steepens —
    * Zipf 1949; Piantadosi 2014 review). Output per group: (group, n,
    * num, den, slope) straight from [[TimeSeries.trendSlopes]]'s
    * exact cross-multiplied form.
    *
    * Float parity: ln is the ONLY libm term; both engines snap it to
    * the integer MICRO grid (`round(ln(x)·1e6)` as BIGINT — the
    * RankingQueries ulp note: StrictMath vs glibc disagree by ≤1 ulp
    * ~1e-16, so a micro-grid boundary flip needs an argument within
    * ~1e-10 of a half — negligible over ≤ maxRank·|groups| distinct
    * arguments). Every sum after the snap is exact (trendSlopes
    * aggregates in DECIMAL(38,0)); ONE IEEE division at the end.
    *
    * Rank ties break by term ascending (deterministic in both
    * engines); terms below `minFreq` drop before ranking so the fit
    * never chases the hapax tail the law does not cover.
    *
    * Scale shape: one tokenize scan → (group, term) count shuffle →
    * per-group top-maxRank window on the vocabulary-sized count table
    * → a ≤ maxRank·|groups| row OLS aggregate. Nothing all-pairs.
    */
  def zipfFit(
      docs: DataFrame, group: String,
      tokens: org.apache.spark.sql.Column,
      maxRank: Int = 200, minFreq: Long = 2L): DataFrame = {
    require(maxRank >= 2, s"zipfFit needs maxRank >= 2, got $maxRank")
    val freq = docs
      .select(col(group), explode(tokens).as("__w"))
      .groupBy(col(group), col("__w")).agg(count(lit(1)).as("__f"))
      .filter(col("__f") >= minFreq)
    val ranked = freq
      .withColumn("__rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(group))
          .orderBy(col("__f").desc, col("__w").asc)))
      .filter(col("__rank") <= maxRank)
    TimeSeries.trendSlopes(
      ranked, group,
      round(log(col("__rank").cast("double")) * lit(1e6), 0).cast("long"),
      round(log(col("__f").cast("double")) * lit(1e6), 0).cast("long"))
  }
}
