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
}
