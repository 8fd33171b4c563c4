package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Token co-occurrence counts + pointwise mutual information — the
  * classic distributional-statistics table (word2vec/GloVe-style
  * pipelines train FROM this; collocation mining reads it directly).
  * Not in the reference's inventory; a training-data engine needs it.
  *
  * Formulation: for each token position i, the DIRECTED partners are
  * the next `window` tokens. Pair generation is entirely map-side —
  * nested array HOFs (`transform` over positions × a `slice` of
  * partners) build each document's pair list inside one projection; no
  * self-join, no positional explode, no second scan of the corpus. The
  * only corpus-sized shuffle is the (a, b) count aggregation (map-side
  * combined). Margins and the grand total derive from the pair-count
  * frame itself — vocabulary-sized (Zipf), so AQE broadcasts them when
  * they fit; the total is a one-row broadcast carrier.
  *
  * PMI uses the pair space's own margins: with N = Σ n_ab,
  * n_a• = Σ_b n_ab, n_•b = Σ_a n_ab,
  *
  *   pmi(a,b) = ln( n_ab · N / (n_a• · n_•b) )
  *
  * computed double-exactly (every product < 2^53) and rounded to the
  * 9-decimal grid, the project's convention for a correctly-rounded
  * transcendental shared with the DuckDB oracle (see q_bm25).
  *
  * `minCount` drops pairs with n_ab below it BEFORE the margin
  * computation would be wrong — margins aggregate the FULL count frame
  * first, then the filter applies, so rare-pair removal never skews
  * the denominators.
  */
object Cooccurrence {

  /** Directed within-window co-occurrence counts: (a, b, n_ab) where
    * `b` follows `a` within `window` positions. Pair generation is
    * map-side array HOFs (no self-join); one count shuffle. The
    * building block under [[pmi]] and the TextRank token graph. */
  def pairCounts(
      docs: DataFrame,
      tokens: Column,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val toks = docs.select(tokens.as("__t")).filter(size(col("__t")) >= 2)
    // positions 0..n-2 (1-based element i+1); partners are the slice
    // (i+2 .. i+1+window), clipped at the array end by slice itself
    val pairs = toks.select(explode(flatten(transform(
      sequence(lit(0), size(col("__t")) - 2),
      i => transform(
        slice(col("__t"), i + lit(2), lit(window)),
        b => struct(element_at(col("__t"), (i + 1).cast("int")).as("a"),
          b.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
    pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
  }

  def pmi(
      docs: DataFrame,
      tokens: Column,
      window: Int,
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    // the pair-count frame feeds FOUR consumers (margins ×2, total,
    // output join); without a materialization each one re-scans the
    // corpus and re-generates every pair — Catalyst does not reuse the
    // aggregate exchange across the branches (measured: 6 corpus scans
    // unchecked, 1 with the checkpoint; PlanShapeSpec pins it)
    val cnt = graft.core.LazyCheckpoint(pairCounts(docs, tokens, window))
    val ma = cnt.groupBy("a").agg(sum("n_ab").as("n_a"))
    val mb = cnt.groupBy("b").agg(sum("n_ab").as("n_b"))
    val total = cnt.agg(sum("n_ab").as("n"))
    cnt
      .join(ma, "a")
      .join(mb, "b")
      .crossJoin(broadcast(total))
      .filter(col("n_ab") >= minCount)
      .select(col("a"), col("b"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("n")
          / (col("n_a") * col("n_b"))), 9).as("pmi"))
  }
}
