package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diversity-aware selection over embeddings — Maximal Marginal
  * Relevance (Carbonell & Goldstein, SIGIR'98): pick k items that are
  * RELEVANT to a query but not redundant with each other. The
  * data-curation face of retrieval: "give me k exemplar documents per
  * topic" / "diversify the RAG shortlist before the context window"
  * (no reference counterpart — SURVEY.md §8 extension surface).
  *
  *   pick_r = argmax_{d ∉ S} [ λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) ]
  *
  * Determinism contract: vector components snap to the 1e-6 grid
  * ([[GridScale]], the Projection/Linalg micro-unit device), so every
  * relevance and pairwise similarity is an EXACT integer (|component|
  * ≲ 1e6 ⇒ |term| ≲ 1e12, ×dim ≪ 2^53 — exact in IEEE double AND in
  * BIGINT, associative, partition-order independent). λ enters as the
  * rational `lambdaNum/lambdaDen`, so scores are exact integers too:
  * `mmr_u = lambdaNum·rel_u − (lambdaDen−lambdaNum)·maxsim_u`. Ties
  * break by candidate id ascending at every step. The DuckDB oracle
  * replays shortlist, pair sims, and each greedy round as unrolled
  * CTEs bit-for-bit.
  *
  * Scale shape: relevance scoring is a broadcast-join map-side scan
  * (queries broadcast; at corpus scale feed the shortlist from
  * [[Similarity.ivfTopK]] instead — the greedy stage only sees
  * `shortlist` rows per query either way). The shortlist ranks through
  * the bounded-heap [[graft.plans.TopKPerGroup]] (map-side heaps under
  * the exchange — a hot query never funnels the corpus through one
  * task). The greedy itself runs per query group over AT MOST
  * `shortlist` candidates — O(k·shortlist·dim) work and
  * O(shortlist·dim) state per group, bounded by construction; query
  * groups spread across executors, so 10^6 queries = 10^6 independent
  * bounded tasks, never an all-pairs blow-up.
  */
object Diversity {

  /** 1e-6 snap grid: exact-integer dots for UNIT-SCALE components
    * (|x| ≲ 1 ⇒ snapped ≲ 1e6 ⇒ per-term product ≲ 1e12) up to
    * dim ≤ 512 with wide headroom under both 2^53 and Long.MaxValue.
    * Larger-magnitude embeddings must be normalized first — a 1e3
    * component would overflow both envelopes. */
  val GridScale = 1000000L

  /** Components snapped to the grid, kept as integer-valued doubles
    * (what both `list_dot_product` and [[graft.plans.DotProduct]] sum
    * exactly). */
  def snapMicro(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(GridScale.toDouble)))

  /** MMR-select `k` of the top-`shortlist` corpus items per query.
    *
    * Contract: queries are identified by the SAME id space as the
    * corpus — the self-pair exclusion is `query_id =!= neighbor_id`,
    * so an external query frame whose ids collide with unrelated
    * corpus ids would silently drop those candidates. Re-key external
    * queries into a disjoint range (e.g. negative ids) first.
    *
    * @return (query_id, rank, neighbor_id, mmr_u) — `mmr_u` the exact
    *         integer score at selection time (rank 1 pays no
    *         redundancy penalty: `mmr_u = lambdaNum·rel_u`).
    */
  def mmrSelect(
      corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      shortlist: Int, k: Int,
      lambdaNum: Long = 7L, lambdaDen: Long = 10L): DataFrame = {
    require(shortlist >= k && k >= 1, s"need shortlist >= k >= 1")
    require(lambdaDen >= lambdaNum && lambdaNum >= 0,
      s"lambda = $lambdaNum/$lambdaDen must lie in [0, 1]")
    val q = broadcast(queries.select(
      col(id).cast("long").as("query_id"), snapMicro(col(vec)).as("__qv")))
    val c = corpus.select(
      col(id).cast("long").as("neighbor_id"), snapMicro(col(vec)).as("__cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.plans.DotProduct.dot(col("__qv"), col("__cv")).as("rel_d"),
        col("__cv"))
    val short = graft.plans.TopKPerGroup.topK(
        scored, Seq("query_id"), "rel_d", "neighbor_id", shortlist)
      .select(col("query_id"), col("neighbor_id"),
        col("rel_d").cast("long").as("rel_u"),
        col("__cv").cast("array<double>").as("__cv"))

    mmrGreedy(short, k, lambdaNum, lambdaDen)
  }

  /** Diversify an EXISTING shortlist — the composition point for the
    * ANN index faces: feed (query_id, neighbor_id) pairs from
    * [[Similarity.ivfQuery]] (or any retrieval stage) and re-rank them
    * MMR-greedily. Vectors re-fetch through one equi-join against the
    * corpus (shortlist-sized probe side), relevance recomputes as the
    * exact snapped-integer dot, so the greedy is bit-identical whether
    * the shortlist came from brute force or an index.
    */
  def mmrRescore(
      pairs: DataFrame, corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int,
      lambdaNum: Long = 7L, lambdaDen: Long = 10L): DataFrame = {
    val q = broadcast(queries.select(
      col(id).cast("long").as("query_id"), snapMicro(col(vec)).as("__qv")))
    val c = corpus.select(
      col(id).cast("long").as("neighbor_id"), snapMicro(col(vec)).as("__cv"))
    val short = pairs
      .select(col("query_id").cast("long").as("query_id"),
        col("neighbor_id").cast("long").as("neighbor_id"))
      // a retrieval stage that unions probe lists may repeat a pair;
      // a duplicate candidate pays no redundancy penalty against its
      // own copy, so it would be selected at two ranks — dedupe here
      .distinct()
      // self-retrieval keeps the query as its own top hit; mmrSelect
      // never generates self-pairs, so drop them here too to keep the
      // two entry points' greedy results identical for that input class
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(c, "neighbor_id")
      .join(q, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        graft.plans.DotProduct.dot(col("__qv"), col("__cv"))
          .cast("long").as("rel_u"),
        col("__cv").cast("array<double>").as("__cv"))
    mmrGreedy(short, k, lambdaNum, lambdaDen)
  }

  /** The greedy stage over a prepared shortlist frame
    * (query_id, neighbor_id, rel_u, __cv snapped): per query group —
    * bounded state, integer arithmetic, ties by id. */
  private def mmrGreedy(
      short: DataFrame, k: Int,
      lambdaNum: Long, lambdaDen: Long): DataFrame = {
    val spark = short.sparkSession
    import spark.implicits._
    val penNum = lambdaDen - lambdaNum
    short.as[(Long, Long, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, rows) =>
        val cand = rows.map { case (_, did, rel, v) =>
          (did, rel, v.map(_.toLong).toArray)
        }.toArray.sortBy { case (did, rel, _) => (-rel, did) }
        val n = cand.length
        val used = new Array[Boolean](n)
        // max sim to the selected set; meaningless until a pick exists
        val maxSim = Array.fill(n)(Long.MinValue)
        val out = Seq.newBuilder[(Long, Int, Long, Long)]
        var r = 1
        while (r <= math.min(k, n)) {
          var best = -1
          var bestScore = Long.MinValue
          var i = 0
          while (i < n) {
            if (!used(i)) {
              val pen = if (r == 1) 0L else maxSim(i)
              val sc = lambdaNum * cand(i)._2 - penNum * pen
              if (best < 0 || sc > bestScore ||
                  (sc == bestScore && cand(i)._1 < cand(best)._1)) {
                best = i; bestScore = sc
              }
            }
            i += 1
          }
          used(best) = true
          out += ((qid, r, cand(best)._1, bestScore))
          val bv = cand(best)._3
          i = 0
          while (i < n) {
            if (!used(i)) {
              var s = 0L
              var j = 0
              val av = cand(i)._3
              while (j < av.length) { s += av(j) * bv(j); j += 1 }
              if (s > maxSim(i)) maxSim(i) = s
            }
            i += 1
          }
          r += 1
        }
        out.result().iterator
      }
      .toDF("query_id", "rank", "neighbor_id", "mmr_u")
  }

  /** Farthest-first (k-center greedy, Gonzalez 1985) coreset
    * selection over an embedding column — the QUERY-FREE complement
    * to [[mmrSelect]]: pick k documents that together COVER the
    * corpus in embedding space (diverse exemplars for annotation,
    * eval-set seeding, per-cluster prototypes). The greedy 2-approx
    * of the k-center objective: start from the smallest id, then
    * repeatedly take the point FARTHEST from everything selected.
    *
    * Determinism: squared L2 on 1e-6-snapped components is an exact
    * integer (≤ 4e12 per term, ×dim ≪ 2^53), computed as
    * d²(a,b) = a·a − 2a·b + b·b from three exact dots; ties break to
    * the smaller id. The emitted `radius_sq` (the chosen point's
    * distance from the prior centers) is the k-center coverage radius
    * curve — how well k centers cover the corpus, exact.
    *
    * Scale shape: per round ONE map-side pass (distance to the single
    * new center, a LITERAL vector in the plan — no join) updating the
    * running min-distance column, then ONE bounded-heap argmax
    * ([[graft.plans.TopKPerGroup]] with its partial/final pair, so
    * the constant group never funnels the corpus through one task).
    * The driver holds k rows total (the centers) — dictionary-sized
    * by construction. k rounds = k passes; the running-min column is
    * checkpointed each round so lineage stays flat.
    */
  def kCenterGreedy(
      corpus: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus
      .select(col(id).cast("long").as("__id"), snapMicro(col(vec)).as("__v"))
      .localCheckpoint()
    def d2To(center: Array[Double]): Column = {
      val c = typedlit(center.toSeq)
      val dot = graft.plans.DotProduct.dot _
      dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), c) +
        lit(center.map(x => x * x).sum)
    }
    val first = base.orderBy(col("__id").asc).limit(1)
      .select(col("__id"), col("__v").cast("array<double>"))
      .as[(Long, Seq[Double])].head()
    val picks = scala.collection.mutable.ArrayBuffer(
      (1, first._1, 0L)) // (rank, center_id, radius_sq)
    var cur = base.withColumn("__md", d2To(first._2.toArray).cast("long"))
    (2 to k).foreach { r =>
      val far = graft.plans.TopKPerGroup.topK(
          cur.withColumn("__s", col("__md").cast("double"))
            .withColumn("__g", lit(1)),
          Seq("__g"), "__s", "__id", 1)
        .select(col("__id"), col("__md"), col("__v").cast("array<double>"))
        .as[(Long, Long, Seq[Double])].head()
      picks += ((r, far._1, far._2))
      if (r < k)
        cur = cur
          .withColumn("__md",
            least(col("__md"), d2To(far._3.toArray).cast("long")))
          .localCheckpoint()
    }
    picks.toSeq.toDF("rank", "center_id", "radius_sq")
  }
}
