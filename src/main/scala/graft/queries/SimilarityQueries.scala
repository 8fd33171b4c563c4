package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor surface over `embeddings`
  * (64-dim `array<float>`, 10 labeled clusters).
  *
  * `q_knn_topk` is the exact brute-force baseline, oracle-checked
  * against DuckDB's `list_dot_product`. `q_knn_lsh` is the bucketed
  * scale path — approximate by construction, so it gets a rows-only
  * driver check plus a recall unit test (SimilaritySpec).
  */
object SimilarityQueries {
  import QueryDef.{noOracle, sql}

  val defs: Seq[QueryDef] = Seq(

    sql(
      "q_knn_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        |s AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(q.v, e.v)
        |      / (sqrt(list_dot_product(q.v, q.v))
        |         * sqrt(list_dot_product(e.v, e.v))) AS cosine
        |  FROM q JOIN e ON e.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
        |FROM (SELECT query_id, neighbor_id, cosine,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cosine DESC, neighbor_id) AS rank
        |      FROM s)
        |WHERE rank <= 5""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          corpus = e, queries = e.filter(col("vec_id") < 10),
          id = "vec_id", vec = "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
    },

    // ---- embedding-cosine near-dup pairs (exact baseline) ----
    sql(
      "q_embed_neardup",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT x.vec_id AS a, y.vec_id AS b,
        |  round(list_dot_product(x.v, y.v)
        |    / (sqrt(list_dot_product(x.v, x.v))
        |       * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine
        |FROM e x JOIN e y ON x.vec_id < y.vec_id
        |WHERE list_dot_product(x.v, y.v)
        |    / (sqrt(list_dot_product(x.v, x.v))
        |       * sqrt(list_dot_product(y.v, y.v))) >= 0.9""".stripMargin) {
      (s, d) =>
        Similarity.cosineNearDupPairs(
            Tables.embeddings(s, d), "vec_id", "embedding", 0.9)
          .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
    },

    noOracle("q_knn_lsh") { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(
        corpus = e, queries = e.filter(col("vec_id") < 10),
        id = "vec_id", vec = "embedding", k = 5, bits = 4, dim = 64)
    },

    noOracle("q_knn_ivf") { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(
        corpus = e, queries = e.filter(col("vec_id") < 10),
        id = "vec_id", vec = "embedding", k = 5,
        numCentroids = 16, nProbe = 8)
    })
}
