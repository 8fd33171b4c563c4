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

    noOracle("q_knn_lsh") { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(
        corpus = e, queries = e.filter(col("vec_id") < 10),
        id = "vec_id", vec = "embedding", k = 5, bits = 4, dim = 64)
    })
}
