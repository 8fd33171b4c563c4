package graft.queries

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Exact-integer PCA faces ([[graft.ops.Linalg]]) over `embeddings`.
  *
  * The oracle replays the ENTIRE pipeline in SQL — the micro-unit
  * snap, the decimal moments, the cancellation-free covariance, all
  * `Iters` power-iteration rounds (HUGEINT CTE chain mirroring the
  * driver's BigInt arithmetic, sign-split division so floor-vs-trunc
  * on negatives can never diverge), the sign canonicalization, and
  * the final projection. Both engines run pure integer arithmetic on
  * identical values, so the comparison is bit-exact at every stage —
  * an end-to-end check that the "deterministic distributed PCA" claim
  * actually holds, not just a property spec.
  */
object LinalgQueries {
  import QueryDef.sql

  private val Dim = 64
  private val Iters = 20

  /** Shared numeric prefix: snap, moments, covariance as HUGEINT.
    * lv and gm are MATERIALIZED: the iteration chain references gm
    * once per round, and DuckDB would otherwise inline the whole
    * subtree (down to the parquet scan) into every round — 20 ×
    * re-scan, and enough duplicate file handles to trip the fd limit
    * (measured). */
  private val gramCtes =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |lv AS MATERIALIZED (SELECT vec_id, i,
       |         CAST(round(v[i+1] * 1000000000) AS BIGINT) AS x
       |       FROM e, range($Dim) t(i)),
       |sxx AS (SELECT a.i AS i, b.i AS j,
       |          sum(a.x::HUGEINT * b.x) AS sxx
       |        FROM lv a JOIN lv b USING (vec_id) GROUP BY 1, 2),
       |s AS (SELECT i, sum(x::HUGEINT) AS s, count(*) AS n
       |      FROM lv GROUP BY 1),
       |gm AS MATERIALIZED (SELECT sxx.i, sxx.j,
       |         sa.n * sxx.sxx - sa.s * sb.s AS m
       |       FROM sxx JOIN s sa ON sxx.i = sa.i
       |       JOIN s sb ON sxx.j = sb.i)""".stripMargin

  /** Every per-round CTE is MATERIALIZED: w_k is referenced twice
    * (the normalize round and its max), so CTE inlining would DOUBLE
    * the expanded plan per round — 2^Iters subtrees by the last round
    * (measured as a hang before materialization). Materialized, each
    * round is one 64-row intermediate. */
  private def iterCtes: String = (1 to Iters).map { k =>
    s"""w$k AS MATERIALIZED (SELECT g.i, sum(g.m * v.vu) AS w
       |  FROM gm g JOIN v${k - 1} v ON g.j = v.i GROUP BY 1),
       |mx$k AS (SELECT max(abs(w)) AS m FROM w$k),
       |v$k AS MATERIALIZED (SELECT i,
       |  (CASE WHEN w < 0 THEN -1 ELSE 1 END)
       |    * ((abs(w) * 1000000) // (SELECT m FROM mx$k)) AS vu
       |  FROM w$k)""".stripMargin
  }.mkString(",\n")

  val defs: Seq[QueryDef] = Seq(

    // ---- the exact covariance matrix itself: one corpus pass,
    //      dim²-row output, values as strings (HUGEINT vs decimal
    //      renders) ----
    sql(
      "q_covariance",
      s"""WITH $gramCtes
         |SELECT i::BIGINT AS i, j::BIGINT AS j, m::VARCHAR AS m
         |FROM gm""".stripMargin) { (s, d) =>
      graft.ops.Linalg.gramMatrix(
        Tables.embeddings(s, d), "embedding", Dim)
    },

    // ---- principal-axis projection: gram → 20 BigInt power-iteration
    //      rounds (driver-side, dim²-sized state) → map-side exact dot.
    //      The oracle unrolls the identical integer fixed point ----
    sql(
      "q_pca_project",
      s"""WITH $gramCtes,
         |v0 AS (SELECT i, 1000000::HUGEINT AS vu FROM range($Dim) t(i)),
         |$iterCtes,
         |flip AS (SELECT CASE WHEN vu < 0 THEN -1 ELSE 1 END AS f
         |         FROM v$Iters WHERE vu != 0 ORDER BY i LIMIT 1),
         |axis AS (SELECT i, vu * (SELECT f FROM flip) AS a FROM v$Iters)
         |SELECT lv.vec_id,
         |  CAST(sum(lv.x * ax.a) AS BIGINT) AS score_u
         |FROM lv JOIN axis ax ON lv.i = ax.i
         |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.ops.Linalg.pca(
        Tables.embeddings(s, d), "vec_id", "embedding", Dim, Iters)
    },

    // ---- symmetric int8 quantization of the embedding corpus:
    //      per-vector micro-unit max + sign-split integer division,
    //      codes hash-checked element-for-element through the json
    //      canon. The oracle replays snap/max/divide relationally ----
    sql(
      "q_embed_quantize",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |u AS (SELECT vec_id, i,
         |        CAST(round(v[i+1] * 1000000000) AS BIGINT) AS xu
         |      FROM e, range($Dim) t(i)),
         |m AS (SELECT vec_id, greatest(max(abs(xu)), 1) AS m
         |      FROM u GROUP BY 1),
         |q AS (SELECT u.vec_id, u.i,
         |        (CASE WHEN xu < 0 THEN -1 ELSE 1 END)
         |          * ((abs(xu) * 127) // m.m) AS qi
         |      FROM u JOIN m ON u.vec_id = m.vec_id)
         |SELECT q.vec_id, m.m::BIGINT AS scale_u,
         |  to_json(list(qi ORDER BY q.i)) AS q_json
         |FROM q JOIN m ON q.vec_id = m.vec_id
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      graft.ops.Projection.quantizeInt8(
          Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("scale_u"),
          Canon.js(col("q")).as("q_json"))
    })
}
