package graft.queries

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Density clustering face ([[graft.ops.Density.dbscan]]) over a
  * PLANTED separated mixture (the q_semantic_dedup device): the 64-d
  * embeddings JL-project to exact-integer 2-D, then each point shifts
  * x by label·8e9 — ten well-separated bands whose within-band
  * nearest-neighbor spacing (~6e8) sits far under the band gap, so
  * eps=1e9 / minPts=4 recovers exactly the ten planted clusters with
  * border and noise roles genuinely exercised (measured: 436 core /
  * 41 border / 23 noise at sf0.01). Every stage is integer-exact, so
  * the oracle replays the full pipeline — projection, grid, 3×3
  * probe, HUGEINT distance test, core count, recursive-CTE
  * components, deterministic min-cluster border attachment.
  */
object DensityQueries {
  import QueryDef.sql

  private[graft] val Eps = 1000000000L
  private[graft] val MinPts = 4
  private val Shift = 8000000000L

  /** The face's point derivation (JL-project to exact-integer 2-D +
    * label-band shift), shared with the scale-rehearsal harness. */
  private[graft] def projectedPoints(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.ops.Projection.randomProject(
        emb, "vec_id", "embedding", inDim = 64, outDim = 2)
      .groupBy(col("vec_id"))
      .agg(max(when(col("j") === 0, col("proj_u"))).as("x0"),
        max(when(col("j") === 1, col("proj_u"))).as("y0"))
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("vec_id"),
        (col("x0") + col("label") * lit(Shift)).as("px"),
        col("y0").as("py"))
  }

  /** The full integer-exact dbscan replay as a CTE chain (shared by
    * the assignment face and the evaluation face): ends with `pt`,
    * `lab` (core clusters), `bord` (border attachment). */
  private def dbscanCtes: String =
    s"""WITH RECURSIVE sg AS (
         |  SELECT i, j,
         |    CASE WHEN strpos('02468ace',
         |           substr(md5('jl:' || i || ':' || j), 1, 1)) > 0
         |         THEN 1 ELSE -1 END AS sgn
         |  FROM range(64) t(i), range(2) u(j)),
         |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |      FROM embeddings),
         |p AS (SELECT e.vec_id, e.label, sg.j,
         |        CAST(sum(CAST(round(e.v[sg.i + 1] * 1000000000) AS BIGINT)
         |                 * sg.sgn) AS BIGINT) AS proj_u
         |      FROM e, sg GROUP BY 1, 2, 3),
         |pt AS MATERIALIZED (
         |  SELECT vec_id AS pid,
         |    max(CASE WHEN j = 0 THEN proj_u END) + label * $Shift AS px,
         |    max(CASE WHEN j = 1 THEN proj_u END) AS py
         |  FROM p GROUP BY vec_id, label),
         |cell AS MATERIALIZED (
         |  SELECT pid, px, py,
         |    (px - ((px % $Eps + $Eps) % $Eps)) // $Eps AS cx,
         |    (py - ((py % $Eps + $Eps) % $Eps)) // $Eps AS cy
         |  FROM pt),
         |pr AS MATERIALIZED (
         |  SELECT c.pid AS qid, h.pid
         |  FROM (SELECT pid, px, py, cx + ox.o AS cx, cy + oy.o AS cy
         |        FROM cell, (VALUES (-1), (0), (1)) ox(o),
         |          (VALUES (-1), (0), (1)) oy(o)) c
         |  JOIN cell h USING (cx, cy)
         |  WHERE c.pid != h.pid
         |    AND (c.px - h.px)::HUGEINT * (c.px - h.px)
         |      + (c.py - h.py)::HUGEINT * (c.py - h.py)
         |      <= ${Eps * Eps}),
         |core AS MATERIALIZED (
         |  SELECT qid AS cid FROM pr GROUP BY 1
         |  HAVING count(*) + 1 >= $MinPts),
         |ce AS (SELECT pr.qid AS a, pr.pid AS b FROM pr
         |       JOIN core c1 ON pr.qid = c1.cid
         |       JOIN core c2 ON pr.pid = c2.cid),
         |cc AS (
         |  SELECT cid AS v, cid AS m FROM core
         |  UNION
         |  SELECT ce.b, cc.m FROM ce JOIN cc ON ce.a = cc.v),
         |lab AS MATERIALIZED (
         |  SELECT v AS pid, min(m) AS cluster FROM cc GROUP BY 1),
         |bord AS (
         |  SELECT pr.qid AS pid, min(lab.cluster) AS cluster
         |  FROM pr JOIN lab ON pr.pid = lab.pid
         |  WHERE pr.qid NOT IN (SELECT cid FROM core)
         |  GROUP BY 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    sql(
      "q_dbscan",
      s"""$dbscanCtes
         |SELECT pt.pid AS vec_id,
         |  COALESCE(lab.cluster, bord.cluster) AS cluster,
         |  CASE WHEN lab.pid IS NOT NULL THEN 'core'
         |       WHEN bord.pid IS NOT NULL THEN 'border'
         |       ELSE 'noise' END AS role
         |FROM pt LEFT JOIN lab ON pt.pid = lab.pid
         |LEFT JOIN bord ON pt.pid = bord.pid""".stripMargin) { (s, d) =>
      graft.ops.Density.dbscan(
        projectedPoints(s, d), "vec_id", "px", "py", Eps, MinPts)
    },

    // ---- EXACT external clustering evaluation: purity + Adjusted
    //      Rand Index of the dbscan assignment against the planted
    //      labels — clustered points only (noise excluded, n_eval
    //      reported); contingency arithmetic in HUGEINT/DECIMAL(38)
    //      with the doubled-fraction ARI so nothing divides ----
    sql(
      "q_cluster_eval",
      s"""$dbscanCtes,
         |asg AS (
         |  SELECT pt.pid,
         |    COALESCE(lab.cluster, bord.cluster) AS c
         |  FROM pt LEFT JOIN lab ON pt.pid = lab.pid
         |  LEFT JOIN bord ON pt.pid = bord.pid),
         |cont AS (
         |  SELECT a.c, e.label AS l, count(*)::BIGINT AS n
         |  FROM asg a JOIN e ON e.vec_id = a.pid
         |  WHERE a.c IS NOT NULL
         |  GROUP BY 1, 2),
         |tt AS (SELECT sum(n)::BIGINT AS nn,
         |         sum(n::HUGEINT * (n - 1) // 2)::HUGEINT AS ii,
         |         count(DISTINCT c)::BIGINT AS n_clusters,
         |         count(DISTINCT l)::BIGINT AS n_labels
         |       FROM cont),
         |pa AS (SELECT sum(a::HUGEINT * (a - 1) // 2)::HUGEINT AS sa,
         |         sum(m)::BIGINT AS purity_num
         |       FROM (SELECT c, sum(n)::HUGEINT AS a, max(n) AS m
         |             FROM cont GROUP BY c)),
         |pb AS (SELECT sum(b::HUGEINT * (b - 1) // 2)::HUGEINT AS sb
         |       FROM (SELECT l, sum(n)::HUGEINT AS b
         |             FROM cont GROUP BY l)),
         |f AS (
         |  SELECT nn, n_clusters, n_labels, purity_num, ii, sa, sb,
         |    (nn::HUGEINT * (nn - 1) // 2) AS p
         |  FROM tt, pa, pb)
         |SELECT nn AS n_eval, n_clusters, n_labels, purity_num,
         |  round(purity_num::DOUBLE / nn, 6) AS purity,
         |  (2 * (p * ii - sa * sb))::VARCHAR AS ari_num,
         |  (p * (sa + sb) - 2 * sa * sb)::VARCHAR AS ari_den,
         |  CASE WHEN p * (sa + sb) - 2 * sa * sb <> 0
         |    THEN round((2 * (p * ii - sa * sb))::DOUBLE
         |         / (p * (sa + sb) - 2 * sa * sb)::DOUBLE, 9)
         |  END AS ari
         |FROM f""".stripMargin) { (s, d) =>
      val assign = graft.ops.Density.dbscan(
        projectedPoints(s, d), "vec_id", "px", "py", Eps, MinPts)
      graft.ops.Density.clusterEval(
        assign, "vec_id", "cluster",
        Tables.embeddings(s, d), "label")
    })
}
