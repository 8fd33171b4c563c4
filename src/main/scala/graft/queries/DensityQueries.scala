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

  val defs: Seq[QueryDef] = Seq(
    sql(
      "q_dbscan",
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
         |  GROUP BY 1)
         |SELECT pt.pid AS vec_id,
         |  COALESCE(lab.cluster, bord.cluster) AS cluster,
         |  CASE WHEN lab.pid IS NOT NULL THEN 'core'
         |       WHEN bord.pid IS NOT NULL THEN 'border'
         |       ELSE 'noise' END AS role
         |FROM pt LEFT JOIN lab ON pt.pid = lab.pid
         |LEFT JOIN bord ON pt.pid = bord.pid""".stripMargin) { (s, d) =>
      graft.ops.Density.dbscan(
        projectedPoints(s, d), "vec_id", "px", "py", Eps, MinPts)
    })
}
