package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-partitioned DBSCAN (Ester et al., KDD'96) over integer 2-D
  * points — density clustering with explicit noise, the cluster family
  * the centroid ops (Lloyd/IVF/SemDeDup) cannot express: clusters of
  * arbitrary shape, no k chosen in advance, outliers labeled instead
  * of absorbed.
  *
  * Scale shape — the textbook grid method, relationally:
  * every point lands in an eps-sized cell (integer floor-div via
  * `pmod`, exact for negatives in BOTH engines — `div` truncates and
  * would split the grid at zero); each point PROBES its 3×3 cell
  * neighborhood (a 9-row map-side explode), and candidates equi-join
  * probe-cell = home-cell. Any true eps-neighbor differs by < 1 cell
  * in each axis, so the 9-cell probe is COMPLETE; each directed pair
  * is found under exactly one offset, so no dedup pass is needed. The
  * exact distance test runs in decimal (coords ~1e11 square past
  * 2^63). Density skew = cell occupancy: eps bounds the cell, so a
  * pathological cell costs a bigger shuffle bucket, never unbounded
  * task state; shrink eps (or pre-salt a hot cell) the way the skew
  * ops do. Core flags are one count; clusters are
  * [[Graph.connectedComponents]] over CORE-CORE edges (the collision
  * subgraph, not the corpus); border points attach to the MINIMUM
  * neighboring core component (a deterministic tie rule — plain
  * DBSCAN leaves border assignment order-dependent, which would break
  * the oracle).
  *
  * All arithmetic is integer/decimal-exact, so the full pipeline is
  * engine-portable: the DuckDB oracle replays grid, probe, distance,
  * core test, a recursive-CTE components pass, and border attachment
  * bit-for-bit.
  *
  * @param eps    radius in the coordinate's integer units (> 0)
  * @param minPts core test: |N_eps(p)| ≥ minPts, self included
  * @param ccMaxIters round budget for the core-graph connected-
  *         components pass ([[Graph.connectedComponents]] fails loudly
  *         rather than returning partial labels; raise for graphs that
  *         need more than the default 30 star rounds)
  * @return (id, cluster, role): role core|border|noise; cluster is the
  *         component's minimum point id, null for noise
  */
object Density {

  def dbscan(
      points: DataFrame, id: String, x: String, y: String,
      eps: Long, minPts: Int, ccMaxIters: Int = 30): DataFrame = {
    require(eps > 0, s"eps must be positive: $eps")
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val pts = graft.core.LazyCheckpoint(points.select(
      col(id).as("pid"), col(x).cast("long").as("px"),
      col(y).cast("long").as("py")))
    def cellOf(c: String) = expr(s"($c - pmod($c, ${eps}L)) div ${eps}L")
    val homed = pts.select(col("pid"), col("px"), col("py"),
      cellOf("px").as("cx"), cellOf("py").as("cy"))
    val offsets = Seq(-1, 0, 1).flatMap(dx => Seq(-1, 0, 1).map(dy => (dx, dy)))
    val probes = homed.select(col("pid").as("qid"), col("px").as("qx"),
      col("py").as("qy"),
      explode(typedlit(offsets)).as("o"),
      col("cx"), col("cy"))
      .select(col("qid"), col("qx"), col("qy"),
        (col("cx") + col("o._1")).as("cx"), (col("cy") + col("o._2")).as("cy"))
    val dx = (col("qx") - col("px")).cast("decimal(19,0)")
    val dy = (col("qy") - col("py")).cast("decimal(19,0)")
    // directed neighbor pairs (qid → pid), both directions present by
    // construction; the per-pair shuffle key is the cell
    val pairs = graft.core.LazyCheckpoint(
      probes.join(homed.select(col("pid"), col("px"), col("py"),
          col("cx"), col("cy")), Seq("cx", "cy"))
        .filter(col("qid") =!= col("pid"))
        .filter(dx * dx + dy * dy <=
          lit(java.math.BigDecimal.valueOf(eps).pow(2)))
        .select(col("qid"), col("pid")))
    val core = pairs.groupBy(col("qid"))
      .agg((count(lit(1)) + 1).as("nsize"))
      .filter(col("nsize") >= minPts)
      .select(col("qid").as("coreid"))
    val coreEdges = pairs
      .join(core.select(col("coreid").as("qid")), Seq("qid"))
      .join(core.select(col("coreid").as("pid")), Seq("pid"))
      .select(col("qid").as("a"), col("pid").as("b"))
    val labeled = Graph.connectedComponents(coreEdges, nodes = Some(core),
        maxIters = ccMaxIters)
      .select(col("node").as("pid"), col("component").as("cluster"))
    // border: non-core with a core neighbor — minimum neighboring
    // core component (deterministic; vanilla DBSCAN is order-dependent)
    val border = pairs
      .join(labeled.select(col("pid"), col("cluster")), Seq("pid"))
      .join(core.select(col("coreid").as("qid")), Seq("qid"), "left_anti")
      .groupBy(col("qid").as("pid"))
      .agg(min(col("cluster")).as("cluster"))
    val coreOut = labeled.withColumn("role", lit("core"))
    val borderOut = border.withColumn("role", lit("border"))
    pts.select(col("pid"))
      .join(coreOut.unionByName(borderOut), Seq("pid"), "left")
      .select(col("pid").as(id), col("cluster"),
        coalesce(col("role"), lit("noise")).as("role"))
  }
}
