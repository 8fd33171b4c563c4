package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Drift
import org.apache.spark.sql.functions._

/** Distribution-drift faces ([[graft.ops.Drift]]): PSI between two
  * dataset slices, numeric (fixed-width integer bins over the events
  * value, cents grid) and categorical (document language frequencies).
  *
  * Oracle strategy: the whole PSI pipeline is relational — two
  * grouped counts, a full-outer join, scalar totals, one smoothed
  * log-ratio term per bin — so DuckDB replays it exactly. The only
  * libm call (ln) lands on the shared 9-decimal grid (the q_pmi
  * convention); the total sums those grid points as DECIMAL(38,9),
  * which is associative, so neither engine's partitioning or
  * summation order can move the result.
  */
object DriftQueries {
  import QueryDef.sql

  /** Oracle body shared by the per-bin and total faces: per-bin PSI
    * terms between two event-type slices of `events`, value binned at
    * `width` cents. Mirrors [[Drift.psiBinned]] term for term. */
  private def psiBinsSql(ref: String, cur: String, width: Long): String =
    s"""r0 AS (SELECT ((iv - iv % $width) // $width) AS bin
       |      FROM (SELECT CAST(round(value * 100) AS BIGINT) AS iv
       |            FROM events WHERE event_type = '$ref')),
       |c0 AS (SELECT ((iv - iv % $width) // $width) AS bin
       |      FROM (SELECT CAST(round(value * 100) AS BIGINT) AS iv
       |            FROM events WHERE event_type = '$cur')),
       |rc AS (SELECT bin, count(*) AS c_ref FROM r0 GROUP BY 1),
       |cc AS (SELECT bin, count(*) AS c_cur FROM c0 GROUP BY 1),
       |bins AS (
       |  SELECT coalesce(rc.bin, cc.bin) AS bin,
       |    coalesce(c_ref, 0)::BIGINT AS c_ref,
       |    coalesce(c_cur, 0)::BIGINT AS c_cur
       |  FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
       |t AS (SELECT sum(c_ref)::BIGINT AS n_ref, sum(c_cur)::BIGINT AS n_cur,
       |             count(*)::BIGINT AS b FROM bins),
       |terms AS (
       |  SELECT bin, c_ref, c_cur,
       |    round(((c_cur + 1) / CAST(n_cur + b AS DOUBLE)
       |            - (c_ref + 1) / CAST(n_ref + b AS DOUBLE))
       |          * ln(((c_cur + 1) / CAST(n_cur + b AS DOUBLE))
       |               / ((c_ref + 1) / CAST(n_ref + b AS DOUBLE))), 9)
       |      AS psi_term
       |  FROM bins, t)""".stripMargin

  /** Engine side of the same slice pair. */
  private def psiBins(s: org.apache.spark.sql.SparkSession, d: String,
      ref: String, cur: String, width: Long): org.apache.spark.sql.DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      round(col("value") * 100).cast("long").as("iv"))
    def slice(t: String) = e.filter(col("event_type") === t)
      .select(Drift.binOf(col("iv"), width).as("bin"))
    Drift.psiBinned(slice(ref), slice(cur), "bin")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- per-bin PSI terms, view → purchase, $20 bins: every bin's
    //      count pair and smoothed term hash-checked ----
    sql(
      "q_drift_psi",
      s"""WITH ${psiBinsSql("view", "purchase", 2000L)}
         |SELECT bin, c_ref, c_cur, psi_term FROM terms""".stripMargin) {
      (s, d) => psiBins(s, d, "view", "purchase", 2000L)
    },

    // ---- the scalar gate: PSI = Σ terms summed EXACTLY as
    //      DECIMAL(38,9) (order-free), plus the bin count ----
    sql(
      "q_drift_total",
      s"""WITH ${psiBinsSql("view", "purchase", 2000L)}
         |SELECT count(*)::BIGINT AS n_bins,
         |  CAST(sum(CAST(psi_term AS DECIMAL(38,9))) AS DOUBLE) AS psi
         |FROM terms""".stripMargin) { (s, d) =>
      psiBins(s, d, "view", "purchase", 2000L)
        .agg(count(lit(1)).as("n_bins"),
          sum(col("psi_term").cast("decimal(38,9)")).cast("double").as("psi"))
    },

    // ---- categorical PSI: language distribution of an even/odd
    //      doc_id split of the documents corpus — the "new batch vs
    //      corpus reference" shape with string bins ----
    sql(
      "q_drift_lang",
      """WITH rc AS (SELECT lang AS bin, count(*) AS c_ref
        |            FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |cc AS (SELECT lang AS bin, count(*) AS c_cur
        |       FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |bins AS (
        |  SELECT coalesce(rc.bin, cc.bin) AS bin,
        |    coalesce(c_ref, 0)::BIGINT AS c_ref,
        |    coalesce(c_cur, 0)::BIGINT AS c_cur
        |  FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
        |t AS (SELECT sum(c_ref)::BIGINT AS n_ref, sum(c_cur)::BIGINT AS n_cur,
        |             count(*)::BIGINT AS b FROM bins)
        |SELECT bin, c_ref, c_cur,
        |  round(((c_cur + 1) / CAST(n_cur + b AS DOUBLE)
        |          - (c_ref + 1) / CAST(n_ref + b AS DOUBLE))
        |        * ln(((c_cur + 1) / CAST(n_cur + b AS DOUBLE))
        |             / ((c_ref + 1) / CAST(n_ref + b AS DOUBLE))), 9)
        |    AS psi_term
        |FROM bins, t""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Drift.psiBinned(
        docs.filter(col("doc_id") % 2 === 0).select(col("lang").as("bin")),
        docs.filter(col("doc_id") % 2 === 1).select(col("lang").as("bin")),
        "bin")
    },

    // ---- Pearson chi-square independence test on the SAME split as
    //      q_drift_lang — the significance companion to the PSI
    //      magnitude (is the lang×half dependence bigger than
    //      sampling noise at this n?). Exact DECIMAL(38,0)
    //      cross-products, one division per cell on the 9-grid,
    //      DECIMAL(38,9) order-free sum ----
    sql(
      "q_chi2_drift",
      """WITH base AS (
        |  SELECT lang AS cat, CAST(doc_id % 2 AS VARCHAR) AS sl
        |  FROM documents WHERE lang IS NOT NULL),
        |cells AS (SELECT cat, sl, count(*)::BIGINT AS o
        |          FROM base GROUP BY 1, 2),
        |r AS (SELECT cat, sum(o)::BIGINT AS r FROM cells GROUP BY 1),
        |c AS (SELECT sl, sum(o)::BIGINT AS c FROM cells GROUP BY 1),
        |t AS (SELECT sum(o)::BIGINT AS n,
        |        count(DISTINCT cat)::BIGINT AS nr,
        |        count(DISTINCT sl)::BIGINT AS nc FROM cells),
        |g AS (
        |  SELECT r.cat, c.sl, coalesce(cells.o, 0)::BIGINT AS o,
        |    r.r, c.c
        |  FROM r CROSS JOIN c
        |  LEFT JOIN cells ON cells.cat = r.cat AND cells.sl = c.sl),
        |terms AS (
        |  SELECT round(CAST((o::HUGEINT * n - r::HUGEINT * c)
        |               * (o::HUGEINT * n - r::HUGEINT * c) AS DOUBLE)
        |          / CAST(r::HUGEINT * c * n AS DOUBLE), 9) AS t9,
        |    n, nr, nc
        |  FROM g, t)
        |SELECT n, ((nr - 1) * (nc - 1))::BIGINT AS df,
        |  CAST(sum(CAST(t9 AS DECIMAL(38,9))) AS DOUBLE) AS chi2
        |FROM terms GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Drift.chi2Test(Tables.documents(s, d),
        col("lang"), col("doc_id") % 2)
    },

    // ---- global equi-depth discretization: 8 near-equal buckets of
    //      orders by total price, exact global rank arithmetic — the
    //      oracle's row_number window replays the same total order ----
    sql(
      "q_equidepth",
      """WITH r AS (
        |  SELECT o_orderkey,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER () AS n
        |  FROM orders)
        |SELECT o_orderkey, (((rn - 1) * 8) // n)::BIGINT AS bin
        |FROM r""".stripMargin) { (s, d) =>
      Drift.equiDepthBins(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
          Seq(col("o_totalprice").asc, col("o_orderkey").asc),
          k = 8, numPartitions = 32)
        .select(col("o_orderkey"), col("bin"))
    },

    // ---- per-group PSI in ONE pass: every event type's even/odd-user
    //      value-distribution drift scored together — per-group totals
    //      equi-join back on the group (no one-row carrier, no
    //      per-domain jobs) ----
    sql(
      "q_drift_by_type",
      """WITH base AS (SELECT event_type AS grp,
        |         CAST(round(value * 100) AS BIGINT) AS iv,
        |         user_id % 2 AS side FROM events),
        |r0 AS (SELECT grp, ((iv - iv % 2000) // 2000) AS bin
        |       FROM base WHERE side = 0),
        |c0 AS (SELECT grp, ((iv - iv % 2000) // 2000) AS bin
        |       FROM base WHERE side = 1),
        |rc AS (SELECT grp, bin, count(*) AS c_ref FROM r0 GROUP BY 1, 2),
        |cc AS (SELECT grp, bin, count(*) AS c_cur FROM c0 GROUP BY 1, 2),
        |bins AS (
        |  SELECT coalesce(rc.grp, cc.grp) AS grp,
        |    coalesce(rc.bin, cc.bin) AS bin,
        |    coalesce(c_ref, 0)::BIGINT AS c_ref,
        |    coalesce(c_cur, 0)::BIGINT AS c_cur
        |  FROM rc FULL OUTER JOIN cc
        |    ON rc.grp = cc.grp AND rc.bin = cc.bin),
        |t AS (SELECT grp, sum(c_ref)::BIGINT AS n_ref,
        |        sum(c_cur)::BIGINT AS n_cur, count(*)::BIGINT AS b
        |      FROM bins GROUP BY 1)
        |SELECT bins.grp, bin, c_ref, c_cur,
        |  round(((c_cur + 1) / CAST(n_cur + b AS DOUBLE)
        |          - (c_ref + 1) / CAST(n_ref + b AS DOUBLE))
        |        * ln(((c_cur + 1) / CAST(n_cur + b AS DOUBLE))
        |             / ((c_ref + 1) / CAST(n_ref + b AS DOUBLE))), 9)
        |    AS psi_term
        |FROM bins JOIN t ON bins.grp = t.grp""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("event_type").as("grp"),
        round(col("value") * 100).cast("long").as("iv"),
        (col("user_id") % 2).as("side"))
      def half(v: Int) = e.filter(col("side") === v)
        .select(col("grp"), Drift.binOf(col("iv"), 2000L).as("bin"))
      Drift.psiBinnedBy(half(0), half(1), "grp", "bin")
    },

    // ---- exact-integer Kolmogorov–Smirnov drift over the same slice
    //      pair: per-bin cross-multiplied CDF-gap numerators, NO libm
    //      and NO rounding grid — decimals rendered as strings (the
    //      q_covariance HUGEINT/decimal device) ----
    sql(
      "q_drift_ks",
      """WITH r0 AS (SELECT ((iv - iv % 2000) // 2000) AS bin
        |      FROM (SELECT CAST(round(value * 100) AS BIGINT) AS iv
        |            FROM events WHERE event_type = 'view')),
        |c0 AS (SELECT ((iv - iv % 2000) // 2000) AS bin
        |      FROM (SELECT CAST(round(value * 100) AS BIGINT) AS iv
        |            FROM events WHERE event_type = 'purchase')),
        |rc AS (SELECT bin, count(*) AS c_ref FROM r0 GROUP BY 1),
        |cc AS (SELECT bin, count(*) AS c_cur FROM c0 GROUP BY 1),
        |bins AS (
        |  SELECT coalesce(rc.bin, cc.bin) AS bin,
        |    coalesce(c_ref, 0)::BIGINT AS c_ref,
        |    coalesce(c_cur, 0)::BIGINT AS c_cur
        |  FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
        |cum AS (SELECT bin, c_ref, c_cur,
        |          sum(c_ref) OVER (ORDER BY bin) AS cumref,
        |          sum(c_cur) OVER (ORDER BY bin) AS cumcur
        |        FROM bins),
        |t AS (SELECT sum(c_ref)::BIGINT AS n_ref,
        |             sum(c_cur)::BIGINT AS n_cur FROM bins)
        |SELECT bin, c_ref, c_cur,
        |  abs(cumref::DECIMAL(38,0) * n_cur
        |      - cumcur::DECIMAL(38,0) * n_ref)::DECIMAL(38,0)::VARCHAR
        |    AS d_u
        |FROM cum, t""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("iv"))
      def slice(t: String) = e.filter(col("event_type") === t)
        .select(Drift.binOf(col("iv"), 2000L).as("bin"))
      Drift.ksBinned(slice("view"), slice("purchase"), "bin")
        .select(col("bin"), col("c_ref"), col("c_cur"),
          col("d_u").cast("string").as("d_u"))
    },

    // ---- the textbook PSI procedure end to end: 10 equal-population
    //      bins from the REFERENCE's own quantiles, stamped on both
    //      sides, then PSI — refCutpoints ∘ applyCutpoints ∘ psiBinned
    //      in one plan ----
    sql(
      "q_drift_quantile",
      """WITH r AS (SELECT o_totalprice AS v FROM orders
        |           WHERE o_orderkey % 2 = 0),
        |c AS (SELECT o_totalprice AS v FROM orders
        |      WHERE o_orderkey % 2 = 1),
        |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
        |         count(*) OVER () AS n FROM r),
        |b AS (SELECT ((rn - 1) * 10) // n AS bin, min(v) AS cut
        |      FROM rk GROUP BY 1),
        |cuts AS (SELECT list(cut ORDER BY cut) AS cs FROM b WHERE bin >= 1),
        |rb AS (SELECT len(list_filter((SELECT cs FROM cuts),
        |                x -> x <= v))::BIGINT AS bin FROM r),
        |cb AS (SELECT len(list_filter((SELECT cs FROM cuts),
        |                x -> x <= v))::BIGINT AS bin FROM c),
        |rc AS (SELECT bin, count(*) AS c_ref FROM rb GROUP BY 1),
        |cc AS (SELECT bin, count(*) AS c_cur FROM cb GROUP BY 1),
        |bins AS (
        |  SELECT coalesce(rc.bin, cc.bin) AS bin,
        |    coalesce(c_ref, 0)::BIGINT AS c_ref,
        |    coalesce(c_cur, 0)::BIGINT AS c_cur
        |  FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
        |t AS (SELECT sum(c_ref)::BIGINT AS n_ref, sum(c_cur)::BIGINT AS n_cur,
        |             count(*)::BIGINT AS b FROM bins)
        |SELECT bin, c_ref, c_cur,
        |  round(((c_cur + 1) / CAST(n_cur + b AS DOUBLE)
        |          - (c_ref + 1) / CAST(n_ref + b AS DOUBLE))
        |        * ln(((c_cur + 1) / CAST(n_cur + b AS DOUBLE))
        |             / ((c_ref + 1) / CAST(n_ref + b AS DOUBLE))), 9)
        |    AS psi_term
        |FROM bins, t""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_totalprice").as("v"))
      val refSide = o.filter(col("o_orderkey") % 2 === 0).select(col("v"))
      val curSide = o.filter(col("o_orderkey") % 2 === 1).select(col("v"))
      val cuts = Drift.refCutpoints(refSide, col("v"), k = 10,
        numPartitions = 32)
      def binned(df: org.apache.spark.sql.DataFrame) =
        Drift.applyCutpoints(df, col("v"), cuts).select(col("bin"))
      Drift.psiBinned(binned(refSide), binned(curSide), "bin")
    },

    // ---- embedding-space drift: per-dimension centroid shift
    //      between even- and odd-labeled vector slices, exact integer
    //      micro-units, divisions cross-multiplied away ----
    sql(
      "q_drift_embedding",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |u AS (SELECT vec_id, label, i,
        |        CAST(round(v[i+1] * 1000000000) AS BIGINT) AS xu
        |      FROM e, range(64) t(i)),
        |r AS (SELECT i, sum(xu)::BIGINT AS s_ref, count(*)::BIGINT AS n_ref
        |      FROM u WHERE label % 2 = 0 GROUP BY 1),
        |c AS (SELECT i, sum(xu)::BIGINT AS s_cur, count(*)::BIGINT AS n_cur
        |      FROM u WHERE label % 2 = 1 GROUP BY 1)
        |SELECT r.i::BIGINT AS j, s_ref, n_ref, s_cur, n_cur,
        |  abs(s_ref::DECIMAL(38,0) * n_cur
        |      - s_cur::DECIMAL(38,0) * n_ref)::DECIMAL(38,0)::VARCHAR AS d_u
        |FROM r JOIN c ON r.i = c.i""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      graft.ops.Drift.embeddingShift(
          e.filter(col("label") % 2 === 0),
          e.filter(col("label") % 2 === 1), "embedding")
        .select(col("j"), col("s_ref"), col("n_ref"),
          col("s_cur"), col("n_cur"),
          col("d_u").cast("string").as("d_u"))
    },

    // ---- robust MAD outlier gate: the z-score gate's 50%-breakdown
    //      complement, exact on the cents grid (dyadic medians — no
    //      rounding anywhere) ----
    sql(
      "q_mad_outliers",
      """WITH e AS (SELECT event_id, event_type,
        |        CAST(round(value * 100) AS BIGINT) AS iv FROM events),
        |m AS (SELECT event_type, quantile_cont(iv, 0.5) AS med
        |      FROM e GROUP BY 1),
        |d AS (SELECT e.event_id, e.event_type, e.iv, m.med,
        |        abs(e.iv - m.med) AS dev
        |      FROM e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT event_id, d.event_type, iv
        |FROM d JOIN md USING (event_type)
        |WHERE dev > 5 * mad""".stripMargin) { (s, d) =>
      graft.ops.Robust.madOutliers(
        Tables.events(s, d).select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("iv")),
        group = "event_type", value = "iv", k = 5)
    },

    // ---- seasonal-naive outliers (round 16): the MAD gate over
    //      (event_type, hour-of-day) groups — "unusual FOR 3am" rather
    //      than unusual overall, the ops-monitoring baseline that
    //      needs no model fit. Same dyadic-exact integer percentile
    //      device as q_mad_outliers, composite season key ----
    sql(
      "q_seasonal_outliers",
      """WITH e AS (SELECT event_id, event_type,
        |        hour(ts)::BIGINT AS hr,
        |        CAST(round(value * 100) AS BIGINT) AS iv FROM events),
        |m AS (SELECT event_type, hr, quantile_cont(iv, 0.5) AS med
        |      FROM e GROUP BY 1, 2),
        |d AS (SELECT e.event_id, e.event_type, e.hr, e.iv,
        |        abs(e.iv - m.med) AS dev
        |      FROM e JOIN m USING (event_type, hr)),
        |md AS (SELECT event_type, hr, quantile_cont(dev, 0.5) AS mad
        |       FROM d GROUP BY 1, 2)
        |SELECT event_id, d.event_type, d.hr, iv
        |FROM d JOIN md USING (event_type, hr)
        |WHERE dev > 6 * mad""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
          col("event_id"), col("event_type"),
          hour(col("ts")).cast("long").as("hr"),
          round(col("value") * 100).cast("long").as("iv"))
        .withColumn("season",
          concat_ws("#", col("event_type"), col("hr")))
      graft.ops.Robust.madOutliers(ev, group = "season", value = "iv",
          k = 6)
        .select("event_id", "event_type", "hr", "iv")
    },

    // ---- Laplace-mechanism release seam: per-group counts + inverse-
    //      CDF Laplace noise from the deterministic md5 draw (salt is
    //      the privacy lever — see ops/Privacy honesty note) ----
    sql(
      "q_dp_counts",
      s"""WITH g AS (SELECT l_returnflag AS grp, count(*) AS n
         |           FROM lineitem GROUP BY 1),
         |u AS (SELECT grp, n,
         |        (CAST('0x' || substr(md5('dp9' || grp), 1,
         |           ${graft.ops.Sampling.PrefixHexLen}) AS BIGINT) + 0.5)
         |          / 4294967296.0 AS uu
         |      FROM g)
         |SELECT grp, n,
         |  n + round(-2.0 * sign(uu - 0.5)
         |            * ln(1 - 2 * abs(uu - 0.5)), 9) AS noisy_n
         |FROM u""".stripMargin) { (s, d) =>
      graft.ops.Privacy.laplaceNoisyCounts(
        Tables.lineitem(s, d).select(col("l_returnflag").as("grp")),
        group = "grp", epsilon = 0.5, salt = "dp9")
    },

    // ---- DP SUM release with per-user clipping: each customer's
    //      within-priority order total clamps to $500k (cents grid)
    //      before the Laplace(clip/eps) noise — the bounded-
    //      sensitivity companion to q_dp_counts ----
    sql(
      "q_dp_sum", {
        val b = 50000000L / 0.5 // clip/eps, shared literal
        s"""WITH per AS (
           |  SELECT o_orderpriority AS grp, o_custkey,
           |    least(greatest(sum(CAST(round(o_totalprice * 100)
           |      AS BIGINT)), 0), 50000000) AS c
           |  FROM orders GROUP BY 1, 2),
           |g AS (SELECT grp, count(*)::BIGINT AS n_users,
           |        sum(c)::BIGINT AS clipped_sum FROM per GROUP BY 1),
           |u AS (SELECT grp, n_users, clipped_sum,
           |        (CAST('0x' || substr(md5('dps' || grp), 1,
           |           ${graft.ops.Sampling.PrefixHexLen}) AS BIGINT) + 0.5)
           |          / 4294967296.0 AS uu
           |      FROM g)
           |SELECT grp, n_users, clipped_sum,
           |  clipped_sum + round(-$b * sign(uu - 0.5)
           |            * ln(1 - 2 * abs(uu - 0.5)), 9) AS noisy_sum
           |FROM u""".stripMargin
      }) { (s, d) =>
      graft.ops.Privacy.laplaceNoisySums(
        Tables.orders(s, d).select(
          col("o_orderpriority").as("grp"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        group = "grp", user = "o_custkey", value = col("cents"),
        clip = 50000000L, epsilon = 0.5, salt = "dps")
    },

    // ---- k-anonymity suppression: customers whose (nation, mktsegment)
    //      combination has fewer than 10 members are withheld from the
    //      release ----
    sql(
      "q_k_anonymity",
      """SELECT c_custkey, c_nationkey, c_mktsegment
        |FROM customer
        |WHERE (c_nationkey, c_mktsegment) IN (
        |  SELECT (c_nationkey, c_mktsegment)
        |  FROM customer GROUP BY c_nationkey, c_mktsegment
        |  HAVING count(*) >= 10)""".stripMargin) { (s, d) =>
      graft.ops.Privacy.kAnonymize(
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment")),
        quasi = Seq("c_nationkey", "c_mktsegment"), k = 10L)
    },

    // ---- l-diversity: (nation, segment) cells must carry at least 3
    //      distinct order priorities among their customers' orders —
    //      the uniform-sensitive-value leak k-anonymity misses ----
    sql(
      "q_l_diversity",
      """WITH j AS (
        |  SELECT o_orderkey, c_nationkey, c_mktsegment, o_orderpriority
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |ok AS (
        |  SELECT c_nationkey, c_mktsegment
        |  FROM j GROUP BY 1, 2
        |  HAVING count(DISTINCT o_orderpriority) >= 3)
        |SELECT o_orderkey, c_nationkey, c_mktsegment, o_orderpriority
        |FROM j
        |WHERE (c_nationkey, c_mktsegment) IN (SELECT (c_nationkey,
        |  c_mktsegment) FROM ok)""".stripMargin) { (s, d) =>
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"),
          col("c_mktsegment"), col("o_orderpriority"))
      graft.ops.Privacy.lDiversify(
        j, quasi = Seq("c_nationkey", "c_mktsegment"),
        sensitive = "o_orderpriority", l = 3L)
    },

    // ---- t-closeness: the distribution-distance leak k and l both
    //      miss — per (nation, segment) cell, total-variation distance
    //      of the order-priority distribution from the corpus-wide
    //      one, exact integer num/den, breach at t = 1/5 ----
    sql(
      "q_t_closeness",
      """WITH j AS (
        |  SELECT c_nationkey, c_mktsegment, o_orderpriority
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cnt AS (
        |  SELECT c_nationkey, c_mktsegment, o_orderpriority,
        |    count(*)::BIGINT AS n_gv
        |  FROM j GROUP BY 1, 2, 3),
        |ng AS (SELECT c_nationkey, c_mktsegment,
        |         sum(n_gv)::BIGINT AS n_g FROM cnt GROUP BY 1, 2),
        |nv AS (SELECT o_orderpriority, sum(n_gv)::BIGINT AS n_v
        |       FROM cnt GROUP BY 1),
        |tot AS (SELECT sum(n_v)::BIGINT AS nn FROM nv),
        |t AS (
        |  SELECT l.c_nationkey, l.c_mktsegment, l.n_g,
        |    abs(coalesce(c.n_gv, 0) * (SELECT nn FROM tot)
        |        - l.n_v * l.n_g) AS term
        |  FROM (SELECT * FROM ng CROSS JOIN nv) l
        |  LEFT JOIN cnt c
        |    ON c.c_nationkey = l.c_nationkey
        |   AND c.c_mktsegment = l.c_mktsegment
        |   AND c.o_orderpriority = l.o_orderpriority)
        |SELECT c_nationkey, c_mktsegment, n_g,
        |  sum(term)::BIGINT AS tvd_num,
        |  (2 * n_g * (SELECT nn FROM tot))::BIGINT AS tvd_den,
        |  5 * sum(term) > 2 * n_g * (SELECT nn FROM tot) AS breaches
        |FROM t GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("o_orderpriority"))
      graft.ops.Privacy.tCloseness(
        j, quasi = Seq("c_nationkey", "c_mktsegment"),
        sensitive = "o_orderpriority", tNum = 1L, tDen = 5L)
    },

    // ---- train-side cutpoints stamped onto serving data: quantile
    //      bounds from the even-keyed half of orders, applied map-side
    //      (broadcast one-row cuts + HOF count) to the odd-keyed half
    //      — the feature-store binning pattern whose output bins feed
    //      psiBinned as the production drift gate ----
    sql(
      "q_cutpoint_binning",
      """WITH r AS (SELECT o_totalprice AS v FROM orders
        |           WHERE o_orderkey % 2 = 0),
        |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
        |         count(*) OVER () AS n FROM r),
        |b AS (SELECT ((rn - 1) * 8) // n AS bin, min(v) AS cut
        |      FROM rk GROUP BY 1),
        |cuts AS (SELECT list(cut ORDER BY cut) AS cs FROM b WHERE bin >= 1)
        |SELECT o_orderkey,
        |  len(list_filter((SELECT cs FROM cuts),
        |                  c -> c <= o_totalprice))::BIGINT AS bin
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      val cuts = Drift.refCutpoints(
        o.filter(col("o_orderkey") % 2 === 0), col("o_totalprice"),
        k = 8, numPartitions = 32)
      Drift.applyCutpoints(
          o.filter(col("o_orderkey") % 2 === 1), col("o_totalprice"), cuts)
        .select(col("o_orderkey"), col("bin"))
    })
}
