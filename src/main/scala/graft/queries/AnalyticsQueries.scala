package graft.queries

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic analytics surface BEYOND the reference's inventory (SURVEY
  * .md §2.4-2.5 records windows / rollup / pivot / percentiles / set
  * ops as absent there): a complete engine offers them, so each is
  * registered with a DuckDB oracle. Where per-group top-k is the real
  * workload, [[graft.plans.TopKPerGroup]] (bounded heap, no sort)
  * remains the scale path — the window queries here are the general
  * ranking/lag/running-total forms.
  */
object AnalyticsQueries {
  import QueryDef.sql

  val defs: Seq[QueryDef] = Seq(

    // ---- ranking + lag + running sum over event time ----
    // (event_id tiebreak: (user_id, ts) is unique in the data, but a
    // total order must never depend on that accident)
    sql(
      "q_window_rank",
      """SELECT event_id, user_id,
        |  row_number() OVER w AS rn,
        |  round(coalesce(lag(value) OVER w, 0.0), 2) AS prev_value,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING), 2) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          row_number().over(w).as("rn"),
          round(coalesce(lag(col("value"), 1).over(w), lit(0.0)), 2)
            .as("prev_value"),
          round(sum(col("value")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_value"))
    },

    // ---- global row_number at scale: range-partitioned, never the
    //      single-partition empty-window funnel ----
    sql(
      "q_global_rank",
      """SELECT o_orderkey, o_totalprice,
        |  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders""".stripMargin) { (s, d) =>
      graft.ops.Layout.globalRowNumber(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        numPartitions = 32)
    },

    // ---- rollup: subtotals + grand total with null indicators ----
    sql(
      "q_rollup",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2)::DECIMAL(18,2)::VARCHAR AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .rollup("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("n"),
            Canon.money(round(sum(col("o_totalprice")), 2)).as("total"))
    },

    // ---- explicit GROUPING SETS (the general form behind
    //      rollup/cube): two single-column subtotal sets, no grand
    //      total — exactly the sets listed, nothing implied ----
    sql(
      "q_grouping_sets",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2)::DECIMAL(18,2)::VARCHAR AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
            col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            Canon.money(round(sum(col("o_totalprice")), 2)).as("total"))
    },

    // ---- cube: all 2^k grouping-set combinations (completes the
    //      rollup/pivot/grouping-sets family) ----
    sql(
      "q_cube",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2)::DECIMAL(18,2)::VARCHAR AS total
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .cube("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("n"),
            Canon.money(round(sum(col("o_totalprice")), 2)).as("total"))
    },

    // ---- JSON scalar functions: build a JSON payload column, then
    //      extract by path (string face) and parse back through a
    //      schema (typed face) — the semi-structured column idiom ----
    sql(
      "q_json_extract",
      """SELECT n_nationkey,
        |  to_json(struct_pack(n_name := n_name,
        |                      n_nationkey := n_nationkey))::VARCHAR
        |    AS payload,
        |  json_extract_string(
        |    to_json(struct_pack(n_name := n_name,
        |                        n_nationkey := n_nationkey)),
        |    '$.n_name') AS name_extracted,
        |  json_extract_string(
        |    to_json(struct_pack(n_name := n_name,
        |                        n_nationkey := n_nationkey)),
        |    '$.n_nationkey')::BIGINT AS key_parsed
        |FROM nation""".stripMargin) { (s, d) =>
      val j = Canon.js(struct(col("n_name"), col("n_nationkey")))
      Tables.nation(s, d).select(
        col("n_nationkey"),
        j.as("payload"),
        get_json_object(j, "$.n_name").as("name_extracted"),
        from_json(j, org.apache.spark.sql.types.StructType.fromDDL(
            "n_name STRING, n_nationkey BIGINT"))
          .getField("n_nationkey").as("key_parsed"))
    },

    // ---- Spark 4 VariantType: parse_json into the binary variant
    //      encoding, extract typed values by path — the engine-native
    //      semi-structured column (shredded storage scale path),
    //      next to the string-face q_json_extract ----
    sql(
      "q_variant",
      """SELECT o_orderkey,
        |  json_extract_string(
        |    to_json(struct_pack(status := o_orderstatus,
        |                        price := o_totalprice)),
        |    '$.status') AS status,
        |  round(json_extract_string(
        |    to_json(struct_pack(status := o_orderstatus,
        |                        price := o_totalprice)),
        |    '$.price')::DOUBLE, 2) AS price
        |FROM orders WHERE o_orderkey < 1000""".stripMargin) { (s, d) =>
      val payload = Canon.js(struct(
        col("o_orderstatus").as("status"), col("o_totalprice").as("price")))
      val v = parse_json(payload)
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          variant_get(v, "$.status", "string").as("status"),
          round(variant_get(v, "$.price", "double"), 2).as("price"))
    },

    // ---- pivot with pinned value set (deterministic columns) ----
    sql(
      "q_pivot",
      """SELECT user_id,
        |  round(coalesce(sum(value) FILTER (event_type = 'click'), 0.0), 2)
        |    AS click,
        |  round(coalesce(sum(value) FILTER (event_type = 'view'), 0.0), 2)
        |    AS view,
        |  round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0.0), 2)
        |    AS purchase
        |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(round(coalesce(sum(col("value")), lit(0.0)), 2))
        .select(col("user_id"),
          coalesce(col("click"), lit(0.0)).as("click"),
          coalesce(col("view"), lit(0.0)).as("view"),
          coalesce(col("purchase"), lit(0.0)).as("purchase"))
    },

    // ---- exact percentiles (linear interpolation both engines) ----
    sql(
      "q_percentile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 2) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 2).as("p50"),
          round(percentile(col("l_quantity"), lit(0.9)), 2).as("p90"))
    },

    // ---- as-of join: latest prior click per purchase, per user ----
    // (union + one shuffle/sort + running window — the merge-join
    // formulation; DuckDB checks it with its native ASOF JOIN)
    sql(
      "q_asof_join",
      """SELECT p.event_id, p.user_id,
        |  CAST(p.ts AS TIMESTAMP) AS ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("value").as("click_value"))
        graft.ops.TemporalJoins.asofJoin(
          purchases, clicks, keyCol = "user_id", timeCol = "ts",
          payload = Seq("click_value"))
    },

    // ---- range join via binning: quantity -> band dimension ----
    sql(
      "q_band_join",
      """SELECT l_orderkey, l_linenumber, l_quantity, band
        |FROM lineitem
        |JOIN (VALUES ('low', 0.0, 15.0), ('mid', 15.0, 35.0),
        |             ('high', 35.0, 60.0)) bands(band, lo, hi)
        |  ON l_quantity >= lo AND l_quantity < hi""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val bands = Seq(("low", 0.0, 15.0), ("mid", 15.0, 35.0),
          ("high", 35.0, 60.0)).toDF("band", "lo", "hi")
        graft.ops.TemporalJoins.bandJoin(
            Tables.lineitem(s, d)
              .select("l_orderkey", "l_linenumber", "l_quantity"),
            "l_quantity", bands, "lo", "hi", binWidth = 20.0)
          .select("l_orderkey", "l_linenumber", "l_quantity", "band")
    },

    // ---- set ops: distinct-semantics intersect / except ----
    sql(
      "q_set_ops",
      """SELECT c_custkey, 'both' AS src FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS src FROM (
        |  SELECT c_custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey FROM orders)""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      val both = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey").intersect(o)
        .withColumn("src", lit("both"))
      val noOrders = c.select("c_custkey").except(o)
        .withColumn("src", lit("no_orders"))
      both.unionByName(noOrders)
    },

    // ---- MULTISET set ops (round 16): INTERSECT ALL / EXCEPT ALL —
    //      bag semantics with real multiplicities (a part returned
    //      twice and shipped three times survives twice / once),
    //      next to q_set_ops' distinct forms. Shared-dialect string,
    //      both engines ----
    sql(
      "q_set_ops_all",
      """SELECT l_partkey, 'both_ms' AS src FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        |UNION ALL
        |SELECT l_partkey, 'a_only_ms' AS src FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')"""
        .stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_returnflag") === "A").select("l_partkey")
      val r = li.filter(col("l_returnflag") === "R").select("l_partkey")
      a.intersectAll(r).withColumn("src", lit("both_ms"))
        .unionByName(a.exceptAll(r).withColumn("src", lit("a_only_ms")))
    },

    // ---- z-order (Morton) values: magic-mask bit spread replayed in
    //      DuckDB bit ops, stage by stage ----
    sql(
      "q_zorder",
      """WITH t0 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    l_partkey & 65535 AS a, l_suppkey & 65535 AS b
        |  FROM lineitem),
        |t1 AS (SELECT l_orderkey, l_linenumber,
        |  (a | (a << 8)) & 16711935 AS a, (b | (b << 8)) & 16711935 AS b
        |  FROM t0),
        |t2 AS (SELECT l_orderkey, l_linenumber,
        |  (a | (a << 4)) & 252645135 AS a, (b | (b << 4)) & 252645135 AS b
        |  FROM t1),
        |t3 AS (SELECT l_orderkey, l_linenumber,
        |  (a | (a << 2)) & 858993459 AS a, (b | (b << 2)) & 858993459 AS b
        |  FROM t2),
        |t4 AS (SELECT l_orderkey, l_linenumber,
        |  (a | (a << 1)) & 1431655765 AS a, (b | (b << 1)) & 1431655765 AS b
        |  FROM t3)
        |SELECT l_orderkey, l_linenumber, a | (b << 1) AS z
        |FROM t4""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.ops.Layout.zValue(col("l_partkey"), col("l_suppkey"))
          .as("z"))
    },

    // ---- Hilbert index (round 16): the better-locality layout key
    //      next to q_zorder — consecutive cells are always
    //      grid-adjacent, so range-partitioned files cover connected
    //      rectangles. 16 unrolled levels of quadrant+rotate, CASE
    //      arithmetic only; the oracle replays the identical chain ----
    sql(
      "q_hilbert",
      graft.ops.Layout.hilbertOracleSql(
        "SELECT l_orderkey, l_linenumber, l_partkey AS x, " +
          "l_suppkey AS y FROM lineitem",
        Seq("l_orderkey", "l_linenumber"), "h")) { (s, d) =>
      graft.ops.Layout.withHilbert(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        col("l_partkey"), col("l_suppkey"), "h")
        .select("l_orderkey", "l_linenumber", "h")
    },

    // ---- heavy-hitter diagnostic: salted count + bounded-heap top-k ----
    sql(
      "q_hot_keys",
      """SELECT l_suppkey, n, rank FROM (
        |  SELECT l_suppkey, n,
        |    row_number() OVER (ORDER BY n DESC, l_suppkey) AS rank
        |  FROM (SELECT l_suppkey, count(*) AS n
        |        FROM lineitem GROUP BY l_suppkey))
        |WHERE rank <= 10""".stripMargin) { (s, d) =>
      graft.ops.Skew.hotKeys(
          Tables.lineitem(s, d), Seq("l_suppkey"), k = 10,
          tie = col("l_suppkey"))
        .select(col("l_suppkey"), col("n"),
          col("rank").cast("long").as("rank"))
    },

    // ---- mergeable HLL distinct sketches: batch sketches union to
    //      the corpus estimate; exact at dimension-scale cardinality
    //      (pinned by SketchExactnessCheck), hence oracle-able ----
    sql(
      "q_sketch_distinct",
      """SELECT lang, 'source' AS col_name,
        |  count(DISTINCT source) AS n_distinct_est
        |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
      graft.ops.Profile.mergeDistinctSketches(
        graft.ops.Profile.distinctSketches(
          Tables.documents(s, d), Seq("lang"), Seq("source")),
        Seq("lang"))
    },

    // ---- one-pass column profiling (ANALYZE-style long format) ----
    sql(
      "q_profile", {
        def one(c: String) =
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  count(*) - count($c) AS n_null,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_value,
             |  CAST(max($c) AS VARCHAR) AS max_value FROM documents"""
            .stripMargin
        Seq("lang", "source", "n_chars").map(one)
          .mkString("\nUNION ALL\n")
      }) { (s, d) =>
      graft.ops.Profile.profile(
        Tables.documents(s, d), Seq("lang", "source", "n_chars"))
    },

    // ---- time-series gap fill: dense hourly per-user grid, last
    //      observation carried forward (ops/TimeSeries.gapFill) ----
    //      decimal-routed sums + ::VARCHAR so both engines print the
    //      identical fixed-scale string
    sql(
      "q_gap_fill",
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    sum(value::DECIMAL(18,2)) AS v
        |  FROM events GROUP BY 1, 2),
        |sp AS (
        |  SELECT user_id,
        |    unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        |  FROM (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        |        FROM b GROUP BY 1)),
        |j AS (SELECT sp.user_id, sp.bucket, b.v
        |      FROM sp LEFT JOIN b
        |        ON sp.user_id = b.user_id AND sp.bucket = b.bucket)
        |SELECT user_id, CAST(bucket AS TIMESTAMP) AS bucket,
        |  v::VARCHAR AS value,
        |  (last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND CURRENT ROW))::VARCHAR AS filled,
        |  v IS NOT NULL AS observed
        |FROM j""".stripMargin) { (s, d) =>
      graft.ops.TimeSeries.gapFill(
          Tables.events(s, d), key = "user_id", ts = "ts",
          valueAgg = sum(col("value").cast("decimal(18,2)")),
          truncUnit = "hour")
        .select(col("user_id"), col("bucket"),
          col("value").cast("string").as("value"),
          col("filled").cast("string").as("filled"),
          col("observed"))
    },

    // ---- LINEAR-interpolation gap fill: the numeric series variant
    //      (LOCF fabricates plateaus) — uniform-spine row offsets make
    //      the weights exact integers on the cents grid; edges stay
    //      NULL (no extrapolation) ----
    sql(
      "q_gap_interp",
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |sp AS (
        |  SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        |  FROM (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        |        FROM b GROUP BY 1)),
        |j AS (SELECT sp.event_type, sp.bucket, b.v
        |      FROM sp LEFT JOIN b USING (event_type, bucket)),
        |w1 AS (SELECT event_type, bucket, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |       FROM j),
        |w2 AS (SELECT event_type, bucket, v, rn,
        |  last_value(v IGNORE NULLS) OVER wb AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |    OVER wb AS pr,
        |  first_value(v IGNORE NULLS) OVER wf AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |    OVER wf AS nr
        |  FROM w1
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, CAST(bucket AS TIMESTAMP) AS bucket,
        |  v AS value,
        |  CASE WHEN v IS NOT NULL THEN v::DOUBLE
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         round((pv * (nr - pr) + (nv - pv) * (rn - pr))::DOUBLE
        |               / (nr - pr), 6)
        |  END AS interp,
        |  v IS NOT NULL AS observed
        |FROM w2""".stripMargin) { (s, d) =>
      graft.ops.TimeSeries.gapFillLinear(
        Tables.events(s, d), key = "event_type", ts = "ts",
        valueAgg = sum(round(col("value") * 100).cast("long")),
        truncUnit = "hour")
    },

    // ---- rolling per-key stats (5-row trailing frame): decimal sum,
    //      exact min/max — the feature-engineering window shape ----
    sql(
      "q_rolling_stats",
      """SELECT event_id, user_id,
        |  (sum(value::DECIMAL(18,2)) OVER w5)::VARCHAR AS roll_sum,
        |  round(min(value) OVER w5, 2) AS roll_min,
        |  round(max(value) OVER w5, 2) AS roll_max,
        |  count(*) OVER w5 AS roll_n
        |FROM events
        |WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (s, d) =>
        val w5 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,2)")).over(w5)
            .cast("string").as("roll_sum"),
          round(min(col("value")).over(w5), 2).as("roll_min"),
          round(max(col("value")).over(w5), 2).as("roll_max"),
          count(lit(1)).over(w5).as("roll_n"))
    },

    // ---- fixed-width histogram (map-side binning + one agg) ----
    sql(
      "q_histogram",
      """SELECT CAST(floor(value/10) AS INTEGER) AS bucket, count(*) AS n,
        |  (sum(value::DECIMAL(18,2)))::VARCHAR AS total
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(floor(col("value") / 10).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("string").as("total"))
    },

    // ---- z-score outliers with EXACT integer arithmetic: the
    //      |v − μ| > 2σ test rearranged to (iv·n − s)² > 4(n·ss − s²)
    //      over integer cents — no float mean/stddev, so the verdict
    //      is bit-portable across engines and partitionings (a float
    //      stddev is neither). The moments and the deviation run in
    //      128-bit-class integers (decimal(38,0) / HUGEINT): with
    //      cents ~1e6 the squared deviation alone passes 2^63 around
    //      1e6 rows per group, where BIGINT would hard-error under
    //      ANSI instead of returning a verdict. decimal(38,0) keeps
    //      the test exact to ~1e12 rows/group (moments ≤ ~1e33 ≪
    //      1e38), and the moment frame is |groups|-sized, so the wide
    //      type costs nothing on the fact-table side. ----
    sql(
      "q_outliers",
      """WITH e AS (SELECT event_id, event_type, value,
        |             CAST(round(value*100) AS BIGINT) AS iv FROM events),
        |st AS (SELECT event_type, count(*)::HUGEINT AS n,
        |         sum(iv::HUGEINT) AS s, sum(iv::HUGEINT * iv) AS ss
        |       FROM e GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value
        |FROM e JOIN st USING (event_type)
        |WHERE (e.iv*st.n - st.s)*(e.iv*st.n - st.s)
        |  > 4*(st.n*st.ss - st.s*st.s)""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("event_id"), col("event_type"), col("value"),
        round(col("value") * 100).cast("long").as("iv"))
      // per-type moments: rows = |event_type| — always broadcastable.
      // iv is cast to decimal BEFORE the square so the per-row product
      // is already wide; sums of decimal(38,0) stay decimal(38,0).
      val wide = col("iv").cast("decimal(38,0)")
      val st = e.groupBy("event_type").agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(wide).as("s"),
        sum(wide * col("iv")).as("ss"))
      val dev = wide * col("n") - col("s")
      e.join(broadcast(st), "event_type")
        .filter(dev * dev > lit(4L) * (col("n") * col("ss") - col("s") * col("s")))
        .select("event_id", "event_type", "value")
    },

    // ---- ordered funnel: users who viewed, then clicked after that
    //      view, then purchased after that click. Greedy earliest-
    //      event semantics are exact for existence: if ANY ordered
    //      triple exists, the earliest view admits an earliest
    //      subsequent click, which admits a purchase. Each stage is an
    //      event_type-pruned scan joined per-user; the per-user minima
    //      frames are key-sized and broadcast under AQE. ----
    sql(
      "q_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS t FROM events
        |           WHERE event_type='view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t
        |      WHERE e.event_type='click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t
        |      WHERE e.event_type='purchase' GROUP BY 1)
        |SELECT p.user_id, CAST(v.t AS TIMESTAMP) AS first_view,
        |  CAST(c.t AS TIMESTAMP) AS first_click,
        |  CAST(p.t AS TIMESTAMP) AS first_purchase
        |FROM p JOIN c ON p.user_id = c.user_id
        |JOIN v ON p.user_id = v.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("first_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("first_view"))
        .groupBy("user_id").agg(min("ts").as("first_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("first_click"))
        .groupBy("user_id").agg(min("ts").as("first_purchase"))
      p.join(c, "user_id").join(v, "user_id")
        .select("user_id", "first_view", "first_click", "first_purchase")
    },

    // ---- batch sessionization: 30-min-gap session split, one
    //      key-partitioned exchange shared by lag probe, boundary
    //      running sum, and session aggregation; gaps compared in
    //      exact integer microseconds, ties broken by event_id (a
    //      tie's gap is 0, so boundaries are tie-order independent) ----
    sql(
      "q_sessionize",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_idx
        |  FROM o)
        |SELECT user_id, session_idx,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) AS TIMESTAMP) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin) { (s, d) =>
      graft.ops.TimeSeries.sessionize(
        Tables.events(s, d), "user_id", "ts", "event_id",
        gapSeconds = 1800L)
    },

    // ---- per-group min-max normalization (feature scaling): the
    //      bounds frame is |groups|-sized and broadcasts; min/max are
    //      exact selections and (v-lo)/(hi-lo) is the same IEEE ops on
    //      both engines, so the scores compare at FULL precision ----
    sql(
      "q_normalize",
      """WITH st AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        |            FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  (e.value - st.lo) / (st.hi - st.lo) AS norm_value
        |FROM events e JOIN st USING (event_type)
        |WHERE st.hi > st.lo""".stripMargin) { (s, d) =>
      val st = Tables.events(s, d).groupBy("event_type")
        .agg(min("value").as("lo"), max("value").as("hi"))
      Tables.events(s, d).join(broadcast(st), "event_type")
        .filter(col("hi") > col("lo"))
        .select(col("event_id"), col("event_type"),
          ((col("value") - col("lo")) / (col("hi") - col("lo")))
            .as("norm_value"))
    },

    // ---- cohort retention: users grouped by first-seen week, counted
    //      in each later active week. Two aggregations over one fact
    //      (first-seen is key-grain and broadcasts back); offsets are
    //      exact integer week arithmetic on both engines ----
    sql(
      "q_retention",
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |      FROM events)
        |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_week,
        |  CAST(date_diff('day', f.cohort, a.wk) // 7 AS INTEGER)
        |    AS week_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val f = ev.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).as("cohort_week"))
      ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
        .join(broadcast(f), "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
            .as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
    },

    // ---- market-basket pair mining: parts co-occurring in an order,
    //      support-thresholded. The pair join is basket-local (equi on
    //      the order key, already the table's natural clustering), so
    //      fan-out is bounded by basket size² — never corpus² ----
    sql(
      "q_basket_pairs",
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
        |               FROM lineitem)
        |SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS support
        |FROM items x JOIN items y
        |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin) { (s, d) =>
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      items.as("x").join(items.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    },

    // ---- winsorization: clip values at per-group p05/p95. The
    //      thresholds land on the 2-decimal grid BEFORE clamping, so
    //      both the comparisons (against exact 2-decimal data) and
    //      the replacement values are bit-identical across engines —
    //      no output rounding needed. One tiny broadcast, map-side
    //      clamp ----
    sql(
      "q_winsorize",
      """WITH thr AS (
        |  SELECT event_type, round(quantile_cont(value, 0.05), 2) AS lo,
        |    round(quantile_cont(value, 0.95), 2) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  CASE WHEN e.value < thr.lo THEN thr.lo
        |       WHEN e.value > thr.hi THEN thr.hi
        |       ELSE e.value END AS clipped
        |FROM events e JOIN thr USING (event_type)""".stripMargin) {
      (s, d) =>
        val thr = Tables.events(s, d).groupBy("event_type").agg(
          round(percentile(col("value"), lit(0.05)), 2).as("lo"),
          round(percentile(col("value"), lit(0.95)), 2).as("hi"))
        Tables.events(s, d).join(broadcast(thr), "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            when(col("value") < col("lo"), col("lo"))
              .when(col("value") > col("hi"), col("hi"))
              .otherwise(col("value")).as("clipped"))
    },

    // ---- deterministic Poisson bootstrap: 16 resamples of the mean
    //      document length — the error bar on a corpus metric in ONE
    //      pass. Weights come from md5 draws against Poisson(1) CDF
    //      thresholds baked as shared integer literals, so membership
    //      and every exact sum hash-check across engines ----
    sql(
      "q_bootstrap_ci", {
        val cases = graft.ops.Profile.PoissonCdfU.zipWithIndex
          .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
        s"""WITH r AS (
           |  SELECT b.b, d.n_chars,
           |    CAST('0x' || substr(md5('bs' || b.b || '#' || d.doc_id),
           |      1, 8) AS BIGINT) AS u
           |  FROM documents d
           |  CROSS JOIN (SELECT unnest(range(16)) AS b) b),
           |w AS (SELECT b, n_chars,
           |        CASE $cases
           |          ELSE ${graft.ops.Profile.PoissonCdfU.length} END AS w
           |      FROM r)
           |SELECT b::INT AS b, CAST(sum(w) AS BIGINT) AS n_eff,
           |  CAST(sum(w * n_chars) AS BIGINT) AS sum_val,
           |  round(CAST(sum(w * n_chars) AS DOUBLE) / sum(w), 6)
           |    AS mean_val
           |FROM w GROUP BY b""".stripMargin
      }) { (s, d) =>
      graft.ops.Profile.poissonBootstrap(
        Tables.documents(s, d), col("doc_id"), col("n_chars"), b = 16)
    },

    // ---- deterministic paired sign-flip permutation test: is the
    //      per-doc difference between two length metrics (chars vs
    //      6·tokens) centered on zero? 200 md5-seeded flips, p as
    //      exact integers p_num/p_den + one rounded division ----
    sql(
      "q_perm_test",
      s"""WITH d AS (
         |  SELECT doc_id,
         |    n_chars - 6 * len(string_split(${TextQueries.NormSql}, ' ')) AS dd
         |  FROM documents),
         |o AS (SELECT count(*)::BIGINT AS n,
         |        sum(dd)::BIGINT AS obs_diff FROM d),
         |f AS (
         |  SELECT b.b, dd,
         |    CASE WHEN CAST('0x' ||
         |        substr(md5('pt' || b.b || '#' || d.doc_id), 1, 8)
         |        AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM d CROSS JOIN (SELECT unnest(range(200)) AS b) b),
         |s AS (SELECT b, sum(sgn * dd)::BIGINT AS sb FROM f GROUP BY 1)
         |SELECT o.n, o.obs_diff,
         |  sum(CASE WHEN abs(sb) >= abs(o.obs_diff)
         |      THEN 1 ELSE 0 END)::BIGINT AS b_exceed,
         |  (sum(CASE WHEN abs(sb) >= abs(o.obs_diff)
         |      THEN 1 ELSE 0 END) + 1)::BIGINT AS p_num,
         |  201::BIGINT AS p_den,
         |  round((sum(CASE WHEN abs(sb) >= abs(o.obs_diff)
         |      THEN 1 ELSE 0 END) + 1)::DOUBLE / 201.0, 6) AS p_value
         |FROM s, o GROUP BY o.n, o.obs_diff""".stripMargin) { (s, d) =>
      graft.ops.Profile.signFlipTest(
        Tables.documents(s, d), col("doc_id"),
        a = col("n_chars"),
        b = lit(6) * size(graft.ops.Text.words(
          graft.ops.Text.normalize(col("text")))),
        resamples = 200)
    },

    // ---- per-event-type OLS trend of value over time (drift
    //      DIRECTION next to the PSI magnitude gates): exact
    //      cross-multiplied numerator/denominator as DECIMAL(38,0)
    //      strings, one final division on identical operands ----
    sql(
      "q_trend_slope",
      """WITH p AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |a AS (SELECT event_type, count(*) AS n,
        |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
        |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
        |  FROM p GROUP BY 1)
        |SELECT event_type, n,
        |  (n * sxy - sx * sy)::VARCHAR AS num,
        |  (n * sxx - sx * sx)::VARCHAR AS den,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |        / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope
        |FROM a
        |WHERE n * sxx - sx * sx <> 0""".stripMargin) { (s, d) =>
      graft.ops.TimeSeries.trendSlopes(
        Tables.events(s, d), "event_type",
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))),
        round(col("value") * 100).cast("long"))
    },

    // ---- one-sided CUSUM changepoint detection per event type: the
    //      Page recursion via its closed form (cumsum + running min —
    //      two windows, no recursion), exact BIGINT cents, alarms at
    //      the shared integer threshold ----
    sql(
      "q_cusum",
      """WITH v AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(round(value * 100) AS BIGINT) - 6000 AS y
        |  FROM events),
        |c1 AS (
        |  SELECT event_id, event_type, ts,
        |    sum(y) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS cs
        |  FROM v),
        |c2 AS (
        |  SELECT event_id, event_type, cs,
        |    min(cs) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS smin
        |  FROM c1)
        |SELECT event_id, event_type,
        |  (cs - least(smin, 0))::BIGINT AS s_u,
        |  cs - least(smin, 0) > 50000 AS alarm
        |FROM c2""".stripMargin) { (s, d) =>
      graft.ops.TimeSeries.cusum(
          Tables.events(s, d), "event_type",
          Seq(col("ts"), col("event_id")),
          round(col("value") * 100).cast("long"), drift = 6000L,
          threshold = 50000L)
        .select("event_id", "event_type", "s_u", "alarm")
    },

    // ---- per-source DATASET CARD: the publication artifact every
    //      corpus release ships — size, token mass, length, language
    //      mix, dominant language, exact-dup count — one corpus scan
    //      per statistic family, dim-sized everything after ----
    sql(
      "q_data_card",
      s"""WITH base AS (
         |  SELECT source, lang, n_chars,
         |    len(string_split(${TextQueries.NormSql}, ' ')) AS toks,
         |    md5(text) AS h
         |  FROM documents),
         |agg AS (
         |  SELECT source,
         |    count(*)::BIGINT AS n_docs,
         |    sum(toks)::BIGINT AS n_tokens,
         |    round(sum(n_chars)::DOUBLE / count(*), 6) AS mean_chars,
         |    count(DISTINCT lang)::BIGINT AS n_langs,
         |    (count(*) - count(DISTINCT h))::BIGINT AS dup_docs
         |  FROM base GROUP BY source),
         |m AS (
         |  SELECT source, lang AS top_lang FROM (
         |    SELECT source, lang,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY count(*) DESC, lang NULLS LAST) AS rn
         |    FROM base GROUP BY source, lang) WHERE rn = 1)
         |SELECT a.source, n_docs, n_tokens, mean_chars, n_langs,
         |  top_lang, dup_docs
         |FROM agg a JOIN m ON m.source = a.source""".stripMargin) {
      (s, d) =>
        val base = Tables.documents(s, d).select(
          col("source"), col("lang"), col("n_chars"),
          size(graft.ops.Text.words(graft.ops.Text.normalize(col("text"))))
            .cast("long").as("toks"),
          md5(col("text").cast("binary")).as("h"))
        val agg = base.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
            .as("mean_chars"),
          countDistinct(col("lang")).as("n_langs"),
          (count(lit(1)) - countDistinct(col("h"))).as("dup_docs"))
        val mode = base.groupBy("source", "lang")
          .agg(count(lit(1)).as("__n"))
          .withColumn("__rn", row_number().over(
            Window.partitionBy("source")
              .orderBy(col("__n").desc, col("lang").asc_nulls_last)))
          .filter(col("__rn") === 1)
          .select(col("source"), col("lang").as("top_lang"))
        agg.join(mode, "source")
          .select("source", "n_docs", "n_tokens", "mean_chars",
            "n_langs", "top_lang", "dup_docs")
    },

    // ---- per-group MODE (modal imputation's lookup table): the
    //      count aggregate is corpus-scale with map-side combine; the
    //      argmax window runs over the DIM-SIZED (group × value)
    //      count frame only, ties to the smaller value ----
    sql(
      "q_mode",
      """SELECT source, lang AS mode_lang, n FROM (
        |  SELECT source, lang, count(*) AS n,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY count(*) DESC, lang NULLS LAST) AS rn
        |  FROM documents GROUP BY source, lang)
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      val counts = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      counts
        .withColumn("rn", row_number().over(
          Window.partitionBy("source")
            // Spark defaults ASC NULLS FIRST, DuckDB NULLS LAST — pin
            // explicitly on both sides so a null lang can't diverge
            .orderBy(col("n").desc, col("lang").asc_nulls_last)))
        .filter(col("rn") === 1)
        .select(col("source"), col("lang").as("mode_lang"), col("n"))
    },

    // ---- KMV distinct sketch (round 16): the md5-draw hash makes
    //      the sketch ITSELF engine-portable — the oracle replays the
    //      exact k minimum hashes, the saturation branch, and the
    //      single exact-integer division of the estimator ----
    sql(
      "q_kmv_distinct",
      """WITH h AS (
        |  SELECT DISTINCT CAST('0x' || substr(md5(l_partkey::VARCHAR),
        |    1, 15) AS BIGINT) AS hv
        |  FROM lineitem),
        |r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
        |kk AS (
        |  SELECT count(*)::BIGINT AS n_sketch, max(hv)::BIGINT AS kth_hv
        |  FROM r WHERE rn <= 256)
        |SELECT n_sketch, kth_hv,
        |  round(CASE WHEN n_sketch < 256 THEN n_sketch::DOUBLE
        |    ELSE 255.0 * power(2, 60) / kth_hv END, 6) AS est_distinct
        |FROM kk""".stripMargin) { (s, d) =>
      graft.ops.Kmv.distinctEstimate(
        Tables.lineitem(s, d), col("l_partkey"), k = 256)
    },

    // ---- KMV Jaccard (round 16): overlap of the part sets bought in
    //      even vs odd orders — exact integers end to end (membership
    //      flags on the union's k minimum hashes, ppm division) ----
    sql(
      "q_kmv_jaccard",
      """WITH ha AS (
        |  SELECT DISTINCT CAST('0x' || substr(md5(l_partkey::VARCHAR),
        |    1, 15) AS BIGINT) AS hv, 1 AS in_a, 0 AS in_b
        |  FROM lineitem WHERE l_orderkey % 2 = 0),
        |hb AS (
        |  SELECT DISTINCT CAST('0x' || substr(md5(l_partkey::VARCHAR),
        |    1, 15) AS BIGINT) AS hv, 0 AS in_a, 1 AS in_b
        |  FROM lineitem WHERE l_orderkey % 2 = 1),
        |u AS (
        |  SELECT hv, max(in_a) AS in_a, max(in_b) AS in_b
        |  FROM (SELECT * FROM ha UNION ALL SELECT * FROM hb)
        |  GROUP BY hv),
        |r AS (SELECT *, row_number() OVER (ORDER BY hv) AS rn FROM u),
        |kk AS (
        |  SELECT count(*)::BIGINT AS k_used,
        |    sum(in_a * in_b)::BIGINT AS n_both
        |  FROM r WHERE rn <= 256)
        |SELECT k_used, n_both,
        |  ((n_both * 1000000) // k_used)::BIGINT AS jacc_ppm
        |FROM kk""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      graft.ops.Kmv.jaccardEstimate(
        li.filter(col("l_orderkey") % 2 === 0), col("l_partkey"),
        li.filter(col("l_orderkey") % 2 === 1), col("l_partkey"),
        k = 256)
    },

    // ---- KMV union cardinality (round 16): |A ∪ B| estimated FROM
    //      TWO SKETCHES alone — min-k of the sketch union is the
    //      union's sketch (the mergeability the incremental stores
    //      ride), so distinct counts over arbitrary slice unions come
    //      from k-row states, never a rescan. Oracle replays the
    //      exact minima and the one-division estimator ----
    sql(
      "q_kmv_union",
      """WITH h AS (
        |  SELECT DISTINCT CAST('0x' || substr(md5(l_partkey::VARCHAR),
        |    1, 15) AS BIGINT) AS hv
        |  FROM lineitem WHERE l_orderkey % 2 = 0
        |  UNION
        |  SELECT DISTINCT CAST('0x' || substr(md5(l_suppkey::VARCHAR),
        |    1, 15) AS BIGINT) AS hv
        |  FROM lineitem WHERE l_orderkey % 2 = 1),
        |r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
        |kk AS (
        |  SELECT count(*)::BIGINT AS n_sketch, max(hv)::BIGINT AS kth_hv
        |  FROM r WHERE rn <= 256)
        |SELECT n_sketch, kth_hv,
        |  round(CASE WHEN n_sketch < 256 THEN n_sketch::DOUBLE
        |    ELSE 255.0 * power(2, 60) / kth_hv END, 6) AS est_distinct
        |FROM kk""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val ska = graft.ops.Kmv.sketch(
        li.filter(col("l_orderkey") % 2 === 0), col("l_partkey"), 256)
      val skb = graft.ops.Kmv.sketch(
        li.filter(col("l_orderkey") % 2 === 1), col("l_suppkey"), 256)
      // union's sketch = min-k of the two sketches' union (k rows in,
      // k rows out — the whole estimate touches 2k rows)
      graft.ops.Kmv.estimateFromSketch(
        ska.unionByName(skb).distinct().orderBy("hv").limit(256),
        k = 256)
    },

    // ---- stage-count funnel summary (round 16): the generic
    //      stage-list companion to q_funnel's per-user detail —
    //      Journey.funnel takes ANY ordered stage sequence and emits
    //      per-stage reached-user counts; same strictly-ordered
    //      first-touch semantics, oracle replays the chained
    //      filtered-min joins ----
    sql(
      "q_funnel_stages",
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        |SELECT 'stage1_view' AS stage, count(*)::BIGINT AS n_users
        |FROM s1
        |UNION ALL SELECT 'stage2_click', count(*)::BIGINT FROM s2
        |UNION ALL SELECT 'stage3_purchase', count(*)::BIGINT FROM s3
        |""".stripMargin) { (s, d) =>
      graft.ops.Journey.funnel(Tables.events(s, d), "user_id",
        col("ts"), col("event_type"), Seq("view", "click", "purchase"))
    },

    // ---- first-order journey transition matrix (round 16): adjacent
    //      event-type pairs per user, probabilities as exact ppm ----
    sql(
      "q_transitions",
      """WITH x AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n
        |  FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (
        |  SELECT from_type, sum(n)::BIGINT AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, n, n_from,
        |  ((n * 1000000) // n_from)::BIGINT AS p_ppm
        |FROM c JOIN f USING (from_type)""".stripMargin) { (s, d) =>
      graft.ops.Journey.transitions(Tables.events(s, d), "user_id",
        col("ts"), col("event_id"), col("event_type"))
    },

    // ---- session path mining (round 16): 30-min-gap sessions
    //      rendered as ordered event-type paths, counted — the
    //      oracle replays boundary marking, the running-sum session
    //      id, the ordered string_agg, and the final count ----
    sql(
      "q_session_paths",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |p AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, count(*)::BIGINT AS n_sessions
        |FROM p GROUP BY 1""".stripMargin) { (s, d) =>
      graft.ops.Journey.sessionPaths(Tables.events(s, d), "user_id",
        "ts", "event_id", col("event_type"), gapSeconds = 1800L)
    },

    // ---- last-touch attribution (round 16): every purchase gets
    //      its most recent strictly-preceding view/click — one
    //      ignore-nulls window pass, replayed identically ----
    sql(
      "q_attribution",
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch_type,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch_ts
        |  FROM events)
        |SELECT event_id, user_id, touch_type,
        |  CAST(touch_ts AS TIMESTAMP) AS touch_ts
        |FROM m WHERE event_type = 'purchase'""".stripMargin) { (s, d) =>
      graft.ops.Journey.lastTouchAttribution(
          Tables.events(s, d), "user_id", col("ts"), col("event_id"),
          col("event_type"), Seq("view", "click"), "purchase")
        .select("event_id", "user_id", "touch_type", "touch_ts")
    },

    // ---- association rules on baskets (round 16): directed
    //      confidence/lift as exact parts-per-million integers; the
    //      oracle replays presence counting with a distinct self-join
    //      against the engine's map-side pair expansion ----
    sql(
      "q_assoc_rules",
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem),
        |n AS (SELECT count(DISTINCT bk)::BIGINT AS nb FROM bi),
        |ic AS (SELECT it, count(*)::BIGINT AS n_item FROM bi
        |       GROUP BY 1),
        |pc AS (
        |  SELECT x.it AS xa, y.it AS yb, count(*)::BIGINT AS n_ab
        |  FROM bi x JOIN bi y ON x.bk = y.bk AND x.it < y.it
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |dr AS (SELECT xa AS a, yb AS b2, n_ab FROM pc
        |       UNION ALL SELECT yb, xa, n_ab FROM pc)
        |SELECT dr.a, dr.b2 AS b, n_ab, ia.n_item AS n_a,
        |  ib.n_item AS n_b,
        |  ((n_ab * 1000000) // ia.n_item)::BIGINT AS conf_ppm,
        |  ((n_ab * (SELECT nb FROM n) * 1000000)
        |    // (ia.n_item * ib.n_item))::BIGINT AS lift_ppm
        |FROM dr JOIN ic ia ON dr.a = ia.it
        |        JOIN ic ib ON dr.b2 = ib.it""".stripMargin) { (s, d) =>
      graft.ops.Cooccurrence.associationRules(
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 3L)
    },

    // ---- log-bucketed quantile sketch (round 16, the DDSketch
    //      shape): p50/p90/p99 of cents(l_extendedprice) per return
    //      flag off a ≤1024-bucket count table — pure bit arithmetic
    //      (length(bin(v)), shift, mask), so the oracle replays the
    //      bucket ids, the cumulative walk, and the floor
    //      reconstruction exactly ----
    sql(
      "q_loghist_quantile",
      logHistOracleSql(
        "SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100)" +
          " AS BIGINT) AS v FROM lineitem")) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      graft.ops.LogHist.quantiles(
        graft.ops.LogHist.sketch(base, Seq("g"), col("v")),
        Seq("g"), LogHistQs)
    },

    // ---- the MERGE path of the same sketch: per-month sketches
    //      folded down to the flag level must answer identically —
    //      counts add losslessly, so the oracle is the SAME direct
    //      replay; this face pins the incremental-profiling contract
    //      (per-batch sketch + fold, never a corpus re-scan) through
    //      the driver gate ----
    sql(
      "q_loghist_inc",
      logHistOracleSql(
        "SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100)" +
          " AS BIGINT) AS v FROM lineitem")) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("g"),
        date_format(col("l_shipdate"), "yyyy-MM").as("slice"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      val monthly = graft.ops.LogHist.sketch(
        base, Seq("g", "slice"), col("v"))
      graft.ops.LogHist.quantiles(
        graft.ops.LogHist.merge(monthly, Seq("g")), Seq("g"), LogHistQs)
    },

    TheilSenDef,

    // ---- sketch-driven equi-depth binning (round 16): the quartile
    //      edges come OFF THE SKETCH (≤1024-bucket table), then rows
    //      bin map-side against the broadcast edge table — the
    //      at-scale alternative to q_equidepth's exact global rank:
    //      one aggregation + one map pass, no corpus sort. Bin
    //      populations are approximately equal (bounded by the
    //      sketch's 1/16 relative error), and the oracle replays
    //      edges and binning exactly ----
    sql(
      "q_loghist_binning",
      logHistBinOracle) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      val qs = graft.ops.LogHist.quantiles(
        graft.ops.LogHist.sketch(base, Seq("g"), col("v")),
        Seq("g"), Seq(250000L, 500000L, 750000L))
      val edges = qs.groupBy("g")
        .pivot("q_ppm", Seq(250000L, 500000L, 750000L))
        .agg(first(col("est")))
        .select(col("g"), col("250000").as("e1"),
          col("500000").as("e2"), col("750000").as("e3"))
      base.join(broadcast(edges), "g")
        .select(col("g"),
          ((col("v") > col("e1")).cast("long") +
            (col("v") > col("e2")).cast("long") +
            (col("v") > col("e3")).cast("long")).as("bin"))
        .groupBy(col("g"), col("bin"))
        .agg(count(lit(1)).as("n"))
    })

  private lazy val TheilSenDef =
    // ---- Theil-Sen robust daily trend (round 16): per event type,
    //      the median of all pairwise slopes over the 30-day daily
    //      totals — exact ppm integers, lower median, so the oracle
    //      replays the pair fan-out and the rank pick bit-for-bit.
    //      The robust companion to q_trend_slope's OLS fit ----
    sql(
      "q_theil_sen",
      """WITH p AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |    (((b.y - a.y) * 1000000) // (b.x - a.x))::BIGINT AS sl
        |  FROM p a JOIN p b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |r AS (
        |  SELECT event_type, sl,
        |    row_number() OVER (PARTITION BY event_type ORDER BY sl)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM s)
        |SELECT event_type, n::BIGINT AS n_pairs, sl AS slope_ppm
        |FROM r WHERE rn = (n + 1) // 2""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast("long").as("x"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      graft.ops.Robust.theilSen(daily, "event_type", "x", "y")
    }

  private[queries] lazy val LogHistQs = Seq(500000L, 900000L, 990000L)

  /** Oracle for the sketch-driven binning: replay the sketch, read
    * the three quartile edges, bin, count. */
  private lazy val logHistBinOracle = {
    import graft.ops.LogHist.{bucketSql, floorSql}
    s"""WITH base AS (
       |  SELECT l_returnflag AS g,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
       |  FROM lineitem),
       |sk AS (
       |  SELECT g, ${bucketSql("v")} AS bucket, count(*)::BIGINT AS n
       |  FROM base GROUP BY 1, 2),
       |c AS (
       |  SELECT g, bucket, n,
       |    sum(n) OVER (PARTITION BY g ORDER BY bucket
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(n) OVER (PARTITION BY g) AS total
       |  FROM sk),
       |q AS (SELECT unnest([250000, 500000, 750000])::BIGINT AS q_ppm),
       |hit AS (
       |  SELECT g, q_ppm, min(bucket) AS b
       |  FROM c CROSS JOIN q
       |  WHERE cum >= (total // 1000000) * q_ppm
       |    + ((total % 1000000) * q_ppm + 999999) // 1000000
       |  GROUP BY 1, 2),
       |est AS (SELECT g, q_ppm, (${floorSql("b")})::BIGINT AS est
       |        FROM hit),
       |ed AS (
       |  SELECT g,
       |    max(CASE WHEN q_ppm = 250000 THEN est END) AS e1,
       |    max(CASE WHEN q_ppm = 500000 THEN est END) AS e2,
       |    max(CASE WHEN q_ppm = 750000 THEN est END) AS e3
       |  FROM est GROUP BY 1)
       |SELECT base.g,
       |  ((CASE WHEN v > e1 THEN 1 ELSE 0 END)
       |   + (CASE WHEN v > e2 THEN 1 ELSE 0 END)
       |   + (CASE WHEN v > e3 THEN 1 ELSE 0 END))::BIGINT AS bin,
       |  count(*)::BIGINT AS n
       |FROM base JOIN ed USING (g)
       |GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB replay of sketch → cumulative walk → floor for the three
    * standard quantiles, over any `(g, v)` source query. */
  private[queries] def logHistOracleSql(src: String): String = {
    import graft.ops.LogHist.{bucketSql, floorSql}
    s"""WITH base AS ($src),
       |sk AS (
       |  SELECT g, ${bucketSql("v")} AS bucket, count(*)::BIGINT AS n
       |  FROM base GROUP BY 1, 2),
       |c AS (
       |  SELECT g, bucket, n,
       |    sum(n) OVER (PARTITION BY g ORDER BY bucket
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(n) OVER (PARTITION BY g) AS total
       |  FROM sk),
       |q AS (SELECT unnest([${LogHistQs.mkString(", ")}])::BIGINT
       |        AS q_ppm),
       |hit AS (
       |  SELECT g, q_ppm, min(bucket) AS b
       |  FROM c CROSS JOIN q
       |  WHERE cum >= (total // 1000000) * q_ppm
       |    + ((total % 1000000) * q_ppm + 999999) // 1000000
       |  GROUP BY 1, 2)
       |SELECT g, q_ppm, (${floorSql("b")})::BIGINT AS est
       |FROM hit""".stripMargin
  }
}
