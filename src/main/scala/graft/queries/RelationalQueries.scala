package graft.queries

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.1-2.6) expressed
  * over the TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Scale notes (100 TB mindset):
  *  - dimension joins (region/nation/supplier/part) are `broadcast()`'d
  *    explicitly — never shuffle a fact table for a KB-sized dim;
  *  - aggregates are plain `groupBy` → Catalyst gives partial
  *    (map-side) aggregation automatically;
  *  - float outputs are rounded at their exact-decimal grid so the
  *    oracle hash-compare is stable regardless of summation order.
  */
object RelationalQueries {
  import QueryDef.sql

  /** The raw-SQL front door faces: ONE dialect-intersection string
    * runs through BOTH `spark.sql` (over [[graft.core.Sql]]'s temp
    * views) and the DuckDB oracle — parser-level compatibility, not
    * just two hand-written plans agreeing. */
  private def sharedSql(name: String, text: String): QueryDef =
    sql(name, text) { (s, d) =>
      graft.core.Sql.registerAll(s, d)
      s.sql(text)
    }

  val defs: Seq[QueryDef] = Seq(

    // ---- raw-SQL entry: aggregation, window, and join faces whose
    //      Spark side IS the oracle string ----
    sharedSql(
      "q_sql_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    sharedSql(
      "q_sql_window",
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 2""".stripMargin),
    sharedSql(
      "q_sql_join",
      """SELECT n_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin),

    // ---- raw-SQL analytics surface (round-14 verdict item 7): the
    //      dialect-intersection device proves PARSER-level compat for
    //      grouping sets / rollup / window frames / FILTER-clause
    //      pivots / correlated EXISTS — surfaces where the engine's
    //      plans are otherwise hand-written ----
    sharedSql(
      "q_sql_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin),
    sharedSql(
      "q_sql_rollup",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin),
    sharedSql(
      "q_sql_window_frame",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS last3,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total,
        |  count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS n_seen
        |FROM orders
        |WHERE o_custkey % 10 = 0""".stripMargin),
    sharedSql(
      "q_sql_pivot_filter",
      """SELECT n_name,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin),
    // ---- round-16 second SQL wave: recursive CTE, set operators,
    //      RANGE frames, LATERAL correlated subquery, ntile/lead/lag
    //      with defaults — still ONE dialect-intersection string ----
    sharedSql(
      "q_sql_recursive",
      """WITH RECURSIVE seq(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 20)
        |SELECT s.n, count(*) AS n_orders
        |FROM seq s JOIN orders ON o_orderkey % 20 = s.n - 1
        |GROUP BY s.n""".stripMargin),
    sharedSql(
      "q_sql_setops",
      """SELECT 'both' AS tag, c_custkey AS k FROM (
        |  SELECT c_custkey FROM customer WHERE c_nationkey = 1
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') a
        |UNION ALL
        |SELECT 'cust_only' AS tag, c_custkey AS k FROM (
        |  SELECT c_custkey FROM customer WHERE c_nationkey = 1
        |  EXCEPT
        |  SELECT o_custkey FROM orders) b""".stripMargin),
    sharedSql(
      "q_sql_range_frame",
      """SELECT o_orderkey, o_custkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near
        |FROM orders
        |WHERE o_custkey % 25 = 0""".stripMargin),
    sharedSql(
      "q_sql_lateral",
      """SELECT n_name, t.top_price FROM nation,
        |LATERAL (SELECT round(max(o_totalprice), 2) AS top_price
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_nationkey = n_nationkey) t""".stripMargin),
    sharedSql(
      "q_sql_ntile",
      """SELECT o_orderkey,
        |  ntile(4) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS quartile,
        |  lead(o_orderkey, 1, -1) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS next_key,
        |  lag(o_orderkey, 2, -1) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS prev2_key
        |FROM orders
        |WHERE o_custkey % 20 = 3""".stripMargin),
    sharedSql(
      "q_sql_exists",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |""".stripMargin),

    // ---- A1/A9/A3: grouped aggregation (TPC-H Q1 flavor) ----
    sql(
      "q_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          countDistinct("l_orderkey").as("n_orders"))
    },

    // ---- P1/P5/P6: projection + filters (pushed to parquet scan) ----
    sql(
      "q_filter_project",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity BETWEEN 5 AND 30
        |  AND l_shipdate IS NOT NULL""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R"
          && col("l_quantity").between(5, 30)
          && col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "l_extendedprice")
    },

    // ---- P8: regex filter ----
    sql(
      "q_filter_rlike",
      """SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE regexp_matches(p_type, '^(ECONOMY|SMALL)$') AND p_size >= 10""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").rlike("^(ECONOMY|SMALL)$") && col("p_size") >= 10)
        .select("p_partkey", "p_name", "p_type")
    },

    // ---- §2.6 conditional family: when/isin/case ----
    sql(
      "q_when_isin",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
        |       WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
        |       ELSE 'low' END AS priority_band,
        |  CASE WHEN o_orderstatus IS NOT NULL THEN o_orderstatus
        |       ELSE 'no-data' END AS status_nn
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("high"))
          .when(col("o_orderpriority") === "3-MEDIUM", lit("medium"))
          .otherwise(lit("low")).as("priority_band"),
        when(col("o_orderstatus").isNotNull, col("o_orderstatus"))
          .otherwise(lit("no-data")).as("status_nn"))
    },

    // ---- J2: inner equi-join fact ⋈ fact ----
    sql(
      "q_join_inner",
      """SELECT o.o_orderkey, o.o_orderdate, c.c_name, o.o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderstatus = 'F'""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "o_orderdate", "c_name", "o_totalprice")
    },

    // ---- J2 left + A3: left join preserving unmatched, then agg ----
    sql(
      "q_join_left_agg",
      """SELECT c.c_custkey, c.c_mktsegment,
        |  count(o.o_orderkey) AS n_orders,
        |  round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey, c.c_mktsegment""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"), c("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 2)
            .as("total_spend"))
    },

    // ---- J3/J10: broadcast dimension joins (geo rollup) ----
    sql(
      "q_join_dims",
      """SELECT r.r_name, n.n_name, count(*) AS n_customers,
        |  round(sum(c.c_acctbal), 2) AS sum_acctbal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_customers"),
          round(sum("c_acctbal"), 2).as("sum_acctbal"))
    },

    // ---- J8: full outer join of two summaries (null-preserving merge) ----
    sql(
      "q_join_full",
      """SELECT coalesce(cs.nk, ss.nk) AS nationkey,
        |  cs.n_cust, ss.n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) cs
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk, count(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) ss
        |ON cs.nk = ss.nk""".stripMargin) { (s, d) =>
      val cs = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val ss = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      cs.join(ss, Seq("nk"), "full")
        .select(col("nk").as("nationkey"), col("n_cust"), col("n_supp"))
    },

    // ---- J9: cross join (combination universe, no repartition hack) ----
    sql(
      "q_join_cross",
      """SELECT r.r_name, n.n_name
        |FROM region r CROSS JOIN nation n""".stripMargin) { (s, d) =>
      Tables.region(s, d).crossJoin(broadcast(Tables.nation(s, d)))
        .select("r_name", "n_name")
    },

    // ---- §2.6 hash + string family: surrogate keys, concat, extract ----
    sql(
      "q_scalar_string",
      """SELECT c_custkey,
        |  md5('customer' || '_' || CAST(c_custkey AS VARCHAR)) AS row_key,
        |  c_name || ' (' || CAST(c_custkey AS VARCHAR) || ')' AS display_name,
        |  upper(c_mktsegment) AS seg_upper,
        |  length(c_name) AS name_len
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        md5(concat_ws("_", lit("customer"), col("c_custkey"))).as("row_key"),
        concat(col("c_name"), lit(" ("), col("c_custkey"), lit(")"))
          .as("display_name"),
        upper(col("c_mktsegment")).as("seg_upper"),
        length(col("c_name")).as("name_len"))
    },

    // ---- §2.6 regexp_extract (ICD code|chapter unpack analog) ----
    sql(
      "q_regexp_extract",
      """SELECT event_id,
        |  regexp_extract(props, '"k": (\d+)', 1) AS k_str,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_val
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
          .as("k_val"))
    },

    // ---- §2.5 set ops: union ----
    sql(
      "q_union",
      """SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        |UNION ALL
        |SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey"),
          lit("customer").as("side"))
      val su = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey"),
          lit("supplier").as("side"))
      c.unionByName(su)
    },

    // ---- A7: distinct ----
    sql(
      "q_distinct",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders") {
      (s, d) =>
        Tables.orders(s, d).select("o_orderstatus", "o_orderpriority")
          .distinct()
    },

    // ---- J7: compound two-key equi-join (agg re-join) ----
    sql(
      "q_join_compound",
      """WITH g AS (SELECT user_id, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type, g.n
        |FROM events e JOIN g USING (user_id, event_type)""".stripMargin) {
      (s, d) =>
        val e = Tables.events(s, d)
        val g = e.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
        e.join(g, Seq("user_id", "event_type"))
          .select("event_id", "user_id", "event_type", "n")
    },

    // ---- A5: first() collapse of a constant-per-group column ----
    sql(
      "q_first_collapse",
      """SELECT o_orderkey, min(o_orderstatus) AS status, count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderkey")
        // first() is safe here: o_orderstatus is functionally dependent
        // on the group key (the oracle's min() agrees on constants)
        .agg(first("o_orderstatus").as("status"),
          count(lit(1)).as("n_items"))
    },

    // ---- salted skew join: result identical to the plain join, hot
    //      keys spread over saltBuckets reducers ----
    sql(
      "q_salted_join",
      """SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin) {
      (s, d) =>
        val fact = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_linenumber"))
        val dim = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus")
        graft.ops.Skew.saltedJoin(fact, dim, Seq("o_orderkey"), saltBuckets = 8)
          .select(col("o_orderkey").as("l_orderkey"), col("l_linenumber"),
            col("o_custkey"), col("o_orderstatus"))
    },

    // ---- record linkage: unit-edit-distance self-join via deletion
    //      neighborhoods (complete banding + exact rescore); the
    //      oracle is the brute-force levenshtein join ----
    sql(
      "q_fuzzy_join",
      """SELECT a.c_custkey AS a, b.c_custkey AS b,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin) {
      (s, d) =>
        graft.ops.Text.editDistance1Pairs(
          Tables.customer(s, d), "c_custkey", "c_name")
    },

    // ---- entity resolution: ED1 banding over DISTINCT mentions →
    //      connected components → golden record (min id + its
    //      attributes + cluster size). The part fixture has 64
    //      distinct names over 2000 rows — exact-duplicate mentions
    //      plus real unit-distance variants ("cold rod"/"old rod") —
    //      so exact collapse, fuzzy clustering, and label fan-back
    //      all do real work. Oracle: brute-force levenshtein graph
    //      over distinct names + recursive min-reachability ----
    sql(
      "q_entity_resolve",
      """WITH RECURSIVE names AS (
        |  SELECT p_name, min(p_partkey) AS rep FROM part GROUP BY 1),
        |e0 AS (
        |  SELECT a.rep AS a, b.rep AS b FROM names a JOIN names b
        |  ON a.rep < b.rep AND levenshtein(a.p_name, b.p_name) <= 1),
        |sym AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |cc AS (
        |  SELECT rep AS v, rep AS m FROM names
        |  UNION
        |  SELECT s.b AS v, cc.m FROM sym s JOIN cc ON s.a = cc.v),
        |lab AS (SELECT v, min(m) AS canonical FROM cc GROUP BY 1),
        |rows_lab AS (
        |  SELECT p.p_partkey, lab.canonical
        |  FROM part p JOIN names n ON p.p_name = n.p_name
        |  JOIN lab ON lab.v = n.rep),
        |sizes AS (
        |  SELECT canonical, count(*) AS n_members
        |  FROM rows_lab GROUP BY 1)
        |SELECT r.p_partkey, r.canonical,
        |  c.p_name AS canonical_p_name, s.n_members
        |FROM rows_lab r
        |JOIN part c ON c.p_partkey = r.canonical
        |JOIN sizes s ON s.canonical = r.canonical""".stripMargin) {
      (s, d) =>
        graft.ops.Text.resolveEntities(
          Tables.part(s, d), "p_partkey", "p_name")
    },

    // ---- bloom-pruned join: explicit semi-join pushdown; zero false
    //      negatives make it byte-identical to the plain join ----
    sql(
      "q_bloom_join",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderpriority
        |FROM lineitem
        |JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON l_orderkey = o_orderkey""".stripMargin) { (s, d) =>
      val probe = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      graft.ops.Bloom.prunedJoin(probe, urgent, Seq("o_orderkey"))
        .select(col("o_orderkey").as("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("o_orderpriority"))
    })
}
