package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.{Nest, Ontology, Summary}
import org.apache.spark.sql.functions._

/** The reference's nested-document core (SURVEY.md §2.4 A1-A9, §2.7):
  * relational → array-of-struct folding, summary lattices, ontology
  * ancestor expansion — expressed through the reusable `graft.ops`
  * operators over the testdata, each with a DuckDB oracle.
  * Child arrays are sorted so results are order-deterministic.
  */
object NestedQueries {
  import QueryDef.sql

  val defs: Seq[QueryDef] = Seq(

    // ---- A1: groupBy + collect_list(struct) — THE core op ----
    // (nested array projected through to_json so the driver's hasher
    // can digest it; the DuckDB oracle mirrors with its own to_json)
    sql(
      "q_nest_order_items",
      """SELECT l_orderkey,
        |  to_json(list(struct_pack(linenumber := l_linenumber,
        |                           quantity := l_quantity)
        |       ORDER BY l_linenumber, l_quantity)) AS items_json,
        |  count(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (s, d) =>
      Nest.nestChildren(
          Tables.lineitem(s, d),
          Seq("l_orderkey"),
          Seq(col("l_linenumber").as("linenumber"),
            col("l_quantity").as("quantity")),
          as = "items")
        .withColumn("n_items", size(col("items")).cast("long"))
        .select(col("l_orderkey"), Canon.js(col("items")).as("items_json"),
          col("n_items"))
    },

    // ---- A1 + J4: nested children re-attached to the parent ----
    sql(
      "q_attach_children",
      """SELECT o.o_orderkey, o.o_orderstatus,
        |  coalesce(li.n, 0) AS n_items
        |FROM orders o LEFT JOIN
        |  (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey) li
        |ON o.o_orderkey = li.l_orderkey""".stripMargin) { (s, d) =>
      val nested = Nest.nestChildren(
        Tables.lineitem(s, d),
        Seq("l_orderkey"),
        Seq(col("l_linenumber").as("linenumber")),
        as = "items")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Nest.attachChildren(
          Tables.orders(s, d), nested, Seq("o_orderkey"), "items")
        .select(col("o_orderkey"), col("o_orderstatus"),
          size(col("items")).cast("long").as("n_items"))
    },

    // ---- A2: collect_set ----
    sql(
      "q_collect_set",
      """SELECT o_custkey,
        |  to_json(list(DISTINCT o_orderpriority ORDER BY o_orderpriority))
        |    AS priorities_json
        |FROM orders GROUP BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(Canon.js(sort_array(collect_set(col("o_orderpriority"))))
          .as("priorities_json"))
    },

    // ---- A8: collect_list(array) → array_distinct(sort_array(flatten)) ----
    sql(
      "q_array_reagg",
      """SELECT lang,
        |  to_json(list_sort(list_distinct(flatten(list(string_split(text, ' '))))))
        |    AS vocab_json
        |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(Canon.js(array_distinct(sort_array(flatten(
          collect_list(split(col("text"), " ")))))).as("vocab_json"))
    },

    // ---- §2.6 explode + P9 array_contains ----
    sql(
      "q_explode_wordcount",
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word HAVING count(*) >= 10""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 10)
    },
    sql(
      "q_array_contains",
      """SELECT doc_id, lang
        |FROM documents
        |WHERE list_contains(string_split(text, ' '), 'spark')""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .filter(array_contains(split(col("text"), " "), "spark"))
          .select("doc_id", "lang")
    },

    // ---- Summary lattice (reference indexes/Summary.scala) ----
    sql(
      "q_summary_lattice",
      """WITH f AS (
        |  SELECT c_mktsegment, o_orderpriority, c_custkey, o_orderkey
        |  FROM customer JOIN orders ON c_custkey = o_custkey),
        |g AS (SELECT DISTINCT c_mktsegment FROM f),
        |cat AS (SELECT DISTINCT o_orderpriority FROM f),
        |p AS (SELECT c_mktsegment, o_orderpriority,
        |        count(DISTINCT c_custkey) AS n_cust,
        |        count(DISTINCT o_orderkey) AS n_orders
        |      FROM f GROUP BY 1, 2)
        |SELECT g.c_mktsegment, cat.o_orderpriority,
        |  coalesce(p.n_cust, 0) AS n_cust,
        |  coalesce(p.n_orders, 0) AS n_orders
        |FROM g CROSS JOIN cat
        |LEFT JOIN p USING (c_mktsegment, o_orderpriority)""".stripMargin) {
      (s, d) =>
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val facts = c.join(o, c("c_custkey") === o("o_custkey"))
          .select("c_mktsegment", "o_orderpriority", "c_custkey", "o_orderkey")
        Summary.lattice(
          facts,
          groupKeys = Seq("c_mktsegment"),
          categoryCol = "o_orderpriority",
          distinctCounts = Map(
            "n_cust" -> col("c_custkey"),
            "n_orders" -> col("o_orderkey")))
    },

    // ---- A4: existence flag (count>0 rewrite of countDistinct(*)) ----
    sql(
      "q_existence_flag",
      """SELECT c.c_custkey, coalesce(f.has_orders, false) AS has_orders
        |FROM customer c LEFT JOIN
        |  (SELECT o_custkey, count(*) > 0 AS has_orders
        |   FROM orders GROUP BY o_custkey) f
        |ON c.c_custkey = f.o_custkey""".stripMargin) { (s, d) =>
      val flags = Summary.existenceFlag(
          Tables.orders(s, d), Seq("o_custkey"), "has_orders")
        .withColumnRenamed("o_custkey", "c_custkey")
      Tables.customer(s, d)
        .join(flags, Seq("c_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("has_orders"), lit(false)).as("has_orders"))
    },

    // ---- A5/A6: min/max collapse + constant-in-agg ----
    sql(
      "q_agg_minmax_const",
      """SELECT 'orders' AS entity,
        |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
        |  count(*) AS n
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).agg(
        lit("orders").as("entity"),
        min("o_orderdate").as("first_date"),
        max("o_orderdate").as("last_date"),
        count(lit(1)).as("n"))
    },

    // ---- P7/P12: SQL-string predicate + where, over events ----
    sql(
      "q_where_expr",
      """SELECT event_id, user_id, value,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour
        |FROM events
        |WHERE value > 100 AND event_type = 'purchase'""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .where("value > 100 AND event_type = 'purchase'")
          .select(col("event_id"), col("user_id"), col("value"),
            date_trunc("hour", col("ts")).as("hour"))
    },

    // ---- §2.7 main-category pick (root-level ancestor, min display) ----
    sql(
      "q_main_category",
      """SELECT c.c_custkey,
        |  min(r.r_name || ' (R' || CAST(r.r_regionkey AS VARCHAR) || ')')
        |    AS main_category
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val terms = n.join(r, n("n_regionkey") === r("r_regionkey"))
        .select(
          concat(lit("N"), col("n_nationkey")).as("id"),
          col("n_name").as("name"),
          array(struct(
            concat(lit("R"), col("r_regionkey")).as("id"),
            col("r_name").as("name"),
            array().cast("array<string>").as("parents"))).as("ancestors"),
          lit(true).as("is_leaf"))
      val data = Tables.customer(s, d)
        .withColumn("nation_code", concat(lit("N"), col("c_nationkey")))
      Ontology.mainCategory(
        data, terms, "nation_code", Seq("c_custkey"),
        rootPredicate = anc => size(anc.getField("parents")) === 0)
    },

    // ---- BUILDING the ancestor closure the reference ships
    //      precomputed: transitive closure of a depth-11 binary-tree
    //      hierarchy (parent(k) = k/2 over part keys) via ITERATIVE
    //      DOUBLING — 4 self-join rounds where the oracle's recursive
    //      CTE (and a naive loop) needs 11 chained rounds ----
    sql(
      "q_ontology_closure",
      """WITH RECURSIVE e AS (
        |  SELECT p_partkey AS child, p_partkey // 2 AS anc
        |  FROM part WHERE p_partkey >= 1),
        |cl AS (
        |  SELECT child, anc FROM e
        |  UNION
        |  SELECT cl.child, e.anc FROM cl JOIN e ON cl.anc = e.child)
        |SELECT child, anc FROM cl""".stripMargin) { (s, d) =>
      val edges = Tables.part(s, d)
        .filter(col("p_partkey") >= 1)
        .select(col("p_partkey").as("child"),
          (col("p_partkey") / 2).cast("long").as("anc"))
      Ontology.ancestorClosure(edges)
    },

    // ---- §2.7 ontology ancestor expansion (nation→region closure) ----
    sql(
      "q_ontology_expand",
      """WITH tagged AS (
        |  SELECT 'N' || CAST(n.n_nationkey AS VARCHAR) AS term_id,
        |         n.n_name AS term_name, true AS is_tagged, true AS is_leaf,
        |         c.c_custkey
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |anc AS (
        |  SELECT 'R' || CAST(r.r_regionkey AS VARCHAR) AS term_id,
        |         r.r_name AS term_name, false AS is_tagged, false AS is_leaf,
        |         c.c_custkey
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey)
        |SELECT term_id, term_name, is_tagged, is_leaf,
        |       count(DISTINCT c_custkey) AS n_members
        |FROM (SELECT * FROM tagged UNION ALL SELECT * FROM anc)
        |GROUP BY term_id, term_name, is_tagged, is_leaf""".stripMargin) {
      (s, d) =>
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        // Build a reference-shaped term table: each nation is a leaf term
        // whose precomputed ancestor closure is its region.
        val terms = n.join(r, n("n_regionkey") === r("r_regionkey"))
          .select(
            concat(lit("N"), col("n_nationkey")).as("id"),
            col("n_name").as("name"),
            array(concat(col("r_name"), lit(" (R"), col("r_regionkey"),
              lit(")"))).as("parents"),
            array(struct(
              concat(lit("R"), col("r_regionkey")).as("id"),
              col("r_name").as("name"),
              array().cast("array<string>").as("parents"))).as("ancestors"),
            lit(true).as("is_leaf"))
        val data = Tables.customer(s, d)
          .withColumn("nation_code", concat(lit("N"), col("c_nationkey")))
        Ontology.expandTerms(
            data, terms, "nation_code",
            groupKeys = Seq("c_custkey"), payload = Seq.empty)
          .groupBy("term_id", "term_name", "is_tagged", "is_leaf")
          .agg(countDistinct("c_custkey").as("n_members"))
    })
}
