package graft.queries

import graft.core.{QueryDef, Tables}
import graft.etl.Indexes
import graft.ops.Nest
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Index-assembly surface (reference: indexes/DonorIndex.scala,
  * DataAccess.scala): the TPC-H analog nested index oracle-checked at
  * any SF, the DUO data-access composition oracle-checked over the
  * clinical fixtures, and the full donor index as a rows-only check
  * (its golden assertions live in IndexesSpec).
  */
object IndexQueries {
  import QueryDef.{noOracle, sql}
  import SourceQueries.FixtureDir

  val defs: Seq[QueryDef] = Seq(

    // ---- nested index assembly (customer ⋈ nation ⋈ orders) ----
    // Canonicalized per Canon: dates as yyyy-MM-dd strings, money as
    // DECIMAL(18,2) strings, nested columns as to_json.
    sql(
      "q_customer_index",
      """WITH n AS (
        |  SELECT n_nationkey,
        |    [struct_pack(name := n_name, regionkey := n_regionkey)] AS nation
        |  FROM nation),
        |o AS (
        |  SELECT o_custkey,
        |    list(struct_pack(orderkey := o_orderkey,
        |          orderdate := strftime(o_orderdate, '%Y-%m-%d'),
        |          totalprice := o_totalprice::DECIMAL(18,2)::VARCHAR)
        |      ORDER BY o_orderkey) AS orders,
        |    count(*) AS n,
        |    round(sum(o_totalprice), 2)::DECIMAL(18,2)::VARCHAR AS spend
        |  FROM orders GROUP BY 1)
        |SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |  to_json(n.nation) AS nation_json,
        |  to_json(o.orders) AS orders_json,
        |  to_json(struct_pack(n_orders := coalesce(o.n, 0),
        |    total_spend := coalesce(o.spend, '0.00'),
        |    has_orders := coalesce(o.n, 0) > 0)) AS summary_json
        |FROM customer c
        |LEFT JOIN n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN o ON c.c_custkey = o.o_custkey""".stripMargin) { (s, d) =>
      Indexes.customerIndex(
          Tables.customer(s, d), Tables.nation(s, d), Tables.orders(s, d))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          Canon.js(col("nation")).as("nation_json"),
          Canon.js(transform(col("orders"), o => struct(
            o.getField("orderkey").as("orderkey"),
            Canon.dateStr(o.getField("orderdate")).as("orderdate"),
            Canon.money(o.getField("totalprice")).as("totalprice"))))
            .as("orders_json"),
          Canon.js(struct(
            col("summary.n_orders").as("n_orders"),
            Canon.money(col("summary.total_spend")).as("total_spend"),
            col("summary.has_orders").as("has_orders"))).as("summary_json"))
    },

    // ---- two-level nest: customer → orders → lineitems ----
    sql(
      "q_two_level_nest",
      """WITH li AS (
        |  SELECT l_orderkey,
        |    list(struct_pack(linenumber := l_linenumber,
        |          quantity := l_quantity)
        |      ORDER BY l_linenumber, l_quantity) AS items
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o.o_custkey,
        |    list(struct_pack(orderkey := o.o_orderkey,
        |          orderdate := strftime(o.o_orderdate, '%Y-%m-%d'),
        |          items := li.items)
        |      ORDER BY o.o_orderkey) AS orders
        |  FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
        |  GROUP BY 1)
        |SELECT c.c_custkey, c.c_name, to_json(o.orders) AS orders_json
        |FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey""".stripMargin) {
      (s, d) =>
        val items = Nest.nestChildren(
          Tables.lineitem(s, d), Seq("l_orderkey"),
          Seq(col("l_linenumber").as("linenumber"),
            col("l_quantity").as("quantity")), "items")
        val ordersRaw = Tables.orders(s, d)
        val orders = ordersRaw
          .join(items, ordersRaw("o_orderkey") === items("l_orderkey"), "left")
          .groupBy(col("o_custkey"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey").as("orderkey"),
            Canon.dateStr(col("o_orderdate")).as("orderdate"),
            col("items")))).as("orders"))
        Tables.customer(s, d)
          .join(orders, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"),
            Canon.js(col("orders")).as("orders_json"))
    },

    // ---- DUO data-access codes (split → explode → lookup → nest) ----
    sql(
      "q_data_access",
      s"""WITH duo AS (
         |  SELECT id, name FROM read_json_auto('$FixtureDir/duo_terms.jsonl.gz')),
         |s AS (
         |  SELECT study_id, access_limitations,
         |    unnest(string_split(access_requirements, ';')) AS req
         |  FROM read_csv('$FixtureDir/study.tsv', delim='\\t', header=true,
         |                all_varchar=true)),
         |j AS (
         |  SELECT s.study_id,
         |    d1.name || ' (' || s.access_limitations || ')'
         |      AS access_limitations,
         |    d2.name || ' (' || trim(s.req) || ')' AS access_requirements
         |  FROM s
         |  LEFT JOIN duo d1 ON s.access_limitations = d1.id
         |  LEFT JOIN duo d2 ON trim(s.req) = d2.id
         |  WHERE s.req IS NOT NULL AND trim(s.req) <> ''),
         |g AS (
         |  SELECT study_id, access_limitations,
         |    list(DISTINCT access_requirements ORDER BY access_requirements)
         |      AS access_requirements
         |  FROM j GROUP BY 1, 2)
         |SELECT study_id,
         |  to_json(struct_pack(access_limitations := access_limitations,
         |    access_requirements := access_requirements))
         |    AS data_access_codes_json
         |FROM g""".stripMargin) { (s, _) =>
      Indexes.dataAccessCodes(
          Sources.tsv(s, s"$FixtureDir/study.tsv"),
          Sources.jsonLines(s, s"$FixtureDir/duo_terms.jsonl.gz"))
        .select(col("study_id"),
          Canon.js(col("data_access_codes")).as("data_access_codes_json"))
    },

    // ---- full donor index over the clinical fixtures ----
    noOracle("q_donor_index") { (s, _) =>
      Indexes.donorIndex(
        donor = Sources.tsv(s, s"$FixtureDir/donor.tsv"),
        study = Sources.tsv(s, s"$FixtureDir/study.tsv"),
        phenotype = Sources.tsv(s, s"$FixtureDir/phenotype.tsv"),
        file = Sources.tsv(s, s"$FixtureDir/file.tsv"),
        biospecimen = Sources.tsv(s, s"$FixtureDir/biospecimen.tsv"),
        samples = Sources.tsv(s, s"$FixtureDir/sample_registration.tsv"),
        terms = Sources.jsonLines(s, s"$FixtureDir/terms.jsonl.gz"),
        meta = Seq("dictionary_version" -> "9.9", "study_version" -> "v42"))
    },

    noOracle("q_study_index") { (s, _) =>
      Indexes.studyIndex(
        study = Sources.tsv(s, s"$FixtureDir/study.tsv"),
        donor = Sources.tsv(s, s"$FixtureDir/donor.tsv"),
        phenotype = Sources.tsv(s, s"$FixtureDir/phenotype.tsv"),
        file = Sources.tsv(s, s"$FixtureDir/file.tsv"),
        biospecimen = Sources.tsv(s, s"$FixtureDir/biospecimen.tsv"),
        samples = Sources.tsv(s, s"$FixtureDir/sample_registration.tsv"),
        terms = Sources.jsonLines(s, s"$FixtureDir/terms.jsonl.gz"),
        duoTerms = Sources.jsonLines(s, s"$FixtureDir/duo_terms.jsonl.gz"),
        meta = Seq("dictionary_version" -> "9.9", "study_version" -> "v42"))
    },

    noOracle("q_file_index") { (s, _) =>
      Indexes.fileIndex(
        file = Sources.tsv(s, s"$FixtureDir/file.tsv"),
        donor = Sources.tsv(s, s"$FixtureDir/donor.tsv"),
        study = Sources.tsv(s, s"$FixtureDir/study.tsv"),
        phenotype = Sources.tsv(s, s"$FixtureDir/phenotype.tsv"),
        biospecimen = Sources.tsv(s, s"$FixtureDir/biospecimen.tsv"),
        samples = Sources.tsv(s, s"$FixtureDir/sample_registration.tsv"),
        terms = Sources.jsonLines(s, s"$FixtureDir/terms.jsonl.gz"),
        meta = Seq("dictionary_version" -> "9.9", "study_version" -> "v42"))
    })
}
