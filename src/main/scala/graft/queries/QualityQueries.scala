package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Quality
import graft.ops.Quality.Check._
import org.apache.spark.sql.functions._

/** Data-quality gate faces ([[graft.ops.Quality]]): the pre-promotion
  * expectation report over a batch — fused single-scan row checks plus
  * a referential anti-join — exactly replayable in DuckDB, so every
  * count (including the deliberately-failing range gate) hash-checks.
  */
object QualityQueries {
  import QueryDef.sql

  val defs: Seq[QueryDef] = Seq(

    // ---- the gate report: 5 fused checks in ONE scan of lineitem +
    //      one anti-join FK probe against orders. in_range is tuned to
    //      FAIL (quantity caps at 50) so the face proves the report
    //      distinguishes pass from fail, not just that zeros agree ----
    sql(
      "q_expectations",
      """WITH a AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS b0,
        |    sum(CASE WHEN l_returnflag IS NOT NULL
        |             AND l_returnflag NOT IN ('A','N','R')
        |        THEN 1 ELSE 0 END)::BIGINT AS b1,
        |    sum(CASE WHEN l_quantity IS NOT NULL
        |             AND (l_quantity < 1 OR l_quantity > 49)
        |        THEN 1 ELSE 0 END)::BIGINT AS b2,
        |    sum(CASE WHEN l_linestatus IS NOT NULL
        |             AND NOT regexp_matches(l_linestatus, '^[OF]$')
        |        THEN 1 ELSE 0 END)::BIGINT AS b3,
        |    (count(*)
        |     - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT AS b4
        |  FROM lineitem),
        |f AS (SELECT
        |    (SELECT count(*) FROM lineitem)::BIGINT AS n,
        |    (SELECT count(*) FROM lineitem l
        |       LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |         ON l.l_orderkey = o.o_orderkey
        |     WHERE o.o_orderkey IS NULL)::BIGINT AS b)
        |SELECT * FROM (
        |  SELECT 'not_null:l_orderkey' AS "check", n AS n_rows,
        |         b0 AS n_bad, b0 = 0 AS passed FROM a
        |  UNION ALL SELECT 'in_set:l_returnflag', n, b1, b1 = 0 FROM a
        |  UNION ALL SELECT 'in_range:l_quantity', n, b2, b2 = 0 FROM a
        |  UNION ALL SELECT 'matches:l_linestatus', n, b3, b3 = 0 FROM a
        |  UNION ALL SELECT 'unique:l_orderkey,l_linenumber', n, b4, b4 = 0
        |    FROM a
        |  UNION ALL SELECT 'fk:l_orderkey->o_orderkey', n, b, b = 0 FROM f)
        |ORDER BY "check"""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      Quality.expectations(li, Seq(
          NotNull("l_orderkey"),
          InSet("l_returnflag", Seq("A", "N", "R")),
          InRange("l_quantity", 1, 49),
          Matches("l_linestatus", "^[OF]$"),
          Unique(Seq("l_orderkey", "l_linenumber"))))
        .unionByName(Quality.fkOrphans(
          li, Seq("l_orderkey"), Tables.orders(s, d), Seq("o_orderkey")))
        .orderBy("check")
    },

    // ---- functional-dependency checks (round 16): one FD that holds
    //      (nation key determines region) and one that is violated
    //      (customers of a nation span market segments) — the report
    //      proves the checker distinguishes the two ----
    sql(
      "q_fd_check",
      """SELECT 'n_nationkey->n_regionkey' AS fd,
        |  count(*)::BIGINT AS n_keys,
        |  sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_violating_keys,
        |  sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
        |FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nb
        |      FROM nation GROUP BY 1)
        |UNION ALL
        |SELECT 'c_nationkey->c_mktsegment',
        |  count(*)::BIGINT,
        |  sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT,
        |  sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0
        |FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS nb
        |      FROM customer GROUP BY 1)""".stripMargin) { (s, d) =>
      Quality.fdCheck(Tables.nation(s, d), "n_nationkey", "n_regionkey")
        .unionByName(Quality.fdCheck(
          Tables.customer(s, d), "c_nationkey", "c_mktsegment"))
    },

    // ---- golden-record survivorship (round 16): blocking-key
    //      clusters (first two normalized words — the q_chat_dedup
    //      prompt-key device, chosen BECAUSE it yields real
    //      multi-member clusters at the correctness SF, so the modal
    //      vote and its tie-break are actually exercised) collapse to
    //      one canonical record — rep = min member id, per-field
    //      canonical = modal value with ties to the smallest value,
    //      nulls never voting ----
    sql(
      "q_golden_record",
      s"""WITH b AS (
         |  SELECT doc_id, lang, source,
         |    regexp_extract(${TextQueries.NormSql},
         |      '^(\\S+\\s+\\S+)', 1) AS c
         |  FROM documents),
         |core AS (
         |  SELECT c, min(doc_id)::BIGINT AS rep_id,
         |    count(*)::BIGINT AS n_members
         |  FROM b GROUP BY 1),
         |lc AS (
         |  SELECT c, lang AS lang_canon FROM (
         |    SELECT c, lang, row_number() OVER (PARTITION BY c
         |      ORDER BY count(*) DESC, lang ASC) AS rn
         |    FROM b WHERE lang IS NOT NULL GROUP BY c, lang)
         |  WHERE rn = 1),
         |sc AS (
         |  SELECT c, source AS source_canon FROM (
         |    SELECT c, source, row_number() OVER (PARTITION BY c
         |      ORDER BY count(*) DESC, source ASC) AS rn
         |    FROM b WHERE source IS NOT NULL GROUP BY c, source)
         |  WHERE rn = 1)
         |SELECT rep_id, n_members, lang_canon, source_canon
         |FROM core LEFT JOIN lc USING (c)
         |LEFT JOIN sc USING (c)""".stripMargin) { (s, d) =>
      Quality.survivorship(
          Tables.documents(s, d), "doc_id",
          regexp_extract(graft.ops.Text.normalize(col("text")),
            "^(\\S+\\s+\\S+)", 1),
          Seq("lang", "source"))
        .select("rep_id", "n_members", "lang_canon", "source_canon")
    })
}
