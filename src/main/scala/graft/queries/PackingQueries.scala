package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.{Packing, Text}
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing over `documents`, sharded by
  * `source` and ordered by `doc_id` — deterministic integer arithmetic
  * end to end, so the DuckDB oracle reproduces chunk assignments
  * byte-for-byte (window exclusive-cumsum + integer floor division).
  */
object PackingQueries {
  import QueryDef.sql

  private val Budget = 256L

  /** DuckDB exclusive running token sum per (source, doc_id) order. */
  private val StartSql =
    """CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"""
      .stripMargin

  val defs: Seq[QueryDef] = Seq(

    sql(
      "q_pack_chunks",
      s"""SELECT doc_id, source, start_tok,
         |  start_tok // $Budget AS first_chunk,
         |  (start_tok + n_tok - 1) // $Budget AS last_chunk
         |FROM (
         |  SELECT doc_id, source, n_tok, $StartSql AS start_tok
         |  FROM (SELECT doc_id, source,
         |    len(string_split_regex(text, '\\s+')) AS n_tok
         |    FROM documents))""".stripMargin) { (s, d) =>
      Packing.packChunks(
          Tables.documents(s, d), col("source"), col("doc_id"),
          Text.tokenCount(col("text")), Budget)
        .select("doc_id", "source", "start_tok", "first_chunk",
          "last_chunk")
    },

    sql(
      "q_pack_stats",
      s"""SELECT source,
         |  CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |    AS total_tokens,
         |  (CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |    + ${Budget - 1}) // $Budget AS n_chunks,
         |  ((CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |    + ${Budget - 1}) // $Budget) * $Budget
         |    - CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |    AS waste_tokens
         |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      Packing.packStats(
        Tables.documents(s, d), col("source"),
        Text.tokenCount(col("text")), Budget)
    })
}
