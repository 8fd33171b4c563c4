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
    },

    // ---- tokenizer-aware packing: chunk assignment driven by REAL
    //      BPE token counts (the learned-merges tokenizer) instead of
    //      the whitespace proxy. The oracle reads the committed BPE
    //      golden for n_tok (DuckDB cannot replay the merge loop) and
    //      replays the window cumsum + integer division relationally —
    //      the mixed golden+relational oracle pattern. ----
    sql(
      "q_pack_bpe",
      s"""WITH nt AS (
         |  SELECT doc_id::BIGINT AS doc_id, n_tok::BIGINT AS n_tok
         |  FROM read_csv(
         |    '${SourceQueries.FixtureDir}/golden_bpe_tokens.tsv',
         |    delim='\\t', header=true, all_varchar=true)),
         |d AS (
         |  SELECT doc.doc_id, doc.source, nt.n_tok
         |  FROM documents doc JOIN nt USING (doc_id))
         |SELECT doc_id, source, start_tok,
         |  start_tok // $Budget AS first_chunk,
         |  (start_tok + n_tok - 1) // $Budget AS last_chunk
         |FROM (
         |  SELECT doc_id, source, n_tok, $StartSql AS start_tok
         |  FROM d)""".stripMargin) { (s, d) =>
      val toks = graft.ops.Bpe.tokenize(
          Tables.documents(s, d), "doc_id", col("text"),
          TextQueries.learnedMerges(s, d))
        .select(col("doc_id"), col("n_tok"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
          Seq("doc_id"))
      Packing.packChunks(toks, col("source"), col("doc_id"),
          col("n_tok"), Budget)
        .select("doc_id", "source", "start_tok", "first_chunk", "last_chunk")
    },

    // ---- length-bucketed batching plan (inference/fine-tuning serving
    //      shape): pow-2 buckets 16..256, 16384-token batch budget; the
    //      bucket is an exact-integer list-filter min in BOTH engines
    //      (no libm log2 whose edge ulps could disagree) ----
    sql(
      "q_length_buckets",
      """WITH t AS (
        |  SELECT len(string_split_regex(text, '\s+')) AS n FROM documents),
        |b AS (SELECT
        |  COALESCE(list_min(list_filter([16,32,64,128,256], x -> x >= n)),
        |    256) AS bucket,
        |  least(n, 256) AS l FROM t)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  count(*) AS n_seqs,
        |  CAST(sum(l) AS BIGINT) AS real_tokens,
        |  CAST(bucket * count(*) AS BIGINT) AS padded_tokens,
        |  CAST(bucket * count(*) - sum(l) AS BIGINT) AS waste_tokens,
        |  (count(*) + (16384 // bucket) - 1) // (16384 // bucket)
        |    AS n_batches
        |FROM b GROUP BY bucket""".stripMargin) { (s, d) =>
      Packing.lengthBuckets(
        Tables.documents(s, d), Text.tokenCount(col("text")),
        minBucket = 16L, maxBucket = 256L, budgetTokens = 16384L)
    },

    // ---- sliding-window chunking with overlap (RAG prep): 32-token
    //      chunks every 24 tokens (8 overlap), map-side only; chunk
    //      arrays ride the to_json canon ----
    sql(
      "q_chunk_overlap",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(${TextQueries.NormSql}, ' ') AS ws
         |  FROM documents),
         |d AS (SELECT doc_id, ws, len(ws) AS n FROM toks),
         |c AS (
         |  SELECT doc_id, k AS chunk_id, ws[k*24+1 : k*24+32] AS chunk
         |  FROM d, UNNEST(range(greatest(1,
         |    CAST(ceil((n - 8) / 24.0) AS BIGINT)))) AS t(k))
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |  to_json(chunk) AS chunk_json
         |FROM c""".stripMargin) { (s, d) =>
      Packing.slidingChunks(
          Tables.documents(s, d)
            .select(col("doc_id"),
              Text.words(Text.normalize(col("text"))).as("__toks")),
          tokens = col("__toks"), chunkSize = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_id"),
          Canon.js(col("chunk")).as("chunk_json"))
    },

    // ---- no-split bin packing (first-fit decreasing) per source:
    //      each doc lands whole in one bin — the packing variant
    //      pretraining recipes use when documents must not straddle
    //      sequences. FFD's first-fit walk is inherently sequential
    //      per shard (DuckDB cannot replay it relationally), but it
    //      is a deterministic total-order function of the corpus ->
    //      committed GenGoldens snapshot ----
    sql(
      "q_pack_ffd",
      s"""SELECT shard, doc_id::BIGINT AS doc_id, n_tok::BIGINT AS n_tok,
         |  bin::BIGINT AS bin
         |FROM read_csv('${SourceQueries.FixtureDir}/golden_pack_ffd.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, d) =>
        Packing.binPackFFD(
            Tables.documents(s, d), "source", "doc_id", "n_chars",
            maxTokens = 400)
          .orderBy("shard", "doc_id")
    })
}
