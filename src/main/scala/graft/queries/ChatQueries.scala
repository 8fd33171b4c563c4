package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Chat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-training conversation-data faces ([[graft.ops.Chat]]).
  *
  * The TURNS fixture is derived deterministically from `documents`
  * inside BOTH engines (no side files): conversation = document,
  * 2 + doc_id%5 turns of 40-char text slices, roles alternating
  * user/assistant with a leading system turn every 7th conversation
  * and a planted assistant-first defect every 17th — so the validator
  * faces prove pass AND fail paths, and short documents naturally
  * produce empty trailing turns (another planted invalid class).
  * Every face's oracle replays the operator relationally (window
  * lag / ordered string_agg / cumulative sum / rank), not just its
  * row count.
  */
object ChatQueries {
  import QueryDef.sql

  /** Shared turns derivation — Spark side. Mirrors [[TurnsCte]].
    * `private[graft]` so ScaleRehearsal can replay it at 10×. */
  private[graft] def turnsOf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("conv_id"),
        coalesce(col("text"), lit("")).as("text"))
    val nt = (lit(2) + (col("conv_id") % 5)).cast("int")
    docs
      .select(col("conv_id"), col("text"),
        explode(sequence(lit(0), nt - 1)).as("ti"))
      .select(
        col("conv_id"),
        col("ti").cast("long").as("turn_idx"),
        when(col("conv_id") % 17 === 2 && col("ti") === 0, "assistant")
          .when(col("conv_id") % 7 === 0 && col("ti") === 0, "system")
          .when(((col("ti") -
            when(col("conv_id") % 7 === 0, 1).otherwise(0)) % 2) === 0,
            "user")
          .otherwise("assistant").as("role"),
        col("text").substr(col("ti") * 40 + 1, lit(40)).as("content"))
  }

  /** Shared turns derivation — DuckDB side. Mirrors [[turnsOf]]. */
  private val TurnsCte: String =
    """t AS (
      |  SELECT doc_id AS conv_id, r.turn_idx::BIGINT AS turn_idx,
      |    CASE WHEN doc_id % 17 = 2 AND r.turn_idx = 0 THEN 'assistant'
      |         WHEN doc_id % 7 = 0 AND r.turn_idx = 0 THEN 'system'
      |         WHEN (r.turn_idx - CASE WHEN doc_id % 7 = 0
      |                 THEN 1 ELSE 0 END) % 2 = 0 THEN 'user'
      |         ELSE 'assistant' END AS role,
      |    substr(coalesce(text, ''), (r.turn_idx * 40 + 1)::INT, 40)
      |      AS content
      |  FROM documents, LATERAL (SELECT unnest(range(0, 2 + doc_id % 5))
      |    AS turn_idx) r)""".stripMargin

  /** The kept-set CTE chain shared by the publish-family oracles:
    * defines `dd (conv_id, rendered)` — rendered conversations that
    * pass the quality gate AND the prompt-decontamination screen.
    * Callers append their own replay (manifest recompute, epoch
    * order) on top. */
  private def sftKeptCte: String =
    s"""$TurnsCte,
       |rend AS (
       |  SELECT conv_id,
       |    string_agg('<|' || role || '|>' || chr(10) || content ||
       |      '<|end|>' || chr(10), '' ORDER BY turn_idx) AS rendered
       |  FROM t GROUP BY conv_id),
       |gt AS (
       |  SELECT conv_id,
       |    count(*)::BIGINT AS n_turns,
       |    sum(CASE WHEN role = 'assistant' THEN length(content)
       |        ELSE 0 END)::BIGINT AS asst_chars,
       |    arg_max(content, turn_idx) AS last_content
       |  FROM t GROUP BY conv_id),
       |kp AS (
       |  SELECT conv_id FROM gt
       |  WHERE asst_chars >= 40 AND n_turns >= 3
       |    AND last_content <> ''),
       |p0 AS (
       |  SELECT conv_id,
       |    arg_min(content, turn_idx) FILTER (WHERE role = 'user')
       |      AS prompt
       |  FROM t WHERE conv_id < 450 GROUP BY conv_id),
       |pw AS (
       |  SELECT conv_id, string_split(${TextQueries.normSqlOf("prompt")},
       |    ' ') AS w
       |  FROM p0 WHERE prompt IS NOT NULL),
       |pg AS (
       |  SELECT conv_id, list_transform(range(len(w) - 4),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
       |         w[i+4] || ' ' || w[i+5]) AS g
       |  FROM pw),
       |ew AS (
       |  SELECT string_split(${TextQueries.NormSql}, ' ') AS w
       |  FROM documents WHERE doc_id >= 450),
       |ev AS (
       |  SELECT flatten(list(list_transform(range(len(w) - 4),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
       |         w[i+4] || ' ' || w[i+5]))) AS eg
       |  FROM ew),
       |clean AS (
       |  SELECT conv_id FROM pg, ev WHERE NOT list_has_any(g, eg)),
       |dd AS (
       |  SELECT r.conv_id, r.rendered FROM rend r
       |  JOIN kp USING (conv_id) JOIN clean USING (conv_id))""".stripMargin

  /** Build the curated SFT export store once per JVM; returns its
    * dir. Shared by `q_sft_publish` and `q_sft_epoch` (faces run in
    * any order). */
  private def sftStore(s: SparkSession, d: String): String = {
    val dir = s"${graft.core.Scratch.dir("sinks")}/graft_sft_store"
    if (graft.sources.Versioned
        .currentVersion(s, s"$dir/manifest").isEmpty) {
      val turns = turnsOf(s, d)
      val rendered = Chat.renderChat(turns)
        .select(col("conv_id"), col("rendered"))
      val kept = Chat.chatGate(turns)
        .filter(col("keep")).select("conv_id")
      val prompts = Chat.firstUserTurn(
        turns.filter(col("conv_id") < 450))
      val clean = graft.ops.Dedup.decontaminate(prompts, "conv_id",
          col("prompt"),
          Tables.documents(s, d).filter(col("doc_id") >= 450),
          col("text"), n = 5)
        .select("conv_id")
      val docs = rendered.join(kept, Seq("conv_id"))
        .join(clean, Seq("conv_id"))
      graft.sources.Export.exportJsonlShards(docs, dir,
        targetBytes = 16384L, id = col("conv_id"),
        sizeOf = octet_length(col("rendered")),
        checksumCols = Seq("conv_id", "rendered")): Unit
    }
    dir
  }

  /** A second, independent SFT store for the takedown face — the
    * retraction MUTATES its store, so it must not share
    * [[sftStore]]'s dir (publish/epoch/workers read the unretracted
    * state in arbitrary face order). Build + retract run once per
    * JVM behind the version check; conversations with
    * conv_id % 53 == 11 are withdrawn (the id universe is derived
    * from the corpus max id, so the same rule covers every SF). */
  private def sftRetractedStore(s: SparkSession, d: String): String = {
    val dir = s"${graft.core.Scratch.dir("sinks")}/graft_sft_retract"
    if (graft.sources.Versioned
        .currentVersion(s, s"$dir/manifest").isEmpty) {
      val turns = turnsOf(s, d)
      val rendered = Chat.renderChat(turns)
        .select(col("conv_id"), col("rendered"))
      val kept = Chat.chatGate(turns)
        .filter(col("keep")).select("conv_id")
      val prompts = Chat.firstUserTurn(
        turns.filter(col("conv_id") < 450))
      val clean = graft.ops.Dedup.decontaminate(prompts, "conv_id",
          col("prompt"),
          Tables.documents(s, d).filter(col("doc_id") >= 450),
          col("text"), n = 5)
        .select("conv_id")
      val docs = rendered.join(kept, Seq("conv_id"))
        .join(clean, Seq("conv_id"))
      graft.sources.Export.exportJsonlShards(docs, dir,
        targetBytes = 16384L, id = col("conv_id"),
        sizeOf = octet_length(col("rendered")),
        checksumCols = Seq("conv_id", "rendered")): Unit
      val maxId = Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val ids = (0L to maxId).filter(_ % 53 == 11).map(_.toString)
      graft.sources.Export.retractShards(s, dir, "conv_id", ids,
        octet_length(col("rendered")), Seq("conv_id", "rendered")): Unit
    }
    dir
  }

  /** The render oracle — shared with the streaming face
    * (`q_chat_stream_render`), which must converge to exactly this. */
  private[queries] val RenderOracle: String =
    s"""WITH $TurnsCte
       |SELECT conv_id,
       |  string_agg('<|' || role || '|>' || chr(10) || content ||
       |    '<|end|>' || chr(10), '' ORDER BY turn_idx) AS rendered,
       |  length(string_agg('<|' || role || '|>' || chr(10) || content
       |    || '<|end|>' || chr(10), '' ORDER BY turn_idx))::BIGINT
       |    AS n_chars
       |FROM t GROUP BY conv_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- structural validation: the oracle replays every flag
    //      relationally (lag for alternation, filtered arg_min for
    //      the first non-system role) — a wrong sort, a missed
    //      planted defect, or an off-by-one in the empty-turn count
    //      all hash-mismatch ----
    sql(
      "q_chat_validate",
      s"""WITH $TurnsCte,
         |x AS (
         |  SELECT conv_id, turn_idx, role, content,
         |    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
         |      AS prev_role
         |  FROM t)
         |SELECT conv_id,
         |  count(*)::BIGINT AS n_turns,
         |  arg_min(role, turn_idx) = 'system' AS has_system,
         |  coalesce(arg_min(role, turn_idx)
         |      FILTER (WHERE role <> 'system') = 'user', false)
         |    AS starts_ok,
         |  sum(CASE WHEN prev_role IS NOT NULL AND role = prev_role
         |      THEN 1 ELSE 0 END) = 0 AS alternates,
         |  arg_max(role, turn_idx) = 'assistant' AS ends_assistant,
         |  sum(CASE WHEN content = '' THEN 1 ELSE 0 END)::BIGINT
         |    AS n_empty,
         |  (coalesce(arg_min(role, turn_idx)
         |      FILTER (WHERE role <> 'system') = 'user', false)
         |   AND sum(CASE WHEN prev_role IS NOT NULL AND role = prev_role
         |       THEN 1 ELSE 0 END) = 0
         |   AND arg_max(role, turn_idx) = 'assistant'
         |   AND sum(CASE WHEN content = '' THEN 1 ELSE 0 END) = 0)
         |    AS valid
         |FROM x GROUP BY conv_id""".stripMargin) { (s, d) =>
      Chat.conversationStats(turnsOf(s, d))
    },

    // ---- template render: the FULL rendered string hash-compares
    //      against DuckDB's ordered string_agg — a turn out of order,
    //      a template byte off, or a dropped empty turn all fail ----
    sql("q_chat_render", RenderOracle) { (s, d) =>
      Chat.renderChat(turnsOf(s, d))
    },

    // ---- loss-mask spans: assistant-content [start, end) offsets in
    //      the rendered string, replayed as a cumulative-sum window;
    //      ChatSpec additionally proves substring(rendered, span) ==
    //      content for every turn ----
    sql(
      "q_chat_mask",
      s"""WITH $TurnsCte,
         |x AS (
         |  SELECT conv_id, turn_idx, role,
         |    length(role) + 5 AS prefix,
         |    length(role) + 5 + length(content) + 8 AS full_len,
         |    length(content) AS clen
         |  FROM t),
         |y AS (
         |  SELECT conv_id, turn_idx, role, clen,
         |    coalesce(sum(full_len) OVER (PARTITION BY conv_id
         |      ORDER BY turn_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      + prefix AS ms
         |  FROM x)
         |SELECT conv_id, turn_idx, ms::BIGINT AS mask_start,
         |  (ms + clen)::BIGINT AS mask_end
         |FROM y WHERE role = 'assistant'""".stripMargin) { (s, d) =>
      Chat.maskSpans(turnsOf(s, d))
        .filter(col("role") === "assistant")
        .drop("role")
    },

    // ---- prompt-level dedup: prompt key = first two words of the
    //      first user turn; keep the longest conversation per key
    //      (ties → smallest conv_id), with the collapse count ----
    sql(
      "q_chat_dedup",
      s"""WITH $TurnsCte,
         |p AS (
         |  SELECT conv_id,
         |    arg_min(content, turn_idx) FILTER (WHERE role = 'user')
         |      AS prompt,
         |    count(*)::BIGINT AS n_turns
         |  FROM t GROUP BY conv_id),
         |k AS (
         |  SELECT conv_id, n_turns,
         |    regexp_extract(prompt, '^(\\S+\\s+\\S+)', 1) AS prompt_key
         |  FROM p WHERE prompt IS NOT NULL),
         |r AS (
         |  SELECT prompt_key, conv_id, n_turns,
         |    count(*) OVER (PARTITION BY prompt_key)::BIGINT AS n_dups,
         |    row_number() OVER (PARTITION BY prompt_key
         |      ORDER BY n_turns DESC, conv_id ASC) AS rn
         |  FROM k)
         |SELECT prompt_key, conv_id, n_turns, n_dups
         |FROM r WHERE rn = 1""".stripMargin) { (s, d) =>
      val turns = turnsOf(s, d)
      val prompts = Chat.firstUserTurn(turns)
        .select(col("conv_id"),
          regexp_extract(col("prompt"), "^(\\S+\\s+\\S+)", 1)
            .as("prompt_key"))
      val stats = turns.groupBy("conv_id")
        .agg(count(lit(1)).as("n_turns"))
      val convs = prompts.join(stats, Seq("conv_id"))
      Chat.keepCanonical(convs, "prompt_key", "n_turns", "conv_id")
        .select("prompt_key", "conv_id", "n_turns", "n_dups")
    },

    // ---- DPO preference pairs: per synthetic prompt group, chosen =
    //      arg-max score / rejected = arg-min with pinned tie-breaks,
    //      margin-filtered; the oracle replays with two ranked
    //      windows, so a tie-break drift or a kept singleton fails ----
    sql(
      "q_pref_pairs",
      """WITH c AS (
        |  SELECT doc_id % 97 AS prompt_id, doc_id AS cand_id,
        |    n_chars % 101 AS score
        |  FROM documents),
        |r AS (
        |  SELECT prompt_id, cand_id, score,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY score DESC, cand_id ASC) AS rc,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY score ASC, cand_id DESC) AS rr,
        |    count(*) OVER (PARTITION BY prompt_id)::BIGINT AS n_cands
        |  FROM c),
        |ch AS (SELECT prompt_id, cand_id AS chosen_id,
        |         score AS chosen_score, n_cands FROM r WHERE rc = 1),
        |rj AS (SELECT prompt_id, cand_id AS rejected_id,
        |         score AS rejected_score FROM r WHERE rr = 1)
        |SELECT ch.prompt_id, chosen_id, rejected_id, chosen_score,
        |  rejected_score,
        |  (chosen_score - rejected_score)::BIGINT AS margin, n_cands
        |FROM ch JOIN rj USING (prompt_id)
        |WHERE chosen_id <> rejected_id
        |  AND chosen_score - rejected_score >= 5""".stripMargin) {
      (s, d) =>
        val cands = Tables.documents(s, d).select(
          (col("doc_id") % 97).as("prompt_id"),
          col("doc_id").as("cand_id"),
          (col("n_chars") % 101).as("score"))
        Chat.preferencePairs(cands, "prompt_id", "cand_id", "score",
          minMargin = 5L)
    },

    // ---- SFT sequence packing (compose: render → packChunks): each
    //      conversation's rendered length concat-packs into 2048-char
    //      training sequences, shard-local chunk ids — the oracle
    //      recomputes the render length per conversation WITHOUT
    //      re-rendering (template arithmetic) then replays the
    //      cumulative-sum + integer-div chunk assignment ----
    sql(
      "q_chat_pack",
      s"""WITH $TurnsCte,
         |g AS (
         |  SELECT conv_id, conv_id % 8 AS shard,
         |    sum(length(role) + 5 + length(content) + 8)::BIGINT
         |      AS n_chars
         |  FROM t GROUP BY conv_id),
         |s AS (
         |  SELECT conv_id, shard, n_chars,
         |    coalesce(sum(n_chars) OVER (PARTITION BY shard
         |      ORDER BY conv_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      ::BIGINT AS start_tok
         |  FROM g)
         |SELECT conv_id, shard, start_tok::BIGINT AS start_tok,
         |  start_tok // 2048 AS first_chunk,
         |  (start_tok + n_chars - 1) // 2048 AS last_chunk
         |FROM s""".stripMargin) { (s, d) =>
      val rendered = Chat.renderChat(turnsOf(s, d))
        .withColumn("shard", col("conv_id") % 8)
      graft.ops.Packing.packChunks(rendered, col("shard"),
          col("conv_id"), col("n_chars"), 2048L)
        .select("conv_id", "shard", "start_tok", "first_chunk",
          "last_chunk")
    },

    // ---- SFT prompt decontamination (compose: firstUserTurn →
    //      decontaminate): train-split prompts screened against the
    //      eval split's full-text 5-grams — the contamination gate at
    //      the point where prompts enter the SFT set; the oracle
    //      replays the normalized shingling and the semi/anti join
    //      chain relationally ----
    sql(
      "q_chat_decontam",
      s"""WITH $TurnsCte,
         |p0 AS (
         |  SELECT conv_id,
         |    arg_min(content, turn_idx) FILTER (WHERE role = 'user')
         |      AS prompt
         |  FROM t WHERE conv_id < 450 GROUP BY conv_id),
         |pw AS (
         |  SELECT conv_id, string_split(${TextQueries.normSqlOf("prompt")},
         |    ' ') AS w
         |  FROM p0 WHERE prompt IS NOT NULL),
         |pg AS (
         |  SELECT conv_id, list_transform(range(len(w) - 4),
         |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         |         w[i+4] || ' ' || w[i+5]) AS g
         |  FROM pw),
         |ew AS (
         |  SELECT string_split(${TextQueries.NormSql}, ' ') AS w
         |  FROM documents WHERE doc_id >= 450),
         |ev AS (
         |  SELECT flatten(list(list_transform(range(len(w) - 4),
         |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         |         w[i+4] || ' ' || w[i+5]))) AS eg
         |  FROM ew)
         |SELECT conv_id FROM pg, ev
         |WHERE NOT list_has_any(g, eg)""".stripMargin) { (s, d) =>
      val turns = turnsOf(s, d).filter(col("conv_id") < 450)
      val prompts = Chat.firstUserTurn(turns)
      val evalDocs = Tables.documents(s, d).filter(col("doc_id") >= 450)
      graft.ops.Dedup.decontaminate(prompts, "conv_id", col("prompt"),
          evalDocs, col("text"), n = 5)
        .select("conv_id")
    },

    // ---- the SFT PUBLISH capstone (compose: render → quality gate →
    //      prompt decontamination → sharded jsonl export): the
    //      curated conversation corpus leaves the pipeline through
    //      the manifest/content-addressing discipline, and the oracle
    //      recomputes the expected manifest FROM FIRST PRINCIPLES —
    //      re-deriving the kept set (gate + decontam) relationally,
    //      re-rendering every kept conversation, and replaying the
    //      shard draw and checksums; the face's read-back aggregates
    //      must match too, so a wrong gate decision, a leaked
    //      contaminated prompt, or a torn shard all hash-mismatch ----
    sql(
      "q_sft_publish",
      s"""WITH $sftKeptCte,
         |tot AS (
         |  SELECT sum(octet_length(encode(rendered)))::BIGINT AS total
         |  FROM dd),
         |ns AS (
         |  SELECT greatest(1, (total + 16383) // 16384)::BIGINT AS n
         |  FROM tot),
         |sh AS (
         |  SELECT CAST('0x' || substr(md5(conv_id::VARCHAR), 1, 8)
         |      AS BIGINT) % (SELECT n FROM ns) AS shard,
         |    octet_length(encode(rendered))::BIGINT AS b,
         |    CAST('0x' || substr(md5(coalesce(conv_id::VARCHAR, chr(2))
         |      || chr(1) || coalesce(rendered, chr(2))),
         |      1, 8) AS BIGINT) AS c
         |  FROM dd)
         |SELECT shard::INT AS shard, count(*)::BIGINT AS n_rows,
         |  sum(b)::BIGINT AS bytes, sum(c)::BIGINT AS checksum,
         |  count(*)::BIGINT AS rb_n_rows, sum(b)::BIGINT AS rb_bytes,
         |  sum(c)::BIGINT AS rb_checksum
         |FROM sh GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = sftStore(s, d)
      val manifest = graft.sources.Export.readShardManifest(s, dir)
        .select(col("shard"), col("n_rows"), col("bytes"),
          col("checksum"))
      val rb = graft.sources.Export.shardAggregates(
          graft.sources.Export.readShards(s, dir, Some(
            org.apache.spark.sql.types.StructType.fromDDL(
              "conv_id BIGINT, rendered STRING"))),
          octet_length(col("rendered")), Seq("conv_id", "rendered"))
        .withColumnsRenamed(Map("n_rows" -> "rb_n_rows",
          "bytes" -> "rb_bytes", "checksum" -> "rb_checksum"))
      manifest.join(rb, Seq("shard"))
    },

    // ---- seeded epoch order over the SFT store (compose: the
    //      curated conversation corpus feeds the reproducible-
    //      training loader machinery): shard visit order and
    //      within-shard order are pure draws of (seed, epoch); the
    //      oracle re-derives the kept set, replays the shard draw,
    //      and recomputes the exact global position of every
    //      conversation ----
    sql(
      "q_sft_epoch",
      s"""WITH $sftKeptCte,
         |tot AS (
         |  SELECT sum(octet_length(encode(rendered)))::BIGINT AS total
         |  FROM dd),
         |ns AS (
         |  SELECT greatest(1, (total + 16383) // 16384)::BIGINT AS n
         |  FROM tot),
         |k AS (
         |  SELECT conv_id,
         |    CAST('0x' || substr(md5(conv_id::VARCHAR), 1, 8)
         |      AS BIGINT) % (SELECT n FROM ns) AS shard
         |  FROM dd),
         |kk AS (
         |  SELECT conv_id, shard,
         |    CAST('0x' || substr(md5('7:2:' || shard::VARCHAR), 1, 8)
         |      AS BIGINT) AS sdraw,
         |    CAST('0x' || substr(md5('7:2:' || conv_id::VARCHAR), 1, 8)
         |      AS BIGINT) AS rdraw
         |  FROM k)
         |SELECT conv_id, shard::INT AS shard,
         |  row_number() OVER (ORDER BY sdraw, shard, rdraw, conv_id)
         |    ::BIGINT AS epoch_pos
         |FROM kk""".stripMargin) { (s, d) =>
      graft.sources.Export.epochOrder(s, sftStore(s, d), "conv_id",
          seed = 7L, epoch = 2)
        .select(col("conv_id"), col("shard"), col("epoch_pos"))
    },

    // ---- right-to-be-forgotten ON the SFT store: conversations of
    //      withdrawn users (conv_id % 53 == 11) retracted through the
    //      no-corpus-scan takedown — only affected shards rewrite,
    //      the shard count stays pinned at the original draw, and the
    //      oracle recomputes the expected post-takedown manifest from
    //      the kept set MINUS the withdrawn ids; read-back aggregates
    //      must match too, so a surviving withdrawn row, a torn
    //      rewrite, or a re-sharded draw all hash-mismatch ----
    sql(
      "q_sft_retract",
      s"""WITH $sftKeptCte,
         |tot AS (
         |  SELECT sum(octet_length(encode(rendered)))::BIGINT AS total
         |  FROM dd),
         |ns AS (
         |  SELECT greatest(1, (total + 16383) // 16384)::BIGINT AS n
         |  FROM tot),
         |sh AS (
         |  SELECT CAST('0x' || substr(md5(conv_id::VARCHAR), 1, 8)
         |      AS BIGINT) % (SELECT n FROM ns) AS shard,
         |    octet_length(encode(rendered))::BIGINT AS b,
         |    CAST('0x' || substr(md5(coalesce(conv_id::VARCHAR, chr(2))
         |      || chr(1) || coalesce(rendered, chr(2))),
         |      1, 8) AS BIGINT) AS c
         |  FROM dd WHERE NOT (conv_id % 53 = 11))
         |SELECT shard::INT AS shard, count(*)::BIGINT AS n_rows,
         |  sum(b)::BIGINT AS bytes, sum(c)::BIGINT AS checksum,
         |  count(*)::BIGINT AS rb_n_rows, sum(b)::BIGINT AS rb_bytes,
         |  sum(c)::BIGINT AS rb_checksum
         |FROM sh GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = sftRetractedStore(s, d)
      val manifest = graft.sources.Export.readShardManifest(s, dir)
        .select(col("shard"), col("n_rows"), col("bytes"),
          col("checksum"))
      val rb = graft.sources.Export.shardAggregates(
          graft.sources.Export.readShards(s, dir, Some(
            org.apache.spark.sql.types.StructType.fromDDL(
              "conv_id BIGINT, rendered STRING"))),
          octet_length(col("rendered")), Seq("conv_id", "rendered"))
        .withColumnsRenamed(Map("n_rows" -> "rb_n_rows",
          "bytes" -> "rb_bytes", "checksum" -> "rb_checksum"))
      manifest.join(rb, Seq("shard"))
    },

    // ---- multi-worker DDP slices over the SFT store: the epoch's
    //      shard visit order cuts into 3 contiguous shard-granular
    //      worker slices; the oracle replays each worker's EXACT
    //      conversation list, so the union is provably the full
    //      epoch with no overlap ----
    sql(
      "q_sft_workers",
      s"""WITH $sftKeptCte,
         |tot AS (
         |  SELECT sum(octet_length(encode(rendered)))::BIGINT AS total
         |  FROM dd),
         |ns AS (
         |  SELECT greatest(1, (total + 16383) // 16384)::BIGINT AS n
         |  FROM tot),
         |k0 AS (
         |  SELECT conv_id,
         |    CAST('0x' || substr(md5(conv_id::VARCHAR), 1, 8)
         |      AS BIGINT) % (SELECT n FROM ns) AS shard
         |  FROM dd),
         |k AS (
         |  SELECT conv_id, shard,
         |    CAST('0x' || substr(md5('7:2:' || shard::VARCHAR), 1, 8)
         |      AS BIGINT) AS sdraw,
         |    CAST('0x' || substr(md5('7:2:' || conv_id::VARCHAR), 1, 8)
         |      AS BIGINT) AS rdraw
         |  FROM k0),
         |off AS (
         |  SELECT shard,
         |    sum(count(*)) OVER (ORDER BY any_value(sdraw), shard)
         |      - count(*) AS o,
         |    sum(count(*)) OVER () AS t
         |  FROM k GROUP BY shard)
         |SELECT k.conv_id, k.shard::INT AS shard,
         |  row_number() OVER (ORDER BY sdraw, k.shard, rdraw, conv_id)
         |    ::BIGINT AS epoch_pos,
         |  ((3 * off.o) // off.t)::INT AS worker
         |FROM k JOIN off ON k.shard = off.shard""".stripMargin) {
      (s, d) =>
        graft.sources.Export.epochWorkerSlices(s, sftStore(s, d),
            "conv_id", seed = 7L, epoch = 2, nWorkers = 3)
          .select(col("conv_id"), col("shard"), col("epoch_pos"),
            col("worker"))
    },

    // ---- PII scrub on the SFT path (compose: planted PII → redact →
    //      re-render): every 9th conversation gets an email planted
    //      in turn 1 and every 9th+7 a phone in turn 0 (in BOTH
    //      engines); the face re-renders from SCRUBBED contents and
    //      counts the redaction markers exactly — an unscrubbed leak,
    //      an over-match, or a marker miscount all hash-mismatch ----
    sql(
      "q_chat_pii",
      s"""WITH $TurnsCte,
         |p AS (
         |  SELECT conv_id, turn_idx, role,
         |    content || CASE
         |      WHEN conv_id % 9 = 4 AND turn_idx = 1
         |        THEN ' mail bob.smith@example.org now'
         |      WHEN conv_id % 9 = 7 AND turn_idx = 0
         |        THEN ' call +1 (555) 123-4567 today'
         |      ELSE '' END AS content
         |  FROM t),
         |r AS (
         |  SELECT conv_id, turn_idx, role,
         |    ${graft.ops.Text.redactPiiSql("content")} AS content
         |  FROM p),
         |g AS (
         |  SELECT conv_id,
         |    string_agg('<|' || role || '|>' || chr(10) || content ||
         |      '<|end|>' || chr(10), '' ORDER BY turn_idx) AS rendered
         |  FROM r GROUP BY conv_id)
         |SELECT conv_id, rendered,
         |  ((length(rendered) - length(replace(rendered, '<EMAIL>', '')))
         |    // 7)::BIGINT AS n_email,
         |  ((length(rendered) - length(replace(rendered, '<PHONE>', '')))
         |    // 7)::BIGINT AS n_phone
         |FROM g""".stripMargin) { (s, d) =>
      val planted = turnsOf(s, d).withColumn("content",
        concat(col("content"),
          when(col("conv_id") % 9 === 4 && col("turn_idx") === 1,
            " mail bob.smith@example.org now")
            .when(col("conv_id") % 9 === 7 && col("turn_idx") === 0,
              " call +1 (555) 123-4567 today")
            .otherwise("")))
      val scrubbed = planted.withColumn("content",
        graft.ops.Text.redactPii(col("content")))
      Chat.renderChat(scrubbed)
        .select(col("conv_id"), col("rendered"),
          expr("(length(rendered) - " +
            "length(replace(rendered, '<EMAIL>', ''))) div 7")
            .cast("long").as("n_email"),
          expr("(length(rendered) - " +
            "length(replace(rendered, '<PHONE>', ''))) div 7")
            .cast("long").as("n_phone"))
    },

    // ---- training-quality gate: exact-integer volume metrics +
    //      keep decision; integer percent ratio (NULL on zero user
    //      volume) replays through DuckDB's integer division ----
    sql(
      "q_chat_gate",
      s"""WITH $TurnsCte,
         |g AS (
         |  SELECT conv_id, count(*)::BIGINT AS n_turns,
         |    sum(CASE WHEN role = 'user' THEN length(content)
         |        ELSE 0 END)::BIGINT AS user_chars,
         |    sum(CASE WHEN role = 'assistant' THEN length(content)
         |        ELSE 0 END)::BIGINT AS asst_chars,
         |    arg_max(content, turn_idx) AS last_content
         |  FROM t GROUP BY conv_id)
         |SELECT conv_id, n_turns, user_chars, asst_chars,
         |  ((asst_chars * 100) // nullif(user_chars, 0))::BIGINT
         |    AS ratio_pct,
         |  (asst_chars >= 40 AND n_turns >= 3 AND last_content <> '')
         |    AS keep
         |FROM g""".stripMargin) { (s, d) =>
      Chat.chatGate(turnsOf(s, d))
    })
}
