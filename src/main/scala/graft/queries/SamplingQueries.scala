package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling / split surface over `documents` — every
  * query here is byte-exact oracle-checkable because the md5-prefix
  * draw ([[Sampling.unitDraw]]) is engine-independent: the DuckDB SQL
  * recomputes the identical hex draw and thresholds, so MEMBERSHIP
  * (not just counts) is verified by the hash gate.
  */
object SamplingQueries {
  import QueryDef.sql

  /** DuckDB side of [[Sampling.unitDraw]]. */
  private def drawSql(salt: String): String =
    s"substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, ${Sampling.PrefixHexLen})"

  private val StratFractions =
    Map("en" -> 0.5, "zh" -> 0.25, "de" -> 0.125)
  private val StratDefault = 0.0625

  val defs: Seq[QueryDef] = Seq(

    // ---- deterministic Bernoulli sample: exact membership checked ----
    sql(
      "q_hash_sample",
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${drawSql("")} < '${Sampling.hexThreshold(0.25)}'"""
        .stripMargin) { (s, d) =>
      Sampling.sampleByHash(
          Tables.documents(s, d), col("doc_id"), 0.25)
        .select("doc_id", "lang", "source")
    },

    // ---- train/val/test assignment: per-split count + id-sum pins
    //      the exact partition of the corpus ----
    sql(
      "q_train_split",
      s"""SELECT split, count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM (SELECT doc_id,
         |  CASE WHEN ${drawSql("")} < '${Sampling.hexThreshold(0.8)}'
         |         THEN 'train'
         |       WHEN ${drawSql("")} < '${Sampling.hexThreshold(0.9)}'
         |         THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |GROUP BY split""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Sampling.splitAssign(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
    },

    // ---- per-language keep-fractions (salted independently of
    //      q_hash_sample so the two samples decorrelate) ----
    sql(
      "q_stratified_sample",
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${drawSql("strat")} <
         |  CASE lang
         |    WHEN 'en' THEN '${Sampling.hexThreshold(0.5)}'
         |    WHEN 'zh' THEN '${Sampling.hexThreshold(0.25)}'
         |    WHEN 'de' THEN '${Sampling.hexThreshold(0.125)}'
         |    ELSE '${Sampling.hexThreshold(StratDefault)}' END"""
        .stripMargin) { (s, d) =>
      Sampling.stratifiedSampleByHash(
          Tables.documents(s, d), col("doc_id"), col("lang"),
          StratFractions, default = StratDefault, salt = "strat")
        .select("doc_id", "lang")
    },

    // ---- fixed-k balanced per-group sample: highest hash draws per
    //      lang, selected by the bounded-heap operator (no group sort);
    //      lexical hex order == numeric draw order, so DuckDB's string
    //      DESC replays the heap's double DESC exactly ----
    sql(
      "q_sample_per_group",
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY ${drawSql("kpg")} DESC, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 10""".stripMargin) { (s, d) =>
      Sampling.sampleKPerGroup(
          Tables.documents(s, d), Seq("lang"), col("doc_id"), k = 10,
          tie = "doc_id", salt = "kpg")
        .select("doc_id", "lang")
    },

    // ---- weighted k-sample per group without replacement (A-ES
    //      keys, length-proportional weights): inclusion odds track
    //      n_chars; the oracle recomputes the exact keys ----
    sql(
      "q_weighted_sample",
      s"""SELECT doc_id, lang, n_chars FROM (
         |  SELECT doc_id, lang, n_chars, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY ln((CAST('0x' || substr(md5('ws' ||
         |        CAST(doc_id AS VARCHAR)), 1, ${Sampling.PrefixHexLen})
         |        AS BIGINT) + 0.5) / 4294967296.0) / n_chars DESC,
         |      doc_id) AS rn
         |  FROM documents WHERE n_chars > 0)
         |WHERE rn <= 5""".stripMargin) { (s, d) =>
      Sampling.weightedSampleKPerGroup(
          Tables.documents(s, d), Seq("lang"), col("doc_id"),
          weight = col("n_chars"), k = 5, tie = "doc_id", salt = "ws")
        .select("doc_id", "lang", "n_chars")
    },

    // ---- per-group quality-quantile filter (exact face; the scale
    //      path is Sampling.topQuantileFilter, spec-checked against
    //      this one) ----
    sql(
      "q_quantile_filter",
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    percent_rank() OVER
        |      (PARTITION BY lang ORDER BY n_chars DESC) AS pr
        |  FROM documents WHERE n_chars IS NOT NULL)
        |WHERE pr <= 0.25""".stripMargin) { (s, d) =>
      Sampling.percentRankTopFraction(
          Tables.documents(s, d).filter(col("n_chars").isNotNull),
          Seq("lang"), col("n_chars"), 0.25)
        .select("doc_id", "lang", "n_chars")
    },

    // ---- deterministic weighted corpus mixture: three language
    //      sub-corpora at different keep-rates, unioned — the draws
    //      are indexed-salt md5 prefixes, so DuckDB replays the exact
    //      membership of the mix ----
    sql(
      "q_weighted_mix",
      s"""SELECT doc_id, lang FROM documents WHERE lang = 'en'
         |  AND ${drawSql("#0")} < '${Sampling.hexThreshold(0.5)}'
         |UNION ALL
         |SELECT doc_id, lang FROM documents WHERE lang = 'es'
         |  AND ${drawSql("#1")} < '${Sampling.hexThreshold(1.0)}'
         |UNION ALL
         |SELECT doc_id, lang FROM documents WHERE lang = 'zh'
         |  AND ${drawSql("#2")} < '${Sampling.hexThreshold(0.25)}'"""
        .stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Sampling.weightedMix(
          Seq(
            docs.filter(col("lang") === "en") -> 0.5,
            docs.filter(col("lang") === "es") -> 1.0,
            docs.filter(col("lang") === "zh") -> 0.25),
          key = "doc_id")
        .select("doc_id", "lang")
    },

    // ---- token-budget slice: rows in draw order until the per-lang
    //      running token sum hits the budget — the exact window is
    //      replayed in DuckDB over the same draw order ----
    sql(
      "q_token_budget",
      s"""SELECT doc_id, lang, n_chars FROM (
         |  SELECT doc_id, lang, n_chars,
         |    sum(n_chars) OVER (PARTITION BY lang
         |      ORDER BY ${drawSql("")}, CAST(doc_id AS VARCHAR)
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM documents)
         |WHERE cum <= 20000""".stripMargin) { (s, d) =>
      Sampling.takeTokenBudget(
          Tables.documents(s, d), Seq("lang"), col("doc_id"),
          col("n_chars"), budget = 20000L)
        .select("doc_id", "lang", "n_chars")
    },

    // ---- leakage-safe split: the draw keys on the GROUP (source
    //      domain), not the row, so every document from one source
    //      lands in the same split — near-duplicates within a site can
    //      never straddle train/test (the C4/RefinedWeb practice:
    //      contamination via intra-domain duplication is the measured
    //      failure of row-keyed splits). Map-side like every draw
    //      here; swap the group column for a near-dup cluster label
    //      (Graph.connectedComponents over collision pairs) when
    //      splitting must respect content clusters instead of
    //      provenance. Exact membership is hash-checked. ----
    sql(
      "q_leakage_safe_split",
      s"""SELECT doc_id, source,
         |  CASE WHEN substr(md5('grp' || source), 1,
         |         ${Sampling.PrefixHexLen})
         |         < '${Sampling.hexThreshold(0.8)}' THEN 'train'
         |       WHEN substr(md5('grp' || source), 1,
         |         ${Sampling.PrefixHexLen})
         |         < '${Sampling.hexThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          Sampling.splitAssign(col("source"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            salt = "grp").as("split"))
    },

    // ---- deterministic negative sampling for contrastive pairs:
    //      k=4 bucket-hashed negatives per anchor from a 64-bucket
    //      corpus election — O(corpus + anchors*k), never the
    //      |anchors|x|corpus| rank blow-up. The md5 draw convention
    //      lets DuckDB replay the exact negative ids ----
    sql(
      "q_negative_sample",
      s"""WITH b AS (
         |  SELECT doc_id AS negative_id,
         |    CAST('0x' || substr(md5('neg#b' || CAST(doc_id AS VARCHAR)),
         |      1, ${Sampling.PrefixHexLen}) AS BIGINT) % 64 AS bkt,
         |    substr(md5('neg#r' || CAST(doc_id AS VARCHAR)),
         |      1, ${Sampling.PrefixHexLen}) AS d
         |  FROM documents),
         |reps AS (
         |  SELECT bkt, negative_id FROM (
         |    SELECT bkt, negative_id,
         |      row_number() OVER (PARTITION BY bkt
         |        ORDER BY d, negative_id) AS rn
         |    FROM b) WHERE rn = 1),
         |probes AS (
         |  SELECT a.doc_id AS anchor_id, i.probe,
         |    CAST('0x' || substr(md5('neg#a' || CAST(a.doc_id AS VARCHAR)
         |        || '#' || CAST(i.probe AS VARCHAR)),
         |      1, ${Sampling.PrefixHexLen}) AS BIGINT) % 64 AS bkt
         |  FROM (SELECT doc_id FROM documents WHERE doc_id < 20) a,
         |       (SELECT unnest(range(4)) AS probe) i)
         |SELECT p.anchor_id, p.probe::INT AS probe, r.negative_id
         |FROM probes p JOIN reps r USING (bkt)
         |WHERE r.negative_id <> p.anchor_id
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Sampling.negativeSamples(
          docs.filter(col("doc_id") < 20), "doc_id",
          docs, "doc_id", k = 4, buckets = 64, salt = "neg")
        .orderBy("anchor_id", "probe")
    },

    // ---- temperature-scaled (α = 1/2) domain rebalancing: keep-rates
    //      derive from the observed lang sizes, √-flattened toward
    //      uniform; integer draw thresholds, so MEMBERSHIP (not just
    //      counts) hash-checks against the DuckDB replay ----
    sql(
      "q_temperature_mix",
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents
         |           GROUP BY lang),
         |w AS (SELECT lang, n,
         |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS wu
         |  FROM c),
         |t AS (SELECT CAST(sum(wu) AS HUGEINT) AS tot FROM w),
         |r AS (SELECT lang,
         |    (least(CAST(250 AS HUGEINT) * wu, (SELECT tot FROM t) * n)
         |     * 4294967296) // ((SELECT tot FROM t) * n) AS thr
         |  FROM w)
         |SELECT d.doc_id, d.lang FROM documents d
         |JOIN r ON r.lang IS NOT DISTINCT FROM d.lang
         |WHERE CAST('0x' || substr(md5('tmix' ||
         |    CAST(d.doc_id AS VARCHAR)), 1, ${Sampling.PrefixHexLen})
         |  AS BIGINT) < r.thr""".stripMargin) { (s, d) =>
      Sampling.temperatureMix(
          Tables.documents(s, d), "lang", col("doc_id"),
          targetRows = 250, salt = "tmix")
        .select("doc_id", "lang")
    },

    // ---- per-domain EPOCH plan for a token budget: balancing |S|
    //      domains inside B tokens gives epochs(s) = B / (|S|·T_s),
    //      capped at 4 (the repeat-past-here-and-memorize rule);
    //      exact integer num/den, divisions on identical operands ----
    sql(
      "q_epoch_plan",
      """WITH t AS (SELECT source, sum(n_chars)::BIGINT AS tokens
        |           FROM documents GROUP BY 1),
        |s AS (SELECT count(*)::BIGINT AS ns FROM t)
        |SELECT source, tokens,
        |  600000::BIGINT AS epoch_num,
        |  (ns * tokens)::BIGINT AS epoch_den,
        |  round(600000::DOUBLE / (ns * tokens), 9) AS epochs,
        |  round(least(600000, 4 * ns * tokens)::DOUBLE
        |        / (ns * tokens), 9) AS capped_epochs,
        |  round(tokens::DOUBLE * least(600000, 4 * ns * tokens)::DOUBLE
        |        / (ns * tokens), 6) AS planned_tokens
        |FROM t, s""".stripMargin) { (s, d) =>
      Sampling.epochPlan(
        Tables.documents(s, d), "source", col("n_chars"),
        budget = 600000L, cap = 4L)
    },

    // ---- calibrated mixing to EXPLICIT target shares (the
    //      prescriptive face: match a benchmark distribution);
    //      unlisted langs drop — calibration doubles as a whitelist.
    //      Same integer thresholds, membership hash-checked ----
    sql(
      "q_calibrate_mix",
      s"""WITH sh AS (SELECT * FROM (VALUES ('en', 400000),
         |    ('zh', 300000), ('de', 300000)) AS t(dom, su)),
         |c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |r AS (SELECT sh.dom,
         |    (least(CAST(200 AS HUGEINT) * su,
         |           CAST(1000000 AS HUGEINT) * n) * 4294967296)
         |    // (CAST(1000000 AS HUGEINT) * n) AS thr
         |  FROM sh JOIN c ON c.lang = sh.dom)
         |SELECT d.doc_id, d.lang FROM documents d
         |JOIN r ON r.dom = d.lang
         |WHERE CAST('0x' || substr(md5('cal' ||
         |    CAST(d.doc_id AS VARCHAR)), 1, ${Sampling.PrefixHexLen})
         |  AS BIGINT) < r.thr""".stripMargin) { (s, d) =>
      Sampling.calibrateMix(
          Tables.documents(s, d), "lang", col("doc_id"),
          targetShares = Map("en" -> 0.4, "zh" -> 0.3, "de" -> 0.3),
          targetRows = 200, salt = "cal")
        .select("doc_id", "lang")
    })
}
