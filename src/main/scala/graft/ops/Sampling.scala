package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines (no reference counterpart — the reference has no sampling;
  * SURVEY.md §8 extension surface).
  *
  * Everything here derives from one primitive: the first
  * [[PrefixHexLen]] hex chars of `md5(salt ++ key)` read as a
  * fixed-point draw in [0, 1). Because the prefix is fixed-width hex,
  * LEXICAL comparison equals numeric comparison, so a sample defined as
  * `draw < threshold` is reproducible byte-for-byte across engines
  * (Spark, DuckDB, anything with md5), across runs, and across
  * repartitionings — unlike `df.sample()`, whose output depends on
  * partition layout and RNG stream position.
  *
  * Scale shape: every operator below is a pure map-side filter or
  * projection — NO shuffle, no RNG state, no driver round-trip — except
  * [[topQuantileFilter]], which adds one partial-aggregated shuffle on
  * the (low-cardinality) group key and broadcasts the thresholds back.
  * Null keys draw null and are dropped by the comparison (both engines
  * agree: NULL < x is NULL).
  */
object Sampling {

  /** 8 hex chars = 32 bits of draw: fraction granularity 2^-32. */
  val PrefixHexLen = 8

  private val Buckets = 1L << (4 * PrefixHexLen) // 16^8

  /** The uniform draw for `key` as a fixed-width lowercase hex string.
    * `salt` decorrelates independent samples over the same keys (an
    * empty salt is fine when only one sample is taken). */
  def unitDraw(key: Column, salt: String = ""): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")),
      1, PrefixHexLen)

  /** `fraction` as the hex threshold the draw is compared against.
    * fraction >= 1 returns "g" — lexically above every hex string, so
    * everything passes; fraction <= 0 passes nothing. */
  def hexThreshold(fraction: Double): String = {
    val n = math.floor(fraction * Buckets).toLong
    if (n >= Buckets) "g"
    else if (n <= 0L) "00000000"
    else f"$n%08x"
  }

  /** Keep ~`fraction` of rows, chosen by key hash: deterministic,
    * partition-independent, map-side. */
  def sampleByHash(
      df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(unitDraw(key, salt) < lit(hexThreshold(fraction)))

  /** Split label ("train" / "val" / "test" / …) for `key` under
    * `weights` (normalized to sum 1): the draw lands in the cumulative
    * bucket of its label. The last label takes everything remaining, so
    * rounding never orphans a row. */
  def splitAssign(
      key: Column, weights: Seq[(String, Double)],
      salt: String = ""): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0),
      "weights must be non-negative")
    val total = weights.map(_._2).sum
    val draw = unitDraw(key, salt)
    val cum = weights.init.scanLeft(0.0) { case (acc, (_, w)) =>
      acc + w / total
    }.tail
    weights.init.zip(cum)
      .foldRight(lit(weights.last._1)) { case (((label, _), c), rest) =>
        when(draw < lit(hexThreshold(c)), label).otherwise(rest)
      }
  }

  /** Per-stratum deterministic sampling: each stratum value gets its
    * own keep-fraction (absent strata fall back to `default`). One
    * when-chain per stratum — map-side, no shuffle, unlike
    * `DataFrameStatFunctions.sampleBy` (seeded RNG, partition-layout
    * dependent). */
  def stratifiedSampleByHash(
      df: DataFrame, key: Column, strata: Column,
      fractions: Map[String, Double], default: Double = 0.0,
      salt: String = ""): DataFrame = {
    val draw = unitDraw(key, salt)
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(hexThreshold(default))) {
        case ((value, f), rest) =>
          when(strata === lit(value), lit(hexThreshold(f))).otherwise(rest)
      }
    df.filter(draw < threshold)
  }

  /** Deterministic fixed-size per-group sample: the k rows with the
    * HIGHEST hash draw in each group — a balanced per-class subset
    * (classic for eval sets / class-capped training data) that is
    * reproducible across runs, engines, and layouts like every other
    * draw here. Selection runs on the bounded-heap TopKPerGroup
    * operator: O(n log k), O(groups × k) memory, never a per-group
    * sort. `tie` must name a unique LongType column (draw collisions
    * are possible at 32-bit scale). */
  def sampleKPerGroup(
      df: DataFrame, groupCols: Seq[String], key: Column, k: Int,
      tie: String, salt: String = ""): DataFrame =
    graft.plans.TopKPerGroup.topK(
        df.withColumn("__draw",
          conv(unitDraw(key, salt), 16, 10).cast("double")),
        groupCols, "__draw", tie, k)
      .drop("__draw", "rank")

  /** WEIGHTED k-sample per group without replacement — Efraimidis &
    * Spirakis (2006) A-ES keys over the engine's deterministic hash
    * draws: row i gets key ln(u_i)/w_i with u_i its md5-derived
    * uniform draw in (0,1); the k LARGEST keys per group are a
    * weighted sample without replacement, each row's inclusion
    * probability proportional to its weight. Same scale shape as
    * [[sampleKPerGroup]]: keys are map-side, ranking rides the
    * bounded-heap TopKPerGroup (no per-group sort), and the draw is
    * engine-portable so a DuckDB oracle reproduces the exact sample.
    * (ln is the one transcendental: cross-engine last-ulp divergence
    * could in principle flip two keys within 1e-16 of each other —
    * with continuous draws that is a measure-zero tie, and `tie`
    * breaks exact key equality deterministically.)
    *
    * `weight` must be strictly positive; rows with weight <= 0 or
    * null are dropped (they can never be sampled).
    */
  def weightedSampleKPerGroup(
      df: DataFrame, groupCols: Seq[String], key: Column, weight: Column,
      k: Int, tie: String, salt: String = ""): DataFrame = {
    val buckets = math.pow(16.0, PrefixHexLen) // 2^32, exact in double
    val u = (conv(unitDraw(key, salt), 16, 10).cast("double") + 0.5) /
      buckets // (0,1) exclusive: ln never sees 0
    graft.plans.TopKPerGroup.topK(
        df.filter(weight > 0)
          .withColumn("__wkey", log(u) / weight),
        groupCols, "__wkey", tie, k)
      .drop("__wkey", "rank")
  }

  /** EXACT per-group top-fraction filter: keep rows whose `score`
    * ranks in the best `fraction` of their group (ties inclusive),
    * via window percent_rank — a per-group sort, so this is the
    * oracle-checkable face for gate-scale data. At 100 TB prefer
    * [[topQuantileFilter]]. */
  def percentRankTopFraction(
      df: DataFrame, groupCols: Seq[String], score: Column,
      fraction: Double): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(score.desc)
    df.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") <= fraction)
      .drop("__pr")
  }

  /** SCALE path for per-group quality filtering: one aggregation
    * computes each group's `1 - fraction` score quantile
    * (percentile_approx, map-side combined), the tiny threshold table
    * broadcasts back, and the filter runs map-side on the fact — no
    * per-group sort anywhere. `accuracy` trades memory for quantile
    * error exactly as percentile_approx documents. */
  def topQuantileFilter(
      df: DataFrame, groupCols: Seq[String], score: Column,
      fraction: Double, accuracy: Int = 10000): DataFrame = {
    val thr = df
      .groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(score, lit(1.0 - fraction), lit(accuracy))
        .as("__thr"))
    df.join(broadcast(thr), groupCols)
      .filter(score >= col("__thr"))
      .drop("__thr")
  }

  /** Deterministic weighted corpus mixture: each source keeps ~its
    * weight fraction via an independently-salted draw (the source
    * index decorrelates sources sharing keys), then everything unions
    * by name — the standard recipe for composing a training mix
    * ("web at 30%, code at 100%, forums at 10%"). Pure map-side
    * sampling + union: no shuffle, reproducible across engines and
    * layouts. Weights are rates in [0, 1]; oversampling (> 1 epoch of
    * a source) is explicit repetition — union the same source again
    * with a different salt — not a hidden behavior here. */
  def weightedMix(
      sources: Seq[(DataFrame, Double)], key: String,
      salt: String = ""): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(sources.forall { case (_, w) => w >= 0.0 && w <= 1.0 },
      "weights are keep-rates in [0, 1]")
    sources.zipWithIndex.map { case ((df, w), i) =>
      sampleByHash(df, col(key), w, s"$salt#$i")
    }.reduce(_.unionByName(_))
  }

  /** Temperature-scaled domain mixing (α = 1/2): sampling rates derive
    * from the OBSERVED domain sizes — p_d ∝ √n_d — so head domains are
    * downweighted toward uniform and the tail keeps its mass (the
    * multilingual-corpus rebalancing recipe; α = 0.5 is its common
    * setting). Each domain's keep-rate targets `targetRows` total:
    * rate_d = min(1, targetRows·√n_d / (Σ_e √n_e) / n_d), membership by
    * the deterministic per-row draw.
    *
    * Unlike [[weightedMix]] (caller-supplied rates), the rates here are
    * DATA-derived, which is where cross-engine float drift would creep
    * in: a float Σ√n depends on summation order. So the weights snap to
    * the 1e-3 grid as BIGINTs (√ is IEEE-correctly-rounded in every
    * engine, floor is unambiguous), the total is an exact integer sum,
    * and each domain's draw threshold is one integer division on
    * DECIMAL(38,0) — `(min(T·w_d, tot·n_d) · 2^32) div (tot·n_d)` —
    * so thresholds and hence MEMBERSHIP are bit-identical in any
    * engine (α ≠ 1/2 would need libm `pow`, which IEEE does not pin —
    * that is why the exponent is fixed at the sqrt point).
    *
    * Scale shape: one dim-sized count aggregate, the scalar total on a
    * one-row broadcast carrier, rates broadcast back onto the corpus —
    * the corpus itself is scanned once, filtered map-side, never
    * shuffled. NULL domains keep their own group (null-safe join).
    */
  def temperatureMix(
      df: DataFrame, domain: String, key: Column, targetRows: Long,
      salt: String = ""): DataFrame = {
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    val counts = df.groupBy(col(domain).as("__dom"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wu",
        floor(sqrt(col("__n").cast("double")) * 1000.0).cast("long"))
    // the weight total folds over the DIM-SIZED count frame via an
    // unpartitioned window — a single-partition pass over #domains
    // rows, NOT a corpus re-scan (a separate agg + crossJoin would
    // recompute the count subtree: one extra 100 TB scan)
    val rates = broadcast(counts
      .withColumn("__tot", sum("__wu").over(Window.partitionBy()))
      .withColumn("__thr", expr(
        s"""(least(CAST($targetRows AS DECIMAL(38,0)) * __wu,
           |       CAST(__tot AS DECIMAL(38,0)) * __n) * 4294967296)
           |div (CAST(__tot AS DECIMAL(38,0)) * __n)""".stripMargin))
      .select("__dom", "__thr"))
    df.join(rates, col(domain) <=> col("__dom"), "left")
      .filter(drawInt(key, salt) < col("__thr"))
      .drop("__dom", "__thr")
  }

  /** Calibrated domain mixing: downsample so the OUTPUT matches
    * explicit target shares ("40% en / 30% zh / 30% code", matching a
    * benchmark or deployment distribution) at ~`targetRows` total —
    * the prescriptive complement to [[temperatureMix]]'s derived
    * rates. rate_d = min(1, targetRows·share_d / n_d); a domain too
    * small to fill its share keeps everything (rate clamps at 1) and
    * the output share shifts accordingly rather than oversampling.
    *
    * Shares snap to 1e-6-grid integer literals JVM-side; the
    * threshold is the same single DECIMAL(38,0) division as
    * [[temperatureMix]], so membership is engine/layout-invariant.
    * Domains absent from `targetShares` (and NULL domains) drop —
    * calibration is also a whitelist. Same scale shape: one dim-sized
    * count, rates broadcast, corpus scanned once, filtered map-side.
    */
  def calibrateMix(
      df: DataFrame, domain: String, key: Column,
      targetShares: Map[String, Double], targetRows: Long,
      salt: String = ""): DataFrame = {
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    require(targetShares.nonEmpty &&
      targetShares.values.forall(s => s >= 0 && s <= 1),
      "shares must lie in [0, 1]")
    val shareU = targetShares.map { case (k, v) =>
      k -> math.round(v * 1000000.0) }
    val shares = broadcast(
      df.sparkSession.createDataFrame(
        shareU.toSeq.map(t => (t._1, t._2))).toDF("__dom", "__su"))
    val counts = df.groupBy(col(domain).as("__dom2"))
      .agg(count(lit(1)).as("__n"))
    val rates = broadcast(counts
      .join(shares, col("__dom2") === col("__dom"))
      .withColumn("__thr", expr(
        s"""(least(CAST($targetRows AS DECIMAL(38,0)) * __su,
           |       CAST(1000000 AS DECIMAL(38,0)) * __n) * 4294967296)
           |div (CAST(1000000 AS DECIMAL(38,0)) * __n)""".stripMargin))
      .select(col("__dom"), col("__thr")))
    df.join(rates, col(domain) === col("__dom"))
      .filter(drawInt(key, salt) < col("__thr"))
      .drop("__dom", "__thr")
  }

  /** Deterministic token-budget slice: rows ordered by their hash draw
    * (a reproducible "random" corpus order — no RNG, no layout
    * dependence), kept while the running `tokens` sum stays within
    * `budget` per shard. "Give me a 10 B-token slice of this corpus"
    * as one window over each shard: one shuffle on `shardCols`, sort
    * within shard (pick shards at file/source granularity so 1000
    * executors stay busy — the same parallelism contract as sequence
    * packing). Ties on the 32-bit draw break by key string, so the
    * slice is total-order deterministic PROVIDED `key` is unique per
    * row (like [[sampleKPerGroup]]'s tie column) — rows sharing a key
    * share both sort fields, and whichever of them straddles the
    * budget boundary is then layout-dependent. */
  def takeTokenBudget(
      df: DataFrame, shardCols: Seq[String], key: Column, tokens: Column,
      budget: Long, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(col("__draw"), col("__key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__draw", unitDraw(key, salt))
      .withColumn("__key", key.cast("string"))
      .withColumn("__cum", sum(tokens).over(w))
      .filter(col("__cum") <= budget)
      .drop("__draw", "__key", "__cum")
  }

  /** The draw as an unsigned 32-bit integer (for modular bucketing —
    * both engines parse the same 8 hex chars). */
  private def drawInt(key: Column, salt: String): Column =
    conv(unitDraw(key, salt), 16, 10).cast("long")

  /** Deterministic NEGATIVE sampling for contrastive-training pairs:
    * k "random" corpus documents per anchor, with replacement across
    * probes, never the anchor itself. The naive formulation (rank all
    * corpus docs per anchor by a joint hash) is an |anchors|×|corpus|
    * blow-up; this one is O(|corpus| + |anchors|·k):
    *
    *  1. every corpus doc hashes into one of `buckets` buckets; each
    *     bucket elects ONE representative (lexicographic min on a
    *     second independent draw) — a buckets-sized dim frame,
    *     broadcast below;
    *  2. each anchor probes k buckets via indexed draws
    *     hash(anchor, i); the probed bucket's representative is the
    *     i-th negative.
    *
    * Uniformity comes from the bucket hash (bucket occupancies are
    * binomial); determinism and engine-portability from the md5 draw
    * convention shared with every sampler above — DuckDB replays the
    * exact negative ids byte-for-byte. Self-collisions (an anchor
    * probing the bucket it represents) are filtered, so an anchor can
    * yield k-1 rows occasionally; repeated probes of one bucket keep
    * both rows (sampling WITH replacement — the standard contrastive
    * setup; `distinct` downstream if without-replacement is wanted).
    * Output: (anchor_id, probe, negative_id), one row per surviving
    * probe.
    */
  def negativeSamples(
      anchors: DataFrame, anchorKey: String,
      corpus: DataFrame, corpusKey: String,
      k: Int, buckets: Int, salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the representative table is buckets-sized AND broadcast — keep it
    // a dimension (a few MB), not a fact; more buckets than ~16M means
    // the caller wants a join-based sampler, not a broadcast one
    require(buckets >= 2 && buckets <= (1 << 24),
      s"buckets must be in [2, ${1 << 24}], got $buckets")
    val reps = corpus.select(col(corpusKey).as("negative_id"),
        (drawInt(col(corpusKey), s"$salt#b") % buckets).as("__bkt"),
        unitDraw(col(corpusKey), s"$salt#r").as("__d"))
      .groupBy("__bkt")
      .agg(min(struct(col("__d"), col("negative_id"))).as("__m"))
      .select(col("__bkt"), col("__m.negative_id").as("negative_id"))
    val probes = anchors
      .select(col(anchorKey).as("anchor_id"),
        explode(sequence(lit(0), lit(k - 1))).as("probe"))
      .withColumn("__bkt",
        drawInt(concat(col("anchor_id").cast("string"), lit("#"),
          col("probe").cast("string")), s"$salt#a") % buckets)
    probes.join(broadcast(reps), Seq("__bkt"))
      .filter(col("negative_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("probe"), col("negative_id"))
  }

  /** Per-domain EPOCH plan for a token budget — the training-run
    * planning table behind every mixing decision ([[temperatureMix]]
    * decides per-document KEEP rates; this decides per-domain REPEAT
    * factors): balancing |S| domains inside a budget of B tokens
    * gives each domain B/|S| tokens, i.e. epochs(s) = B / (|S|·T_s)
    * passes over its T_s tokens. Domains with epochs > 1 must be
    * repeated (upsampled) to hold their share — exactly the
    * small-high-quality-corpus case (Wikipedia in every LLM mix) —
    * and repeating past `cap` epochs is where memorization outpaces
    * value (the 4-epoch rule of thumb, Muennighoff et al. 2023), so
    * the plan also emits the capped effective allocation.
    *
    * EXACT arithmetic: epochs is the integer rational epoch_num /
    * epoch_den = B / (|S|·T_s); the cap compares and clamps on the
    * SAME denominator (min(num, cap·den)/den), so verdicts and
    * effective token counts are bit-portable; the only doubles are
    * final divisions on identical operands.
    *
    * Scale shape: one map-side-combined aggregation of the corpus;
    * everything after runs on the |S|-row table with |S| riding a
    * ONE-row broadcast carrier.
    *
    * @return per domain: group, tokens, epoch_num, epoch_den, epochs
    *         (round 9), capped_epochs, planned_tokens (round 6)
    */
  def epochPlan(
      df: DataFrame, group: String,
      tokens: org.apache.spark.sql.Column,
      budget: Long, cap: Long = 4L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val t = df.groupBy(col(group))
      .agg(sum(tokens.cast("long")).as("tokens"))
      .localCheckpoint() // |S|-sized; two consumers (count + the plan)
      // — unchecked, each re-aggregates the corpus (PlanShapeSpec pin)
    val s = t.agg(count(lit(1)).as("__ns"))
    t.crossJoin(broadcast(s))
      .select(col(group), col("tokens"),
        lit(budget).as("epoch_num"),
        (col("__ns") * col("tokens")).as("epoch_den"))
      .withColumn("epochs",
        round(col("epoch_num").cast("double") / col("epoch_den"), 9))
      .withColumn("capped_epochs",
        round(least(col("epoch_num"), lit(cap) * col("epoch_den"))
          .cast("double") / col("epoch_den"), 9))
      .withColumn("planned_tokens",
        round(col("tokens").cast("double") *
          least(col("epoch_num"), lit(cap) * col("epoch_den"))
            .cast("double") / col("epoch_den"), 6))
  }
}
