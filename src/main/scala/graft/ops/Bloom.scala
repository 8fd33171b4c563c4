package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter corpus membership: a compact, shuffle-free alternative
  * to the anti-join for "is this fingerprint already in the corpus?"
  * (the streaming-ingest dedup gate, [[graft.streaming.EventStream
  * .filterKnown]]'s scale sibling).
  *
  * Build ONCE over the corpus — one scan, one dimension-sized
  * aggregation (m/64 words) — then test ANY number of micro-batches
  * map-side against the broadcast bitset: zero per-batch shuffle of
  * either side, versus the anti-join's per-batch join against the
  * corpus fingerprints. The trade is one-sided error: a known
  * fingerprint NEVER passes (no false negatives — the dedup guarantee
  * holds), while a truly novel one is dropped with probability
  * ≈ (1 - e^(-k·n/m))^k (sized by `mBits`).
  *
  * Scale envelope: the bitset must fit a broadcast — 1 G bits = 128 MB
  * handles ~100 M fingerprints at 1% FP. Beyond that, shard the bloom
  * by fingerprint prefix or fall back to the partitioned anti-join
  * (both exist; this operator covers the common
  * dimension-sized-state case).
  *
  * All probe positions are xxhash64 chains — deterministic, no RNG,
  * identical across runs and cluster layouts. Pure `functions._`
  * composition (explode + bit_or + element_at + shift) — no UDF, the
  * membership test stays in whole-stage codegen.
  */
object Bloom {

  /** k probe positions in [0, mBits) for one value: xxhash64 seeded by
    * the probe index. */
  private def positions(v: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(lit(i), v), lit(mBits.toLong)))

  /** `1L << (pos & 63)` with a column shift amount (the typed API only
    * accepts literal shifts). */
  private def bitMask(pos: Column): Column =
    call_function("shiftleft", lit(1L), pos.bitwiseAND(lit(63L)).cast("int"))

  /** A built bitset WITH the parameters it was built under — probing
    * with different mBits/k than the build silently voids the
    * no-false-negative guarantee, so the pair travels together and
    * the test side cannot drift. */
  final case class BloomBits(words: Array[Long], mBits: Int, k: Int)

  /** Build the bitset over the corpus: explode each fingerprint's k
    * positions, OR the bit masks per 64-bit word (map-side partial
    * bit_or, one tiny shuffle on word index), collect the ≤ m/64
    * non-zero words. Returns the dense word array, driver-held,
    * carrying its build parameters.
    */
  def build(
      corpus: DataFrame, fp: Column, mBits: Int, k: Int): BloomBits = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(k > 0, "k must be positive")
    val words = corpus
      .select(explode(array(positions(fp, mBits, k): _*)).as("__pos"))
      .select(shiftright(col("__pos"), 6).as("__w"), bitMask(col("__pos")).as("__m"))
      .groupBy("__w").agg(expr("bit_or(__m)").as("__bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    BloomBits(arr, mBits, k)
  }

  /** Append a boolean might-contain column. The bitset rides a one-row
    * broadcast frame (data, not a plan literal — a 16 M-bit filter
    * would otherwise be a quarter-million-node literal expression);
    * the test is k element_at + AND chains, all codegen'd, probing
    * with exactly the parameters the bitset was built under. */
  def withMightContain(
      df: DataFrame, bloom: BloomBits, fp: Column, as: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bloomDf = Seq(Tuple1(bloom.words.toSeq)).toDF("__bloom")
    val test = positions(fp, bloom.mBits, bloom.k).map { p =>
      element_at(col("__bloom"), shiftright(p, 6).cast("int") + lit(1))
        .bitwiseAND(bitMask(p)) =!= lit(0L)
    }.reduce(_ && _)
    df.crossJoin(broadcast(bloomDf))
      .withColumn(as, test)
      .drop("__bloom")
  }

  /** Bloom-pruned equi-join (explicit semi-join pushdown): build the
    * bitset over the build side's join keys, drop probe rows map-side
    * BEFORE the shuffle join. No false negatives → every matching probe
    * row survives the gate, so the inner-join result is IDENTICAL to
    * the plain join (exactly oracle-checkable); false positives only
    * cost shuffled-then-dropped rows at the filter's FP rate.
    *
    * This is the manual, reusable form of Spark's runtime bloom
    * pushdown (`spark.sql.optimizer.runtime.bloomFilter.*`, which
    * injects the same gate only when its own size heuristics fire):
    * here the caller KNOWS the build side is selective — e.g. "the 2%
    * of orders flagged urgent" probed by a 100 TB lineitem — and the
    * built [[BloomBits]] can be kept and reused across many probes of
    * the same build side.
    */
  def prunedJoin(
      probe: DataFrame,
      buildSide: DataFrame,
      keys: Seq[String],
      mBits: Int = 1 << 20,
      k: Int = 5): DataFrame = {
    require(keys.nonEmpty, "prunedJoin needs at least one join key")
    // one fingerprint over the compound key; xxhash64 of the key
    // columns matches positions()'s hashing domain on both sides
    def fp(df: DataFrame): Column = xxhash64(keys.map(df(_)): _*)
    val bloom =
      build(buildSide.select(keys.map(col): _*), fp(buildSide), mBits, k)
    withMightContain(probe, bloom, fp(probe), "__hit")
      .filter(col("__hit"))
      .drop("__hit")
      .join(buildSide, keys, "inner")
  }

  /** Keep only rows whose fingerprint is definitely NOT in the corpus
    * the bloom was built from: known rows never pass; a novel row is
    * sacrificed with the filter's FP probability. The right gate when
    * re-ingesting a feed that mostly overlaps the corpus. */
  def filterNovel(
      df: DataFrame, bloom: BloomBits, fp: Column): DataFrame =
    withMightContain(df, bloom, fp, "__known")
      .filter(!col("__known"))
      .drop("__known")
}
