package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: documents are
  * concatenated in a deterministic order and the token stream is cut
  * into fixed-`budget` chunks (the standard concat-and-chunk packing —
  * a document may straddle a chunk boundary). No reference counterpart
  * (SURVEY.md §8 extension surface).
  *
  * The whole assignment is closed-form over a per-shard running token
  * sum: `start = exclusive-cumsum(tokens)`, so a doc occupies chunks
  * `start div budget .. (start + tokens - 1) div budget`. Integer
  * arithmetic end to end — byte-reproducible in any engine with window
  * sums, which is what makes the oracle exact.
  *
  * Scale shape: ONE shuffle on the shard key; each shard's window sum
  * runs independently, so parallelism = shard count (pick shards like
  * input file / source — thousands at 100 TB). No global sort: chunk
  * ids are shard-local by construction, globally unique as
  * (shard, chunk).
  */
object Packing {

  /** Chunk-span assignment: input + (start_tok, first_chunk,
    * last_chunk), ordered-by `orderCol` within each `shardCol`.
    * `tokens` must be a non-negative bigint column expression. */
  def packChunks(
      df: DataFrame, shardCol: Column, orderCol: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__tok", tokens)
      .withColumn("start_tok", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("first_chunk",
        expr(s"start_tok div ${budget}L"))
      .withColumn("last_chunk",
        expr(s"(start_tok + __tok - 1) div ${budget}L"))
      .drop("__tok")
  }

  /** Per-shard packing stats: chunk count and padding waste of the
    * final short chunk — the number every packing change is judged by
    * (waste fraction at a given budget). */
  def packStats(
      df: DataFrame, shardCol: Column, tokens: Column,
      budget: Long): DataFrame =
    df.groupBy(shardCol)
      .agg(sum(tokens).as("total_tokens"))
      .withColumn("n_chunks",
        expr(s"(total_tokens + ${budget - 1}L) div ${budget}L"))
      .withColumn("waste_tokens",
        expr(s"n_chunks * ${budget}L - total_tokens"))

  /** Length-bucketed batching plan — the inference/fine-tuning serving
    * shape: each sequence pads to the smallest power-of-two bucket that
    * holds it (clamped to [minBucket, maxBucket]; longer sequences
    * truncate into the top bucket), and a per-bucket batch plan is
    * computed for a `budgetTokens` batch budget (batch size =
    * budget div bucket — the fixed-shape batches compilers/XLA-style
    * runtimes want). Reports per bucket: sequence count, real tokens,
    * padded tokens, wasted tokens (padding), and batch count.
    *
    * Exact-integer end to end: the bucket is `array_min(filter(...))`
    * over a literal bucket table — a map-side HOF, no join, no libm
    * log2 (whose ulp at bucket edges could disagree across engines) —
    * followed by ONE aggregation keyed by bucket (dim-sized output).
    */
  def lengthBuckets(
      df: DataFrame, len: Column,
      minBucket: Long = 64L, maxBucket: Long = 65536L,
      budgetTokens: Long = 16384L): DataFrame = {
    require(minBucket > 0 && (minBucket & (minBucket - 1)) == 0,
      s"minBucket must be a power of two: $minBucket")
    require(maxBucket >= minBucket && (maxBucket & (maxBucket - 1)) == 0,
      s"maxBucket must be a power of two >= minBucket: $maxBucket")
    require(budgetTokens >= maxBucket,
      s"budgetTokens ($budgetTokens) must hold at least one max-bucket " +
        s"sequence ($maxBucket)")
    val table = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(_ <= maxBucket).toSeq
    val buckets = array(table.map(lit): _*)
    df.select(
        coalesce(array_min(filter(buckets, b => b >= len)), lit(maxBucket))
          .as("bucket"),
        least(len, lit(maxBucket)).as("__len"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("__len")).as("real_tokens"))
      .withColumn("padded_tokens", col("bucket") * col("n_seqs"))
      .withColumn("waste_tokens", col("padded_tokens") - col("real_tokens"))
      .withColumn("n_batches", expr(
        s"(n_seqs + ($budgetTokens div bucket) - 1) div " +
          s"($budgetTokens div bucket)"))
  }

  /** Per-document sliding-window chunking with overlap — the RAG /
    * context-window prep op: cut each document's token list into
    * chunks of `chunkSize` starting every `chunkSize - overlap`
    * tokens, so consecutive chunks share `overlap` tokens and no
    * token is more than `overlap` away from a chunk boundary it can
    * see across. Entirely map-side (array HOFs inside one projection
    * + one generator) — chunking a 100 TB corpus shuffles nothing.
    *
    * Chunk k starts at k·(chunkSize−overlap); exactly
    * ceil((n − overlap) / (chunkSize − overlap)) chunks are emitted
    * (min 1) — the smallest count whose last chunk still reaches the
    * document end, so every token is covered and no chunk is redundant
    * (a start whose tokens the previous chunk fully covers is never
    * generated). The last chunk may be shorter; never empty. A
    * document shorter than `chunkSize` yields exactly one chunk.
    * Output: every input column, plus `chunk_id` (0-based, per-doc)
    * and `chunk` (the token slice).
    */
  def slidingChunks(
      df: DataFrame, tokens: Column,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap")
    val stride = chunkSize - overlap
    val n = size(tokens)
    // number of chunks: 1 + floor((n-1)/stride) clipped so the LAST
    // start < n; equivalently ceil((n - overlap) / stride), min 1
    val nChunks = greatest(lit(1),
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"))
    df.select(col("*"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          k => slice(tokens, k * stride + 1, lit(chunkSize))))
          .as(Seq("chunk_id", "chunk")))
      // an empty/null token list must yield NO chunk rows, not one
      // empty chunk ("never empty" contract)
      .where(size(col("chunk")) > 0)
  }

  /** First-fit-decreasing bin packing per shard — the NO-SPLIT packing
    * variant ([[packChunks]] splits documents across chunk
    * boundaries; many pretraining recipes must not, so each document
    * lands whole in exactly one bin of capacity `maxTokens`). FFD is
    * the classic 11/9·OPT+1 heuristic: sort the shard's documents by
    * token count descending (id ascending tie — total order, so the
    * packing is deterministic and layout-independent), drop each into
    * the first bin it fits.
    *
    * Scale shape: one shuffle on the shard key, then a per-shard
    * in-memory pass (`flatMapGroups`). The SHARD is the memory/
    * parallelism contract, exactly as [[packStats]] and
    * `takeTokenBudget`: pick shards at file/source granularity so
    * 1000 executors stay busy and a shard's (id, tokens) pairs — 16
    * bytes each, NOT the documents — fit in a task comfortably.
    * Bin ids are shard-local (bin 0, 1, …), stable across runs.
    * A document larger than `maxTokens` gets a bin of its own
    * (oversize = the caller chunks it first with [[packChunks]]).
    */
  def binPackFFD(
      docs: DataFrame, shardCol: String, id: String, tokens: String,
      maxTokens: Long): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(shardCol).cast("string").as("shard"),
        col(id).cast("long").as("doc_id"),
        col(tokens).cast("long").as("n_tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        val items = rows.map { case (_, i, t) => (i, t) }.toArray
          .sortBy { case (i, t) => (-t, i) }
        val fill = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (i, t) =>
          var b = 0
          while (b < fill.length && fill(b) + t > maxTokens) b += 1
          if (b == fill.length) fill += 0L
          fill(b) += t
          (shard, i, t, b.toLong)
        }
      }
      .toDF("shard", "doc_id", "n_tok", "bin")
  }
}
