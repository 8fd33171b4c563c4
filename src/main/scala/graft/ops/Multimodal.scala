package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction runs per-partition in
  * explicit batches (the Scala analog of Arrow-batched `mapInPandas`).
  *
  * Decoder bindings — all REAL JDK codecs, no external deps:
  * [[graft.ops.ImageIo.ImageIoDecoder]] (javax.imageio PNG/JPEG/BMP/GIF
  * — `q_media_phash_real`/`q_media_neardup_real`),
  * [[graft.ops.AudioIo.WavDecoder]] (javax.sound PCM/WAV —
  * `q_audio_phash_real`), and [[graft.ops.VideoIo.MjpegDecoder]]
  * (RIFF/AVI chunk walk + per-frame javax.imageio JPEG —
  * `q_video_phash_real`). The default [[Multimodal.FakeDecoder]]
  * remains as the clearly-marked deterministic stand-in for codecs the
  * JDK lacks (H.264/VP9-class video, compressed audio). The Spark-side
  * plumbing — schema, encoder types, batch shape, partition balancing —
  * is shared by every binding.
  *
  * Scale notes: payloads dominate partition bytes, so balance
  * partitions by BYTES not row count ([[rebalanceByBytes]]); feature
  * extraction is per-row map-side work with zero shuffle; metadata
  * sniffing (format magic, sizes) is native-expression and never
  * touches the decoder.
  */
object Multimodal {

  /** Typed media metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      kind: String,       // "image" | "audio" | "video"
      format: String,     // container/codec tag, e.g. "png", "wav"
      width: Int, height: Int,      // images/video; 0 otherwise
      sampleRate: Int,              // audio; 0 otherwise
      durationMs: Long)             // audio/video; 0 otherwise

  final case class MediaRow(
      media_id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, fingerprint: Long,
      features: Array[Float])

  /** Per-batch decode hook — the seam where a real codec binds. */
  trait Decoder extends Serializable {
    /** Decode one payload into a fixed-dim feature vector. */
    def decode(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float]
  }

  /** STUB decoder: deterministic fake standing in for codecs this
    * environment lacks (audio/video — images have the real
    * [[graft.ops.ImageIo.ImageIoDecoder]]). Features are derived from
    * a rolling hash of the payload bytes — stable across runs, so
    * tests and downstream plumbing behave exactly as with a real
    * decoder, just without meaningful pixel/sample values. */
  object FakeDecoder extends Decoder {
    override def decode(
        payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      var h = 1125899906842597L // FNV-ish seed
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        h = h * 31 + (payload(i) & 0xff)
        out(i % dim) += ((h >>> 32).toInt % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Batched per-partition feature extraction: the iterator is grouped
    * into `batchSize` chunks (mirroring Arrow record batches) so a
    * real decoder can amortize model/codec setup per batch, and rows
    * never accumulate beyond one batch in memory. Zero shuffle. */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: Decoder = FakeDecoder,
      dim: Int = 8,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(
            r.media_id,
            r.payload.length.toLong,
            scala.util.hashing.MurmurHash3.bytesHash(r.payload, 42).toLong,
            decoder.decode(r.payload, r.meta, dim))
        }
      }
    }
  }

  final case class MediaHash(media_id: Long, phash: Long)

  /** Perceptual hash over the decoded feature signal — image/audio
    * near-dup dedup's fingerprint (pHash family: Zauner 2010, the DCT
    * variant behind every production image-dedup pipeline). The DCT,
    * median threshold, and bit packing are REAL library-grade math;
    * only the pixel/sample decode behind [[extractFeatures]] is the
    * environment's stub — swap the [[Decoder]] and this hash is the
    * production operator unchanged.
    *
    * Per vector: 1-D DCT-II of the feature signal, DROP the DC
    * coefficient (overall brightness/energy must not dominate), keep
    * the next 64 low-frequency coefficients (cyclic when dim < 65 —
    * use dim ≥ 65 for full 64-bit acuity), threshold each at the
    * upper median → 64-bit fingerprint whose Hamming distance tracks
    * perceptual similarity. Entirely per-row (typed kernel, zero
    * shuffle); exact doubles, no RNG — bit-reproducible anywhere.
    */
  def perceptualHashes(features: Dataset[MediaFeatures]): Dataset[MediaHash] = {
    import features.sparkSession.implicits._
    features.map(f => MediaHash(f.media_id, phashOf(f.features)))
  }

  private[ops] def phashOf(x: Array[Float]): Long = {
    val n = x.length
    require(n >= 2, s"phash needs >= 2 feature values, got $n")
    val coeffs = new Array[Double](64)
    var k = 0
    while (k < 64) {
      val kk = 1 + k % (n - 1) // AC coefficients only; cyclic below dim 65
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x(i) * math.cos(math.Pi / n * (i + 0.5) * kk)
        i += 1
      }
      coeffs(k) = s
      k += 1
    }
    val med = coeffs.sorted.apply(32) // upper median of the 64
    var bits = 0L
    k = 0
    while (k < 64) {
      if (coeffs(k) > med) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** Media near-duplicate pairs: perceptual hashes → pigeonhole
    * Hamming banding ([[Dedup.hammingNearDups]] — equi-join on band
    * chunks, never all-pairs, provably complete within `maxHamming <
    * bands`). The composition a crawl-scale image dedup runs: decode →
    * phash (both map-side) → one banded self-join over 8-byte keys.
    */
  def phashNearDups(
      features: Dataset[MediaFeatures],
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    Dedup.hammingNearDups(
      perceptualHashes(features).toDF().localCheckpoint(),
      "media_id", "phash", maxHamming, bands)

  /** Per-batch resize hook — [[graft.ops.ImageIo.ImageIoResizer]] is
    * the real image binding; the fake below covers non-image media. */
  trait Resizer extends Serializable {
    def resize(payload: Array[Byte], meta: MediaMeta,
        w: Int, h: Int): Array[Byte]
  }

  /** STUB resizer: deterministic fake with a REAL contract the
    * plumbing (and the oracle) can check — emits exactly w×h bytes,
    * each sampled from the source payload at the proportional offset
    * (nearest-neighbor downsampling over the raw bytes). */
  object FakeResizer extends Resizer {
    override def resize(payload: Array[Byte], meta: MediaMeta,
        w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      if (payload.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = payload((i.toLong * payload.length / out.length).toInt)
          i += 1
        }
      }
      out
    }
  }

  /** Batched per-partition resize: same batch shape as
    * [[extractFeatures]]; meta dims are rewritten to the target size
    * so downstream stages see consistent typed metadata. */
  def resizeAll(
      media: Dataset[MediaRow], w: Int, h: Int,
      resizer: Resizer = FakeResizer,
      batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaRow(r.media_id, resizer.resize(r.payload, r.meta, w, h),
            r.meta.copy(width = w, height = h))
        }
      }
    }
  }

  /** Native format sniff from magic bytes — no decoder, stays in
    * codegen: PNG \x89PNG, JPEG \xFF\xD8\xFF, RIFF/WAV, else "bin". */
  def sniffFormat(payload: Column): Column = {
    val magic = hex(substring(payload, 1, 4))
    when(magic.startsWith("89504E47"), "png")
      .when(magic.startsWith("FFD8FF"), "jpeg")
      .when(magic.startsWith("52494646"), "riff")
      .otherwise("bin")
  }

  /** Native frame-sample plumbing for video rows: the sampled frame
    * timeline as array<bigint> of millisecond offsets — explode it to
    * fan one row per frame, then decode per frame. The fan-out is
    * native `sequence`, so sampling density changes never touch the
    * decoder seam. */
  def frameOffsets(durationMs: Column, everyMs: Int): Column =
    when(durationMs <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), durationMs - 1, lit(everyMs.toLong)))

  /** Repartition so each partition holds ~`targetBytes` of payload —
    * row-count balance is wrong for media (one 4K video ≈ 10⁵ thumbs).
    * One lightweight agg job sizes the layout, then a single shuffle
    * arranges it. */
  def rebalanceByBytes(
      df: DataFrame,
      payloadCol: String,
      targetBytes: Long): DataFrame = {
    // sum() is null on an empty frame (or all-null payloads) — treat as 0
    val row = df.agg(sum(length(col(payloadCol)))).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    df.repartition(parts)
  }
}
