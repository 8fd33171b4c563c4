package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Multimodal
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Multimodal surface: documents' text re-encoded as opaque binary
  * payloads drive the real plumbing (typed rows, batched per-partition
  * decode, native magic-byte sniff + frame fan-out).
  *
  * q_media_features runs the decode seam over the planted corpus and
  * compares against the committed GenGoldens snapshot (the scala
  * MurmurHash3 fingerprint is not recomputable in DuckDB);
  * q_media_frames keeps SF scale with a REAL DuckDB oracle — the sniff
  * and frame fan-out are native expressions both engines can compute.
  */
object MediaQueries {
  import QueryDef.sql
  import SourceQueries.FixtureDir

  /** Deterministic REAL-pixel corpus for the javax.imageio faces: 48
    * distinct synthetic PNGs (integer-only patterns — bit-identical on
    * every JVM) plus three planted near-duplicates (`jitter = 1`
    * perturbs every 16th pixel's luminance by +1 — perceptually
    * invisible, so the pHash must land within banding distance).
    * Driver-side generation is 48 tiny PNGs (~1 KB each) — fixture
    * cost, not data-path cost; at scale the payloads arrive from a
    * binary source ([[graft.sources.Sources]] raw-file reader).
    */
  def realMediaCorpus(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    import graft.ops.ImageIo
    def meta = Multimodal.MediaMeta("image", "png", 64, 48, 0, 0L)
    val base = (0L until 48L).map(i =>
      Multimodal.MediaRow(i, ImageIo.syntheticPng(i), meta))
    val dups = Seq(5L, 17L, 29L).map(i =>
      Multimodal.MediaRow(1000L + i, ImageIo.syntheticPng(i, jitter = 1), meta))
    s.createDataset(base ++ dups).repartition(4)
  }

  /** Deterministic REAL-audio corpus for the javax.sound faces: 32
    * distinct PCM16 WAV clips (integer-only triangle carrier × AM
    * envelope) plus three planted near-duplicates (`jitter = 2` LSBs
    * on every 16th sample — inaudible). */
  def realAudioCorpus(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    import graft.ops.AudioIo
    def meta = Multimodal.MediaMeta("audio", "wav", 0, 0, 8000, 1000L)
    val base = (0L until 32L).map(i =>
      Multimodal.MediaRow(i, AudioIo.syntheticWav(i), meta))
    val dups = Seq(3L, 11L, 23L).map(i =>
      Multimodal.MediaRow(1000L + i, AudioIo.syntheticWav(i, jitter = 2), meta))
    s.createDataset(base ++ dups).repartition(4)
  }

  /** Deterministic REAL-video corpus for the MJPEG/AVI faces: 24
    * distinct clips (real javax.imageio JPEG frames, integer-only
    * brightness-ramp schedules, wrapped in minimal RIFF/AVI) plus
    * three planted near-duplicates (`jitter = 2` — a uniform +2 luma
    * shift the DC-dropping pHash must be invariant to). */
  def realVideoCorpus(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    import graft.ops.VideoIo
    def meta = Multimodal.MediaMeta("video", "avi", 32, 24, 0, 1000L)
    val base = (0L until 24L).map(i =>
      Multimodal.MediaRow(i, VideoIo.syntheticAvi(i), meta))
    val dups = Seq(2L, 9L, 21L).map(i =>
      Multimodal.MediaRow(1000L + i, VideoIo.syntheticAvi(i, jitter = 2), meta))
    // a spliced compilation clip sharing byte-identical frames with
    // clips 2 and 9 — the shared-frame dedup face's plant
    val splice = Multimodal.MediaRow(
      2000L, VideoIo.syntheticAviSplice(Seq(2L, 9L), take = 12), meta)
    s.createDataset(base ++ dups :+ splice).repartition(4)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- REAL video end to end: RIFF/AVI chunk walk → real JPEG
    // frame decode → temporal luminance signature → DCT pHash =
    // Hamming-bandable video fingerprints (TV-dedup-style) ----
    sql(
      "q_video_phash_real",
      s"""SELECT media_id::BIGINT AS media_id, phash::BIGINT AS phash
         |FROM read_csv('$FixtureDir/golden_video_phash_real.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, _) =>
        Multimodal.perceptualHashes(
          Multimodal.extractFeatures(
            realVideoCorpus(s), graft.ops.VideoIo.MjpegDecoder, dim = 65))
          .toDF()
    },

    // ---- cross-video shared-frame detection: frame fan-out to rows
    // (zero shuffle), exact frame fingerprints, one equi-join on the
    // fingerprint — the re-posted/compilation-content dedup a video
    // corpus runs at frame granularity. The planted splice clip must
    // surface against exactly its two source clips. ----
    sql(
      "q_video_shared_frames",
      s"""SELECT va::BIGINT AS va, vb::BIGINT AS vb,
         |  n_shared::BIGINT AS n_shared
         |FROM read_csv('$FixtureDir/golden_video_shared.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, _) =>
        val frames = graft.ops.VideoIo.explodeFrames(realVideoCorpus(s))
          .select(col("media_id"), md5(col("frame")).as("fp"))
          .localCheckpoint() // both join sides read the decoded walk once
        frames.select(col("media_id").as("va"), col("fp"))
          .join(frames.select(col("media_id").as("vb"), col("fp")), Seq("fp"))
          .filter(col("va") < col("vb"))
          .groupBy(col("va"), col("vb"))
          .agg(count(lit(1)).as("n_shared"))
    },

    // ---- REAL audio end to end: javax.sound PCM decode → envelope
    // features → DCT pHash = Hamming-bandable audio fingerprints. Same
    // snapshot/spec split as the image faces: the golden locks the
    // full real pipeline, MultimodalSpec asserts the semantics.
    sql(
      "q_audio_phash_real",
      s"""SELECT media_id::BIGINT AS media_id, phash::BIGINT AS phash
         |FROM read_csv('$FixtureDir/golden_audio_phash_real.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, _) =>
        Multimodal.perceptualHashes(
          Multimodal.extractFeatures(
            realAudioCorpus(s), graft.ops.AudioIo.WavDecoder, dim = 65))
          .toDF()
    },

    // ---- REAL pixels end to end: javax.imageio decode → box-average
    // luma grid → DCT pHash. The committed golden locks the full real
    // pipeline; MultimodalSpec independently asserts the semantic
    // properties (planted dups within Hamming 3 of their base, distinct
    // bases far apart) so a kernel regression can't be silently
    // re-snapshotted.
    sql(
      "q_media_phash_real",
      s"""SELECT media_id::BIGINT AS media_id, phash::BIGINT AS phash
         |FROM read_csv('$FixtureDir/golden_media_phash_real.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, _) =>
        Multimodal.perceptualHashes(
          Multimodal.extractFeatures(
            realMediaCorpus(s), graft.ops.ImageIo.ImageIoDecoder, dim = 65))
          .toDF()
    },

    // The crawl-scale image-dedup composition over real pixels: decode →
    // pHash (map-side) → pigeonhole-banded self-join (never all-pairs).
    sql(
      "q_media_neardup_real",
      s"""SELECT a::BIGINT AS a, b::BIGINT AS b, hamming::INT AS hamming
         |FROM read_csv('$FixtureDir/golden_media_pairs_real.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, _) =>
        Multimodal.phashNearDups(
          Multimodal.extractFeatures(
            realMediaCorpus(s), graft.ops.ImageIo.ImageIoDecoder, dim = 65),
          maxHamming = 3, bands = 4)
    },

    sql(
      "q_media_features",
      s"""SELECT media_id::BIGINT AS media_id, n_bytes::BIGINT AS n_bytes,
         |  fingerprint::BIGINT AS fingerprint
         |FROM read_csv('$FixtureDir/golden_media_features.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, _) =>
        import s.implicits._
        val media = Sources.tsv(s, s"$FixtureDir/docs_planted.tsv").select(
          col("doc_id").cast("long").as("media_id"),
          col("text").cast("binary").as("payload"),
          struct(lit("image").as("kind"), lit("bin").as("format"),
            lit(4).as("width"), lit(4).as("height"),
            lit(0).as("sampleRate"), lit(0L).as("durationMs")).as("meta"))
          .as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media, dim = 8).toDF()
          .select(col("media_id"), col("n_bytes"), col("fingerprint"))
    },

    // Perceptual-hash media dedup fingerprints: the committed golden
    // locks the whole DCT → median-threshold → bit-pack kernel (the
    // MATH is real pHash; only the pixel decode is the stub). The
    // near-dup pairing over these hashes is differential-tested vs
    // brute force in MultimodalSpec.
    sql(
      "q_media_phash",
      s"""SELECT media_id::BIGINT AS media_id, phash::BIGINT AS phash
         |FROM read_csv('$FixtureDir/golden_media_phash.tsv',
         |  delim='\\t', header=true, all_varchar=true)""".stripMargin) {
      (s, _) =>
        import s.implicits._
        val media = Sources.tsv(s, s"$FixtureDir/docs_planted.tsv").select(
          col("doc_id").cast("long").as("media_id"),
          col("text").cast("binary").as("payload"),
          struct(lit("image").as("kind"), lit("bin").as("format"),
            lit(4).as("width"), lit(4).as("height"),
            lit(0).as("sampleRate"), lit(0L).as("durationMs")).as("meta"))
          .as[Multimodal.MediaRow]
        Multimodal.perceptualHashes(
          Multimodal.extractFeatures(media, dim = 65)).toDF()
    },

    // Resize seam: the stub contract (exactly w*h bytes, meta dims
    // rewritten) is computable, so the oracle is pure arithmetic over
    // the same corpus — the plumbing (typed rows, batching, meta
    // rewrite) is what's under test.
    sql(
      "q_media_resize",
      s"""SELECT doc_id::BIGINT AS media_id, 16::INT AS width,
         |  8::INT AS height, 128::BIGINT AS n_bytes
         |FROM read_csv('$FixtureDir/docs_planted.tsv', delim='\\t',
         |  header=true, all_varchar=true)""".stripMargin) { (s, _) =>
      import s.implicits._
      val media = Sources.tsv(s, s"$FixtureDir/docs_planted.tsv").select(
        col("doc_id").cast("long").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(lit("image").as("kind"), lit("bin").as("format"),
          lit(640).as("width"), lit(480).as("height"),
          lit(0).as("sampleRate"), lit(0L).as("durationMs")).as("meta"))
        .as[Multimodal.MediaRow]
      Multimodal.resizeAll(media, w = 16, h = 8).toDF()
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          length(col("payload")).cast("long").as("n_bytes"))
    },

    // Text payloads can only hit the RIFF magic (PNG/JPEG magics are
    // not valid UTF-8 prefixes), so the sniff reduces to a prefix
    // check the oracle mirrors; the frame fan-out is sequence/range
    // over the same millisecond grid.
    sql(
      "q_media_frames",
      """SELECT doc_id,
        |  CASE WHEN starts_with(text, 'RIFF') THEN 'riff' ELSE 'bin' END
        |    AS format,
        |  unnest(range(0, n_chars * 10, 1000)) AS frame_ms
        |FROM documents
        |WHERE n_chars > 0""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        Multimodal.sniffFormat(col("text").cast("binary")).as("format"),
        explode(Multimodal.frameOffsets(
          (col("n_chars") * 10).cast("long"), 1000)).as("frame_ms"))
    },

    // ---- scene-cut detection: 6 programs of (2 + id % 3) flat-luma
    //      scenes x 5 frames; cuts must fire at EXACTLY the scene
    //      boundaries (multiples of 5), a pure function of the layout
    //      — relational oracle over real JPEG-decoded frames ----
    sql(
      "q_video_scenes",
      """WITH p AS (SELECT unnest(range(6)) AS media_id),
        |c AS (SELECT media_id, unnest(range(1, 2 + media_id % 3)) AS k
        |      FROM p)
        |SELECT media_id::BIGINT AS media_id, (5 * k)::BIGINT AS cut_idx
        |FROM c ORDER BY 1, 2""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.ops.VideoIo
      def meta = Multimodal.MediaMeta("video", "avi", 32, 24, 0, 0L)
      val programs = (0L until 6L).map { p =>
        val scenes = (2 + p % 3).toInt
        val lumas = (0 until scenes).map(sc => 40 + 50 * sc + 7 * p.toInt)
        Multimodal.MediaRow(p,
          VideoIo.syntheticAviScenes(lumas, framesPerScene = 5), meta)
      }
      VideoIo.sceneCuts(s.createDataset(programs).repartition(3),
          threshold = 0.05)
        .orderBy("media_id", "cut_idx")
    },

    // ---- silence trim: pad each real WAV clip with (100 + id % 50)
    //      silent samples per side, pin both endpoints loud, trim at
    //      threshold 0 — the byte delta is exactly the planted
    //      padding (4 bytes per padded sample), relationally
    //      computable, and the kept samples must be byte-identical ----
    sql(
      "q_audio_trim",
      """WITH ids AS (SELECT unnest(range(32)) AS media_id
        |             UNION ALL SELECT unnest([1003, 1011, 1023]))
        |SELECT media_id::BIGINT AS media_id,
        |  (4 * (100 + media_id % 50))::BIGINT AS delta,
        |  true AS audio_equal
        |FROM ids ORDER BY media_id""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.ops.AudioIo
      realAudioCorpus(s).map { r =>
        // pin first/last sample loud so trim removes EXACTLY the pads
        val clip = r.payload.clone()
        val n = (clip.length - 44) / 2
        def loud(i: Int): Unit = {
          clip(44 + i * 2) = 0xe8.toByte; clip(45 + i * 2) = 0x03 // 1000
        }
        loud(0); loud(n - 1)
        val pad = (100 + r.media_id % 50).toInt
        val padded = AudioIo.wavWithPadding(clip, pad)
        val trimmed = AudioIo.wavTrimSilence(padded, threshold = 0)
        (r.media_id, (padded.length - trimmed.length).toLong,
          java.util.Arrays.equals(trimmed, clip))
      }.toDF("media_id", "delta", "audio_equal").orderBy("media_id")
    },

    // ---- metadata scrub (privacy): plant a tEXt "gps" chunk in each
    //      real PNG, strip it at the byte level, prove the decoded
    //      pixels are untouched. The byte DELTA is exactly the
    //      planted chunk's size (12 header/crc + 7 'gps id=' + the
    //      id's digits), so DuckDB computes the expected shrinkage
    //      RELATIONALLY — no golden needed for byte surgery ----
    sql(
      "q_media_strip",
      """WITH ids AS (SELECT unnest(range(48)) AS media_id
        |             UNION ALL SELECT unnest([1005, 1017, 1029]))
        |SELECT media_id::BIGINT AS media_id,
        |  (19 + length(CAST(media_id AS VARCHAR)))::BIGINT AS delta,
        |  true AS pixels_equal
        |FROM ids ORDER BY media_id""".stripMargin) { (s, _) =>
      import s.implicits._
      import graft.ops.ImageIo
      realMediaCorpus(s).map { r =>
        val tainted =
          ImageIo.pngWithText(r.payload, "gps", s"id=${r.media_id}")
        val stripped = ImageIo.stripMetadata(tainted)
        val f1 = ImageIo.ImageIoDecoder.decode(tainted, r.meta, 64)
        val f2 = ImageIo.ImageIoDecoder.decode(stripped, r.meta, 64)
        (r.media_id, (tainted.length - stripped.length).toLong,
          java.util.Arrays.equals(f1, f2))
      }.toDF("media_id", "delta", "pixels_equal").orderBy("media_id")
    })
}
