package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._
  import Multimodal._

  private def media(id: Long, bytes: Array[Byte], kind: String = "image") =
    MediaRow(id, bytes, MediaMeta(kind, "bin", 4, 4, 0, 0L))

  test("extractFeatures is deterministic with fixed dim and stats") {
    val rows = Seq(
      media(1L, Array[Byte](1, 2, 3, 4, 5)),
      media(2L, Array[Byte](9, 9, 9))).toDS()
    val a = extractFeatures(rows, dim = 4).collect().sortBy(_.media_id)
    val b = extractFeatures(rows, dim = 4).collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a(0).n_bytes == 5L && a(1).n_bytes == 3L)
    assert(a(0).fingerprint != a(1).fingerprint)
    assert(a.forall(_.features.length == 4))
  }

  test("batch shape: decoder sees bounded batches, all rows survive") {
    val n = 150
    val rows = (1 to n).map(i => media(i.toLong, Array[Byte](i.toByte))).toDS()
      .repartition(2)
    val got = extractFeatures(rows, batchSize = 32).collect()
    assert(got.length == n)
    assert(got.map(_.media_id).toSet == (1 to n).map(_.toLong).toSet)
  }

  test("resizeAll rewrites meta dims and emits the stub byte contract") {
    val rows = Seq(
      media(1L, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)),
      media(2L, Array.emptyByteArray)).toDS()
    val got = resizeAll(rows, w = 2, h = 2).collect().sortBy(_.media_id)
    assert(got.forall(r => r.meta.width == 2 && r.meta.height == 2))
    assert(got.forall(_.payload.length == 4))
    // nearest-neighbor over raw bytes: offsets 0, 2, 4, 6
    assert(got(0).payload.toSeq == Seq[Byte](10, 30, 50, 70))
    assert(got(1).payload.toSeq == Seq[Byte](0, 0, 0, 0)) // empty source
    // deterministic
    val again = resizeAll(rows, w = 2, h = 2).collect().sortBy(_.media_id)
    assert(again.map(_.payload.toSeq).toSeq == got.map(_.payload.toSeq).toSeq)
  }

  test("sniffFormat reads magic bytes natively") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val wav = "RIFF1234".getBytes
    val other = Array[Byte](0, 1, 2, 3)
    val got = Seq((1, png), (2, jpg), (3, wav), (4, other))
      .toDF("id", "payload")
      .select($"id", sniffFormat($"payload").as("fmt"))
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "png", 2 -> "jpeg", 3 -> "riff", 4 -> "bin"))
  }

  test("frameOffsets fans out a native sampled timeline") {
    val got = Seq((1L, 2500L), (2L, 0L)).toDF("id", "duration_ms")
      .select($"id", frameOffsets($"duration_ms", 1000).as("offs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(0L, 1000L, 2000L))
    assert(got(2L).isEmpty)
  }

  test("rebalanceByBytes sizes partitions by payload bytes") {
    val rows = (1 to 100).map(i => (i.toLong, Array.fill[Byte](1000)(1)))
      .toDF("id", "payload")
    val out = rebalanceByBytes(rows, "payload", targetBytes = 25000L)
    assert(out.rdd.getNumPartitions == 4) // 100 KB / 25 KB
  }

  test("perceptual hash: deterministic, DC-invariant, locality-aware") {
    val rnd = new scala.util.Random(3)
    val base = Array.tabulate(65)(i => math.sin(i * 0.37).toFloat * 10f)
    // identical signal -> identical hash
    assert(phashOf(base.clone()) == phashOf(base.clone()))
    // adding a constant offset only moves the DC coefficient, which the
    // hash drops -> same fingerprint (brightness invariance)
    val brighter = base.map(_ + 5.0f)
    assert(phashOf(brighter) == phashOf(base))
    // small local perturbation stays closer than an unrelated signal
    val near = base.clone(); near(10) += 0.3f; near(40) -= 0.2f
    val far = Array.tabulate(65)(_ => rnd.nextFloat() * 20f - 10f)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h0 = phashOf(base)
    assert(ham(h0, phashOf(near)) < ham(h0, phashOf(far)),
      s"near=${ham(h0, phashOf(near))} far=${ham(h0, phashOf(far))}")
  }

  test("phashNearDups equals brute-force hamming pairs (pigeonhole " +
      "completeness over real banding)") {
    val rnd = new scala.util.Random(9)
    // 30 base signals; every third gets a slightly perturbed sibling
    val rows = (0 until 30).flatMap { g =>
      val base = Array.tabulate(65)(i =>
        math.sin(i * (0.1 + g * 0.07)).toFloat * 10f)
      val sib = base.clone(); sib(g % 65) += 0.15f
      Seq((g.toLong * 2, base)) ++
        (if (g % 3 == 0) Seq((g.toLong * 2 + 1, sib)) else Nil)
    }
    val feats = rows.map { case (id, v) =>
      MediaFeatures(id, 0L, 0L, v) }.toDS()
    val got = Multimodal.phashNearDups(feats, maxHamming = 3, bands = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val hashes = rows.map { case (id, v) => id -> phashOf(v) }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture planted no near pairs - test is vacuous")
  }

  // ---- real javax.imageio decoder on the same seam ----

  test("ImageIoDecoder decodes real PNG pixels: gradient luminance is " +
      "monotonic and deterministic") {
    val png = ImageIo.syntheticPng(0L) // fx=1, fy=1, pure gradient + blocks
    val f1 = ImageIo.ImageIoDecoder.decode(
      png, MediaMeta("image", "png", 64, 48, 0, 0L), 16)
    val f2 = ImageIo.ImageIoDecoder.decode(
      png, MediaMeta("image", "png", 64, 48, 0, 0L), 16)
    assert(f1.toSeq == f2.toSeq, "decode must be bit-deterministic")
    assert(f1.forall(v => v >= 0f && v <= 1f), "luma must be normalized")
    // the id-0 pattern brightens left→right and top→bottom; on the 4×4
    // grid the last cell must outshine the first
    assert(f1(15) > f1(0), s"gradient lost: ${f1.toSeq}")
    // an undecodable payload must fail loudly, not produce garbage
    intercept[IllegalArgumentException] {
      ImageIo.ImageIoDecoder.decode(
        Array[Byte](1, 2, 3), MediaMeta("image", "png", 0, 0, 0, 0L), 4)
    }
  }

  test("ImageIoDecoder and FakeDecoder share the extractFeatures " +
      "plumbing: same schema, ids, byte counts — only features differ") {
    import graft.queries.MediaQueries
    val corpus = MediaQueries.realMediaCorpus(spark)
    val real = extractFeatures(corpus, ImageIo.ImageIoDecoder, dim = 65)
      .collect().sortBy(_.media_id)
    val fake = extractFeatures(corpus, FakeDecoder, dim = 65)
      .collect().sortBy(_.media_id)
    assert(real.map(_.media_id).toSeq == fake.map(_.media_id).toSeq)
    assert(real.map(_.n_bytes).toSeq == fake.map(_.n_bytes).toSeq)
    assert(real.map(_.fingerprint).toSeq == fake.map(_.fingerprint).toSeq)
    assert(real.forall(_.features.length == 65))
  }

  test("real-pixel pHash semantics: planted jittered dups land within " +
      "banding distance; distinct bases stay apart") {
    import graft.queries.MediaQueries
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hashes = Multimodal.perceptualHashes(
        extractFeatures(MediaQueries.realMediaCorpus(spark),
          ImageIo.ImageIoDecoder, dim = 65))
      .collect().map(h => h.media_id -> h.phash).toMap
    // each planted near-duplicate (jitter=1 on every 16th pixel) must
    // hash within the pigeonhole gate of its base
    for (i <- Seq(5L, 17L, 29L)) {
      assert(ham(hashes(i), hashes(1000L + i)) <= 3,
        s"planted dup $i drifted: hamming ${ham(hashes(i), hashes(1000L + i))}")
    }
    // distinct bases are perceptually different: median pairwise hamming
    // across all base pairs must be far above the gate
    val bases = (0L until 48L).map(hashes)
    val dists = for (i <- bases.indices; j <- bases.indices if i < j)
      yield ham(bases(i), bases(j))
    assert(dists.sorted.apply(dists.size / 2) > 10,
      s"bases collapsed: median hamming ${dists.sorted.apply(dists.size / 2)}")
  }

  test("WavDecoder decodes real PCM: envelope tracks the planted AM " +
      "pattern, deterministic, loud on non-audio payloads") {
    val meta = MediaMeta("audio", "wav", 0, 0, 8000, 1000L)
    val wav = AudioIo.syntheticWav(0L) // envelope period 900 samples
    val f1 = AudioIo.WavDecoder.decode(wav, meta, 16)
    val f2 = AudioIo.WavDecoder.decode(wav, meta, 16)
    assert(f1.toSeq == f2.toSeq, "decode must be bit-deterministic")
    assert(f1.forall(v => v >= 0f && v <= 1f), "envelope must normalize")
    // the id-0 AM envelope (period 1800 samples over 8000) rises and
    // falls — the feature boxes must NOT be flat
    assert(f1.max - f1.min > 0.1f, s"AM envelope lost: ${f1.toSeq}")
    // sniffFormat sees the RIFF magic natively
    val fmt = Seq(Tuple1(wav)).toDF("payload")
      .select(sniffFormat($"payload")).as[String].head()
    assert(fmt == "riff")
    // a non-audio payload fails loudly
    intercept[Exception] {
      AudioIo.WavDecoder.decode(Array[Byte](1, 2, 3, 4), meta, 4)
    }
  }

  test("real-audio fingerprints: planted jittered clips land within " +
      "banding distance; distinct clips stay apart") {
    import graft.queries.MediaQueries
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hashes = Multimodal.perceptualHashes(
        extractFeatures(MediaQueries.realAudioCorpus(spark),
          AudioIo.WavDecoder, dim = 65))
      .collect().map(h => h.media_id -> h.phash).toMap
    for (i <- Seq(3L, 11L, 23L))
      assert(ham(hashes(i), hashes(1000L + i)) <= 3,
        s"planted dup $i drifted: ${ham(hashes(i), hashes(1000L + i))}")
    val bases = (0L until 32L).map(hashes)
    val dists = for (i <- bases.indices; j <- bases.indices if i < j)
      yield ham(bases(i), bases(j))
    assert(dists.sorted.apply(dists.size / 2) > 10,
      s"clips collapsed: median hamming ${dists.sorted.apply(dists.size / 2)}")
  }

  test("MjpegDecoder walks RIFF/AVI and decodes real JPEG frames into a " +
      "temporal signature; DC-invariant to uniform brightness shifts") {
    val meta = MediaMeta("video", "avi", 32, 24, 0, 1000L)
    val avi = VideoIo.syntheticAvi(0L, nFrames = 24)
    assert(VideoIo.aviFrames(avi).size == 24, "frame walk must find all frames")
    // every frame chunk is a real JPEG javax.imageio can decode
    val f0 = VideoIo.aviFrames(avi).next()
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(f0)) != null)
    val feats = VideoIo.MjpegDecoder.decode(avi, meta, 16)
    assert(feats.toSeq == VideoIo.MjpegDecoder.decode(avi, meta, 16).toSeq)
    assert(feats.forall(v => v >= 0f && v <= 1f))
    assert(feats.max - feats.min > 0.05f,
      s"brightness ramp lost: ${feats.toSeq}")
    // the uniform +2 luma jitter must leave the DC-dropping pHash at
    // Hamming ~0 (brightness invariance of the fingerprint)
    def ph(b: Array[Byte]) =
      phashOf(VideoIo.MjpegDecoder.decode(b, meta, 65))
    val d = java.lang.Long.bitCount(
      ph(avi) ^ ph(VideoIo.syntheticAvi(0L, jitter = 2)))
    assert(d <= 3, s"uniform brightness shift moved the fingerprint: $d")
    // loud on garbage
    intercept[IllegalArgumentException] {
      VideoIo.MjpegDecoder.decode(Array[Byte](1, 2, 3), meta, 4)
    }
    intercept[IllegalArgumentException] {
      VideoIo.aviFrames("RIFFxxxxWAVE".getBytes).toList
    }
  }

  test("real-video fingerprints: planted near-dups within banding " +
      "distance; distinct clips apart") {
    import graft.queries.MediaQueries
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hashes = Multimodal.perceptualHashes(
        extractFeatures(MediaQueries.realVideoCorpus(spark),
          VideoIo.MjpegDecoder, dim = 65))
      .collect().map(h => h.media_id -> h.phash).toMap
    for (i <- Seq(2L, 9L, 21L))
      assert(ham(hashes(i), hashes(1000L + i)) <= 3,
        s"planted dup $i drifted: ${ham(hashes(i), hashes(1000L + i))}")
    val bases = (0L until 24L).map(hashes)
    val dists = for (i <- bases.indices; j <- bases.indices if i < j)
      yield ham(bases(i), bases(j))
    assert(dists.sorted.apply(dists.size / 2) > 8,
      s"clips collapsed: median hamming ${dists.sorted.apply(dists.size / 2)}")
  }

  test("cross-video shared frames: the spliced clip surfaces against " +
      "exactly its two source clips; jittered dups do NOT byte-match") {
    import graft.queries.MediaQueries
    val frames = VideoIo.explodeFrames(MediaQueries.realVideoCorpus(spark))
      .select(col("media_id"), md5(col("frame")).as("fp"))
      .localCheckpoint()
    val pairs = frames.select(col("media_id").as("va"), col("fp"))
      .join(frames.select(col("media_id").as("vb"), col("fp")), Seq("fp"))
      .filter(col("va") < col("vb"))
      .groupBy(col("va"), col("vb"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.keySet == Set((2L, 2000L), (9L, 2000L)),
      s"unexpected shared-frame pairs: ${pairs.keySet}")
    // each splice half carries 12 source frames; within-clip periodic
    // repeats can only raise the pair-match count
    assert(pairs((2L, 2000L)) >= 12L && pairs((9L, 2000L)) >= 12L)
  }

  test("decoder edge shapes: 1x1 image with dim 65, stereo 16-bit WAV " +
      "channel-averaging, 8-bit PCM") {
    val imeta = MediaMeta("image", "png", 1, 1, 0, 0L)
    // 1×1 image: every box degenerates to the single pixel — all
    // features equal, normalized, no crash
    val one = new java.awt.image.BufferedImage(
      1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    one.setRGB(0, 0, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(one, "png", bos)
    val f = ImageIo.ImageIoDecoder.decode(bos.toByteArray, imeta, 65)
    assert(f.length == 65 && f.forall(v => math.abs(v - f(0)) < 1e-6f))
    assert(f(0) > 0.49f && f(0) < 0.52f) // mid-gray luma

    // stereo PCM16: channels average — a clip with L = -R must decode
    // to the same |amplitude| envelope as its mono |L| counterpart
    val n = 800
    def pcm16(bytes: Array[Byte], off: Int, v: Int): Unit = {
      bytes(off) = v.toByte; bytes(off + 1) = (v >> 8).toByte
    }
    def wavHeader(bytes: Array[Byte], ch: Int, bits: Int, frames: Int): Unit = {
      val frameSz = ch * bits / 8
      def w32(o: Int, v: Int): Unit = (0 to 3).foreach(i =>
        bytes(o + i) = (v >> (8 * i)).toByte)
      def w16(o: Int, v: Int): Unit = (0 to 1).foreach(i =>
        bytes(o + i) = (v >> (8 * i)).toByte)
      "RIFF".getBytes.copyToArray(bytes, 0); w32(4, 36 + frames * frameSz)
      "WAVE".getBytes.copyToArray(bytes, 8); "fmt ".getBytes.copyToArray(bytes, 12)
      w32(16, 16); w16(20, 1); w16(22, ch); w32(24, 8000)
      w32(28, 8000 * frameSz); w16(32, frameSz); w16(34, bits)
      "data".getBytes.copyToArray(bytes, 36); w32(40, frames * frameSz)
    }
    val stereo = new Array[Byte](44 + n * 4)
    wavHeader(stereo, ch = 2, bits = 16, frames = n)
    (0 until n).foreach { t =>
      val v = ((t % 100) - 50) * 300
      pcm16(stereo, 44 + t * 4, v); pcm16(stereo, 46 + t * 4, -v)
    }
    val ameta = MediaMeta("audio", "wav", 0, 0, 8000, 100L)
    val sf = AudioIo.WavDecoder.decode(stereo, ameta, 8)
    assert(sf.forall(v => v >= 0f && v <= 1f) && sf.max > 0f)

    // 8-bit PCM (unsigned samples center at 128): silence decodes to a
    // zero envelope
    val eight = new Array[Byte](44 + n)
    wavHeader(eight, ch = 1, bits = 8, frames = n)
    java.util.Arrays.fill(eight, 44, 44 + n, 128.toByte)
    val ef = AudioIo.WavDecoder.decode(eight, ameta, 8)
    assert(ef.forall(_ == 0f), s"8-bit silence must be zero: ${ef.toSeq}")
  }

  test("ImageIoResizer re-encodes a real downsample whose pixels still " +
      "carry the source gradient") {
    val meta = MediaMeta("image", "png", 64, 48, 0, 0L)
    val small = ImageIo.ImageIoResizer.resize(
      ImageIo.syntheticPng(0L), meta, 8, 6)
    // output is a real decodable PNG at the target size
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(small))
    assert(img != null && img.getWidth == 8 && img.getHeight == 6)
    // grayscale: r == g == b everywhere
    val px = for (y <- 0 until 6; x <- 0 until 8) yield img.getRGB(x, y)
    assert(px.forall(p =>
      ((p >> 16) & 0xff) == ((p >> 8) & 0xff) && ((p >> 8) & 0xff) == (p & 0xff)))
    // id-0 gradient survives the downsample: bottom-right > top-left
    assert((img.getRGB(7, 5) & 0xff) > (img.getRGB(0, 0) & 0xff))
    // resizeAll plumbing works with the real resizer and rewrites meta
    val rows = Seq(MediaRow(1L, ImageIo.syntheticPng(3L), meta)).toDS()
    val out = resizeAll(rows, w = 8, h = 6, ImageIo.ImageIoResizer).collect()
    assert(out.head.meta.width == 8 && out.head.meta.height == 6)
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.head.payload)).getWidth == 8)
  }

  test("stripMetadata: PNG tEXt chunk removed at the byte level, IDAT " +
    "untouched so decoded pixels are bit-identical; JPEG APP1/COM " +
    "dropped, scan preserved; unknown bytes pass through") {
    val meta = Multimodal.MediaMeta("image", "png", 64, 48, 0, 0L)
    val clean = ImageIo.syntheticPng(7L)
    val tainted = ImageIo.pngWithText(clean, "gps", "45.50,-73.57")
    def contains(hay: Array[Byte], needle: String): Boolean =
      new String(hay, "ISO-8859-1").contains(needle)
    assert(contains(tainted, "tEXt") && contains(tainted, "45.50,-73.57"))
    val stripped = ImageIo.stripMetadata(tainted)
    assert(!contains(stripped, "tEXt") && !contains(stripped, "45.50"))
    // pixel fidelity: full-res luma features identical
    val f1 = ImageIo.ImageIoDecoder.decode(clean, meta, 64)
    val f2 = ImageIo.ImageIoDecoder.decode(stripped, meta, 64)
    assert(java.util.Arrays.equals(f1, f2))
    // JPEG: encode, inject an APP1 EXIF segment after SOI, strip it
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(clean))
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    val jpg = jbos.toByteArray
    val exif = "Exif  secret-camera-serial".getBytes("ISO-8859-1")
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((exif.length + 2) >> 8) & 0xff).toByte,
      ((exif.length + 2) & 0xff).toByte) ++ exif
    val jTainted = jpg.take(2) ++ seg ++ jpg.drop(2)
    val jStripped = ImageIo.stripMetadata(jTainted)
    assert(contains(jTainted, "secret-camera-serial"))
    assert(!contains(jStripped, "secret-camera-serial"))
    val d1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    val d2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jStripped))
    assert(d2 != null && d2.getWidth == d1.getWidth)
    val same = (0 until d1.getHeight).forall(y =>
      (0 until d1.getWidth).forall(x => d1.getRGB(x, y) == d2.getRGB(x, y)))
    assert(same, "JPEG scan bytes must decode identically after the strip")
    // unknown format: untouched
    val blob = Array[Byte](1, 2, 3, 4, 5)
    assert(ImageIo.stripMetadata(blob).toSeq == blob.toSeq)
  }

  test("sceneCuts: fires exactly at flat-scene boundaries, silent on " +
    "single-scene clips, deterministic under repartition") {
    val meta = Multimodal.MediaMeta("video", "avi", 32, 24, 0, 0L)
    val rows = Seq(
      Multimodal.MediaRow(1L,
        VideoIo.syntheticAviScenes(Seq(40, 120, 200), 5), meta),
      Multimodal.MediaRow(2L,
        VideoIo.syntheticAviScenes(Seq(90), 8), meta)).toDS()
    def cuts(d: org.apache.spark.sql.Dataset[Multimodal.MediaRow]) =
      VideoIo.sceneCuts(d, threshold = 0.05)
        .as[(Long, Long)].collect().toSet
    val got = cuts(rows)
    assert(got == Set((1L, 5L), (1L, 10L)),
      s"expected cuts at the two scene boundaries, got $got")
    assert(cuts(rows.repartition(5)) == got)
  }

  test("wavTrimSilence: planted pads removed exactly, kept samples " +
    "byte-identical; all-silent clip collapses; non-WAV passes through") {
    val clip = AudioIo.syntheticWav(4L, nSamples = 500)
    // pin endpoints loud so the trim boundary is exactly the pads
    val n = 500
    clip(44) = 0xe8.toByte; clip(45) = 0x03
    clip(44 + (n - 1) * 2) = 0xe8.toByte; clip(45 + (n - 1) * 2) = 0x03
    val padded = AudioIo.wavWithPadding(clip, pad = 37)
    assert(padded.length == clip.length + 4 * 37)
    val trimmed = AudioIo.wavTrimSilence(padded, threshold = 0)
    assert(java.util.Arrays.equals(trimmed, clip),
      "trim must return exactly the loud span, headers rewritten")
    // the trimmed clip still decodes through the real WavDecoder
    val meta = Multimodal.MediaMeta("audio", "wav", 0, 0, 8000, 0L)
    val f = AudioIo.WavDecoder.decode(trimmed, meta, 16)
    assert(f.length == 16 && f.exists(_ != 0f))
    // an all-silent clip collapses to zero samples
    val silent = AudioIo.wavWithPadding(
      AudioIo.syntheticWav(0L, nSamples = 0), pad = 20)
    assert(AudioIo.wavTrimSilence(silent, 0).length == 44)
    // non-WAV: untouched
    val blob = Array[Byte](9, 9, 9)
    assert(AudioIo.wavTrimSilence(blob, 0).toSeq == blob.toSeq)
  }
}
