package graft.ops

import graft.ops.Multimodal.{Decoder, MediaMeta}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Video on the [[Multimodal.Decoder]] seam, as real as the JDK allows:
  * Motion-JPEG in an AVI/RIFF container — the container walk is a
  * standard RIFF chunk scan (the same framing WAV uses) and every frame
  * is decoded by the real `javax.imageio` JPEG codec. Modern inter-frame
  * codecs (H.264/VP9/AV1) have no JDK decoder; those payloads should
  * fail loudly here and route to an external transcode stage — MJPEG is
  * the one video format a hermetic JVM pipeline can genuinely decode,
  * and it is what many capture/surveillance sources still emit.
  *
  * Features are a TEMPORAL luminance signature: each frame reduces to
  * its mean luma (exact integer box average over all pixels), and the
  * frame sequence is then box-averaged into `dim` time cells — the
  * video analog of [[AudioIo]]'s amplitude envelope. pHash over it
  * gives Hamming-bandable video fingerprints (TV-dedup-style temporal
  * signatures) with zero new machinery.
  *
  * Scale: per-row map-side work inside the batched `mapPartitions`;
  * memory bounded by ONE decoded frame at a time plus the dim-sized
  * accumulators (frames stream through the chunk walk — the whole clip
  * is never held decoded).
  */
object VideoIo {

  /** Walk a RIFF/AVI payload and return the raw bytes of each video
    * frame chunk (`00dc`/`00db` — compressed/uncompressed stream-0
    * data), in order. LIST chunks recurse; everything else skips.
    * Loud on non-RIFF/non-AVI payloads. */
  def aviFrames(payload: Array[Byte]): Iterator[Array[Byte]] = {
    require(payload.length >= 12 &&
      new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(payload, 8, 4, "US-ASCII") == "AVI ",
      "payload is not a RIFF/AVI container")
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    def walk(start: Int, end: Int): Iterator[Array[Byte]] = {
      var off = start
      var out = Iterator.empty: Iterator[Array[Byte]]
      while (off + 8 <= end) {
        val id = new String(payload, off, 4, "US-ASCII")
        val size = u32(off + 4).toInt
        val body = off + 8
        if (id == "LIST" && size >= 4)
          out = out ++ walk(body + 4, math.min(body + size, end))
        else if (id == "00dc" || id == "00db") {
          val frame = java.util.Arrays.copyOfRange(
            payload, body, math.min(body + size, end))
          out = out ++ Iterator.single(frame)
        }
        off = body + size + (size & 1) // chunks are word-aligned
      }
      out
    }
    walk(12, payload.length)
  }

  /** Decode an MJPEG/AVI payload into `dim` temporal mean-luma
    * features: per frame, exact-integer mean BT.601 luma over all
    * pixels; across frames, box-average into `dim` time cells. */
  /** Mean BT.601 luma of one decoded frame, in [0, 1]. */
  private[ops] def frameLuma(fb: Array[Byte]): Double = {
    val img = ImageIO.read(new ByteArrayInputStream(fb))
    require(img != null, "frame chunk is not decodable by javax.imageio")
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum.toDouble / (img.getWidth.toLong * img.getHeight * 1000L * 255L)
  }

  /** Shot/scene-cut detection over real decoded frames: a cut is a
    * frame whose mean luma jumps more than `threshold` from its
    * predecessor — the classic hard-cut detector, the segmentation
    * step before per-shot sampling/dedup of video training corpora.
    * One flatMap per clip (frames stream out of the RIFF walk, one
    * decoded frame in memory at a time; the luma trace is 8 B/frame),
    * zero shuffle. Output: (media_id, cut_idx) — frame indexes that
    * OPEN a new shot. */
  def sceneCuts(media: org.apache.spark.sql.Dataset[Multimodal.MediaRow],
      threshold: Double): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      var prev = Double.NaN
      aviFrames(r.payload).zipWithIndex.flatMap { case (fb, i) =>
        val l = frameLuma(fb)
        val cut = i > 0 && math.abs(l - prev) > threshold
        prev = l
        if (cut) Some((r.media_id, i.toLong)) else None
      }
    }.toDF("media_id", "cut_idx")
  }

  /** Deterministic multi-scene fixture: each scene is `framesPerScene`
    * FLAT frames at its own brightness — within-scene luma deltas are
    * JPEG-quantization noise, across-scene deltas are the planted
    * jumps, so expected cuts are a pure function of the scene layout
    * (the relational-oracle device of the image/audio fixtures). */
  def syntheticAviScenes(sceneLumas: Seq[Int], framesPerScene: Int,
      w: Int = 32, h: Int = 24): Array[Byte] =
    wrapAvi(
      sceneLumas.flatMap(b => Seq.fill(framesPerScene)(flatFrameJpeg(b, w, h))),
      w, h)

  private def flatFrameJpeg(v: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  object MjpegDecoder extends Decoder {
    override def decode(
        payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val sums = new Array[Double](dim)
      val counts = new Array[Int](dim)
      // two passes would need the frame count up front; instead collect
      // per-frame lumas first (8 B/frame — dim-sized, never pixel-sized)
      val lumas = aviFrames(payload).map(frameLuma).toArray
      require(lumas.nonEmpty, "AVI payload contains no video frames")
      var f = 0
      while (f < lumas.length) {
        val box = (f.toLong * dim / lumas.length).toInt
        sums(box) += lumas(f)
        counts(box) += 1
        f += 1
      }
      Array.tabulate(dim)(b =>
        if (counts(b) == 0) 0f else (sums(b) / counts(b)).toFloat)
    }
  }

  /** One deterministic JPEG frame of clip `id`: per-id SPATIAL
    * frequencies (so frames of different clips differ in content, not
    * just brightness) under a per-frame brightness ramp with per-id
    * period/phase (the temporal signature). Real javax.imageio JPEG
    * encode; integer-only pattern math. */
  private[ops] def frameJpeg(id: Long, f: Int, w: Int, h: Int,
      jitter: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 1 + (id % 7).toInt
    val fy = 1 + (id % 5).toInt
    val period = 6 + (id % 5).toInt
    val ramp = math.abs((f + (id % 7).toInt) % (2 * period) - period) *
      200 / period
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val grad = (x * fx * 255 / w + y * fy * 255 / h) % 256 / 2
        val v = math.min(255, (grad + ramp) / 2 + jitter)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Wrap pre-encoded frames in a minimal RIFF AVI (avih header + movi
    * frame list). */
  private[ops] def wrapAvi(frames: Seq[Array[Byte]], w: Int, h: Int)
      : Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val avih = new ByteArrayOutputStream()
    avih.write("avih".getBytes("US-ASCII")); avih.write(le32(56))
    avih.write(le32(41667)) // µs/frame (24 fps)
    avih.write(le32(0)); avih.write(le32(0)); avih.write(le32(0x10))
    avih.write(le32(frames.length)); avih.write(le32(0)); avih.write(le32(1))
    avih.write(le32(0)); avih.write(le32(w)); avih.write(le32(h))
    (0 until 4).foreach(_ => avih.write(le32(0)))
    val hdrlBody = "hdrl".getBytes("US-ASCII") ++ avih.toByteArray
    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { fb =>
      movi.write("00dc".getBytes("US-ASCII")); movi.write(le32(fb.length))
      movi.write(fb)
      if ((fb.length & 1) == 1) movi.write(0) // word alignment
    }
    val lists = new ByteArrayOutputStream()
    lists.write("LIST".getBytes("US-ASCII")); lists.write(le32(hdrlBody.length))
    lists.write(hdrlBody)
    lists.write("LIST".getBytes("US-ASCII"))
    lists.write(le32(movi.size())); lists.write(movi.toByteArray)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(4 + lists.size()))
    out.write("AVI ".getBytes("US-ASCII")); out.write(lists.toByteArray)
    out.toByteArray
  }

  /** Deterministic synthetic MJPEG/AVI fixture: `nFrames` real JPEG
    * frames ([[frameJpeg]]) in a minimal RIFF AVI. `jitter` shifts
    * every frame's luma uniformly by +jitter (invisible; plants a
    * temporal-signature near-duplicate the DC-dropping pHash must
    * land on). */
  def syntheticAvi(id: Long, nFrames: Int = 24, w: Int = 32, h: Int = 24,
      jitter: Int = 0): Array[Byte] =
    wrapAvi((0 until nFrames).map(f => frameJpeg(id, f, w, h, jitter)), w, h)

  /** A spliced clip: the first `take` frames of each source clip,
    * concatenated — byte-identical frames shared with the sources (the
    * re-posted/compilation-content scenario frame-level dedup must
    * catch). */
  def syntheticAviSplice(ids: Seq[Long], take: Int, w: Int = 32,
      h: Int = 24): Array[Byte] =
    wrapAvi(
      ids.flatMap(id => (0 until take).map(f => frameJpeg(id, f, w, h, 0))),
      w, h)

  /** Fan a video corpus out to one row per frame: (media_id,
    * frame_idx, frame) — the layout frame-level ops (per-frame
    * fingerprints, shot detection, cross-video shared-frame dedup) run
    * on. A flatMap: zero shuffle, frames stream out of the chunk walk
    * without the clip ever being held decoded. */
  def explodeFrames(media: org.apache.spark.sql.Dataset[Multimodal.MediaRow])
      : org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => aviFrames(r.payload).zipWithIndex.map {
        case (fb, i) => (r.media_id, i, fb)
      })
      .toDF("media_id", "frame_idx", "frame")
  }
}
