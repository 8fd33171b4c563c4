package graft.ops

import graft.ops.Multimodal.{Decoder, MediaMeta, Resizer}

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec bound to the [[Multimodal.Decoder]] seam via the
  * JDK's `javax.imageio` (PNG/JPEG/BMP/GIF — zero external deps, fully
  * hermetic). This replaces the environment-stub [[Multimodal.FakeDecoder]]
  * for genuine pixel flows: decode → integer box-average luminance grid →
  * normalized float features, which the existing pHash kernel
  * ([[Multimodal.phashOf]]) then fingerprints unchanged.
  *
  * Determinism: the luma reduction is integer-only (BT.601 ×1000 fixed
  * point) and the final normalization is one IEEE double divide per cell,
  * so features are bit-reproducible across JVMs — PNG is lossless, so
  * even byte-level PNG encoder differences across JDKs cannot change the
  * decoded pixels this reads.
  *
  * Scale: decode is per-row map-side work inside
  * [[Multimodal.extractFeatures]]'s batched `mapPartitions` — zero
  * shuffle, executor memory bounded by one image + one batch of feature
  * vectors at a time.
  */
object ImageIo {

  /** Decode an image payload and reduce it to `dim` luminance features:
    * the image is covered by a row-major ~square grid of `dim` boxes;
    * each feature is the box's mean BT.601 luma in [0, 1]. Box edges use
    * integer floor division, so every source pixel lands in exactly one
    * box and the reduction is exact integer math until the final divide.
    */
  object ImageIoDecoder extends Decoder {
    override def decode(
        payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null,
        "payload is not a decodable image (ImageIO.read returned null); " +
          "route non-image media through a different Decoder binding")
      val w = img.getWidth
      val h = img.getHeight
      val gw = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
      val gh = math.max(1, math.ceil(dim.toDouble / gw).toInt)
      val out = new Array[Float](dim)
      var c = 0
      while (c < dim) {
        val gx = c % gw
        val gy = c / gw
        val x0 = gx * w / gw
        val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        val y0 = gy * h / gh
        val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
        var sum = 0L
        var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += 299L * r + 587L * g + 114L * b // BT.601 luma ×1000
            n += 1
            x += 1
          }
          y += 1
        }
        out(c) = if (n == 0) 0f else (sum.toDouble / (n * 1000.0 * 255.0)).toFloat
        c += 1
      }
      out
    }
  }

  /** Real resizer on the [[Multimodal.Resizer]] seam: decode → integer
    * box-average downsample (same exact-grid reduction as the decoder) →
    * re-encode as grayscale PNG bytes. Nearest-box averaging rather than
    * Graphics2D interpolation keeps the pixel math integer-deterministic.
    */
  object ImageIoResizer extends Resizer {
    override def resize(payload: Array[Byte], meta: MediaMeta,
        w: Int, h: Int): Array[Byte] = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val sw = img.getWidth
      val sh = img.getHeight
      val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      var gy = 0
      while (gy < h) {
        var gx = 0
        while (gx < w) {
          val x0 = gx * sw / w
          val x1 = math.max(x0 + 1, (gx + 1) * sw / w)
          val y0 = gy * sh / h
          val y1 = math.max(y0 + 1, (gy + 1) * sh / h)
          var sum = 0L
          var n = 0
          var y = y0
          while (y < y1 && y < sh) {
            var x = x0
            while (x < x1 && x < sw) {
              val rgb = img.getRGB(x, y)
              sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)
              n += 1
              x += 1
            }
            y += 1
          }
          val luma = if (n == 0) 0 else (sum / (n * 1000L)).toInt
          out.setRGB(gx, gy, (luma << 16) | (luma << 8) | luma)
          gx += 1
        }
        gy += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Deterministic synthetic PNG fixtures for the real-decode faces:
    * integer-only test patterns (per-id gradient frequencies + an
    * id-phased 8×8 block overlay), so the bytes AND the decoded pixels
    * are identical on every JVM — no RNG, no floating point, no
    * platform-varying `Math.sin`. `jitter > 0` perturbs the luminance of
    * every 16th pixel by +1, a visually-invisible change that makes a
    * planted perceptual near-duplicate.
    */
  def syntheticPng(id: Long, w: Int = 64, h: Int = 48,
      jitter: Int = 0): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val fx = 1 + (id % 7).toInt
    val fy = 1 + (id % 5).toInt
    val phase = (id % 3).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val grad = (x * fx * 255 / w + y * fy * 255 / h) % 256
        val block = if ((x / 8 + y / 8 + phase) % 3 == 0) 48 else 0
        var v = math.min(255, grad + block)
        if (jitter > 0 && (x + y * w) % 16 == 0) v = math.min(255, v + jitter)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
