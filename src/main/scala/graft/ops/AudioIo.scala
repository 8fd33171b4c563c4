package graft.ops

import graft.ops.Multimodal.{Decoder, MediaMeta}

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** Real audio codec bound to the [[Multimodal.Decoder]] seam via the
  * JDK's `javax.sound.sampled` (WAV/AIFF/AU PCM — zero external deps,
  * hermetic, no audio device needed for decoding). With
  * [[ImageIo.ImageIoDecoder]] covering images and this covering audio,
  * [[Multimodal.FakeDecoder]] remains only for modalities the JDK has
  * no codec for (video).
  *
  * Features are the signal's ENVELOPE: the sample timeline is covered
  * by `dim` equal boxes and each feature is the box's mean absolute
  * amplitude in [0, 1] — the representation audio-fingerprinting
  * pipelines hash (Wang 2003-style constellation hashing reduces to
  * banded energy too; the engine's pHash-over-features then gives
  * Hamming-bandable audio fingerprints with zero new machinery).
  *
  * Determinism: PCM decode is exact integer unpacking; the envelope
  * reduction is integer sums with one IEEE double divide per box —
  * bit-reproducible across JVMs.
  *
  * Scale: per-row map-side work inside the batched `mapPartitions` of
  * [[Multimodal.extractFeatures]]; memory bounded by one clip + one
  * batch of feature vectors.
  */
object AudioIo {

  /** Decode a PCM audio payload (16- or 8-bit, any channel count —
    * channels average into one mono stream) into `dim` mean-|amplitude|
    * envelope features. */
  object WavDecoder extends Decoder {
    override def decode(
        payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        require(bits == 16 || bits == 8,
          s"WavDecoder handles 8/16-bit PCM, got $bits-bit")
        val channels = fmt.getChannels
        val bytesPerFrame = fmt.getFrameSize
        val data = in.readAllBytes()
        val nFrames = data.length / bytesPerFrame
        require(nFrames > 0, "audio payload decoded to zero frames")
        // per-box integer sums of mean-across-channels |amplitude|
        val sums = new Array[Long](dim)
        val counts = new Array[Long](dim)
        val big = fmt.isBigEndian
        var f = 0
        while (f < nFrames) {
          var acc = 0L
          var c = 0
          while (c < channels) {
            val off = f * bytesPerFrame + c * (bits / 8)
            val s =
              if (bits == 16) {
                val lo = data(off + (if (big) 1 else 0)) & 0xff
                val hi = data(off + (if (big) 0 else 1)).toInt
                (hi << 8) | lo
              } else (data(off) & 0xff) - 128 // 8-bit PCM is unsigned
            acc += math.abs(s.toLong)
            c += 1
          }
          val box = (f.toLong * dim / nFrames).toInt
          sums(box) += acc / channels
          counts(box) += 1
          f += 1
        }
        val full = if (bits == 16) 32768.0 else 128.0
        Array.tabulate(dim)(b =>
          if (counts(b) == 0) 0f else (sums(b).toDouble / (counts(b) * full)).toFloat)
      } finally in.close()
    }
  }

  /** Deterministic synthetic WAV fixtures: PCM16 mono, integer-only
    * triangle-wave carrier with a per-id amplitude envelope (no RNG, no
    * floating point, no platform-varying libm) — byte-identical on
    * every JVM. `jitter > 0` perturbs every 16th sample by +jitter
    * LSBs, an inaudible change that makes a planted fingerprint
    * near-duplicate. */
  /** Trim leading/trailing silence from a PCM16 mono WAV at the BYTE
    * level — the standard audio-corpus normalization (padding from
    * recording equipment wastes tokens/storage and skews duration
    * features). A sample is "silence" when |s| <= `threshold`; the
    * kept span runs from the first to the last loud sample, header
    * sizes rewritten, sample bytes COPIED verbatim (no resynthesis —
    * the audible content is bit-identical). All-silent clips collapse
    * to zero samples. Non-WAV/compressed payloads pass through
    * unchanged (same contract as the image scrub). Pure byte surgery:
    * deterministic, map-side.
    */
  def wavTrimSilence(payload: Array[Byte], threshold: Int): Array[Byte] = {
    if (payload.length < 44 ||
      new String(payload, 0, 4, "US-ASCII") != "RIFF" ||
      new String(payload, 8, 4, "US-ASCII") != "WAVE") return payload
    // fixture-layout WAV: fmt at 12, data chunk header at 36 (the
    // corpus convention this library's decoder also assumes)
    if (new String(payload, 36, 4, "US-ASCII") != "data") return payload
    val n = (payload.length - 44) / 2
    def sample(i: Int): Int =
      ((payload(44 + i * 2) & 0xff) |
        (payload(45 + i * 2) << 8)).toShort.toInt
    var first = 0
    while (first < n && math.abs(sample(first)) <= threshold) first += 1
    var last = n - 1
    while (last >= first && math.abs(sample(last)) <= threshold) last -= 1
    val kept = math.max(0, last - first + 1)
    val out = new Array[Byte](44 + kept * 2)
    System.arraycopy(payload, 0, out, 0, 44)
    System.arraycopy(payload, 44 + first * 2, out, 44, kept * 2)
    def w32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    w32(4, 36 + kept * 2)
    w32(40, kept * 2)
    out
  }

  /** Re-pad a fixture WAV with exact silent samples on both ends
    * (spec/face helper — the planted padding [[wavTrimSilence]] must
    * remove). */
  def wavWithPadding(wav: Array[Byte], pad: Int): Array[Byte] = {
    val n = (wav.length - 44) / 2
    val out = new Array[Byte](44 + (n + 2 * pad) * 2)
    System.arraycopy(wav, 0, out, 0, 44)
    // leading/trailing pads are already zero bytes (silence)
    System.arraycopy(wav, 44, out, 44 + pad * 2, n * 2)
    def w32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    w32(4, 36 + (n + 2 * pad) * 2)
    w32(40, (n + 2 * pad) * 2)
    out
  }

  def syntheticWav(id: Long, nSamples: Int = 8000, sampleRate: Int = 8000,
      jitter: Int = 0): Array[Byte] = {
    def tri(t: Int, p: Int): Long = { // triangle in [-p/2, p/2], period 2p
      val m = t % (2 * p)
      math.abs(m.toLong - p) - p / 2
    }
    val carrier = 20 + (id % 13).toInt * 7   // per-id pitch
    val envelope = 900 + (id % 7).toInt * 311 // per-id AM period
    val pcm = new Array[Byte](44 + nSamples * 2)
    // RIFF/WAVE header (PCM16 mono, little-endian throughout)
    def w32(off: Int, v: Int): Unit = {
      pcm(off) = v.toByte; pcm(off + 1) = (v >> 8).toByte
      pcm(off + 2) = (v >> 16).toByte; pcm(off + 3) = (v >> 24).toByte
    }
    def w16(off: Int, v: Int): Unit = {
      pcm(off) = v.toByte; pcm(off + 1) = (v >> 8).toByte
    }
    "RIFF".getBytes.copyToArray(pcm, 0)
    w32(4, 36 + nSamples * 2)
    "WAVE".getBytes.copyToArray(pcm, 8)
    "fmt ".getBytes.copyToArray(pcm, 12)
    w32(16, 16); w16(20, 1); w16(22, 1) // PCM, mono
    w32(24, sampleRate); w32(28, sampleRate * 2)
    w16(32, 2); w16(34, 16)
    "data".getBytes.copyToArray(pcm, 36)
    w32(40, nSamples * 2)
    var t = 0
    while (t < nSamples) {
      // carrier × envelope, both exact-integer triangles; peak ≈ ±16k
      val amp = 8192L + tri(t, envelope) * 8192L / (envelope / 2)
      var s = (tri(t, carrier) * amp / (carrier / 2)).toInt
      if (jitter > 0 && t % 16 == 0) s = math.min(32767, s + jitter)
      w16(44 + t * 2, s & 0xffff)
      t += 1
    }
    pcm
  }
}
