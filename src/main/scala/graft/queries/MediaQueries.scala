package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal surface: documents' text re-encoded as opaque binary
  * payloads drive the real plumbing (typed rows, batched per-partition
  * decode, native magic-byte sniff + frame fan-out). Decode itself is
  * the documented deterministic stub — rows-only driver checks.
  */
object MediaQueries {
  import QueryDef.noOracle

  val defs: Seq[QueryDef] = Seq(

    noOracle("q_media_features") { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(lit("image").as("kind"), lit("bin").as("format"),
          lit(4).as("width"), lit(4).as("height"),
          lit(0).as("sampleRate"), lit(0L).as("durationMs")).as("meta"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(media, dim = 8).toDF()
        .select(col("media_id"), col("n_bytes"), col("fingerprint"))
    },

    noOracle("q_media_frames") { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        Multimodal.sniffFormat(col("text").cast("binary")).as("format"),
        explode(Multimodal.frameOffsets(
          (col("n_chars") * 10).cast("long"), 1000)).as("frame_ms"))
    })
}
