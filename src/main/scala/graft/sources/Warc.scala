package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC/WET record reader — the crawl front door (round-14 verdict
  * item 3): web-scale corpora ship as WARC containers (and their
  * plain-text WET "conversion" siblings), which is what the curation
  * chain (mojibake → gopher → dedup → export) sits behind in a real
  * training-data pipeline. (No reference counterpart; SURVEY.md §8
  * extension surface.)
  *
  * Format (ISO 28500): each record is a `WARC/<version>` line, CRLF
  * header lines (`Name: value`), one blank line, then EXACTLY
  * `Content-Length` payload bytes, then CRLF CRLF. The parser honors
  * Content-Length — it never string-splits on the `WARC/` magic, so a
  * payload CONTAINING "WARC/1.0" (a crawled page quoting the spec, a
  * nested crawl log) cannot tear a record. Header names are
  * case-insensitive per spec; payloads are returned as raw bytes
  * (crawl payloads are not guaranteed UTF-8 — decode at the consumer,
  * e.g. `col("payload").cast("string")` for WET conversion text).
  *
  * Scale shape: one task per container file via the `binaryFile`
  * source — exactly how crawl dumps ship (thousands of ~1 GB
  * `.warc.gz` segment files; gzip is non-splittable, so per-file
  * parallelism IS the right grain). The whole-file gunzip handles the
  * member-per-record gzip layout Common-Crawl-style writers emit
  * (concatenated members decode as one stream). Nothing corpus-sized
  * visits the driver; the parse is a single forward scan per blob.
  */
object Warc {

  final case class WarcRecord(
      file: String, record_idx: Int, warc_type: String,
      target_uri: String, record_id: String, content_type: String,
      content_length: Long, payload: Array[Byte])

  /** All records under `dir` (one row per WARC record, file order
    * preserved in `record_idx`). `pathGlob` filters at the listing;
    * `.gz` files are gunzipped whole (multi-member safe). */
  def records(spark: SparkSession, dir: String,
      pathGlob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    Sources.binaryFiles(spark, dir, pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, content) => parse(path, content) }
      .toDF()
  }

  /** WET convenience view: just the `conversion` records (the
    * extracted plain text of each crawled page), payload decoded as
    * UTF-8 `text`. */
  def wetText(spark: SparkSession, dir: String,
      pathGlob: String = "*.w[ae]*"): DataFrame = {
    import org.apache.spark.sql.functions._
    records(spark, dir, pathGlob)
      .filter(col("warc_type") === "conversion")
      .withColumn("text", col("payload").cast("string"))
      .drop("payload")
  }

  /** Parse one container blob into its records. Binary-safe: record
    * boundaries come from Content-Length, never from scanning for the
    * magic. Loud on malformation (truncated payload, missing
    * Content-Length, garbage between records) — a torn crawl segment
    * must fail the task, not silently drop records. */
  private[sources] def parse(
      file: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val bytes = if (file.endsWith(".gz")) gunzipAll(raw) else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var idx = 0
    def readLine(): String = {
      var end = pos
      while (end < bytes.length && bytes(end) != '\n') end += 1
      require(end < bytes.length,
        s"$file: unterminated header line at byte $pos")
      val stop = if (end > pos && bytes(end - 1) == '\r') end - 1 else end
      val line = new String(bytes, pos, stop - pos,
        java.nio.charset.StandardCharsets.UTF_8)
      pos = end + 1
      line
    }
    while (pos < bytes.length) {
      // skip the inter-record CRLF CRLF (and tolerate extra blanks)
      if (bytes(pos) == '\r' || bytes(pos) == '\n') pos += 1
      else {
        val version = readLine()
        require(version.startsWith("WARC/"),
          s"$file: expected a WARC version line at record $idx, " +
            s"got '${version.take(40)}'")
        val headers = scala.collection.mutable.Map.empty[String, String]
        var line = readLine()
        while (line.nonEmpty) {
          val colon = line.indexOf(':')
          require(colon > 0, s"$file: malformed header '$line'")
          headers(line.substring(0, colon).trim.toLowerCase) =
            line.substring(colon + 1).trim
          line = readLine()
        }
        val len = headers.getOrElse("content-length", sys.error(
          s"$file: record $idx has no Content-Length")).toLong
        require(pos + len <= bytes.length,
          s"$file: record $idx payload truncated " +
            s"(need $len bytes at $pos of ${bytes.length})")
        out += WarcRecord(file, idx,
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-record-id", null),
          headers.getOrElse("content-type", null),
          len,
          java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt))
        pos += len.toInt
        idx += 1
      }
    }
    out.iterator
  }

  /** Gunzip a whole blob, concatenated-member safe (Common-Crawl
    * writers emit one gzip member per record; GZIPInputStream decodes
    * the members as one stream). */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }
}
