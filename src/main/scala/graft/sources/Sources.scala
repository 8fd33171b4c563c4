package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Raw-input scans (SURVEY.md §2.1). The reference's only raw format is
  * header-ful TSV read with every column as string (reference:
  * processes/processes.scala:18 `tsv_with_headers`; no inferSchema —
  * typing happens downstream, explicitly), plus multiline-JSON metadata
  * (processes.scala:19) and gzipped JSON-lines ontology term files
  * (ProcessETLConfig.scala:30-33).
  *
  * Scale notes: plain-text TSV/JSON scans parallelize per file (and per
  * split for uncompressed files); gzip is non-splittable, so a 100 TB
  * ingest should arrive as many .gz files (one task each), which is how
  * the reference's ontology inputs are shipped. Schema inference reads
  * the data twice — for JSON-lines at scale, pass an explicit schema
  * via the `schema` overloads.
  */
object Sources {

  /** Header-ful TSV, all columns string (no inference — deterministic
    * ingest; types are applied downstream where they're checked). */
  def tsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)

  /** Multiline (pretty-printed array) JSON — the reference's
    * study-version metadata format. Whole-file reads: metadata-sized
    * inputs only. */
  def multilineJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** JSON-lines (one object per line), transparently gunzipped by the
    * codec; the reference's ontology term-file format. */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** JSON-lines with an explicit schema: skips the inference pass —
    * one scan instead of two, required at real scale. */
  def jsonLines(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** In-memory JSON strings → DataFrame (the reference parses the
    * id-server's HTTP response this way: PreProcessUtils.scala:98). */
  def inMemoryJson(spark: SparkSession, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(rows)
    spark.read.json(ds)
  }

  /** Raw media files → (path, modificationTime, length, content) via
    * Spark's built-in `binaryFile` format — the ingest boundary of the
    * multimodal pipeline ([[graft.ops.Multimodal]]): image/audio/video
    * arrive as files, become opaque binary columns here, and flow
    * through sniff/decode/feature stages as ordinary rows.
    *
    * Scale: listing parallelizes driver-side, reads parallelize one
    * task per file (files are indivisible blobs); pair with
    * [[graft.ops.Multimodal.rebalanceByBytes]] after ingest so payload
    * skew does not decide partition sizes. `pathGlob` filters at the
    * listing (e.g. `*.png`) — files that never match are never opened.
    */
  def binaryFiles(
      spark: SparkSession,
      dir: String,
      pathGlob: String = "*"): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)

  /** WARC/WET crawl containers → one row per record ([[Warc.records]]
    * — Content-Length-honoring split, binary-safe payloads, one task
    * per container file). The crawl front door of the curation chain. */
  def warcRecords(
      spark: SparkSession,
      dir: String,
      pathGlob: String = "*.warc*"): DataFrame =
    Warc.records(spark, dir, pathGlob)

  /** Raw-crawl HTML view ([[Warc.responseHtml]]): `response` records'
    * bodies with the HTTP header block stripped — feed to
    * [[graft.ops.Html.htmlText]] for the non-WET curation path. */
  def warcResponseHtml(
      spark: SparkSession,
      dir: String,
      pathGlob: String = "*.warc*"): DataFrame =
    Warc.responseHtml(spark, dir, pathGlob)
}
