package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Output sinks (SURVEY.md §2.1 S6-S8). The reference writes its final
  * indexes as JSON partitioned by study/release and `coalesce(1)`s
  * every non-parquet output (reference: processes/processes.scala:22-38)
  * — a single-writer bottleneck that cannot scale.
  *
  * Here the default instead repartitions BY THE PARTITION COLUMNS, so
  * each Hive partition directory is written by the task that owns that
  * key: one shuffle, full write parallelism, and one file per
  * partition dir (what coalesce(1) was trying to achieve) without
  * serializing the whole job through one task. `singleFile = true`
  * restores the reference's exact behavior for metadata-sized outputs.
  */
object Sinks {

  /** Partition-owner arrangement shared by the text sinks: one writer
    * per Hive partition dir (or coalesce(1) reference parity). */
  private def arrange(
      df: DataFrame, partitionBy: Seq[String],
      singleFile: Boolean): DataFrame =
    if (singleFile) df.coalesce(1)
    else if (partitionBy.nonEmpty) df.repartition(partitionBy.map(col): _*)
    else df

  def partitionedJson(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String],
      singleFile: Boolean = false): Unit =
    arrange(df, partitionBy, singleFile).write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionBy: _*)
      .json(path)

  def parquet(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Seq.empty): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionBy: _*)
      .parquet(path)

  /** Columnar ORC sink — Spark's second native columnar format, for
    * interop with Hive-ecosystem consumers (same partition-owner write
    * discipline as [[parquet]]). */
  def orc(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Seq.empty): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionBy: _*)
      .orc(path)

  /** Dynamic-partition overwrite: replace ONLY the Hive partitions the
    * frame touches, leaving sibling partitions intact — the
    * incremental re-publish pattern (recompute one day/source, swap it
    * in) that static overwrite mode would turn into "delete the whole
    * table first". Per-write option, no session-conf mutation; one
    * writer per touched partition dir (the partition-owner shuffle
    * shared with the text sinks). */
  def overwritePartitions(
      df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty,
      "overwritePartitions needs at least one partition column")
    df.repartition(partitionBy.map(col): _*).write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** XML sink (Spark 4's built-in xml source, the spark-xml donation)
    * — the interchange boundary for registry/LIMS consumers that still
    * speak XML. Same partition-owner write discipline as the other
    * text sinks; `rowTag` names the per-row element. */
  def xml(
      df: DataFrame,
      path: String,
      rowTag: String,
      partitionBy: Seq[String] = Seq.empty,
      singleFile: Boolean = false): Unit =
    arrange(df, partitionBy, singleFile).write
      .mode(SaveMode.Overwrite)
      .option("rowTag", rowTag)
      .partitionBy(partitionBy: _*)
      .format("xml")
      .save(path)

  /** Header-ful CSV sink with the same partition-owner write
    * discipline as [[partitionedJson]] — the interchange format for
    * spreadsheet/BI consumers of metadata-sized outputs. */
  def csv(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Seq.empty,
      singleFile: Boolean = false): Unit =
    arrange(df, partitionBy, singleFile).write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .partitionBy(partitionBy: _*)
      .csv(path)

  /** Scatter a binary payload column to one raw file per row — the
    * export half of the multimodal ingest loop (the import half is
    * [[Sources.binaryFiles]]). Media consumers (codecs, labeling UIs,
    * CDNs) read raw files, not parquet row groups, so a training
    * pipeline needs this boundary both ways.
    *
    * Each executor writes the rows of its own partitions directly to
    * the target filesystem — no driver funnel, no coalesce(1); write
    * parallelism is the partition count. `nameCol` must be unique per
    * row (it becomes the file name) and is the caller's contract —
    * duplicate names mean last-writer-wins, not an error, matching
    * object-store semantics.
    */
  def binaryFiles(
      df: DataFrame,
      dir: String,
      nameCol: String,
      payloadCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val base = new Path(dir)
    val driverFs = base.getFileSystem(conf.value)
    if (driverFs.exists(base)) driverFs.delete(base, true)
    driverFs.mkdirs(base)
    df.select(col(nameCol).cast("string"), col(payloadCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          val fs = new Path(dir).getFileSystem(conf.value)
          rows.foreach { r =>
            val out = fs.create(new Path(dir, r.getString(0)), true)
            try out.write(r.getAs[Array[Byte]](1))
            finally out.close()
          }
        }
      }
  }

  /** Fold the `batch_id=` directories the idempotent streaming sink
    * accumulates ([[graft.streaming.EventStream.idempotentParquetSink]])
    * into one compact partition, without touching the live head: every
    * batch dir with id ≤ `upTo` is rewritten as a single
    * `batch_id=upTo` directory of `targetFiles` files, then the
    * superseded dirs are removed. A per-batch micro-file layout
    * otherwise degrades every downstream scan (file-listing and
    * open-cost dominate under ~128 MB/file).
    *
    * Contract: run as the single maintenance writer, and only with
    * `upTo` strictly below the last COMMITTED batch — the engine never
    * replays committed batches, so no future write can target a folded
    * dir. Crash-safe under RE-RUN with the same `upTo`: the rewrite
    * lands in a hidden temp dir (readers using `basePath` never see
    * it) and source dirs are deleted only after the temp write
    * COMMITTED (parquet `_SUCCESS`); a re-run that finds a committed
    * temp resumes at the delete/rename step instead of rebuilding it
    * from whatever source dirs survive — rebuilding there would bake a
    * partial fold over the already-deleted batches.
    */
  def compactBatches(
      spark: org.apache.spark.sql.SparkSession,
      outDir: String,
      upTo: Long,
      targetFiles: Int = 1): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val folded = fs.listStatus(new Path(outDir)).toSeq
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("batch_id=") &&
          n.stripPrefix("batch_id=").forall(_.isDigit) &&
          n.stripPrefix("batch_id=").toLong <= upTo
      }
    val tmp = new Path(outDir, s".compact_tmp_$upTo")
    val tmpCommitted = fs.exists(new Path(tmp, "_SUCCESS"))
    if (folded.nonEmpty && !tmpCommitted) {
      spark.read
        .option("basePath", outDir)
        .parquet(folded.map(_.toString): _*)
        .drop("batch_id")
        .coalesce(targetFiles)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    }
    if (folded.nonEmpty || tmpCommitted) {
      // HDFS-style FileSystem APIs report failure as `false`, not an
      // exception. Swallowing a false here is silent data loss: with
      // the source dirs gone, a failed rename strands the folded rows
      // in the hidden temp dir that basePath readers skip. Fail loudly
      // instead — the committed temp makes a re-run resume safely.
      folded.foreach { p =>
        if (!fs.delete(p, true) && fs.exists(p))
          throw new java.io.IOException(
            s"compactBatches: failed to delete superseded dir $p")
      }
      val dest = new Path(outDir, s"batch_id=$upTo")
      if (fs.exists(dest) && !fs.delete(dest, true))
        throw new java.io.IOException(
          s"compactBatches: failed to clear stale destination $dest")
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(
          s"compactBatches: rename $tmp -> $dest failed; folded rows " +
            "remain in the temp dir — re-run with the same upTo to retry")
    }
  }
}
