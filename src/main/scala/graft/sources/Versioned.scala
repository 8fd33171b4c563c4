package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic versioned publication of a table directory — the promote /
  * rollback primitive a 100 TB pipeline needs between "the batch
  * passed its [[graft.ops.Quality]] gate" and "consumers see it".
  * (No reference counterpart; SURVEY.md §8 extension surface.)
  *
  * Layout: `root/v_<n>` immutable snapshot dirs plus a `_CURRENT`
  * pointer file holding the promoted version as one 8-byte long.
  * Readers resolve the pointer, then read an immutable dir — a
  * publish in flight never tears a reader, because data files are
  * fully written BEFORE the pointer moves (the pointer flip is the
  * only mutation, and it is a temp-write + rename).
  *
  * Crash discipline (the [[graft.streaming.EventStream]] sink
  * recipe): a crash before the rename leaves the old pointer valid
  * and the new snapshot dir orphaned (swept by a later publish's
  * prune); a crash between pointer-delete and rename is healed at
  * the next resolve — the newest complete `._CURRENT_*.tmp` is the
  * durable copy and is promoted, truncated tmps are deleted.
  * Rollback is itself a pointer flip to the previous surviving
  * version, so it is as atomic as publish and does not destroy the
  * rolled-back-from snapshot (roll forward again if the alarm was
  * false).
  *
  * Scale shape: publish cost is the snapshot write itself (full
  * parallelism, immutable target); promote/rollback/resolve are
  * driver-side metadata (one rename / one 8-byte read). `keep` bounds
  * disk: superseded versions beyond the newest `keep` are pruned
  * only after a successful pointer commit.
  */
object Versioned {

  private val Pointer = "_CURRENT"

  /** Write `df` as the next version under `root` and atomically
    * promote it. Returns the published version number.
    *
    * `manifestCols` non-empty additionally writes an integrity
    * manifest INSIDE the snapshot (`v_<n>/_manifest` — the leading
    * underscore hides it from the snapshot's own parquet readers):
    * one row of (version, n_rows, checksum) where the checksum is the
    * order-independent sum of a 32-bit md5 draw over each row's
    * canonical string — engine-portable (DuckDB recomputes it
    * byte-for-byte), associative (partitioning cannot move it), and
    * cheap (one extra aggregation of the frame being written). A
    * consumer verifies a 100 TB publish by re-aggregating the
    * snapshot and comparing two longs — the partial-write /
    * wrong-version check object stores cannot give you. */
  def publish(df: DataFrame, root: String, keep: Int = 3,
      manifestCols: Seq[String] = Seq.empty): Long = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    // next = 1 + max over BOTH the pointer and surviving dirs, so a
    // publish after rollback mints a fresh number instead of silently
    // rewriting the rolled-back-from snapshot (version ids are
    // immutable once seen by any consumer)
    val next = (resolve(fs, root).toSeq ++ versions(fs, root))
      .foldLeft(0L)(math.max) + 1L
    df.write.mode("overwrite").parquet(s"$root/v_$next")
    if (manifestCols.nonEmpty) {
      import org.apache.spark.sql.functions.{col, lit}
      manifest(spark.read.parquet(s"$root/v_$next"), manifestCols)
        .select(lit(next).as("version"), col("n_rows"), col("checksum"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$root/v_$next/_manifest")
    }
    commit(fs, root, next)
    prune(fs, root, keep)
    next
  }

  /** One-row (n_rows, checksum) integrity summary of `df` over
    * `cols`: checksum = Σ rows uint32(md5 prefix of the -joined
    * canonical string). Sum is associative/commutative, so layout and
    * row order cannot move it; both engines compute the identical
    * value. NULL fields are skipped by concat_ws in BOTH engines —
    * callers needing null-position sensitivity coalesce upstream. */
  def manifest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one column")
    import org.apache.spark.sql.functions._
    df.agg(count(lit(1)).as("n_rows"),
      coalesce(sum(conv(substring(md5(
          concat_ws("\u0001", cols.map(c => col(c).cast("string")): _*)
            .cast("binary")), 1, 8), 16, 10).cast("long")), lit(0L))
        .as("checksum"))
  }

  /** The promoted snapshot's manifest (written by [[publish]] with
    * `manifestCols`). */
  def readManifest(spark: SparkSession, root: String): DataFrame = {
    val v = resolve(fsOf(spark, root), root).getOrElse(
      throw new java.io.FileNotFoundException(s"nothing published in $root"))
    spark.read.parquet(s"$root/v_$v/_manifest")
  }

  /** Flip the pointer back to the newest surviving version below the
    * current one. Returns the now-current version. */
  def rollback(spark: SparkSession, root: String): Long = {
    val fs = fsOf(spark, root)
    val cur = resolve(fs, root).getOrElse(
      throw new java.io.FileNotFoundException(s"nothing published in $root"))
    val prev = versions(fs, root).filter(_ < cur)
    require(prev.nonEmpty,
      s"no version before v_$cur survives in $root; cannot roll back")
    commit(fs, root, prev.max)
    prev.max
  }

  /** Read the currently-promoted snapshot. */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = resolve(fsOf(spark, root), root).getOrElse(
      throw new java.io.FileNotFoundException(s"nothing published in $root"))
    spark.read.parquet(s"$root/v_$v")
  }

  /** Currently-promoted version, if any (heals interrupted commits). */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    resolve(fsOf(spark, root), root)

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(
      fs: org.apache.hadoop.fs.FileSystem, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v_") && n.drop(2).nonEmpty &&
        n.drop(2).forall(_.isDigit))
      .map(_.drop(2).toLong)
  }

  private def commit(
      fs: org.apache.hadoop.fs.FileSystem, root: String, v: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val pointer = new Path(root, Pointer)
    val tmp = new Path(root, s"._CURRENT_$v.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(v) finally out.close()
    if (fs.exists(pointer) && !fs.delete(pointer, false))
      throw new java.io.IOException(s"failed to clear pointer $pointer")
    if (!fs.rename(tmp, pointer)) {
      val healed = fs.exists(pointer) && {
        val in = fs.open(pointer)
        try in.readLong() == v finally in.close()
      }
      if (!healed) throw new java.io.IOException(
        s"rename $tmp -> $pointer failed; re-run the publish")
    }
  }

  /** Committed version; promotes the newest COMPLETE tmp if a commit
    * was interrupted between pointer-delete and rename. */
  private def resolve(
      fs: org.apache.hadoop.fs.FileSystem, root: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val pointer = new Path(root, Pointer)
    def readPtr(): Option[Long] = {
      val in = fs.open(pointer)
      try Some(in.readLong()) finally in.close()
    }
    if (fs.exists(pointer)) readPtr()
    else if (!fs.exists(new Path(root))) None
    else {
      val (complete, truncated) = fs.listStatus(new Path(root)).toSeq
        .filter { st =>
          val n = st.getPath.getName
          val v = n.stripPrefix("._CURRENT_").stripSuffix(".tmp")
          n.startsWith("._CURRENT_") && n.endsWith(".tmp") &&
            v.nonEmpty && v.forall(_.isDigit)
        }
        .partition(_.getLen == java.lang.Long.BYTES)
      truncated.foreach(st => fs.delete(st.getPath, false))
      if (complete.isEmpty) None
      else {
        val newest = complete.map(_.getPath).maxBy(
          _.getName.stripPrefix("._CURRENT_").stripSuffix(".tmp").toLong)
        if (!fs.rename(newest, pointer) && !fs.exists(pointer))
          throw new java.io.IOException(
            s"recovery rename $newest -> $pointer failed")
        complete.map(_.getPath).filterNot(_ == newest)
          .foreach(p => fs.delete(p, false))
        readPtr()
      }
    }
  }

  /** Delete versions beyond the newest `keep`, never the current one.
    * Runs only after a successful commit; orphans from crashed
    * publishes are swept here too. */
  private def prune(
      fs: org.apache.hadoop.fs.FileSystem, root: String, keep: Int): Unit = {
    val cur = resolve(fs, root)
    val drop = versions(fs, root).sorted(Ordering[Long].reverse).drop(keep)
      .filterNot(cur.contains)
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v_$v"), true)
    }
  }
}
