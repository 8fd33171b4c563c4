package graft.sources

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VersionedSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def vals(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("v").as[Long].collect().sorted.toSeq

  test("publish/readCurrent round-trip; republish bumps the version") {
    val root = java.nio.file.Files.createTempDirectory("graft_ver").toString
    assert(Versioned.publish(Seq(1L, 2L).toDF("v"), root) == 1L)
    assert(vals(Versioned.readCurrent(spark, root)) == Seq(1L, 2L))
    assert(Versioned.publish(Seq(3L).toDF("v"), root) == 2L)
    assert(vals(Versioned.readCurrent(spark, root)) == Seq(3L))
    assert(Versioned.currentVersion(spark, root).contains(2L))
  }

  test("rollback flips to the previous surviving snapshot; a publish " +
    "after rollback mints a FRESH version, never rewriting the " +
    "rolled-back-from one") {
    val root = java.nio.file.Files.createTempDirectory("graft_ver").toString
    Versioned.publish(Seq(1L).toDF("v"), root)
    Versioned.publish(Seq(2L).toDF("v"), root)
    assert(Versioned.rollback(spark, root) == 1L)
    assert(vals(Versioned.readCurrent(spark, root)) == Seq(1L))
    // v_2 still on disk for roll-forward
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/v_2")))
    assert(Versioned.publish(Seq(3L).toDF("v"), root) == 3L)
    assert(vals(Versioned.readCurrent(spark, root)) == Seq(3L))
    // the superseded-but-immutable v_2 was not rewritten
    assert(vals(spark.read.parquet(s"$root/v_2")) == Seq(2L))
  }

  test("prune keeps the newest `keep` versions and never the current") {
    val root = java.nio.file.Files.createTempDirectory("graft_ver").toString
    (1 to 5).foreach(i => Versioned.publish(Seq(i.toLong).toDF("v"), root,
      keep = 2))
    val left = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("v_")).sorted.toSeq
    assert(left == Seq("v_4", "v_5"))
    assert(vals(Versioned.readCurrent(spark, root)) == Seq(5L))
  }

  test("manifest round-trip: re-aggregating the published snapshot " +
    "reproduces (n_rows, checksum); content changes move the checksum") {
    val root = java.nio.file.Files.createTempDirectory("graft_ver").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    val v = Versioned.publish(df, root, manifestCols = Seq("k", "s"))
    val m = Versioned.readManifest(spark, root)
      .select("version", "n_rows", "checksum")
      .as[(Long, Long, Long)].collect().head
    assert(m._1 == v && m._2 == 3L)
    val recomputed = Versioned.manifest(
        Versioned.readCurrent(spark, root), Seq("k", "s"))
      .as[(Long, Long)].collect().head
    assert(recomputed == ((m._2, m._3)), "snapshot no longer matches")
    // the manifest dir is invisible to snapshot readers
    assert(Versioned.readCurrent(spark, root).count() == 3L)
    // sensitivity: dropping a row or editing a value moves the checksum
    val less = Versioned.manifest(
        Versioned.readCurrent(spark, root).filter(col("k") =!= 2L),
        Seq("k", "s"))
      .as[(Long, Long)].collect().head
    assert(less._2 != m._3)
    val edited = Versioned.manifest(
        Versioned.readCurrent(spark, root)
          .withColumn("s", concat(col("s"), lit("x"))),
        Seq("k", "s"))
      .as[(Long, Long)].collect().head
    assert(edited._2 != m._3)
  }

  test("interrupted pointer commit heals on resolve: a complete tmp is " +
    "promoted, a truncated tmp is discarded") {
    val root = java.nio.file.Files.createTempDirectory("graft_ver").toString
    Versioned.publish(Seq(1L).toDF("v"), root)
    Versioned.publish(Seq(2L).toDF("v"), root)
    // simulate a crash between pointer-delete and rename during a
    // rollback-to-1 commit: pointer gone, complete tmp for v1 present,
    // plus a truncated tmp for a bogus v9
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/_CURRENT"))
    val buf = java.nio.ByteBuffer.allocate(8).putLong(1L)
    buf.flip()
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(s"$root/._CURRENT_1.tmp"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.write(buf) finally ch.close()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/._CURRENT_9.tmp"),
      Array[Byte](1, 2, 3)) // truncated: must not be promoted
    assert(Versioned.currentVersion(spark, root).contains(1L))
    assert(vals(Versioned.readCurrent(spark, root)) == Seq(1L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/._CURRENT_9.tmp")))
  }
}
