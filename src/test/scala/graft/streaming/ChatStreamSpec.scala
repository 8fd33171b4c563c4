package graft.streaming

import graft.WithSpark
import graft.ops.Chat
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** [[EventStream.chatRenderSink]] — streaming conversation assembly:
  * cross-batch turn accumulation, touched-bucket-only re-render,
  * replay idempotence, empty-batch pointer advance, and pointer-crash
  * healing (the shared snapshot-commit discipline).
  */
class ChatStreamSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def turnsDf(rows: (Long, Long, String, String)*): DataFrame =
    rows.toDF("conv_id", "turn_idx", "role", "content")

  private val allTurns = Seq(
    (1L, 0L, "user", "q one"), (1L, 1L, "assistant", "a one"),
    (1L, 2L, "user", "q two"), (1L, 3L, "assistant", "a two"),
    (2L, 0L, "user", "hello"), (2L, 1L, "assistant", "world"),
    (3L, 0L, "system", "be brief"), (3L, 1L, "user", "x"),
    (3L, 2L, "assistant", "y"))

  private def expected: Seq[(Long, String, Long)] =
    Chat.renderChat(turnsDf(allTurns: _*))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  private def snapshot(dir: String): Seq[(Long, String, Long)] =
    EventStream.readChatRendered(spark, dir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  test("cross-batch assembly converges to the one-shot batch render") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_stream").toString
    // split BY TURN INDEX: every conversation spans multiple batches,
    // and conv 1's later turns land in an EARLIER batch than its
    // opening turn would suggest (out-of-order across batches)
    (0 until 3).foreach { k =>
      EventStream.chatRenderSink(dir)(
        turnsDf(allTurns.filter(_._2 % 3 == k): _*), k.toLong)
    }
    assert(snapshot(dir) == expected)
  }

  test("live foreachBatch stream converges and restarts clean") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_stream_live").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_chat_stream_ckpt").toString
    implicit val sql2 = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, String)]
    val query = mem.toDF()
      .toDF("conv_id", "turn_idx", "role", "content")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(EventStream.chatRenderSink(dir) _)
      .start()
    try {
      (0 until 3).foreach { k =>
        mem.addData(allTurns.filter(_._2 % 3 == k))
        query.processAllAvailable()
      }
      assert(snapshot(dir) == expected)
    } finally query.stop()
  }

  test("re-delivered batch is a no-op even with different payload") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_replay").toString
    EventStream.chatRenderSink(dir)(turnsDf(allTurns: _*), 0L)
    val before = snapshot(dir)
    EventStream.chatRenderSink(dir)(
      turnsDf((9L, 0L, "user", "poison")), 0L)
    assert(snapshot(dir) == before, "replayed batch must not refold")
  }

  test("untouched buckets carry forward; batch dir holds only its " +
      "touched buckets") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_buckets").toString
    EventStream.chatRenderSink(dir, nBuckets = 4)(
      turnsDf(allTurns: _*), 0L)
    val conv2Before = snapshot(dir).filter(_._1 == 2L)
    // batch 1 extends ONLY conversation 1 (bucket 1)
    EventStream.chatRenderSink(dir, nBuckets = 4)(
      turnsDf((1L, 4L, "user", "more")), 1L)
    val after = snapshot(dir)
    assert(after.filter(_._1 == 2L) == conv2Before,
      "conversation in an untouched bucket changed")
    assert(after.find(_._1 == 1L).get._2.endsWith(
      "<|user|>\nmore<|end|>\n"))
    val b1 = new java.io.File(s"$dir/turns/batch_1")
      .listFiles().map(_.getName).filter(_.startsWith("bucket="))
    assert(b1.toSeq == Seq("bucket=1"),
      s"batch dir should hold only touched buckets, got ${b1.toSeq}")
  }

  test("empty batch advances the pointer and keeps the snapshot") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_empty").toString
    EventStream.chatRenderSink(dir)(turnsDf(allTurns: _*), 0L)
    val before = snapshot(dir)
    EventStream.chatRenderSink(dir)(turnsDf(), 1L)
    assert(snapshot(dir) == before)
    assert(new java.io.File(s"$dir/snapshot_v1").exists(),
      "empty batch must still commit a snapshot version")
    // and the NEXT batch folds normally against it
    EventStream.chatRenderSink(dir)(
      turnsDf((2L, 2L, "user", "again")), 2L)
    assert(snapshot(dir).find(_._1 == 2L).get._2.endsWith(
      "<|user|>\nagain<|end|>\n"))
  }

  test("turn-dir fold: bounded listing, byte-identical converged " +
      "snapshot, folded dirs swept") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_fold").toString
    // one turn per batch -> 9 batches; maxTurnDirs = 3 forces folds
    allTurns.zipWithIndex.foreach { case (t, i) =>
      EventStream.chatRenderSink(dir, nBuckets = 4, maxTurnDirs = 3)(
        turnsDf(t), i.toLong)
    }
    assert(snapshot(dir) == expected)
    val turnDirs = new java.io.File(s"$dir/turns")
      .listFiles().map(_.getName).toSeq
    assert(turnDirs.size <= 3,
      s"fold must bound the turn-dir listing, got $turnDirs")
    assert(turnDirs.exists(_.startsWith("fold_")),
      s"expected a fold dir in $turnDirs")
  }

  test("legacy store without dir sidecars self-upgrades") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_legacy").toString
    EventStream.chatRenderSink(dir)(
      turnsDf(allTurns.filter(_._2 == 0L): _*), 0L)
    EventStream.chatRenderSink(dir)(
      turnsDf(allTurns.filter(_._2 == 1L): _*), 1L)
    // simulate a store written before the sidecar existed
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("turn_dirs_v"))
      .foreach(f => assert(f.delete()))
    EventStream.chatRenderSink(dir)(
      turnsDf(allTurns.filter(_._2 >= 2L): _*), 2L)
    assert(snapshot(dir) == expected)
    assert(new java.io.File(s"$dir/turn_dirs_v2").exists(),
      "next batch must re-establish the sidecar")
  }

  test("unreferenced orphan turn dirs are swept, never read") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_orphan").toString
    EventStream.chatRenderSink(dir)(
      turnsDf(allTurns.filterNot(_._1 == 2L): _*), 0L)
    // plant an orphan holding POISON rows for conv 2 — a listing-based
    // reader would fold it in; the sidecar-based reader must not
    turnsDf((2L, 0L, "user", "poison"))
      .withColumn("bucket", org.apache.spark.sql.functions
        .pmod(org.apache.spark.sql.functions.col("conv_id"),
          org.apache.spark.sql.functions.lit(16)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/turns/batch_99x")
    EventStream.chatRenderSink(dir)(
      turnsDf(allTurns.filter(_._1 == 2L): _*), 1L)
    assert(snapshot(dir) == expected,
      "orphan dir leaked into the history read")
    assert(!new java.io.File(s"$dir/turns/batch_99x").exists(),
      "orphan dir must be swept after the commit")
  }

  test("heals an interrupted pointer commit") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chat_crash").toString
    EventStream.chatRenderSink(dir)(turnsDf(allTurns: _*), 0L)
    EventStream.chatRenderSink(dir)(
      turnsDf((2L, 2L, "user", "late")), 1L)
    val d = new java.io.File(dir)
    val ptr = new java.io.File(d, "_current")
    assert(ptr.renameTo(new java.io.File(d, "._current_1.tmp")))
    assert(snapshot(dir).find(_._1 == 2L).get._2.endsWith(
      "<|user|>\nlate<|end|>\n"))
    assert(ptr.exists(), "recovery must reinstate the pointer")
  }
}
