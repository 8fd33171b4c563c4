package graft.streaming

import graft.WithSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventStreamSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("hourlyStats in batch: window, count, rounded sum") {
    val events = Seq(
      (ts(5), "view", 10.0), (ts(30), "view", 2.5),
      (ts(45), "purchase", 99.99),
      (Timestamp.valueOf("2026-01-01 11:10:00"), "view", 1.0))
      .toDF("ts", "event_type", "value")
    val got = EventStream.hourlyStats(events)
      .orderBy("hour_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (Timestamp.valueOf("2026-01-01 10:00:00"), "purchase", 1L, 99.99),
      (Timestamp.valueOf("2026-01-01 10:00:00"), "view", 2L, 12.5),
      (Timestamp.valueOf("2026-01-01 11:00:00"), "view", 1L, 1.0)))
  }

  test("hourlyStats over a stream with watermark drops late data") {
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val stats = EventStream.hourlyStats(
      input.toDF().toDF("ts", "event_type", "value")
        .withWatermark("ts", "30 minutes"))
    val query = stats.writeStream
      .format("memory").queryName("hourly")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData((ts(5), "view", 1.0), (ts(50), "view", 2.0))
      query.processAllAvailable()
      // watermark now 10:20 — an event at 10:59 is on time…
      input.addData((ts(59), "view", 4.0))
      query.processAllAvailable()
      // …then events far ahead advance the watermark past 10:xx
      input.addData((Timestamp.valueOf("2026-01-01 13:00:00"), "view", 8.0))
      query.processAllAvailable()
      // late event in the closed 10:00 window must be dropped
      input.addData((ts(10), "view", 100.0))
      query.processAllAvailable()
      val rows = spark.table("hourly")
        .groupBy("hour_start", "event_type")
        .agg(max("n_events").as("n"), max("sum_value").as("s"))
        .filter(col("hour_start") === ts(0).toString.replace(".0", ""))
        .as[(Timestamp, String, Long, Double)].collect()
      assert(rows.length == 1)
      assert(rows(0)._3 == 3L)          // 3 on-time events
      assert(rows(0)._4 == 7.0)         // late 100.0 excluded
    } finally query.stop()
  }

  test("slidingStats lands each event in exactly length/slide windows") {
    val df = Seq(
      (ts(0), "click", 1.0), (ts(7), "click", 2.0), (ts(23), "view", 3.0))
      .toDF("ts", "event_type", "value")
    val got = EventStream.slidingStats(df) // 10 min windows, 5 min slide
    assert(got.agg(sum(col("n_events"))).head().getLong(0) == 6L)
    // the 10:00 click is in [09:55,10:05) and [10:00,10:10)
    val starts = got.filter(col("event_type") === "click")
      .select(col("win_start").cast("string")).as[String].collect().toSet
    assert(starts == Set("2026-01-01 09:55:00", "2026-01-01 10:00:00",
      "2026-01-01 10:05:00"))
  }

  test("dedupWithinWatermark keeps first arrival per key") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val deduped = EventStream.dedupWithinWatermark(
      input.toDF().toDF("doc_id", "ts", "payload")
        .withWatermark("ts", "10 minutes"),
      Seq("doc_id"))
    val query = deduped.writeStream
      .format("memory").queryName("dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, ts(0), "first"), (2L, ts(1), "other"))
      query.processAllAvailable()
      input.addData((1L, ts(2), "dup-within-watermark"))
      query.processAllAvailable()
      val got = spark.table("dedup")
        .select("doc_id", "payload").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "first"), (2L, "other")))
    } finally query.stop()
  }

  test("sessionStats: exact-gap boundary extends; beyond it splits") {
    import org.apache.spark.sql.functions.col
    val events = Seq(
      (1L, Timestamp.valueOf("2026-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2026-01-01 10:20:00")), // < 30m: extends
      (1L, Timestamp.valueOf("2026-01-01 10:50:00")), // == 30m: extends
      (1L, Timestamp.valueOf("2026-01-01 11:21:00")), // > 30m: NEW session
      (2L, Timestamp.valueOf("2026-01-01 09:00:00")))
      .toDF("user_id", "ts")
    val got = EventStream.sessionStats(events, "30 minutes")
      .orderBy("user_id", "session_start")
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (1L, 1L), (2L, 1L)))
  }

  test("intervalJoin runs as a bounded stream-stream join") {
    import org.apache.spark.sql.functions.col
    val leftIn = MemoryStream[(Long, Timestamp)](spark)
    val rightIn = MemoryStream[(Long, Timestamp, Double)](spark)
    val purchases = leftIn.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
    val clicks = rightIn.toDF().toDF("user_id", "click_ts", "value")
      .withWatermark("click_ts", "0 seconds")
    val joined = EventStream.intervalJoin(
      purchases, clicks, "user_id", "ts", "click_ts", "10 MINUTES")
    val query = joined.writeStream
      .format("memory").queryName("interval_join")
      .outputMode(OutputMode.Append())
      .start()
    try {
      rightIn.addData((1L, ts(0), 5.0), (1L, ts(30), 7.0)) // 30m earlier
      leftIn.addData((1L, ts(5)))  // within 10m of the first click only
      query.processAllAvailable()
      val got = spark.table("interval_join")
        .select(col("user_id"), col("value"))
        .as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 5.0)))
    } finally query.stop()
  }

  test("intervalJoinOuter emits the unmatched-left null row once the " +
      "watermark passes its window") {
    import org.apache.spark.sql.functions.col
    val leftIn = MemoryStream[(Long, Timestamp)](spark)
    val rightIn = MemoryStream[(Long, Timestamp, Double)](spark)
    val purchases = leftIn.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
    val clicks = rightIn.toDF().toDF("user_id", "click_ts", "value")
      .withWatermark("click_ts", "0 seconds")
    val joined = EventStream.intervalJoinOuter(
      purchases, clicks, "user_id", "ts", "click_ts", "10 MINUTES")
    val query = joined.writeStream
      .format("memory").queryName("interval_join_outer")
      .outputMode(OutputMode.Append())
      .start()
    try {
      rightIn.addData((1L, ts(0), 5.0))
      leftIn.addData((1L, ts(5)), (2L, ts(5))) // user 2: no click ever
      query.processAllAvailable()
      // advance BOTH watermarks past user 2's window so the engine can
      // prove no match is still possible and release the null row
      rightIn.addData((9L, ts(120), 0.0))
      leftIn.addData((9L, ts(120)))
      query.processAllAvailable()
      val got = spark.table("interval_join_outer")
        .select(col("user_id"), col("value"))
        .as[(Long, Option[Double])].collect().toSet
      assert(got.contains((1L, Some(5.0))), "matched pair missing")
      assert(got.contains((2L, None)),
        "unmatched left's null row never emitted")
    } finally query.stop()
  }

  test("enrichWithDim broadcast-joins a static dim into each batch") {
    import org.apache.spark.sql.functions.col
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("cust_id", "segment")
    val input = MemoryStream[(Long, Double)](spark)
    val enriched = EventStream.enrichWithDim(
      input.toDF().toDF("user_id", "value"), dim, "user_id", "cust_id")
    val query = enriched.writeStream
      .format("memory").queryName("enriched")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, 5.0), (3L, 7.0)) // 3 has no dim row
      query.processAllAvailable()
      val got = spark.table("enriched")
        .select(col("user_id"), col("segment"))
        .as[(Long, Option[String])].collect().toSet
      assert(got == Set((1L, Some("GOLD")), (3L, None))) // left join
    } finally query.stop()
  }

  test("filterKnown anti-joins a static corpus statelessly") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq("fp1", "fp2").toDF("fp")
    val input = MemoryStream[(String, Long)](spark)
    val fresh = EventStream.filterKnown(
      input.toDF().toDF("fp", "doc_id"), corpus, "fp")
    val query = fresh.writeStream
      .format("memory").queryName("fresh_docs")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(("fp1", 10L), ("fp9", 11L)) // fp1 known, fp9 new
      query.processAllAvailable()
      val got = spark.table("fresh_docs")
        .select(col("doc_id")).as[Long].collect().toSet
      assert(got == Set(11L))
    } finally query.stop()
  }

  test("filterNearKnown drops within-hamming arrivals, keeps novel ones") {
    import org.apache.spark.sql.functions.col
    val base = 0x0123456789abcdefL
    val corpus = Seq(base).toDF("h")
    // 2 bits flipped: near-dup (<= 3); 20 bits flipped: novel
    val near = base ^ 0x3L
    val far = base ^ 0x000fffff00000000L
    val input = MemoryStream[(Long, Long)](spark)
    // the gate's anti-join right side derives from the batch, which
    // the continuous planner rejects — foreachBatch is the contract
    val survived = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val query = input.toDF().toDF("h", "doc_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        EventStream.filterNearKnown(batch, corpus, "h",
            maxHamming = 3, bands = 4)
          .select(col("doc_id")).as[Long].collect()
          .foreach(survived.add)
        ()
      }
      .start()
    try {
      input.addData((base, 1L), (near, 2L), (far, 3L))
      query.processAllAvailable()
      assert(survived.size == 1 && survived.contains(3L))
    } finally query.stop()
  }

  test("filterNearKnown batch face equals brute-force hamming gate") {
    val rnd = new scala.util.Random(21)
    val corpus = Seq.fill(40)(rnd.nextLong())
    val batch = corpus.take(10).map(_ ^ 0x5L) ++ // 2-bit edits: near
      Seq.fill(30)(rnd.nextLong())               // random: mostly novel
    val got = EventStream.filterNearKnown(
        batch.zipWithIndex.map { case (h, i) => (h, i.toLong) }
          .toDF("h", "id"),
        corpus.toDF("h"), "h", maxHamming = 3, bands = 4)
      .select("id").as[Long].collect().toSet
    val expect = batch.zipWithIndex.collect { case (h, i)
      if !corpus.exists(c => java.lang.Long.bitCount(c ^ h) <= 3) =>
        i.toLong
    }.toSet
    assert(got == expect)
  }

  test("deterministic hash sampling runs unchanged behind readStream " +
      "(map-side filter, no state) and matches the batch sample") {
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[Long](spark)
    val sampled = graft.ops.Sampling.sampleByHash(
      input.toDF().toDF("id"), col("id"), 0.3, salt = "st")
    val query = sampled.writeStream
      .format("memory").queryName("stream_sample")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(1L to 200L: _*)
      query.processAllAvailable()
      val got = spark.table("stream_sample")
        .select(col("id")).as[Long].collect().toSet
      val batch = graft.ops.Sampling.sampleByHash(
          (1L to 200L).toDF("id"), col("id"), 0.3, salt = "st")
        .select("id").as[Long].collect().toSet
      assert(got == batch, "stream sample diverged from batch sample")
      assert(got.nonEmpty && got.size < 200)
    } finally query.stop()
  }

  test("Drift.psiBinned gates micro-batches against a static reference " +
      "and matches the batch-mode score") {
    import org.apache.spark.sql.functions.{col, sum}
    // the ingest drift gate: each arriving batch is PSI-scored against
    // the corpus reference inside foreachBatch (psiBinned's full-outer
    // join + one-row carrier derive from the batch, so foreachBatch is
    // the contract, as for the near-dup gate above)
    val ref = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("bin")
    def score(df: org.apache.spark.sql.DataFrame): Double =
      graft.ops.Drift.psiBinned(ref, df, "bin")
        .agg(sum(col("psi_term").cast("decimal(38,9)")).cast("double"))
        .as[Double].first()
    val input = MemoryStream[String](spark)
    val scores = new java.util.concurrent.ConcurrentHashMap[Long, Double]()
    val query = input.toDF().toDF("bin").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        scores.put(id, score(batch)); ()
      }
      .start()
    try {
      input.addData(Seq.fill(30)("a") ++ Seq.fill(70)("b"): _*)
      query.processAllAvailable()
      input.addData(Seq.fill(50)("a") ++ Seq.fill(50)("b"): _*)
      query.processAllAvailable()
      // a shifted batch scores positive; a matching batch scores zero
      assert(scores.get(0L) > 0.0)
      assert(scores.get(1L) == 0.0)
      // stream == batch: the gate behind readStream IS the batch op
      val batchPsi = score((Seq.fill(30)("a") ++ Seq.fill(70)("b")).toDF("bin"))
      assert(scores.get(0L) == batchPsi,
        "streaming PSI diverged from the batch-mode score")
    } finally query.stop()
  }

  test("idempotentParquetSink: re-delivered batches replace, not duplicate") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files
      .createTempDirectory("graft_sink").toString
    val input = MemoryStream[Long](spark)
    val query = input.toDF().toDF("v").writeStream
      .foreachBatch(EventStream.idempotentParquetSink(out) _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(1L, 2L); query.processAllAvailable()
      input.addData(3L); query.processAllAvailable()
      val first = spark.read.parquet(out)
        .select(col("v")).as[Long].collect().sorted.toSeq
      assert(first == Seq(1L, 2L, 3L))
      // simulate failure re-delivery of batch 1 with the same payload
      EventStream.idempotentParquetSink(out)(
        Seq(3L).toDF("v"), batchId = 1L)
      val after = spark.read.parquet(out)
        .select(col("v")).as[Long].collect().sorted.toSeq
      assert(after == Seq(1L, 2L, 3L), "re-delivery must not duplicate")
    } finally query.stop()
  }

  test("nearDupIngestSink: in-batch and cross-batch collisions drop, " +
    "novel docs accrete, re-delivered batches are idempotent") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ndingest").toString
    def doc(id: Long, words: String*) = (id, words)
    def df(rows: (Long, Seq[String])*) = rows.toDF("doc_id", "sh")
    val sink = EventStream.nearDupIngestSink(dir, "doc_id", "sh") _
    // batch 0: doc 3 duplicates doc 1 (identical shingles) -> in-batch
    // drop keeps the smaller id
    sink(df(
      doc(1L, "alpha beta", "beta gamma"),
      doc(2L, "delta epsilon", "epsilon zeta"),
      doc(3L, "alpha beta", "beta gamma")), 0L)
    def accepted(): Seq[Long] = EventStream.readAccepted(spark, dir)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(accepted() == Seq(1L, 2L))
    // batch 1: doc 4 duplicates accepted doc 2 -> cross-batch drop;
    // doc 5 is novel -> kept
    val b1 = df(
      doc(4L, "delta epsilon", "epsilon zeta"),
      doc(5L, "eta theta", "theta iota"))
    sink(b1, 1L)
    assert(accepted() == Seq(1L, 2L, 5L))
    // failure re-delivery of batch 1 with the same payload: the state
    // read must exclude the replayed batch's own partial output, so
    // doc 5 is NOT self-rejected and the state is unchanged
    sink(b1, 1L)
    assert(accepted() == Seq(1L, 2L, 5L), "replay must be idempotent")
    // batch 2 still screens against everything accepted so far
    sink(df(doc(6L, "eta theta", "theta iota"),
      doc(7L, "kappa lambda", "lambda mu")), 2L)
    assert(accepted() == Seq(1L, 2L, 5L, 7L))
  }

  test("nearDupIngestSink behind a MemoryStream accretes exactly the " +
    "batch-face state") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ndingest_s").toString
    val input = MemoryStream[(Long, Seq[String])](spark)
    val query = input.toDS().toDF("doc_id", "sh").writeStream
      .foreachBatch(EventStream.nearDupIngestSink(dir, "doc_id", "sh") _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, Seq("a b", "b c")), (2L, Seq("d e", "e f")))
      query.processAllAvailable()
      input.addData((3L, Seq("a b", "b c")), (4L, Seq("g h", "h i")))
      query.processAllAvailable()
      val got = EventStream.readAccepted(spark, dir)
        .select(col("doc_id")).as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 4L))
    } finally query.stop()
  }

  test("tokenQuotaFilter (transformWithState / RocksDB): per-source " +
    "budget enforced ACROSS micro-batches, greedy by doc id") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws").toString
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Long, Long)](spark)
      val query = EventStream.tokenQuotaFilter(input.toDS(), budget = 10L)
        .toDF("source", "doc_id").writeStream
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("quota_out")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(("a", 1L, 4L), ("a", 2L, 4L), ("a", 3L, 4L),
          ("b", 10L, 9L))
        query.processAllAvailable()
        input.addData(("a", 4L, 2L), ("a", 5L, 1L), ("b", 11L, 2L))
        query.processAllAvailable()
        val got = spark.table("quota_out")
          .as[(String, Long)].collect().toSet
        // a: 4+4 accepted, third 4 would hit 12 > 10; next batch the
        // 2-token doc still fits (10), the 1-token one no longer does.
        // b: 9 accepted; the later 2 would cross.
        assert(got == Set(("a", 1L), ("a", 2L), ("a", 4L), ("b", 10L)))
      } finally query.stop()
    } finally spark.conf.unset(
      "spark.sql.streaming.stateStore.providerClass")
  }

  test("upsertSink folds a changelog stream into a keyed snapshot") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_upsert").toString
    val input = MemoryStream[(Long, String)](spark)
    val query = input.toDF().toDF("k", "v").writeStream
      .foreachBatch(EventStream.upsertSink(out, Seq("k")) _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, "a"), (2L, "b")); query.processAllAvailable()
      input.addData((2L, "B"), (3L, "c")); query.processAllAvailable()
      val snap = EventStream.readSnapshot(spark, out)
        .as[(Long, String)].collect().sorted.toSeq
      assert(snap == Seq((1L, "a"), (2L, "B"), (3L, "c")))
      // re-delivery of an already-folded batch is a no-op, even with a
      // DIFFERENT payload (the engine replays the same data; the guard
      // is the batch id)
      EventStream.upsertSink(out, Seq("k"))(
        Seq((9L, "z")).toDF("k", "v"), batchId = 0L)
      val after = EventStream.readSnapshot(spark, out)
        .as[(Long, String)].collect().sorted.toSeq
      assert(after == snap, "replayed batch must not refold")
    } finally query.stop()
  }

  test("upsertSink heals an interrupted pointer commit") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_upsert2").toString
    EventStream.upsertSink(out, Seq("k"))(Seq((1L, "a")).toDF("k", "v"), 0L)
    EventStream.upsertSink(out, Seq("k"))(Seq((1L, "A")).toDF("k", "v"), 1L)
    // simulate a crash between pointer-delete and rename: pointer gone,
    // the committed tmp is the durable copy
    val dir = new java.io.File(out)
    val ptr = new java.io.File(dir, "_current")
    val tmp = new java.io.File(dir, "._current_1.tmp")
    assert(ptr.renameTo(tmp))
    val snap = EventStream.readSnapshot(spark, out)
      .as[(Long, String)].collect().toSeq
    assert(snap == Seq((1L, "A")))
    assert(ptr.exists(), "recovery must reinstate the pointer")
  }

  test("recovery never promotes a truncated pointer tmp") {
    // a crash between fs.create(tmp) and a durable writeLong leaves a
    // short file; promoting it would poison every later read with
    // EOFException — recovery must delete it and fall back
    val out = java.nio.file.Files
      .createTempDirectory("graft_upsert3").toString
    EventStream.upsertSink(out, Seq("k"))(Seq((1L, "a")).toDF("k", "v"), 0L)
    val dir = new java.io.File(out)
    val ptr = new java.io.File(dir, "_current")
    // simulate the interrupted NEXT commit: pointer cleared, tmp short
    assert(ptr.delete())
    val bad = new java.io.File(dir, "._current_1.tmp")
    java.nio.file.Files.write(bad.toPath, Array[Byte](0, 0, 1))
    val ex = intercept[java.io.FileNotFoundException](
      EventStream.readSnapshot(spark, out))
    assert(ex.getMessage.contains("no upsert snapshot"))
    assert(!bad.exists(), "truncated tmp must be swept, not promoted")
    // the batch re-delivers (its pointer never committed) and the sink
    // recovers end to end
    EventStream.upsertSink(out, Seq("k"))(Seq((1L, "A")).toDF("k", "v"), 1L)
    assert(EventStream.readSnapshot(spark, out)
      .as[(Long, String)].collect().toSeq == Seq((1L, "A")))
  }

  test("recovery with a complete AND a truncated tmp promotes the complete one") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_upsert4").toString
    EventStream.upsertSink(out, Seq("k"))(Seq((1L, "a")).toDF("k", "v"), 0L)
    val dir = new java.io.File(out)
    val ptr = new java.io.File(dir, "_current")
    val good = new java.io.File(dir, "._current_0.tmp")
    assert(ptr.renameTo(good)) // crash mid-commit of batch 0
    // plus a NEWER truncated tmp from a second crash
    val bad = new java.io.File(dir, "._current_1.tmp")
    java.nio.file.Files.write(bad.toPath, Array[Byte](7))
    val snap = EventStream.readSnapshot(spark, out)
      .as[(Long, String)].collect().toSeq
    assert(snap == Seq((1L, "a")))
    assert(ptr.exists() && !bad.exists())
  }

  test("bloom novelty gate filters a stream map-side (no per-batch corpus join)") {
    import graft.ops.Bloom
    val corpus = (0 until 100).map(i => s"fp_$i").toDF("fp")
    val bloom = Bloom.build(corpus, col("fp"), mBits = 8192, k = 4)
    val input = MemoryStream[(String, Long)](spark)
    val fresh = Bloom.filterNovel(
      input.toDF().toDF("fp", "doc_id"), bloom, col("fp"))
    val query = fresh.writeStream
      .format("memory").queryName("bloom_fresh")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(("fp_1", 10L), ("fp_99", 11L), ("novel_a", 12L))
      query.processAllAvailable()
      input.addData(("fp_50", 13L), ("novel_b", 14L))
      query.processAllAvailable()
      val got = spark.table("bloom_fresh")
        .select(col("doc_id")).as[Long].collect().toSet
      assert(!got.contains(10L) && !got.contains(11L) && !got.contains(13L),
        "known fingerprints must never pass") // the one-sided guarantee
      assert(got.contains(12L) && got.contains(14L))
    } finally query.stop()
  }

  test("checkpointed restart replays the uncommitted batch without duplicates") {
    // end-to-end exactly-once: file source + checkpoint + idempotent
    // sink. The crash is simulated faithfully: after the first run we
    // delete the checkpoint's last commit marker — exactly the state a
    // query killed between sink write and commit leaves behind — so the
    // restarted query re-executes that batch through the sink for real.
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft_restart")
    val in = Files.createDirectory(base.resolve("in")).toString
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString

    def startQuery() = spark.readStream
      .schema("v long")
      .json(in)
      .writeStream
      .foreachBatch(EventStream.idempotentParquetSink(out) _)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    Files.writeString(Paths.get(in, "a.json"), "{\"v\":1}\n{\"v\":2}\n")
    val q1 = startQuery()
    try q1.processAllAvailable() finally { q1.stop(); q1.awaitTermination() }
    assert(spark.read.parquet(out).select(col("v"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // crash point: the LATEST batch reached the sink but its commit
    // marker is gone (a no-data batch may have run after batch 0, so
    // target the highest id — deleting an interior marker would leave
    // a hole the commit log rejects as concurrent modification)
    val commits = Paths.get(ckpt, "commits")
    val latest = Files.list(commits).toArray.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    assert(Files.deleteIfExists(commits.resolve(latest.toString)))
    // the local ChecksumFileSystem keeps a .N.crc sibling; a stale one
    // makes the replayed commit write fail as already-existing
    Files.deleteIfExists(commits.resolve(s".$latest.crc"))
    Files.writeString(Paths.get(in, "b.json"), "{\"v\":3}\n")

    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
      .select(col("v")).as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L),
      "replayed batch must replace its own output, new batch appended once")
  }

  test("compactBatches folds old batch dirs; the live head keeps replaying") {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("graft_compact").toString
    val sink = EventStream.idempotentParquetSink(out) _
    sink(Seq(1L, 2L).toDF("v"), 0L)
    sink(Seq(3L).toDF("v"), 1L)
    sink(Seq(4L).toDF("v"), 2L)
    sink(Seq(5L).toDF("v"), 3L) // live head — must not be folded

    graft.sources.Sinks.compactBatches(spark, out, upTo = 2L)

    val dirs = Files.list(Paths.get(out)).toArray.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(dirs == Seq("batch_id=2", "batch_id=3"))
    // data preserved, one file in the folded partition
    assert(spark.read.parquet(out).select(col("v"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val foldedFiles = Files.list(Paths.get(out, "batch_id=2")).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(foldedFiles == 1, "folded partition should be one compact file")
    // the live head still replays idempotently after compaction
    sink(Seq(5L).toDF("v"), 3L)
    assert(spark.read.parquet(out).select(col("v"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("compactBatches re-run resumes a crashed swap without losing rows") {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("graft_compact_crash").toString
    val sink = EventStream.idempotentParquetSink(out) _
    sink(Seq(1L, 2L).toDF("v"), 0L)
    sink(Seq(3L).toDF("v"), 1L)
    // simulate a crash mid-swap: the temp fold is committed and one of
    // the two source dirs is already gone
    Seq(1L, 2L, 3L).toDF("v").coalesce(1)
      .write.parquet(s"$out/.compact_tmp_1")
    Files.walk(Paths.get(s"$out/batch_id=0"))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.delete(p))
    // the re-run must NOT rebuild the fold from the surviving dir only
    graft.sources.Sinks.compactBatches(spark, out, upTo = 1L)
    assert(spark.read.parquet(out).select(col("v"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "rows from the already-deleted batch dir were lost")
    val dirs = Files.list(Paths.get(out)).toArray.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(dirs == Seq("batch_id=1"))
  }

  test("sessionStats runs behind readStream with a watermark") {
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(Long, Timestamp)](spark)
    val events = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
    val query = EventStream.sessionStats(events, "10 minutes")
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(1)))
      query.processAllAvailable()
      // watermark far past both sessions' ends closes them
      input.addData((3L, Timestamp.valueOf("2026-01-01 12:00:00")))
      query.processAllAvailable()
      val got = spark.table("native_sessions")
        .select(col("user_id"), col("n_events"))
        .as[(Long, Long)].collect().toMap
      assert(got.get(1L).contains(2L)) // one merged session, two events
      assert(got.get(2L).contains(1L))
    } finally query.stop()
  }

  test("slidingStats runs behind readStream with a watermark") {
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val events = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "0 seconds")
    val query = EventStream.slidingStats(events)
      .writeStream.format("memory").queryName("sliding_stats")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((ts(0), "click", 1.0))
      query.processAllAvailable()
      // watermark far past the windows' ends emits them
      input.addData((Timestamp.valueOf("2026-01-01 12:00:00"), "x", 0.0))
      query.processAllAvailable()
      val got = spark.table("sliding_stats")
        .filter(col("event_type") === "click")
        .select(col("win_start").cast("string"))
        .as[String].collect().toSet
      assert(got == Set("2026-01-01 09:55:00", "2026-01-01 10:00:00"))
    } finally query.stop()
  }

  test("cmsSink folds batch sketches; re-delivered batches never " +
      "double-count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val sink = EventStream.cmsSink(dir, "w") _
    val b0 = Seq("x", "x", "y").toDF("w")
    val b1 = Seq("x", "z").toDF("w")
    sink(b0, 0L)
    sink(b1, 1L)
    sink(b1, 1L) // restart replay of the last uncommitted batch
    sink(b0, 0L) // stale replay far behind the head
    val (last, sketch) = EventStream.readCmsState(spark, dir)
    assert(last == 1L)
    val est = graft.ops.Profile.estimateHot(
        Seq("x", "y", "z").toDF("w"), "w", sketch, 1L)
      .as[(String, Long)].collect().toMap
    assert(est == Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
  }

  test("cmsSink survives a crash between state delete and rename " +
      "(recovery completes the interrupted commit)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-r").toString
    val sink = EventStream.cmsSink(dir, "w") _
    sink(Seq("x", "x").toDF("w"), 0L)
    sink(Seq("y").toDF("w"), 1L)
    // simulate the crash window: the commit deleted the old state and
    // died before renaming the (fully written) tmp into place
    val state = new java.io.File(dir, "cms_state.bin")
    val tmp = new java.io.File(dir, ".cms_state_1.tmp")
    assert(state.renameTo(tmp))
    // next fold must recover batches 0-1 from the tmp, not restart
    sink(Seq("x", "z").toDF("w"), 2L)
    val (last, sketch) = EventStream.readCmsState(spark, dir)
    assert(last == 2L)
    val est = graft.ops.Profile.estimateHot(
        Seq("x", "y", "z").toDF("w"), "w", sketch, 1L)
      .as[(String, Long)].collect().toMap
    assert(est == Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
  }

  test("cmsSink behind a real foreachBatch stream tracks exact counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-s").toString
    val input = MemoryStream[String](spark)
    val query = input.toDF().toDF("w").writeStream
      .foreachBatch(EventStream.cmsSink(dir, "w") _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData("a", "b", "a")
      query.processAllAvailable()
      input.addData("b", "c")
      query.processAllAvailable()
      val (_, sketch) = EventStream.readCmsState(spark, dir)
      val est = graft.ops.Profile.estimateHot(
          Seq("a", "b", "c").toDF("w"), "w", sketch, 1L)
        .as[(String, Long)].collect().toMap
      assert(est == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    } finally query.stop()
  }

  test("sessionize closes sessions after the event-time gap") {
    val input = MemoryStream[(Long, Timestamp)](spark)
    val events = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp)]
    val sessions = EventStream.sessionize(events, gapMs = 10 * 60 * 1000)
    val query = sessions.writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(1)))
      query.processAllAvailable()
      // jump far forward: watermark passes both users' timeouts
      input.addData((3L, Timestamp.valueOf("2026-01-01 12:00:00")))
      query.processAllAvailable()
      input.addData((3L, Timestamp.valueOf("2026-01-01 14:00:00")))
      query.processAllAvailable()
      val got = spark.table("sessions")
        .as[EventStream.Session].collect()
        .map(s => s.user_id -> s.n_events).toMap
      assert(got.get(1L).contains(2L)) // two events, one session
      assert(got.get(2L).contains(1L))
    } finally query.stop()
  }

  test("cusumSink: the carried-state closed form makes streamed CUSUM " +
      "identical to one batch CUSUM over the concatenated history; " +
      "replay is a no-op") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_cusum_sink").toString
    // two keys, values crafted so alarms fire only with carried state:
    // key p climbs +8 over drift each step across BOTH batches
    val rows = (1L to 20L).map(i => ("p", i, 18L)) ++
      (1L to 20L).map(i => ("q", i, if (i % 2 == 0) 25L else 0L))
    val (b0, b1) = rows.partition(_._2 <= 10)
    val input = MemoryStream[(String, Long, Long)](spark)
    val query = input.toDF().toDF("k", "i", "x").writeStream
      .foreachBatch(EventStream.cusumSink(
        out, "k", Seq("i"), col("x"), drift = 10L, threshold = 100L) _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(b0: _*); query.processAllAvailable()
      input.addData(b1: _*); query.processAllAvailable()
      val streamed = EventStream.readCusumScored(spark, out)
        .select("k", "i", "s_u", "alarm")
        .as[(String, Long, Long, Boolean)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val full = graft.ops.TimeSeries.cusum(
          rows.toDF("k", "i", "x"), "k", Seq(col("i")), col("x"),
          drift = 10L, threshold = 100L)
        .select("k", "i", "s_u", "alarm")
        .as[(String, Long, Long, Boolean)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(streamed == full,
        "streamed fold diverged from the batch closed form")
      // key p reaches S = 20*8 = 160 only because batch 2 RESUMED from
      // the carried 80 — without state the alarm would never fire
      assert(streamed(("p", 20L)) == ((160L, true)))
      // q oscillates 0/25 around drift 10: net +5 per pair, S_20 = 60
      assert(full(("q", 20L)) == ((60L, false))) // stays under threshold
      // re-delivery with different payload must not refold
      EventStream.cusumSink(out, "k", Seq("i"), col("x"), 10L, 100L)(
        Seq(("p", 99L, 1000L)).toDF("k", "i", "x"), batchId = 1L)
      assert(EventStream.readCusumScored(spark, out)
        .filter(col("i") === 99L).count() == 0,
        "replayed batch must not refold")
    } finally query.stop()
  }

  test("cusumSink wide key space: a corpus-keyed state takes the SHUFFLE " +
      "join path (gate declines the broadcast under a small threshold) " +
      "and the fold still equals the batch closed form") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_cusum_wide").toString
    // 3000 distinct keys — the per-user-keyed shape the gate exists for
    val rows = for (k <- 1 to 3000; i <- 1L to 6L)
      yield (s"u$k", i, (k % 7) * 5L)
    val (b0, b1) = rows.partition(_._2 <= 3)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try {
      EventStream.cusumSink(out, "k", Seq("i"), col("x"), 10L, 40L)(
        b0.toDF("k", "i", "x"), batchId = 0L)
      // batch 1 reads a >1 KiB snapshot: stateBytes*4 > 1024 → merge hint
      EventStream.cusumSink(out, "k", Seq("i"), col("x"), 10L, 40L)(
        b1.toDF("k", "i", "x"), batchId = 1L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val streamed = EventStream.readCusumScored(spark, out)
      .select("k", "i", "s_u", "alarm")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val full = graft.ops.TimeSeries.cusum(
        rows.toDF("k", "i", "x"), "k", Seq(col("i")), col("x"), 10L, 40L)
      .select("k", "i", "s_u", "alarm")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(streamed == full,
      "shuffle-path fold diverged from the batch closed form")
    // and the forced-override contract: Some(false) on a fresh dir
    // produces the same fold as the gated run
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_cusum_wide2").toString
    EventStream.cusumSink(out2, "k", Seq("i"), col("x"), 10L, 40L,
      broadcastState = Some(false))(b0.toDF("k", "i", "x"), 0L)
    EventStream.cusumSink(out2, "k", Seq("i"), col("x"), 10L, 40L,
      broadcastState = Some(false))(b1.toDF("k", "i", "x"), 1L)
    val forced = EventStream.readCusumScored(spark, out2)
      .select("k", "i", "s_u", "alarm")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(forced == full)
  }

  test("componentSink folds an edge stream into the SAME clustering a " +
      "full CC over the union would produce; replay is a no-op") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_cc_sink").toString
    val input = MemoryStream[(Long, Long)](spark)
    val query = input.toDF().toDF("a", "b").writeStream
      .foreachBatch(EventStream.componentSink(out) _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 0: two separate chains; batch 1: merge them + a new pair;
      // batch 2: an edge inside an existing component (no-op merge)
      input.addData((1L, 2L), (10L, 11L)); query.processAllAvailable()
      input.addData((2L, 10L), (20L, 21L)); query.processAllAvailable()
      input.addData((10L, 11L)); query.processAllAvailable()
      val snap = EventStream.readSnapshot(spark, out)
        .as[(Long, Long)].collect().toMap
      val full = graft.ops.Graph.connectedComponents(
          Seq((1L, 2L), (10L, 11L), (2L, 10L), (20L, 21L))
            .toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(snap == full, "streamed fold diverged from the full CC")
      assert(snap(11L) == 1L && snap(20L) == 20L)
      // re-delivery with a different payload must not refold
      EventStream.componentSink(out)(
        Seq((99L, 100L)).toDF("a", "b"), batchId = 1L)
      val after = EventStream.readSnapshot(spark, out)
        .as[(Long, Long)].collect().toMap
      assert(after == snap, "replayed batch must not refold")
    } finally query.stop()
  }

  test("componentStoreSink folds the same stream into a GraphStore: " +
      "labeling equals the full CC, merges never rewrite member rows, " +
      "replay and crash-window re-delivery are no-ops") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_cc_storesink").toString
    val input = MemoryStream[(Long, Long)](spark)
    val query = input.toDF().toDF("a", "b").writeStream
      .foreachBatch(EventStream.componentStoreSink(out) _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, 2L), (10L, 11L)); query.processAllAvailable()
      input.addData((2L, 10L), (20L, 21L)); query.processAllAvailable()
      input.addData((10L, 11L)); query.processAllAvailable()
      val got = graft.ops.GraphStore.read(spark, s"$out/store")
        .as[(Long, Long)].collect().toMap
      val full = graft.ops.Graph.connectedComponents(
          Seq((1L, 2L), (10L, 11L), (2L, 10L), (20L, 21L))
            .toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == full, "store fold diverged from the full CC")
      // the batch-1 merge of {10,11} into component 1 rode the rebase
      // table — the stored raw rows still carry the old label
      val raw = spark.read.parquet(s"$out/store/labels")
        .select(col("node"), col("component"))
        .as[(Long, Long)].collect().toMap
      assert(raw(10L) == 10L && raw(11L) == 10L,
        "streamed merge rewrote pass-through member rows")
      // pointer-gated replay with a different payload must not refold
      EventStream.componentStoreSink(out)(
        Seq((99L, 100L)).toDF("a", "b"), batchId = 1L)
      assert(graft.ops.GraphStore.read(spark, s"$out/store")
        .as[(Long, Long)].collect().toMap == got)
      // crash window: state mutated but pointer never committed —
      // re-delivering the SAME batch against already-applied state
      // converges (idempotent applyBatch) and then commits
      graft.ops.GraphStore.applyBatch(spark, s"$out/store",
        Seq((21L, 1L)).toDF("a", "b")) // the "crashed" attempt's work
      EventStream.componentStoreSink(out)(
        Seq((21L, 1L)).toDF("a", "b"), batchId = 3L)
      val healed = graft.ops.GraphStore.read(spark, s"$out/store")
        .as[(Long, Long)].collect().toMap
      assert(healed == full.keySet.map(_ -> 1L).toMap,
        s"all prior nodes should land in component 1: $healed")
    } finally query.stop()
  }

  test("componentStoreSink compacts when the rebase table outgrows its " +
      "threshold: exactly one compaction on a merge-heavy stream, read " +
      "view invariant across it") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_cc_storecompact").toString
    val input = MemoryStream[(Long, Long)](spark)
    val query = input.toDF().toDF("a", "b").writeStream
      .foreachBatch(
        EventStream.componentStoreSink(out, compactAtRebaseRows = 2L) _)
      .outputMode(OutputMode.Append())
      .start()
    try {
      def rebase() = graft.ops.GraphStore.rebaseSize(spark, s"$out/store")
      // batch 0 inits four 2-node components; each later batch merges
      // two PRIOR canonicals, so every batch grows the rebase table
      input.addData((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
      query.processAllAvailable()
      assert(rebase() == 0L)
      input.addData((2L, 4L)); query.processAllAvailable() // 3 -> 1
      assert(rebase() == 1L, "merge should ride the rebase table")
      input.addData((6L, 8L)); query.processAllAvailable() // 7 -> 5
      assert(rebase() == 2L, "at-threshold must NOT compact (policy is >)")
      val before = graft.ops.GraphStore.read(spark, s"$out/store")
        .as[(Long, Long)].collect().toMap
      input.addData((4L, 6L)); query.processAllAvailable() // 5 -> 1, n=3 > 2
      assert(rebase() == 0L,
        "crossing the threshold inside the sink must trigger compaction")
      val after = graft.ops.GraphStore.read(spark, s"$out/store")
        .as[(Long, Long)].collect().toMap
      assert(after == (1L to 8L).map(_ -> 1L).toMap,
        s"read view after compaction diverged: $after")
      assert(after.keySet == before.keySet,
        "compaction changed store membership")
      // compacted labels are fully resolved in the raw rows
      val raw = spark.read.parquet(s"$out/store/labels")
        .select(col("node"), col("component"))
        .as[(Long, Long)].collect().toMap
      assert(raw == after, "compaction left unresolved raw labels")
    } finally query.stop()
  }

  test("exportShardsSink format=json: gzip jsonl batch shards, " +
      "format-dispatched read and compaction, loud on a mid-stream " +
      "format switch") {
    import graft.sources.Export
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_sink_jsonl").toString
    def sink(fmt: String) = EventStream.exportShardsSink(out, 4,
      col("doc_id"), octet_length(col("text")), Seq("doc_id", "text"),
      compactAtDirs = 2, format = fmt) _
    val rows = (1L to 30L).map(i => (i, s"jl-$i"))
    rows.grouped(10).zipWithIndex.foreach { case (g, b) =>
      sink("json")(g.toDF("doc_id", "text"), b.toLong)
    }
    // batch files are gzip jsonl
    val files = new java.io.File(s"$out/data").listFiles()
      .flatMap(_.listFiles()).filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles()).map(_.getName)
      .filterNot(n => n.startsWith(".") || n == "_SUCCESS")
    assert(files.nonEmpty && files.forall(n =>
      n.contains(".json") && n.endsWith(".gz")),
      s"expected gzip jsonl shard files, got ${files.take(5).toSeq}")
    // compaction fired (threshold 2 over 3 batches) and the read view
    // is exactly the union of committed batches, through json reads
    val m = EventStream.readStreamShardManifest(spark, out)
    assert(m.select(col("format")).head().getString(0) == "json")
    assert(m.select(col("dirs")).head().getSeq[String](0)
      .exists(_.startsWith("compact_")))
    val back = EventStream.readStreamShards(spark, out)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
    // folded manifest equals the one-shot aggregates
    val want = Export.shardAggregates(
        rows.toDF("doc_id", "text")
          .withColumn("shard", Export.shardOf(col("doc_id"), 4)),
        octet_length(col("text")), Seq("doc_id", "text"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(m.select(col("shard"), col("n_rows"), col("bytes"),
        col("checksum"))
      .as[(Int, Long, Long, Long)].collect().toSet == want)
    // continuing the store under another format fails loudly
    val ex = intercept[IllegalArgumentException] {
      sink("parquet")(Seq((99L, "x")).toDF("doc_id", "text"), 3L)
    }
    assert(ex.getMessage.contains("written as json"))
  }

  test("exportShardsSink: a PRE-dirs-column store (older manifest " +
      "format) keeps folding, reading and compacting after the " +
      "upgrade — the dir list is derived from batch_ids") {
    import graft.sources.{Export, Versioned}
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_sink_migrate").toString
    def sink = EventStream.exportShardsSink(out, 4, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"),
      compactAtDirs = 2) _
    val a = (1L to 12L).map(i => (i, s"mig-$i"))
    sink(a.take(6).toDF("doc_id", "text"), 0L)
    // rewrite the manifest WITHOUT the dirs column — the on-disk
    // shape every pre-round-15 store has
    val legacy = Versioned.readCurrent(spark, s"$out/manifest")
      .drop("dirs")
    Versioned.publish(legacy, s"$out/manifest"): Unit
    // reading the legacy store works
    assert(EventStream.readStreamShards(spark, out)
      .select("doc_id").as[Long].collect().toSet == (1L to 6L).toSet)
    // folding the next batch works (this fold reads the legacy
    // manifest as `prior`) and keeps the full batch-id list
    sink(a.drop(6).toDF("doc_id", "text"), 1L)
    val m = EventStream.readStreamShardManifest(spark, out)
    assert(m.select(col("batch_ids")).head().getSeq[Long](0) ==
      Seq(0L, 1L))
    assert(EventStream.readStreamShards(spark, out)
      .select("doc_id").as[Long].collect().toSet == (1L to 12L).toSet)
    // aggregates equal the one-shot replay over everything
    val want = Export.shardAggregates(
        a.toDF("doc_id", "text")
          .withColumn("shard", Export.shardOf(col("doc_id"), 4)),
        octet_length(col("text")), Seq("doc_id", "text"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(m.select(col("shard"), col("n_rows"), col("bytes"),
        col("checksum"))
      .as[(Int, Long, Long, Long)].collect().toSet == want)
    // and the compaction path handles the migrated store too
    sink(Seq((100L, "mig-100")).toDF("doc_id", "text"), 2L)
    assert(EventStream.readStreamShardManifest(spark, out)
      .select(col("dirs")).head().getSeq[String](0).size <= 2)
  }

  test("epochOrderOf over the STREAMED export: same permutation " +
      "contract as the batch path — exact 1..N, reproducible, " +
      "compaction-invariant (order depends on content, not layout)") {
    import graft.sources.Export
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_epoch_stream").toString
    def sink(threshold: Int) = EventStream.exportShardsSink(out, 4,
      col("doc_id"), octet_length(col("text")), Seq("doc_id", "text"),
      compactAtDirs = threshold) _
    val rows = (1L to 40L).map(i => (i, s"doc-$i"))
    rows.grouped(10).zipWithIndex.foreach { case (g, b) =>
      sink(2)(g.toDF("doc_id", "text"), b.toLong)
    }
    def order() = Export.epochOrderOf(
        EventStream.readStreamShards(spark, out), "doc_id", 7L, 2)
      .select(col("epoch_pos").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val o1 = order()
    assert(o1.map(_._1).toSeq == (1L to 40L))
    assert(o1.toSeq == order().toSeq, "epoch order must be reproducible")
    // compaction happened mid-stream (threshold 2 over 4 batches);
    // the order is a function of (content, seed, epoch) — layout
    // (batch dirs vs compacted dir) cannot move it: recompute over a
    // FRESH single-batch export of the same rows
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_export_epoch_stream2").toString
    EventStream.exportShardsSink(out2, 4, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))(
      rows.toDF("doc_id", "text"), 0L)
    val o2 = Export.epochOrderOf(
        EventStream.readStreamShards(spark, out2), "doc_id", 7L, 2)
      .select(col("epoch_pos").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(o1.toSeq == o2.toSeq,
      "layout (batch dirs vs compacted) moved the epoch order")
  }

  test("exportShardsSink compaction: crossing the dir threshold folds " +
      "batch dirs into ONE compacted dir with a byte-identical read " +
      "view and unmoved manifest aggregates; replay after compaction " +
      "is a no-op; the sweep reclaims unreferenced batch dirs") {
    import graft.sources.Export
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_sink_compact").toString
    def sink = EventStream.exportShardsSink(out, 4, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"),
      compactAtDirs = 3) _
    def batchRows(b: Long) =
      (b * 10 to b * 10 + 5).map(i => (i, s"row-$b-$i"))
    def manifest() = EventStream.readStreamShardManifest(spark, out)
      .select(col("shard"), col("n_rows"), col("bytes"), col("checksum"))
      .as[(Int, Long, Long, Long)].collect().toSet
    def dirsListed() = EventStream.readStreamShardManifest(spark, out)
      .select(col("dirs")).head().getSeq[String](0)
    def view() = EventStream.readStreamShards(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    // 3 batches: at/below threshold, no compaction
    (0L to 2L).foreach(b => sink(batchRows(b).toDF("doc_id", "text"), b))
    assert(dirsListed().toSet == Set("batch_0", "batch_1", "batch_2"))
    val before = (manifest(), view())
    // 4th batch crosses the threshold inside the sink
    sink(batchRows(3L).toDF("doc_id", "text"), 3L)
    assert(dirsListed() == Seq("compact_b3"),
      s"expected exactly one compacted dir, got ${dirsListed()}")
    val wantView = before._2 ++ batchRows(3L).toSet
    assert(view() == wantView, "compaction changed the read view")
    val wantAgg = Export.shardAggregates(
        wantView.toSeq.toDF("doc_id", "text")
          .withColumn("shard", Export.shardOf(col("doc_id"), 4)),
        octet_length(col("text")), Seq("doc_id", "text"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(manifest() == wantAgg, "compaction moved manifest aggregates")
    // exactly one file per shard in the compacted dir
    val cdir = new java.io.File(s"$out/data/compact_b3")
    cdir.listFiles().filter(_.getName.startsWith("shard=")).foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"compacted shard dir ${d.getName} has more than one file")
    }
    // replay of a pre-compaction batch: pointer-gated no-op, view and
    // manifest untouched
    sink(Seq((999L, "ghost")).toDF("doc_id", "text"), 1L)
    assert(manifest() == wantAgg && view() == wantView,
      "replay after compaction moved the store")
    // a further batch appends alongside the compacted dir
    sink(batchRows(4L).toDF("doc_id", "text"), 4L)
    assert(dirsListed().toSet == Set("compact_b3", "batch_4"))
    assert(view() == wantView ++ batchRows(4L).toSet)
    // a SECOND compaction point folds the NEW batch dirs into their
    // own tier-1 dir — the earlier compact_b3 is NOT rewritten
    // (tiered folds: total compaction writes grow ~n·log n over a
    // stream's lifetime, not n²; the round-15 whole-store refold was
    // the quadratic shape) — and the sweep reclaims every dir no
    // surviving manifest version references
    def fileStamps(d: String): Map[String, Long] = {
      val root = new java.io.File(s"$out/data/$d")
      if (!root.exists()) Map.empty
      else root.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val b3Before = fileStamps("compact_b3")
    (5L to 6L).foreach(b => sink(batchRows(b).toDF("doc_id", "text"), b))
    assert(dirsListed().toSet == Set("compact_b3", "compact_b6"),
      s"expected two tier-1 dirs, got ${dirsListed()}")
    assert(fileStamps("compact_b3") == b3Before,
      "a later batch fold rewrote an earlier compacted dir")
    val left = new java.io.File(s"$out/data").listFiles().map(_.getName)
    assert(left.contains("compact_b6") && left.contains("compact_b3"))
    assert(!left.contains("batch_0") && !left.contains("batch_1"),
      s"sweep left long-unreferenced batch dirs behind: ${left.toSeq}")
    assert(view() == wantView ++ (4L to 6L).flatMap(batchRows).toSet)
    // aggregates still equal the one-shot replay over everything
    val wantAll = Export.shardAggregates(
        (wantView ++ (4L to 6L).flatMap(batchRows).toSet).toSeq
          .toDF("doc_id", "text")
          .withColumn("shard", Export.shardOf(col("doc_id"), 4)),
        octet_length(col("text")), Seq("doc_id", "text"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(manifest() == wantAll)
  }

  test("tiered compaction cascades: once tier-1 dirs outgrow the " +
      "threshold they fold into ONE tier-2 dir, the read view stays " +
      "byte-identical, the listing stays bounded, and re-running the " +
      "compactor on an all-compact store is a version no-op") {
    import graft.sources.{Export, Versioned}
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_sink_tiers").toString
    def sink = EventStream.exportShardsSink(out, 4, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"),
      compactAtDirs = 2) _
    def rows(b: Long) = (b * 10 to b * 10 + 3).map(i => (i, s"t-$b-$i"))
    (0L to 11L).foreach(b => sink(rows(b).toDF("doc_id", "text"), b))
    val dirs = EventStream.readStreamShardManifest(spark, out)
      .select(col("dirs")).head().getSeq[String](0)
    assert(dirs.exists(_.startsWith("compact_t2_b")),
      s"12 batches at threshold 2 must have cascaded to tier 2: $dirs")
    assert(dirs.size <= 2 + 3, // ~maxDirs + tiers
      s"tiered listing must stay bounded, got ${dirs.size}: $dirs")
    val want = (0L to 11L).flatMap(rows).toSet
    assert(EventStream.readStreamShards(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
      == want, "tier cascade changed the read view")
    // aggregates = the one-shot replay
    val wantAgg = Export.shardAggregates(
        want.toSeq.toDF("doc_id", "text")
          .withColumn("shard", Export.shardOf(col("doc_id"), 4)),
        octet_length(col("text")), Seq("doc_id", "text"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(EventStream.readStreamShardManifest(spark, out)
      .select(col("shard"), col("n_rows"), col("bytes"), col("checksum"))
      .as[(Int, Long, Long, Long)].collect().toSet == wantAgg)
    // drive the compactor to its fixpoint at maxDirs=1 (repeated
    // driver-issued compaction at an UNMOVED max batch id — the
    // name-roll path), then a further call must be a version no-op
    var guard = 0
    while (EventStream.maybeCompactStreamShards(spark, out, 4, 1)) {
      guard += 1; assert(guard < 10, "compactor failed to converge")
    }
    val vBefore = Versioned.currentVersion(spark, s"$out/manifest").get
    assert(!EventStream.maybeCompactStreamShards(spark, out, 4, 1))
    assert(Versioned.currentVersion(spark, s"$out/manifest").get
      == vBefore, "a no-progress compaction minted a version")
    // the fully-collapsed store still reads byte-identical
    assert(EventStream.readStreamShards(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
      == want)
  }

  test("compaction while a PRE-dirs manifest version survives: the " +
      "sweep upgrades each version (dirs derived from batch_ids) " +
      "instead of throwing, and never deletes a dir the legacy " +
      "version references") {
    import graft.sources.Versioned
    val out = java.nio.file.Files
      .createTempDirectory("graft_sweep_legacy").toString
    def sink = EventStream.exportShardsSink(out, 4, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"),
      compactAtDirs = 64) _ // no in-sink compaction; we drive it below
    (0L to 2L).foreach(b => sink(
      (b * 10 to b * 10 + 5).map(i => (i, s"leg-$b-$i"))
        .toDF("doc_id", "text"), b))
    // make a LEGACY (pre-dirs) version the promoted one — keep=2 means
    // it SURVIVES the compaction publish below, which is exactly the
    // round-15 advice scenario: sweep must read it without the column
    Versioned.publish(
      Versioned.readCurrent(spark, s"$out/manifest").drop("dirs"),
      s"$out/manifest"): Unit
    val want = EventStream.readStreamShards(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    // direct compaction: publishes the compacted version (keep=2 →
    // survivors = legacy + compacted), then sweeps ALL versions
    assert(EventStream.maybeCompactStreamShards(spark, out, 4, 1))
    assert(EventStream.readStreamShards(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
      == want, "compaction over the legacy store changed the view")
    // the legacy version derives its dirs from batch_ids, so the
    // batch dirs it references must survive the sweep
    val left = new java.io.File(s"$out/data").listFiles().map(_.getName)
    (0 to 2).foreach(b => assert(left.contains(s"batch_$b"),
      s"sweep deleted batch_$b, still referenced by the surviving " +
        s"legacy manifest version: ${left.toSeq}"))
  }

  test("exportShardsSink: a leading EMPTY batch advances the pointer " +
      "without publishing a manifest, and the first non-empty batch " +
      "publishes instead of wedging on a missing manifest read") {
    import graft.sources.{Export, Versioned}
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_sink_empty").toString
    def sink = EventStream.exportShardsSink(out, 4, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text")) _
    // batch 0 is empty: pointer commits, nothing is published
    sink(Seq.empty[(Long, String)].toDF("doc_id", "text"), 0L)
    assert(Versioned.currentVersion(spark, s"$out/manifest").isEmpty,
      "an empty batch must not publish a manifest")
    // batch 1 carries data: before the round-14 fix this threw
    // FileNotFoundException (prior gated on the BATCH pointer, which
    // the empty batch had advanced) and every re-delivery rethrew —
    // the stream was permanently wedged
    val a = Seq((1L, "alpha-one"), (2L, "beta-two"), (3L, "gamma-three"))
    sink(a.toDF("doc_id", "text"), 1L)
    def manifest() = EventStream.readStreamShardManifest(spark, out)
      .select(col("shard"), col("n_rows"), col("bytes"), col("checksum"))
      .as[(Int, Long, Long, Long)].collect().toSet
    val want = Export.shardAggregates(
        a.toDF("doc_id", "text")
          .withColumn("shard", Export.shardOf(col("doc_id"), 4)),
        octet_length(col("text")), Seq("doc_id", "text"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(manifest() == want,
      "first non-empty batch after an empty prefix published wrong")
    // replay of the empty batch and of batch 1 both no-op
    sink(Seq((99L, "ghost")).toDF("doc_id", "text"), 0L)
    sink(a.toDF("doc_id", "text"), 1L)
    assert(manifest() == want, "replay after an empty prefix refolded")
    assert(EventStream.readStreamShards(spark, out)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("exportShardsSink: folded manifest equals the one-shot " +
      "aggregates over all batches, replay and crash-window " +
      "re-delivery never double-fold, readers see only committed " +
      "batches") {
    import graft.sources.Export
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_sink").toString
    def sink = EventStream.exportShardsSink(out, 4, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text")) _
    val a = (1L to 20L).map(i => (i, s"alpha-$i-" + ("x" * (i % 7).toInt)))
    val b = (21L to 35L).map(i => (i, s"beta-$i"))
    val input = MemoryStream[(Long, String)](spark)
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(a: _*); query.processAllAvailable()
      input.addData(b: _*); query.processAllAvailable()
      def manifest() = EventStream
        .readStreamShardManifest(spark, out)
        .select(col("shard"), col("n_rows"), col("bytes"),
          col("checksum"))
        .as[(Int, Long, Long, Long)].collect().toSet
      val all = (a ++ b).toDF("doc_id", "text")
      val want = Export.shardAggregates(
          all.withColumn("shard", Export.shardOf(col("doc_id"), 4)),
          octet_length(col("text")), Seq("doc_id", "text"))
        .as[(Int, Long, Long, Long)].collect().toSet
      assert(manifest() == want,
        "folded manifest diverged from the one-shot aggregates")
      // read-back: exactly the union of committed batches
      val back = EventStream.readStreamShards(spark, out)
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      assert(back == (a ++ b).toSet)
      // pointer-gated replay with a DIFFERENT payload must not refold
      sink(Seq((99L, "ghost")).toDF("doc_id", "text"), 0L)
      assert(manifest() == want, "replayed batch refolded the manifest")
      // crash window: manifest for batch 2 published but the pointer
      // commit lost — rewind the pointer to 1 and re-deliver batch 2
      val c = Seq((41L, "gamma-41"), (42L, "gamma-42"))
      sink(c.toDF("doc_id", "text"), 2L)
      val withC = manifest()
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ptr = new org.apache.hadoop.fs.Path(out, "_current")
      val os = fs.create(ptr, true)
      try os.writeLong(1L) finally os.close()
      sink(c.toDF("doc_id", "text"), 2L) // re-delivery after the crash
      assert(manifest() == withC,
        "crash-window re-delivery double-folded the manifest")
      assert(EventStream.readStreamShards(spark, out).count() ==
        (a ++ b ++ c).size.toLong)
    } finally query.stop()
  }
}
