package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[LogHist]] contract: bucket edges bracket their members, the
  * quantile read has the advertised ≤ 1/16 relative error against the
  * exact quantile, and sketches MERGE losslessly (the property the
  * incremental-profiling story rides on). */
class LogHistSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  // deterministic, scale-spanning values: squares, powers, small ints
  private val values: Seq[Long] =
    (0L to 40L) ++ (1 to 62).map(1L << _) ++
      (1L to 300L).map(i => i * i * 37 % 1000000) ++
      Seq(Long.MaxValue, Long.MaxValue - 1)

  test("every value sits inside its bucket's [floor, next-floor) range") {
    val rows = values.toDF("v")
      .select(col("v"), LogHist.bucketOf(col("v")).as("b"))
      .select(col("v"), col("b"), LogHist.bucketFloor(col("b")).as("lo"))
      .collect()
    rows.foreach { r =>
      val (v, b, lo) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(lo <= v, s"v=$v bucket=$b floor=$lo above the value")
      // width = floor/16 for the log region; exact for v < 32
      val width = if (b < 32) 1L else math.max(lo / 16, 1L)
      assert(v < lo + width || b >= 1023,
        s"v=$v bucket=$b floor=$lo width=$width — value past bucket end")
    }
  }

  test("bucket ids are bounded and the two regions are disjoint") {
    val bs = values.toDF("v").select(LogHist.bucketOf(col("v")).as("b"))
      .as[Long].collect()
    assert(bs.forall(b => b >= 0 && b <= 63L * 16 + 15))
    val small = values.filter(_ < 32).toSet
    values.zip(bs).foreach { case (v, b) =>
      if (small(v)) assert(b == v) else assert(b >= 96)
    }
  }

  test("quantile estimates carry ≤ 1/16 relative error vs exact") {
    val data = (1L to 5000L).map(i => ("g", i * i % 999983 + 1))
    val df = data.toDF("g", "v")
    val sk = LogHist.sketch(df, Seq("g"), col("v"))
    val qs = Seq(500000L, 900000L, 990000L)
    val est = LogHist.quantiles(sk, Seq("g"), qs)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val sorted = data.map(_._2).sorted
    qs.foreach { q =>
      val exact = sorted(((sorted.size * q + 999999) / 1000000 - 1).toInt)
      val e = est(q)
      // the estimate is a bucket floor: within one bucket width below
      assert(e <= exact && exact - e <= math.max(exact / 16, 1),
        s"q=$q exact=$exact est=$e — outside the 1/16 relative bound")
    }
  }

  test("merge of per-slice sketches equals the whole-corpus sketch") {
    val df = (1L to 4000L).map(i => (s"m${i % 7}", "g", i * 31 % 50000))
      .toDF("slice", "g", "v")
    val whole = LogHist.sketch(df, Seq("g"), col("v"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    val merged = LogHist.merge(
        LogHist.sketch(df, Seq("g", "slice"), col("v")), Seq("g"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(merged.toSeq == whole.toSeq)
  }

  test("sketch size never exceeds the 1024-bucket bound") {
    val df = (1L to 100000L).map(i => ("g", i * 2654435761L % Long.MaxValue))
      .toDF("g", "v")
    assert(LogHist.sketch(df, Seq("g"), col("v")).count() <= 1024)
  }

  test("logHistSink: the folded stream state equals one sketch over " +
      "the whole history; replay is a no-op (counts would double)") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_loghist_sink").toString
    val vs = (1L to 3000L).map(i => i * 17 % 100000).toDF("v")
      .localCheckpoint()
    (0 until 3).foreach { b =>
      EventStream.logHistSink(dir, "v")(
        vs.filter(col("v") % 3 === b), b.toLong)
    }
    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val folded = table(EventStream.readLogHistState(spark, dir))
    val oneShot = table(LogHist.sketch(vs, Seq.empty, col("v"))
      .select("bucket", "n"))
    assert(folded == oneShot)
    // replayed batch id: must NOT re-add its counts
    EventStream.logHistSink(dir, "v")(vs.filter(col("v") % 3 === 1), 1L)
    assert(table(EventStream.readLogHistState(spark, dir)) == oneShot)
  }

  test("a negative value fails LOUDLY instead of silently growing " +
      "one bucket per distinct negative") {
    val bad = Seq(5L, -3L).toDF("v")
    val e = intercept[Exception] {
      LogHist.sketch(bad, Seq.empty, col("v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("negative value")), e.toString)
  }

  test("logHistSink: an interrupted state commit is healed from the tmp") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_loghist_crash").toString
    val vs = (1L to 500L).toDF("v")
    EventStream.logHistSink(dir, "v")(vs, 0L)
    val d = new java.io.File(dir)
    val state = new java.io.File(d, "cms_state.bin")
    assert(state.renameTo(new java.io.File(d, ".cms_state_0.tmp")))
    val healed = EventStream.readLogHistState(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = LogHist.sketch(vs, Seq.empty, col("v"))
      .select("bucket", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(healed == direct)
  }
}
