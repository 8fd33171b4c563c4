package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Kmv]] — engine-portable distinct sketches: undersaturated
  * exactness, saturated estimator accuracy, mergeability, and the
  * exact-integer Jaccard. */
class KmvSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("undersaturated sketch reports the exact distinct count") {
    val df = (1L to 100L).flatMap(i => Seq(i, i)).toDF("v")
    val r = Kmv.distinctEstimate(df, col("v"), k = 256).collect().head
    assert(r.getLong(0) == 100L && r.getDouble(2) == 100.0)
  }

  test("saturated estimator lands near the true cardinality") {
    val df = (1L to 20000L).toDF("v")
    val r = Kmv.distinctEstimate(df, col("v"), k = 256).collect().head
    assert(r.getLong(0) == 256L)
    val est = r.getDouble(2)
    assert(est > 15000 && est < 25000,
      s"KMV k=256 estimate $est too far from 20000")
  }

  test("sketches are mergeable: min-k of unioned sketches equals the " +
      "sketch of the union") {
    val a = (1L to 5000L).toDF("v")
    val b = (2500L to 7500L).toDF("v")
    val direct = Kmv.sketch(a.unionByName(b), col("v"), 128)
      .as[Long].collect().toSeq
    val merged = Kmv.sketch(a, col("v"), 128)
      .unionByName(Kmv.sketch(b, col("v"), 128))
      .distinct().orderBy("hv").limit(128)
      .as[Long].collect().toSeq
    assert(direct == merged)
  }

  test("jaccard is exact-integer when the union fits the sketch") {
    // |A ∩ B| = 50, |A ∪ B| = 150 -> 333333 ppm exactly
    val a = (1L to 100L).toDF("v")
    val b = (51L to 150L).toDF("v")
    val r = Kmv.jaccardEstimate(a, col("v"), b, col("v"), k = 256)
      .collect().head
    assert(r.getLong(0) == 150L && r.getLong(1) == 50L &&
      r.getLong(2) == 333333L)
  }

  test("kmvSink: the folded stream state equals one sketch over the " +
      "whole history; replay is a no-op") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kmv_sink").toString
    val ids = (1L to 3000L).toDF("id").localCheckpoint()
    (0 until 3).foreach { b =>
      EventStream.kmvSink(dir, "id", k = 64)(
        ids.filter(col("id") % 3 === b), b.toLong)
    }
    val folded = EventStream.readKmvMins(spark, dir)
      .as[Long].collect().toSeq.sorted
    val oneShot = Kmv.sketch(ids, col("id"), 64)
      .as[Long].collect().toSeq
    assert(folded == oneShot)
    // replayed batch with poisoned payload: watermark guards it
    EventStream.kmvSink(dir, "id", k = 64)(
      Seq(999999L).toDF("id"), 1L)
    assert(EventStream.readKmvMins(spark, dir)
      .as[Long].collect().toSeq.sorted == oneShot)
  }

  test("kmvSink: an interrupted state commit is healed from the tmp") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kmv_crash").toString
    EventStream.kmvSink(dir, "id", k = 32)(
      (1L to 500L).toDF("id"), 0L)
    val d = new java.io.File(dir)
    val state = new java.io.File(d, "cms_state.bin")
    assert(state.renameTo(new java.io.File(d, ".cms_state_0.tmp")))
    val healed = EventStream.readKmvMins(spark, dir)
      .as[Long].collect().toSeq
    assert(healed == Kmv.sketch((1L to 500L).toDF("id"), col("id"), 32)
      .as[Long].collect().toSeq)
  }

  test("saturated jaccard estimate tracks the true overlap") {
    val a = (1L to 10000L).toDF("v")
    val b = (5001L to 15000L).toDF("v") // true J = 5000/15000 = 1/3
    val r = Kmv.jaccardEstimate(a, col("v"), b, col("v"), k = 512)
      .collect().head
    assert(r.getLong(0) == 512L)
    val ppm = r.getLong(2)
    assert(ppm > 250000L && ppm < 420000L,
      s"KMV jaccard $ppm ppm too far from 333333")
  }
}
