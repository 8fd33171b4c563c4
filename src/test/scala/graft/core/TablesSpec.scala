package graft.core

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Pins the `events` loader's two-physical-encodings contract: whether
  * `ts` ships as a raw epoch-nanos long (legacy TIMESTAMP(NANOS) read
  * under `nanosAsLong`) or a proper micros timestamp, the normalized
  * surface (`ts` timestamp + `ts_ns` epoch nanos) must be identical.
  * Regression test for the micros→nanos factor (×1000, not ×1000000):
  * the wrong factor overflows BIGINT for current epochs.
  */
class TablesSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("events normalizes nanos-long and micros-timestamp encodings identically") {
    val base = Files.createTempDirectory("graft-tables").toString
    // Three instants, micro-precision (nanos beyond micros would be lost
    // by the timestamp encoding, so use micro-aligned values).
    val micros = Seq(1700000000000000L, 1700000123456789L, 1735689600000001L)

    val legacyDir = s"$base/legacy"
    val modernDir = s"$base/modern"
    Files.createDirectories(java.nio.file.Paths.get(legacyDir))
    Files.createDirectories(java.nio.file.Paths.get(modernDir))

    // Legacy shape: ts is a raw epoch-nanos LONG column.
    micros.map(m => (m * 1000L, "e")).toDF("ts", "kind")
      .write.mode("overwrite").parquet(s"$legacyDir/events.parquet")
    // Modern shape: ts is a micros TIMESTAMP column.
    micros.toDF("us").select(timestamp_micros($"us").as("ts"), lit("e").as("kind"))
      .write.mode("overwrite").parquet(s"$modernDir/events.parquet")

    val a = Tables.events(spark, legacyDir)
      .select($"ts".cast("long").as("ts_s"), $"ts_ns").orderBy("ts_ns")
      .as[(Long, Long)].collect().toSeq
    val b = Tables.events(spark, modernDir)
      .select($"ts".cast("long").as("ts_s"), $"ts_ns").orderBy("ts_ns")
      .as[(Long, Long)].collect().toSeq

    assert(a == b, "the two physical encodings must normalize to the same surface")
    assert(a.map(_._2) == micros.sorted.map(_ * 1000L),
      "ts_ns must be epoch NANOS (micros × 1000), not micros × 1e6")
  }
}
