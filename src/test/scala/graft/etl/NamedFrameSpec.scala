package graft.etl

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NamedFrameSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def frame = NamedFrame(
    "donor",
    Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
    Map("study_version" -> "v42", "dictionary_version" -> "9.9",
      "study_version_creation_date" -> "2026-01-01"))

  test("stamped materializes tags as literal columns, idempotently") {
    val s = frame.stamped
    assert(s.columns.toSeq ==
      Seq("id", "v", "dictionary_version", "study_version",
        "study_version_creation_date"))
    assert(s.select("study_version").distinct().as[String].collect()
      .toSeq == Seq("v42"))
    // re-stamping with an updated tag replaces, never duplicates
    val restamped = NamedFrame("donor", s,
      Map("study_version" -> "v43")).stamped
    assert(restamped.columns.count(_ == "study_version") == 1)
    assert(restamped.select("study_version").distinct().as[String]
      .collect().toSeq == Seq("v43"))
  }

  test("annotated tags survive a parquet round-trip and recover") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-namedframe").toString
    frame.annotated.write.mode("overwrite").parquet(out)
    val back = NamedFrame.fromAnnotated(spark.read.parquet(out))
    assert(back.isDefined, "lineage metadata lost in parquet round-trip")
    assert(back.get.name == "donor")
    assert(back.get.tags == frame.tags)
    // the data itself is untouched — zero per-row cost
    assert(back.get.df.orderBy("id").as[(Long, String)].collect().toSeq
      == Seq((1L, "a"), (2L, "b")))
  }

  test("fromAnnotated is None on an untagged frame; withTag is immutable") {
    assert(NamedFrame.fromAnnotated(Seq(1).toDF("x")).isEmpty)
    val nf = frame
    val nf2 = nf.withTag("study_version", "v99")
    assert(nf.tags("study_version") == "v42") // original untouched
    assert(nf2.tags("study_version") == "v99")
  }
}
