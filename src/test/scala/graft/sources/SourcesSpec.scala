package graft.sources

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SourcesSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private val dir = "src/test/resources/clinical"

  test("tsv reads header-ful tab-separated files as all-string") {
    val df = Sources.tsv(spark, s"$dir/donor.tsv")
    assert(df.count() == 5)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.columns.take(3).toSeq ==
      Seq("study_id", "submitter_donor_id", "dob"))
  }

  test("multilineJson reads pretty-printed JSON arrays") {
    val df = Sources.multilineJson(spark, s"$dir/metadata.json")
    val row = df.select("dictionaryVersion", "studyVersionId")
      .as[(String, String)].collect().head
    assert(row == ("9.9", "v42"))
  }

  test("jsonLines reads gzipped JSON-lines with nested arrays") {
    val df = Sources.jsonLines(spark, s"$dir/terms.jsonl.gz")
    assert(df.count() == 4)
    val seizure = df.filter($"id" === "HP:0000001")
      .select(size($"ancestors"), $"is_leaf").as[(Int, Boolean)]
      .collect().head
    assert(seizure == ((2, true)))
  }

  test("jsonLines with explicit schema skips inference") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id STRING, name STRING, is_leaf BOOLEAN")
    val df = Sources.jsonLines(spark, s"$dir/terms.jsonl.gz", schema)
    assert(df.schema == schema)
    assert(df.count() == 4)
  }

  test("inMemoryJson parses JSON strings like the id-server response") {
    val df = Sources.inMemoryJson(spark,
      Seq("""{"hash": "abc", "internal_id": "donor_1"}""",
        """{"hash": "def", "internal_id": "donor_2"}"""))
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("hash", "internal_id"))
  }

  test("partitionedJson writes one dir per partition value, round-trips") {
    val out = Files.createTempDirectory("graft-sink").toString
    val df = Seq(("GS001", "DO001", 1L), ("GS001", "DO002", 2L),
      ("GS002", "DO003", 3L)).toDF("study_id", "donor_id", "v")
    Sinks.partitionedJson(df, out, Seq("study_id"))
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("study_id=")).sorted.toSeq
    assert(dirs == Seq("study_id=GS001", "study_id=GS002"))
    val back = spark.read.json(out)
    assert(back.count() == 3)
    assert(back.select(sum("v")).as[Long].collect().head == 6L)
  }

  test("binaryFiles scatter→gather round-trips payload bytes exactly") {
    val out = Files.createTempDirectory("graft-bin").toString
    val df = Seq(
      ("a.png", Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2)),
      ("b.bin", Array[Byte](0, 1, 2, 3))).toDF("fname", "payload")
    Sinks.binaryFiles(df, out, "fname", "payload")
    val back = Sources.binaryFiles(spark, out)
      .select(regexp_extract($"path", "([^/]+)$", 1), $"length", $"content")
      .as[(String, Long, Array[Byte])].collect().sortBy(_._1)
    assert(back.map(r => (r._1, r._2)).toSeq == Seq(("a.png", 6L), ("b.bin", 4L)))
    assert(back(0)._3.toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2))
    assert(back(1)._3.toSeq == Seq[Byte](0, 1, 2, 3))
  }

  test("binaryFiles glob filters at the listing, and scatter overwrites") {
    val out = Files.createTempDirectory("graft-bin2").toString
    val df1 = Seq(("x.png", Array[Byte](1)), ("y.wav", Array[Byte](2)))
      .toDF("fname", "payload")
    Sinks.binaryFiles(df1, out, "fname", "payload")
    // second scatter replaces the directory wholesale (Overwrite contract)
    val df2 = Seq(("x.png", Array[Byte](9)), ("z.png", Array[Byte](3)))
      .toDF("fname", "payload")
    Sinks.binaryFiles(df2, out, "fname", "payload")
    val names = Sources.binaryFiles(spark, out, "*.png")
      .select(regexp_extract($"path", "([^/]+)$", 1)).as[String]
      .collect().sorted.toSeq
    assert(names == Seq("x.png", "z.png"))
    val xBytes = Sources.binaryFiles(spark, out, "x.png")
      .select($"content").as[Array[Byte]].collect().head.toSeq
    assert(xBytes == Seq[Byte](9))
  }

  test("csv sink writes header-ful files that round-trip typed reads") {
    val out = Files.createTempDirectory("graft-csv").toString
    val df = Seq((1, "AFRICA"), (2, "ASIA")).toDF("k", "name")
    Sinks.csv(df, out)
    val back = spark.read.option("header", "true")
      .schema("k int, name string").csv(out)
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1, "AFRICA"), (2, "ASIA")))
  }

  test("partitionedJson singleFile mirrors the reference coalesce(1)") {
    val out = Files.createTempDirectory("graft-sink1").toString
    val df = Seq(("GS001", 1L), ("GS002", 2L)).toDF("study_id", "v")
    Sinks.partitionedJson(df, out, Seq.empty, singleFile = true)
    val parts = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(parts == 1)
  }

  test("object-store conf seam produces the reference's s3a entries") {
    // conf-only S9 seam (reference SparkConfig.scala:21-26): the
    // sandbox has no network, so the contract under test is exactly
    // what the reference's dev block sets — key names and values on
    // the Hadoop configuration — plus the scale knobs
    val c = ObjectStoreConf(
      endpoint = "https://store.example:9000",
      accessKey = "AK", secretKey = "SK",
      extra = Map("fs.s3a.connection.timeout" -> "5000"))
    val m = c.confMap
    assert(m("fs.s3a.endpoint") == "https://store.example:9000")
    assert(m("fs.s3a.access.key") == "AK")
    assert(m("fs.s3a.secret.key") == "SK")
    assert(m("fs.s3a.path.style.access") == "true")
    assert(m("fs.s3a.committer.magic.enabled") == "true")
    assert(m("fs.s3a.connection.maximum") == "96")
    assert(m("fs.s3a.connection.timeout") == "5000") // extra wins a slot
    // overrides flow through `extra`
    assert(c.copy(extra = Map("fs.s3a.connection.maximum" -> "8"))
      .confMap("fs.s3a.connection.maximum") == "8")
    // applyTo lands the entries on a live session's Hadoop conf
    ObjectStoreConf.devDefaults.applyTo(spark)
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(hc.get("fs.s3a.path.style.access") == "true")
  }

  test("a filter on the partition column prunes partitions at the scan") {
    // the 100 TB contract behind partitioned writes: a reader filtering
    // on the layout key must plan a PartitionFilter (metadata-only
    // pruning), not a data filter over every file
    val out = Files.createTempDirectory("graft-prune").toString
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L))
      .toDF("k", "v")
    Sinks.parquet(df, out, partitionBy = Seq("k"))
    val read = spark.read.parquet(out).filter(col("k") === "b")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(k"),
      s"partition filter missing from scan:\n$scan")
    assert(!scan.contains("PushedFilters: [IsNotNull(k)"),
      "layout-key filter leaked into the data-filter path")
    assert(read.select("k", "v").as[(String, Long)].collect().toSeq
      == Seq(("b", 3L)))
  }

  test("PERMISSIVE JSONL ingest routes malformed lines to " +
    "_corrupt_record verbatim — the quarantine path, not a job abort") {
    // Spark disallows queries touching ONLY the corrupt column on the
    // raw file (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented
    // pattern is to parse once into a cached/saved frame, then route
    val df = spark.read
      .schema("id bigint, val string, _corrupt_record string")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json("src/test/resources/clinical/corrupt.jsonl")
      .cache()
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().sorted.toSeq
    assert(corrupt == Seq("not json at all", "{\"id\": 3, \"val\": \"c\""))
    val clean = df.filter(col("_corrupt_record").isNull)
      .select("id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(1L, 2L, 4L, 5L))
  }
}
