package graft.sources

import graft.WithSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroIoSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("flat round-trip preserves every supported type, nulls, and " +
      "row multiplicity across partitions (incl. empty partitions)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", IntegerType),
      StructField("x", DoubleType), StructField("f", FloatType),
      StructField("ok", BooleanType), StructField("s", StringType),
      StructField("b", BinaryType)))
    val rows = Seq(
      Row(1L, 10, 1.5, 2.5f, true, "alpha", Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, false, null, null),
      Row(2L, 10, 1.5, 2.5f, true, "alpha", Array[Byte](1, 2, 3)), // dup
      Row(3L, -7, -0.25, 0f, null, "", Array.emptyByteArray))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 6), schema) // > rows: some
                                                       // partitions empty
    val dir = graft.core.Scratch.dir("avro_rt")
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir, schema)
    assert(back.schema == schema)
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] = d
      .select(to_json(struct(d.columns.map(c =>
        if (d.schema(c).dataType == BinaryType) base64(col(c)).as(c)
        else col(c)): _*)))
      .as[String].collect().sorted.toSeq
    assert(canon(back) == canon(df))
    // one container per input partition, executor-written
    val parts = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro"))
    assert(parts == 6)
  }

  test("date/timestamp round-trip as Avro logical types " +
      "(date on int days, timestamp-micros on long)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("d", DateType),
      StructField("t", TimestampType)))
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, java.sql.Date.valueOf("2026-03-01"), ts),
      Row(2L, null, null),
      Row(3L, java.sql.Date.valueOf("1969-12-31"), // pre-epoch
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = graft.core.Scratch.dir("avro_ltypes")
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir, schema)
    assert(back.schema == schema)
    def canon(d: org.apache.spark.sql.DataFrame): Set[String] = d
      .select(to_json(struct(d.columns.map(col): _*)))
      .as[String].collect().toSet
    assert(canon(back) == canon(df))
    // the embedded writer schema carries the logical-type annotations
    assert(AvroIo.avroSchemaJson(schema).contains("timestamp-micros") &&
      AvroIo.avroSchemaJson(schema).contains("\"logicalType\":\"date\""))
  }

  test("schema json maps the interchange subset and rejects nested " +
      "columns loudly") {
    val j = AvroIo.avroSchemaJson(StructType(Seq(
      StructField("a", LongType), StructField("s", StringType))))
    assert(j.contains(""""name":"a","type":["null","long"]"""))
    val nested = StructType(Seq(
      StructField("m", ArrayType(LongType))))
    val e = intercept[IllegalArgumentException] {
      AvroIo.avroSchemaJson(nested)
    }
    assert(e.getMessage.contains("unsupported column type"))
  }

  test("containers are real Avro OCF: an independent GenericReader " +
      "sees the embedded writer schema and the same values") {
    val df = Seq((5L, "ocf")).toDF("id", "s")
    val dir = graft.core.Scratch.dir("avro_ocf")
    AvroIo.write(df.coalesce(1), dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val reader = org.apache.avro.file.DataFileReader.openReader(
      f, new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val sch = reader.getSchema
    assert(sch.getType == org.apache.avro.Schema.Type.RECORD)
    assert(sch.getFields.size() == 2)
    val rec = reader.next()
    assert(rec.get("id") == 5L && rec.get("s").toString == "ocf")
    assert(!reader.hasNext)
    reader.close()
  }
}
