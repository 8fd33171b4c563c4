package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object-Container-File sink/source built directly on the Avro
  * core library — the mainstream row-format boundary (Kafka/Hive
  * interchange) next to the parquet/ORC/JSON/CSV/XML sinks.
  *
  * This environment ships `avro-*.jar` but NOT the `spark-avro`
  * datasource connector, so `format("avro")` is unavailable; rather
  * than stub the boundary, the encode/decode runs as executor-side
  * per-partition IO — the [[Sinks.binaryFiles]] discipline: each
  * task writes ITS OWN `part-NNNNN.avro` container straight to the
  * target filesystem (full write parallelism, no driver funnel, no
  * coalesce(1)), and the reader parallelizes one task per container
  * file (Avro OCF is block-compressed but a container is not
  * splittable here — ship many files, exactly as the gzip inputs
  * already do). At 100 TB both directions scale with partition count.
  *
  * Schema mapping: flat rows of long/int/double/float/boolean/string/
  * binary, each as the Avro nullable union `[null, T]` — the
  * interchange subset the face round-trips. Nested structs/arrays
  * belong in parquet/ORC (columnar) — Avro here is the ROW boundary.
  * The Avro schema travels as its canonical JSON string and is parsed
  * inside each task (cheap, and sidesteps closure-serialization of
  * Schema objects).
  *
  * Commit discipline: [[write]] is delete-then-write with NO staging
  * commit of its own (unlike the Spark-committer sinks) — a crash
  * mid-write leaves a partial directory. Publish through
  * [[Versioned.publish]]-style promotion (write to a fresh dir, flip
  * a pointer) when consumers must never observe a torn output.
  */
object AvroIo {

  private def avroType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "bytes"
    // Avro logical types, encoded exactly as the spec says consumers
    // expect them: date = days since epoch on int, timestamp =
    // microseconds since epoch on long
    case DateType => """{"type":"int","logicalType":"date"}"""
    case TimestampType =>
      """{"type":"long","logicalType":"timestamp-micros"}"""
    case TimestampNTZType =>
      """{"type":"long","logicalType":"local-timestamp-micros"}"""
    case other =>
      throw new IllegalArgumentException(
        s"AvroIo: unsupported column type $other (flat interchange " +
          "subset only — use parquet/ORC for nested columns)")
  }

  /** Canonical JSON Avro schema for a flat Spark schema: a record of
    * nullable-union fields. */
  def avroSchemaJson(schema: StructType, name: String = "row"): String = {
    val fields = schema.fields.map { f =>
      val t = avroType(f.dataType)
      val tJson = if (t.startsWith("{")) t else s""""$t""""
      s"""{"name":"${f.name}","type":["null",$tJson]}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Write one Avro container per partition under `dir` (overwrite).
    * Executor-side IO through the Hadoop filesystem of `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val json = avroSchemaJson(schema)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs0 = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs0.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val n = schema.length
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val avroSchema = new org.apache.avro.Schema.Parser().parse(json)
      val path = new org.apache.hadoop.fs.Path(
        dir, f"part-$pid%05d.avro")
      val fs = path.getFileSystem(hconf.value)
      val out = fs.create(path, true)
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      writer.create(avroSchema, out)
      var wrote = 0L
      rows.foreach { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        var i = 0
        while (i < n) {
          val v = row.get(i) match {
            case null => null
            case s: String => new org.apache.avro.util.Utf8(s)
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
            case t: java.sql.Timestamp =>
              Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
            case t: java.time.LocalDateTime =>
              t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
                t.getNano / 1000L
            case other => other
          }
          rec.put(i, v)
          i += 1
        }
        writer.append(rec)
        wrote += 1
      }
      writer.close() // closes the stream
      Iterator.single(wrote)
    }.count(): Unit
  }

  /** Read a [[write]]-produced directory back: one task per container
    * file, rows decoded to `schema` (pass the original Spark schema —
    * the container's writer schema is embedded and checked by the
    * Avro reader itself). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.toString)
      .filter(_.endsWith(".avro"))
      .sorted.toSeq
    val n = schema.length
    val dts = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val in = new org.apache.avro.mapred.FsInput(
          new org.apache.hadoop.fs.Path(f), hconf.value)
        val reader = org.apache.avro.file.DataFileReader.openReader(
          in, new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        val it = new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = {
            val rec = reader.next()
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) {
              vals(i) = (rec.get(i), dts(i)) match {
                case (null, _) => null
                case (u: org.apache.avro.util.Utf8, StringType) =>
                  u.toString
                case (b: java.nio.ByteBuffer, BinaryType) =>
                  val a = new Array[Byte](b.remaining()); b.get(a); a
                case (v: java.lang.Integer, DateType) =>
                  java.sql.Date.valueOf(
                    java.time.LocalDate.ofEpochDay(v.longValue()))
                case (v: java.lang.Long, TimestampType) =>
                  val ts = new java.sql.Timestamp(
                    Math.floorDiv(v.longValue(), 1000000L) * 1000L)
                  ts.setNanos(
                    (Math.floorMod(v.longValue(), 1000000L) * 1000L).toInt)
                  ts
                case (v: java.lang.Long, TimestampNTZType) =>
                  java.time.LocalDateTime.ofEpochSecond(
                    Math.floorDiv(v.longValue(), 1000000L),
                    (Math.floorMod(v.longValue(), 1000000L) * 1000L).toInt,
                    java.time.ZoneOffset.UTC)
                case (v, _) => v
              }
              i += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
        it
      }
    spark.createDataFrame(rdd, schema)
  }
}
