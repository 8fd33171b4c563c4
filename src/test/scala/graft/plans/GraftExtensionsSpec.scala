package graft.plans

import graft.WithSpark
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with WithSpark {

  test("graft_dot is callable from SQL after in-session registration") {
    GraftExtensions.register(spark)
    val got = spark
      .sql("SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(got == 32.0)
  }

  test("graft_dot null semantics: null input yields null") {
    GraftExtensions.register(spark)
    val row = spark
      .sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d")
      .collect()(0)
    assert(row.isNullAt(0))
  }

  test("graft_dot rejects non-array inputs at analysis") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_dot(1.0, 2.0)").collect()
    }
  }

  test("graft_draw from SQL is byte-identical to Sampling.unitDraw") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    GraftExtensions.register(spark)
    val viaSql = spark.range(0, 200)
      .createOrReplaceTempView("__draw_ids")
    val sqlDraws = spark
      .sql("SELECT id, graft_draw(id, 'salty') AS d FROM __draw_ids")
      .as[(Long, String)].collect().toMap
    val colDraws = spark.range(0, 200)
      .select(col("id"),
        graft.ops.Sampling.unitDraw(col("id"), "salty").as("d"))
      .as[(Long, String)].collect().toMap
    assert(sqlDraws == colDraws)
  }

  test("graft_zvalue from SQL matches Layout.zValue") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    GraftExtensions.register(spark)
    val got = spark
      .sql("SELECT graft_zvalue(12345, 54321) AS z")
      .as[Long].collect().head
    val want = Seq((12345, 54321)).toDF("a", "b")
      .select(graft.ops.Layout.zValue(col("a"), col("b")))
      .as[Long].collect().head
    assert(got == want)
  }

  test("graft_cosine is callable from SQL and matches hand computation") {
    GraftExtensions.register(spark)
    val got = spark
      .sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(got == 1.0)
    val ortho = spark
      .sql("SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(ortho == 0.0)
  }

  test("graft_redact matches the Column face byte-for-byte") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val s = "mail a@b.co from 10.0.0.1 or +1 555-019-9 id 123456789012"
    val viaSql = spark.sql(
        s"SELECT graft_redact('$s') AS r")
      .collect()(0).getString(0)
    val viaColumn = Seq(s).toDF("t")
      .select(graft.ops.Text.redactPii(
        org.apache.spark.sql.functions.col("t")))
      .collect()(0).getString(0)
    assert(viaSql == viaColumn)
    assert(viaSql == "mail <EMAIL> from <IP> or <PHONE> id <NUM>")
  }
}
