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
}
