package graft.functions

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite with WithSpark {
  import GraftFunctions._

  private def eval1[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")
  }

  test("truthy accepts the reference's truthy set and rejects others") {
    import spark.implicits._
    val got = Seq("YES", "Yes", "yes", "TRUE", "True", "true", "Y", "y", "1",
        "no", "FALSE", "", "2")
      .toDF("v").select(truthy(col("v")).as("b")).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, true, true, true, true, true, true, true,
      false, false, false, false))
  }

  test("truthy on null is false") {
    import spark.implicits._
    val got = Seq(Option.empty[String]).toDF("v")
      .select(truthy(col("v")).as("b")).as[Boolean].collect().head
    assert(!got)
  }

  test("notNullCol defaults nulls to no-data") {
    import spark.implicits._
    val got = Seq(Some("x"), None).toDF("v")
      .select(notNullCol(col("v")).as("r")).as[String].collect().toSeq
    assert(got == Seq("x", "no-data"))
  }

  test("isNotBlank rejects null, empty, whitespace") {
    import spark.implicits._
    val got = Seq(Some("a"), Some(""), Some("   "), None).toDF("v")
      .select(isNotBlank(col("v")).as("b"))
      .collect().map(r => Option(r.get(0))).toSeq
    // null: isNotNull=false short-circuits the AND → false (not null)
    assert(got == Seq(Some(true), Some(false), Some(false), Some(false)))
  }

  test("displayName formats Name (ID)") {
    assert(eval1[String](displayName(lit("Asthma"), lit("HP:0002099")))
      == "Asthma (HP:0002099)")
  }

  test("entityKey is deterministic sha1 of entity_keys") {
    val expected = org.apache.commons.codec.digest.DigestUtils
      .sha1Hex("donor_ST0001_DO0001")
    assert(eval1[String](entityKey("donor", lit("ST0001"), lit("DO0001")))
      == expected)
  }

  test("sanitize strips extension, accents, non-letters, case") {
    assert(sanitize("family-history.tsv") == "familyhistory")
    assert(sanitize("Étude_2.csv") == "etude")
    assert(sanitize("donor.tsv") == "donor")
  }

  test("multiFormatDate parses the four reference patterns") {
    import spark.implicits._
    val got = Seq("6/9/1946", "25/12/2000", "2001-07-04", "bogus")
      .toDF("v").select(multiFormatDate(col("v")).cast("string").as("r"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("1946-09-06"), Some("2000-12-25"),
      Some("2001-07-04"), None))
  }

  test("ageBetween computes whole years, -1 on parse failure") {
    import spark.implicits._
    val got = Seq(
        ("6/9/1946", "6/9/2021"),
        ("6/9/1946", "5/9/2021"),
        ("oops", "6/9/2021"))
      .toDF("dob", "to")
      .select(ageBetween(col("dob"), col("to")).as("age"))
      .as[Int].collect().toSeq
    assert(got == Seq(75, 74, -1))
  }

  test("ageOrNoData stringifies with no-data fallback") {
    import spark.implicits._
    val got = Seq(("6/9/1946", "6/9/2021"), ("oops", "x"))
      .toDF("dob", "to")
      .select(ageOrNoData(col("dob"), col("to")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("75", "no-data"))
  }
}

class LenientDateSpec extends AnyFunSuite with WithSpark {
  test("lenient parse accepts month-overflow like SimpleDateFormat") {
    // 11/22/2009 under d/M/yyyy: month 22 overflows → 2010-10-11
    // (the reference's golden ages depend on this; SURVEY.md §2.6)
    assert(LenientDate.parse("11/22/2009")
      .contains(java.time.LocalDate.of(2010, 10, 11)))
  }

  test("lenient age matches Period.between semantics") {
    assert(LenientDate.age("6/9/1946", "6/9/2021") == 75)
    assert(LenientDate.age("bogus", "6/9/2021") == -1)
    assert(LenientDate.age(null, "6/9/2021") == -1)
  }

  test("lenientAge works as a column") {
    import spark.implicits._
    val got = Seq(("6/9/1946", "6/9/2021")).toDF("a", "b")
      .select(LenientDate.lenientAge(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("r"))
      .as[Int].collect().head
    assert(got == 75)
  }
}
