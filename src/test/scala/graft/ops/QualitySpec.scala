package graft.ops

import graft.WithSpark
import graft.ops.Quality.Check._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("row-level checks fuse into one pass and honor NULL semantics: " +
    "only not_null counts NULLs as violations") {
    val df = Seq(
      (Some("a"), Some("X"), Some(5.0)),
      (None, Some("Y"), Some(100.0)), // null id; Y not allowed; 100 > hi
      (Some("c"), None, None) // nulls PASS in_set / in_range
    ).toDF("id", "flag", "qty")
    val r = report(Quality.expectations(df, Seq(
      NotNull("id"), InSet("flag", Seq("X")), InRange("qty", 0, 50),
      Matches("id", "^[a-z]$"))))
    assert(r("not_null:id") == ((3L, 1L, false)))
    assert(r("in_set:flag") == ((3L, 1L, false)))
    assert(r("in_range:qty") == ((3L, 1L, false)))
    assert(r("matches:id") == ((3L, 0L, true)))
  }

  test("unique counts surplus rows per key tuple, including NULL keys") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1), ("b", 1))
      .toDF("k1", "k2")
    val r = report(Quality.expectations(df, Seq(Unique(Seq("k1", "k2")))))
    // 6 rows, 3 distinct tuples -> 3 surplus
    assert(r("unique:k1,k2") == ((6L, 3L, false)))
    // struct-wrapped keys keep NULL-bearing tuples countable
    val withNull = Seq((Option.empty[String], 1), (None, 1), (Some("x"), 1))
      .toDF("k1", "k2")
    val rn = report(Quality.expectations(withNull, Seq(Unique(Seq("k1", "k2")))))
    assert(rn("unique:k1,k2") == ((3L, 1L, false)))
  }

  test("empty frame: zero rows, zero violations, all checks pass") {
    val df = Seq.empty[(String, Double)].toDF("id", "qty")
    val r = report(Quality.expectations(df,
      Seq(NotNull("id"), InRange("qty", 0, 1), Unique(Seq("id")))))
    assert(r.values.forall(_ == ((0L, 0L, true))))
  }

  test("fkOrphans: unmatched and NULL child keys are orphans; " +
    "clean FK passes") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = report(Quality.fkOrphans(child, Seq("ck"), parent, Seq("pk")))
    assert(r("fk:ck->pk") == ((4L, 2L, false)))
    val clean = Seq(1L, 2L).toDF("ck")
    val rc = report(Quality.fkOrphans(clean, Seq("ck"), parent, Seq("pk")))
    assert(rc("fk:ck->pk") == ((2L, 0L, true)))
  }

  test("observedChecks: the gate rides an unrelated action as observed " +
    "metrics — same numbers as expectations(), no second scan") {
    val df = Seq(
      (Some("a"), Some(5.0)), (None, Some(100.0)), (Some("c"), None))
      .toDF("id", "qty")
    val checks = Seq(NotNull("id"), InRange("qty", 0, 50))
    val (observed, obs) = Quality.observedChecks(df, checks)
    // the caller's OWN action — here a write to a scratch dir — is the
    // only job that runs
    observed.write.mode("overwrite").parquet(
      java.nio.file.Files.createTempDirectory("graft_obs").toString + "/p")
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("bad:not_null:id") == 1L)
    assert(m("bad:in_range:qty") == 1L)
    // Unique is rejected loudly (observed metrics cannot be distinct)
    intercept[IllegalArgumentException] {
      Quality.observedChecks(df, Seq(Unique(Seq("id"))))
    }
  }

  test("single-scan plan shape: the fused report reads its input once " +
    "(one scan leaf) regardless of check count") {
    val df = spark.range(1000).selectExpr("id", "cast(id % 7 as double) v",
      "cast(id % 3 as string) s")
    val plan = Quality.expectations(df, Seq(
      NotNull("id"), InRange("v", 0, 5), InSet("s", Seq("0", "1", "2")),
      Matches("s", "^[0-9]+$"), Unique(Seq("id"))))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if l.children.isEmpty => l
    }
    assert(scans.length == 1, s"expected one scan leaf, got:\n$plan")
  }

  test("fdCheck distinguishes a holding FD from a violated one") {
    import spark.implicits._
    val df = Seq((1L, "a", "x"), (1L, "a", "y"), (2L, "b", "z"))
      .toDF("k", "held", "broken")
    val hold = Quality.fdCheck(df, "k", "held").collect().head
    assert(hold.getString(0) == "k->held" && hold.getLong(1) == 2L &&
      hold.getLong(2) == 0L && hold.getBoolean(3))
    val broke = Quality.fdCheck(df, "k", "broken").collect().head
    assert(broke.getLong(2) == 1L && !broke.getBoolean(3))
  }

  test("survivorship: modal field wins, ties to smallest, nulls " +
      "never vote, rep is the min member id") {
    import spark.implicits._
    val df = Seq(
      (5L, "c1", Some("en"), "web"), (3L, "c1", Some("en"), "web"),
      (9L, "c1", Some("fr"), "api"),
      // c2: lang all null -> canon null; source tie web/api -> api
      (2L, "c2", None, "web"), (4L, "c2", None, "api"))
      .toDF("id", "c", "lang", "source")
    val got = Quality.survivorship(df, "id", org.apache.spark.sql
        .functions.col("c"), Seq("lang", "source"))
      .orderBy("rep_id").collect()
    assert(got(0).getLong(0) == 2L && got(0).getLong(1) == 2L)
    assert(got(0).isNullAt(2) && got(0).getString(3) == "api")
    assert(got(1).getLong(0) == 3L && got(1).getLong(1) == 3L)
    assert(got(1).getString(2) == "en" && got(1).getString(3) == "web")
  }

  test("Luhn card validation: checksum separates real cards from " +
      "off-by-one digit runs; separators strip; short runs reject; " +
      "redaction touches only valid candidates") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "pay 4539578763621486 now"),        // valid (Visa test)
      (2L, "pay 4539 5787 6362 1486 now"),     // valid, spaced
      (3L, "ref 4539578763621487 code"),       // checksum fails
      (4L, "code 123456789012 x"),             // 12 digits: too short
      (5L, "iban-ish 79927398713 no"))         // 11 digits: too short
      .toDF("id", "t")
    val got = rows
      .withColumn("valid", size(Text.luhnCards(col("t"))))
      .withColumn("red", Text.redactCards(col("t")))
      .select("id", "valid", "red")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    assert(got(1L) == ((1, "pay [CARD] now")))
    assert(got(2L) == ((1, "pay [CARD] now")))
    assert(got(3L) == ((0, "ref 4539578763621487 code")),
      "an invalid checksum must NOT redact")
    assert(got(4L)._1 == 0 && got(5L)._1 == 0)
  }

  test("IBAN mod-97: real IBANs validate, off-by-one and shouty " +
      "product codes reject, redaction touches only valid candidates") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "pay DE89370400440532013000 now"),  // valid (DE example)
      (2L, "to GB82WEST12345698765432 ok"),    // valid, with letters
      (3L, "ref DE89370400440532013001 x"),    // checksum off by one
      (4L, "sku AB12CDEF34567890 list"),       // candidate, invalid
      (5L, "code ab12cdef34567890 lower"))     // not a candidate
    val got = rows.toDF("id", "t")
      .select(col("id"), graft.ops.Text.redactIbans(col("t")).as("r"),
        org.apache.spark.sql.functions.size(
          graft.ops.Text.ibans(col("t"))).as("n"))
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "pay [IBAN] now", 1)))
    assert(got(2L) == ((2L, "to [IBAN] ok", 1)))
    assert(got(3L)._2.contains("DE89370400440532013001"),
      "an invalid mod-97 checksum must NOT redact")
    assert(got(4L)._3 == 0 && got(5L)._3 == 0)
  }

  test("conformalThreshold: exact order statistic, k=0 fallback, loud alpha") {
    import org.apache.spark.sql.functions.col
    val cal = (1 to 10).map(i => i * 10L).toDF("s")
    // n=10, alpha=0.1: k = (11*10)//100 = 1 -> smallest score
    val t1 = Quality.conformalThreshold(cal, col("s"), 10, 100)
      .as[(Long, Long, Long)].collect().head
    assert(t1 == ((10L, 1L, 10L)))
    // alpha=0.25: k = (11*25)//100 = 2 -> second smallest
    val t2 = Quality.conformalThreshold(cal, col("s"), 25, 100)
      .as[(Long, Long, Long)].collect().head
    assert(t2 == ((10L, 2L, 20L)))
    // calibration too small for alpha: k=0 -> keep everything
    val t0 = Quality.conformalThreshold(
        Seq(5L, 7L, 9L).toDF("s"), col("s"), 10, 100)
      .as[(Long, Long, Long)].collect().head
    assert(t0 == ((3L, 0L, Long.MinValue)))
    val e = intercept[IllegalArgumentException] {
      Quality.conformalThreshold(cal, col("s"), 0, 100)
    }
    assert(e.getMessage.contains("alpha"))
  }
}
