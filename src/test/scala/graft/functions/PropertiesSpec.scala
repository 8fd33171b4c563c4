package graft.functions

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests (SURVEY.md §5) for the scalar library.
  * Generators run with a fixed seed and the generated samples are
  * evaluated in ONE DataFrame per property (a DF per sample would be
  * hundreds of Spark jobs); failures are reproducible.
  */
class PropertiesSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("sanitize: idempotent, lowercase-letters-only, extension-stripping") {
    val nameGen = for {
      stem <- Gen.listOfN(8, Gen.frequency(
        8 -> Gen.alphaChar, 1 -> Gen.oneOf('é', 'à', 'ü', 'Ç'),
        1 -> Gen.oneOf('-', '_', '0', ' '))).map(_.mkString)
      ext <- Gen.oneOf("", ".tsv", ".json.gz", ".a.b")
    } yield (stem, ext)
    for ((stem, ext) <- samples(nameGen, 300, 1L)) {
      val s = GraftFunctions.sanitize(stem + ext)
      assert(s.matches("[a-z]*"), s"'$stem$ext' -> '$s'")
      assert(GraftFunctions.sanitize(s) == s, s"not idempotent on '$s'")
      // the extension never contributes (reference truncates at 1st dot)
      if (!stem.contains('.'))
        assert(s == GraftFunctions.sanitize(stem))
    }
    assert(GraftFunctions.sanitize("Café-História.tsv") == "cafehistoria")
  }

  test("truthy: exactly the reference's nine-string accept set") {
    val truthySet = Set("YES", "Yes", "yes", "TRUE", "True", "true",
      "Y", "y", "1")
    val strGen = Gen.frequency(
      3 -> Gen.oneOf(truthySet.toSeq),
      3 -> Gen.oneOf("NO", "no", "FALSE", "false", "0", "", " ", "yEs",
        "TRUE ", " 1", "2", "Ye"),
      2 -> Gen.alphaNumStr.map(_.take(6)))
    val in = samples(strGen, 400, 2L)
    val got = in.toDF("s")
      .select(col("s"), GraftFunctions.truthy(col("s")).as("t"))
      .as[(String, Boolean)].collect().toMap
    for (s <- in)
      assert(got(s) == truthySet.contains(s), s"truthy('$s')")
  }

  test("lenientAge equals java.time Period on well-formed slash dates") {
    val dateGen = for {
      epochDay <- Gen.chooseNum(-20000L, 30000L) // ~1915..2052
    } yield java.time.LocalDate.ofEpochDay(epochDay)
    val pairs = samples(
      for { a <- dateGen; b <- dateGen } yield (a, b), 300, 3L)
    def slash(d: java.time.LocalDate) =
      s"${d.getDayOfMonth}/${d.getMonthValue}/${d.getYear}"
    for ((a, b) <- pairs) {
      val expected = java.time.Period.between(a, b).getYears
      assert(LenientDate.age(slash(a), slash(b)) == expected,
        s"age(${slash(a)}, ${slash(b)})")
    }
    // month-overflow leniency: 11/22/2009 = day 11 of month 22 → Oct 2010
    assert(LenientDate.parse("11/22/2009")
      .contains(java.time.LocalDate.of(2010, 10, 11)))
  }

  test("native ageBetween is within one year of Period semantics and " +
      "non-negative for ordered dates") {
    val dateGen = Gen.chooseNum(-20000L, 30000L)
      .map(java.time.LocalDate.ofEpochDay)
    val pairs = samples(
      for { a <- dateGen; b <- dateGen } yield
        if (a.isAfter(b)) (b, a) else (a, b), 300, 4L)
    def slash(d: java.time.LocalDate) =
      s"${d.getDayOfMonth}/${d.getMonthValue}/${d.getYear}"
    val df = pairs.map { case (a, b) => (slash(a), slash(b)) }
      .toDF("dob", "to")
      .select(col("dob"), col("to"),
        GraftFunctions.ageBetween(col("dob"), col("to")).as("age"))
      .as[(String, String, Int)].collect()
    val expected = pairs.map { case (a, b) =>
      (slash(a), slash(b)) -> java.time.Period.between(a, b).getYears
    }.toMap
    for ((dob, to, age) <- df) {
      val p = expected((dob, to))
      assert(age >= 0, s"negative age for ($dob, $to)")
      // months_between's last-day-of-month rule can differ from Period
      // by at most one year (leap-day birthdays)
      assert(math.abs(age - p) <= 1, s"($dob, $to): native $age vs Period $p")
    }
  }

  test("entityKey sha1 matches MessageDigest over random key parts") {
    val partGen = Gen.listOfN(3, Gen.alphaNumStr.map(_.take(8)))
    val rows = samples(partGen, 200, 5L).map {
      case Seq(a, b, c) => (a, b, c)
      case other => (other.mkString, "x", "y")
    }
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        GraftFunctions.entityKey("ent", col("a"), col("b"), col("c"))
          .as("k"))
      .as[(String, String, String, String)].collect()
    val md = java.security.MessageDigest.getInstance("SHA-1")
    for ((a, b, c, k) <- got) {
      val expected = md.digest(s"ent_${a}_${b}_$c"
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(k == expected, s"sha1('ent_${a}_${b}_$c')")
    }
  }
}
