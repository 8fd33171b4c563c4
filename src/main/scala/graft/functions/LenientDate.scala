package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import java.text.SimpleDateFormat
import java.time.{LocalDate, Period, ZoneId}

/** Bug-compatible lenient date parsing (reference: EtlUtils.scala:9-27 +
  * ProcessETLUtils.scala:481-489). Java `SimpleDateFormat` is lenient by
  * default, so `11/22/2009` parses under `d/M/yyyy` by month-overflow —
  * the reference's golden outputs depend on this (SURVEY.md §2.6 Date
  * note). Kept as a UDF on purpose: exact `SimpleDateFormat` semantics
  * are not expressible in native Catalyst date functions. Only for
  * parity paths; prefer [[GraftFunctions.multiFormatDate]] elsewhere.
  */
object LenientDate {
  /** Exactly the reference's pattern list (EtlUtils.scala:9-14): the
    * four slash variants, nothing else — ISO strings and 2-digit years
    * must FAIL here like they do in the reference (the native
    * [[GraftFunctions.multiFormatDate]] is the place for extensions).
    */
  private val Patterns =
    Seq("d/M/yyyy", "d/MM/yyyy", "dd/M/yyyy", "dd/MM/yyyy")

  /** First pattern that parses wins (lenient — may overflow fields).
    * Instant→LocalDate via the JVM-default zone, mirroring the
    * reference's `ZoneId.systemDefault()` round-trip
    * (EtlUtils.scala:25) — `SimpleDateFormat` parsed in the default
    * zone converts back cleanly only through the same zone.
    */
  def parse(s: String): Option[LocalDate] =
    if (s == null) None
    else Patterns.view.flatMap { p =>
      try {
        val fmt = new SimpleDateFormat(p) // lenient by default
        Some(fmt.parse(s).toInstant.atZone(ZoneId.systemDefault()).toLocalDate)
      } catch { case _: Exception => None }
    }.headOption

  /** Whole years between; -1 if either side unparseable. */
  def age(dob: String, to: String): Int =
    (parse(dob), parse(to)) match {
      case (Some(a), Some(b)) => Period.between(a, b).getYears
      case _                  => -1
    }

  val ageUdf = udf((dob: String, to: String) => age(dob, to))

  def lenientAge(dob: Column, to: Column): Column = ageUdf(dob, to)
}
