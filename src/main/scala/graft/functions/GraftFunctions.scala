package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import java.text.Normalizer

/** Scalar-function library re-expressing the reference's helpers
  * (SURVEY.md §2.6) as native Spark `Column` expressions — everything
  * stays inside whole-stage codegen; the only UDF surface is the
  * lenient-date parity fallback in [[LenientDate]].
  */
object GraftFunctions {

  /** Truthy string set (reference: processes/ProcessETLUtils.scala:509-517).
    * Accepts YES/Yes/yes/TRUE/True/true/Y/y/"1"/1.
    */
  private val TruthyValues =
    Seq("YES", "Yes", "yes", "TRUE", "True", "true", "Y", "y", "1")

  /** String-truthiness → BooleanType
    * (reference: ProcessETLUtils.scala:509-517 `isTrue`). */
  def truthy(c: Column): Column =
    when(c.cast(StringType).isin(TruthyValues: _*), lit(true))
      .otherwise(lit(false))

  /** Count ≥ 1 → BooleanType (reference: ProcessETLUtils.scala:499-501
    * `toBoolean`). */
  def nonZero(c: Column): Column = c.geq(1)

  /** null → "no-data" default (reference: ProcessETLUtils.scala:491-493
    * `notNullCol`). */
  def notNullCol(c: Column, default: String = "no-data"): Column =
    when(c.isNotNull, c).otherwise(lit(default))

  /** Non-null AND non-blank after trim (reference:
    * ProcessETLUtils.scala:495-497 `isNotBlank`). */
  def isNotBlank(c: Column): Column = c.isNotNull && trim(c) =!= ""

  /** `"Name (ID)"` display form (reference: ProcessETLUtils.scala:259). */
  def displayName(name: Column, id: Column): Column =
    concat(name, lit(" ("), id, lit(")"))

  /** Deterministic surrogate key: sha1 over "_"-joined entity + key
    * columns (reference: PreProcessUtils.scala:17-91 `addCQDGId`). */
  def entityKey(entity: String, keys: Column*): Column =
    sha1(concat_ws("_", (lit(entity) +: keys): _*))

  /** Same recipe with sha-256 — for deployments where sha1 is
    * disallowed, and the oracle-checkable variant (DuckDB 1.0 ships
    * sha256 but not sha1). */
  def entityKeySha256(entity: String, keys: Column*): Column =
    sha2(concat_ws("_", (lit(entity) +: keys): _*), 256)

  /** Table-name normalization: strip extension, NFD-decompose, drop
    * non-letters, lowercase (reference: EtlUtils.scala:16-21
    * `sanitize`). Driver-side (plain Scala), used on catalog names.
    */
  def sanitize(fileName: String): String = {
    // Truncate at the FIRST dot, like the reference ("a.b.tsv" → "a").
    val dot = fileName.indexOf('.')
    val noExt = if (dot > -1) fileName.substring(0, dot) else fileName
    Normalizer
      .normalize(noExt, Normalizer.Form.NFD)
      .replaceAll("[^a-zA-Z]", "")
      .toLowerCase
      .trim
  }

  /** Multi-format date parse, native. Spark's strict `d/M/yyyy` already
    * accepts 1- and 2-digit day/month, so the reference's four slash
    * variants (EtlUtils.scala:9-14) collapse to one pattern; `yyyy-MM-dd`
    * is a deliberate extension NOT in the reference (ISO inputs fail
    * there — use [[LenientDate]] when exact parity matters, including
    * its lenient month-overflow behavior).
    */
  def multiFormatDate(c: Column): Column = {
    val patterns = Seq("d/M/yyyy", "yyyy-MM-dd")
    coalesce(patterns.map(p => try_to_date(c, p)): _*)
  }

  /** Whole years between two multi-format string dates; -1 when either
    * fails to parse (reference: ProcessETLUtils.scala:481-489
    * `calculateAge`).
    */
  def ageBetween(dob: Column, to: Column): Column = {
    val d1 = multiFormatDate(dob)
    val d2 = multiFormatDate(to)
    when(d1.isNull || d2.isNull, lit(-1))
      .otherwise(floor(months_between(d2, d1) / 12).cast(IntegerType))
  }

  /** Age with "no-data" default on failure, as string (reference:
    * ProcessETLUtils.scala:519-526 `getAge`). */
  def ageOrNoData(dob: Column, to: Column): Column = {
    val age = ageBetween(dob, to)
    when(age === -1, lit("no-data")).otherwise(age.cast(StringType))
  }
}
