package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical driver-checkable forms for nested outputs.
  *
  * The driver's compare harness hashes cell VALUES through a pandas
  * sort, which cannot order array/struct cells — so every registered
  * query projects nested columns through `to_json` and the DuckDB
  * oracle mirrors it with its own `to_json`. The two engines'
  * compact-JSON forms are byte-identical for longs, strings, booleans,
  * dates, arrays, and structs, PROVIDED (measured, 2026-08):
  *
  *   - null struct fields: Spark must set `ignoreNullFields=false`
  *     (DuckDB always emits `"f":null`);
  *   - timestamps: Spark emits ISO-8601 `T`/`Z`, DuckDB a plain
  *     space — cast to a date/`yyyy-MM-dd` string BEFORE nesting;
  *   - money/decimal-ish doubles: Java switches to E-notation at 1e7
  *     and decimals keep scale differently — route through
  *     `decimal(18,2)` then string (`"1234567.80"` on both sides;
  *     DuckDB mirror: `x::DECIMAL(18,2)::VARCHAR`).
  *
  * Small doubles (quantities, scores < 1e7) round-trip identically and
  * may stay numeric.
  */
object Canon {

  /** Spark-side JSON canonicalization options. */
  val JsonOpts: Map[String, String] = Map("ignoreNullFields" -> "false")

  /** Nested column → canonical JSON string (null-safe: a null array or
    * struct yields SQL null, matching DuckDB's `to_json(NULL)`). */
  def js(c: Column): Column = to_json(c, JsonOpts)

  /** Money-ish double → fixed-scale string ("1234567.80"), matching
    * DuckDB `x::DECIMAL(18,2)::VARCHAR`. */
  def money(c: Column): Column = c.cast("decimal(18,2)").cast("string")

  /** Timestamp/date → `yyyy-MM-dd` string, matching DuckDB
    * `strftime(x, '%Y-%m-%d')`. */
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Project every complex (array/struct/map) column of `df` through
    * [[js]] as `<name>_json`, leaving scalars untouched — the blanket
    * driver-checkable form for wide index products. */
  def flattenNested(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType =>
          js(df.col(f.name)).as(f.name + "_json")
        case _ => df.col(f.name)
      }
    }.toIndexedSeq: _*)
  }
}
