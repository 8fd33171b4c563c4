package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registry entry: a Spark query plus (optionally) the equivalent
  * ANSI SQL for the DuckDB oracle. Modules contribute `Seq[QueryDef]`;
  * `graft.SparkEntry` flattens them into the driver contract maps.
  *
  * Column names in `run`'s output MUST match the oracle SQL's column
  * names exactly (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  def sql(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** Rows-only check (non-SQL-expressible op). */
  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
