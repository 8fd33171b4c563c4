package graft

import graft.core.QueryDef
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query modules contribute `Seq[QueryDef]`; this object flattens them
  * into the `queries` / `oracleSql` maps the driver consumes.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ NestedQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++ SourceQueries.defs ++
      IndexQueries.defs ++ MediaQueries.defs ++ StreamQueries.defs ++
      AnalyticsQueries.defs ++ SamplingQueries.defs ++
      PackingQueries.defs ++ RankingQueries.defs ++ CdcQueries.defs ++
      GraphQueries.defs ++ LinalgQueries.defs ++ DensityQueries.defs ++
      DriftQueries.defs ++ QualityQueries.defs ++ ChatQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_dims")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
