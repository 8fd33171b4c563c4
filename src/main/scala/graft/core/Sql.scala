package graft.core

import org.apache.spark.sql.SparkSession

/** The raw-SQL front door: register every catalog table as a temp view
  * so `spark.sql("...")` text runs directly against the engine — a
  * reference user's analysts get ANSI SQL without touching the
  * DataFrame API. Views are lazy plan aliases (registration moves no
  * data), and the `events` view carries the SAME dual-encoding
  * normalization as [[Tables.events]], so SQL consumers are
  * encoding-agnostic too.
  *
  * The dialect-intersection discipline the oracle enforces everywhere
  * pays off here twice over: a query face can run ONE string through
  * BOTH `spark.sql` and DuckDB, proving parser-level compatibility,
  * not just semantic equivalence of two hand-written plans.
  */
object Sql {

  /** Register all testdata tables as temp views on `spark`. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      val df =
        if (t == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
}
