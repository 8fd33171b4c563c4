package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide output-contract net: the driver's compare harness hashes
  * cell values through a pandas sort, which cannot order array /
  * struct / map cells (round 10 shipped `q_dedup_provenance` red for
  * exactly this). Every registered query must therefore project
  * nested columns through `Canon.js` (→ `<name>_json` string) before
  * registration — see `queries/Canon.scala`. This spec walks every
  * face's ANALYZED schema (no execution needed) and fails on any
  * top-level complex column, so the class of harness failure cannot
  * recur.
  */
class CanonSweepSpec extends AnyFunSuite {
  private lazy val spark = WithSpark.session
  private val d = "/root/testdata/sf0.001"

  test("no registered query emits a top-level array/struct/map column") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema =
        try fn(spark, d).schema
        catch { case e: Throwable => fail(s"$name failed to analyze: $e") }
      val nested = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] => f.name
      }
      if (nested.nonEmpty)
        offenders += s"$name(${nested.mkString(",")})"
    }
    assert(offenders.isEmpty,
      "un-canonicalized nested output columns (wrap in Canon.js) in: " +
        offenders.mkString(", "))
  }
}
