package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  // heavy-hitter key "hot" (90%) + long tail, spread over partitions
  private lazy val skewed = (1 to 1000).map { i =>
    val k = if (i % 10 != 0) "hot" else s"cold$i"
    (k, i.toLong, i * 0.5)
  }.toDF("key", "id", "v").repartition(8)

  test("saltedCountSum equals plain groupBy count/sum") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(String, Long, Double)].collect().map { case (k, n, s) => k -> (n, s) }.toMap
    val salted = Skew.saltedCountSum(
        skewed, Seq("key"), Map("sv" -> col("v")), saltBuckets = 4)
      .as[(String, Long, Double)].collect().map { case (k, n, s) => k -> (n, s) }.toMap
    assert(salted == plain)
  }

  test("saltedCountDistinct equals plain countDistinct") {
    val withDups = skewed.withColumn("dup", col("id") % 7)
    val plain = withDups.groupBy("key")
      .agg(countDistinct("dup").as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCountDistinct(
        withDups, Seq("key"), col("dup"), saltBuckets = 4)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salt spreads a hot key over multiple partial groups") {
    val parts = skewed.withColumn("__salt", Skew.saltCol(4))
      .filter(col("key") === "hot")
      .select("__salt").distinct().count()
    assert(parts > 1) // the hot key no longer funnels through one group
  }
}
