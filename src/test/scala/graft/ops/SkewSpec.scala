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

  private lazy val dim = (Seq("hot") ++ (1 to 1000).map(i => s"cold$i"))
    .zipWithIndex.map { case (k, i) => (k, s"attr$i") }
    .toDF("key", "attr")

  test("saltedJoin equals the plain inner join on skewed keys") {
    val plain = skewed.join(dim, Seq("key"))
      .select("key", "id", "v", "attr")
      .as[(String, Long, Double, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("key"), saltBuckets = 4)
      .select("key", "id", "v", "attr")
      .as[(String, Long, Double, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals the plain left join (unmatched rows kept once)") {
    val partialDim = dim.filter(col("key") =!= "hot") // hot key unmatched
    val plain = skewed.join(partialDim, Seq("key"), "left")
      .select("key", "id", "v", "attr")
      .as[(String, Long, Double, Option[String])].collect().sorted.toSeq
    val salted = Skew.saltedJoin(
        skewed, partialDim, Seq("key"), saltBuckets = 4, joinType = "left")
      .select("key", "id", "v", "attr")
      .as[(String, Long, Double, Option[String])].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin spreads the hot key's output over multiple tasks") {
    // disable auto-broadcast so the join actually shuffles (the regime
    // salting is for: a dim too large to broadcast) and AQE coalescing
    // (which re-merges KB-sized test partitions and hides the spread)
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val spread = Skew.saltedJoin(skewed, dim, Seq("key"), saltBuckets = 4)
        .filter(col("key") === "hot")
        .select(spark_partition_id().as("p"))
        .distinct().count()
      assert(spread > 1, "hot key still funnels through one reducer")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
