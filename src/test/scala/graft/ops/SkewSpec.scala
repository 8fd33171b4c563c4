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

  test("hot-key stress: one key holding 50% of the fact stays within " +
      "~2x of the mean reducer load under salting") {
    // the scale claim made in the scaladoc, measured: a key owning
    // half the fact side must NOT own half a reducer. 16k fact rows,
    // 8k under one key, 64 salt buckets, 16 reducers.
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "16")
    val prev = conf.map { case (k, _) => k -> spark.conf.get(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = (1 to 16000).map { i =>
        (if (i % 2 == 0) "hot" else s"cold${i % 500}", i.toLong)
      }.toDF("key", "id").repartition(64)
      val d = (Seq("hot") ++ (0 until 500).map(i => s"cold$i"))
        .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "attr")
      def partitionLoads(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
        .select(spark_partition_id().as("p"))
        .groupBy("p").count().as[(Int, Long)].collect().map(_._2).toSeq
      val unsalted = partitionLoads(fact.join(d, Seq("key")))
      val salted = partitionLoads(
        Skew.saltedJoin(fact, d, Seq("key"), saltBuckets = 64))
      assert(salted.sum == unsalted.sum, "row counts must match")
      val mean = salted.sum.toDouble / salted.size
      info(s"unsalted max=${unsalted.max} salted max=${salted.max} " +
        f"mean=$mean%.0f")
      // unsalted: the hot key funnels 8k rows through ONE reducer
      assert(unsalted.max >= 8000, "fixture drifted: hot key not funneled")
      // salted: worst reducer within ~2x of the mean
      assert(salted.max <= 2 * mean,
        s"salting left a reducer at ${salted.max} rows (mean $mean)")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
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
