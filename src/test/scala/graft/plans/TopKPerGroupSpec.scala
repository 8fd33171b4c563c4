package graft.plans

import graft.WithSpark
import graft.ops.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("topK equals the window row_number formulation row-for-row") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val scored = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("cv"))
      .crossJoin(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cosine"))

    val viaWindow = scored
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet

    val viaTopK = TopKPerGroup.topK(
        scored, Seq("query_id"), "cosine", "neighbor_id", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet

    assert(viaTopK == viaWindow)
    assert(viaTopK.size == 8 * 5)
  }

  test("plans one shuffle on the group key and no sort") {
    val df = (1 to 100).map(i => (i % 5, i.toLong, i * 0.1))
      .toDF("g", "id", "score")
    val plan = TopKPerGroup.topK(
        df, Seq("g"), "score", "id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Sort ["), s"no global/window sort expected:\n$plan")
  }

  test("partial heap runs below the exchange, final above (like HashAggregate)") {
    val df = (1 to 100).map(i => (i % 5, i.toLong, i * 0.1))
      .toDF("g", "id", "score")
    val plan = TopKPerGroup.topK(df, Seq("g"), "score", "id", 3)
      .queryExecution.executedPlan.toString
    val iPartial = plan.indexOf("TopKPerGroupPartial")
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    val iFinal = plan.indexOf("TopKPerGroup ") // final node, trailing space
    assert(iPartial >= 0, s"partial node missing:\n$plan")
    assert(iExchange >= 0 && iFinal >= 0)
    // plan prints top-down: final < exchange < partial
    assert(iFinal < iExchange && iExchange < iPartial,
      s"partial/final straddle the exchange:\n$plan")
  }

  test("pre-clustered input: the partial advertises it, no second exchange") {
    val df = (1 to 100).map(i => (i % 5, i.toLong, i * 0.1))
      .toDF("g", "id", "score")
      .repartition(col("g"))
    val plan = TopKPerGroup.topK(df, Seq("g"), "score", "id", 3)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"the explicit repartition must be the only exchange:\n$plan")
  }

  test("partial pre-selection caps what a constant global group shuffles") {
    // 8 input partitions, one global group: the exchange input is fed
    // by the partial heaps — ≤ k rows each — not the full frame
    val df = spark.range(0, 10000, 1, 8)
      .select(lit(0).as("g"), col("id"),
        (col("id") % 97).cast("double").as("score"))
    val exec = TopKPerGroup.topK(df, Seq("g"), "score", "id", 7)
    val rows = exec.select("id", "rank").as[(Long, Int)].collect().toSet
    // correctness under the split: global top 7 of (id % 97) desc, id asc
    assert(rows == (0 until 7).map(i => (96L + 97 * i, i + 1)).toSet)
  }

  test("handles groups smaller than k and exact ties") {
    val df = Seq((1, 10L, 2.0), (1, 11L, 2.0), (2, 20L, 1.0))
      .toDF("g", "id", "score")
    val got = TopKPerGroup.topK(
        df, Seq("g"), "score", "id", 5)
      .select("g", "id", "rank").as[(Int, Long, Int)].collect().toSet
    // equal scores break ties by id ascending
    assert(got == Set((1, 10L, 1), (1, 11L, 2), (2, 20L, 1)))
  }

  test("null and NaN scores order like the window desc formulation") {
    // Spark desc ordering: NaN greatest (rank 1), nulls last
    val df = Seq(
      (1, 10L, Some(1.0)), (1, 11L, Some(Double.NaN)), (1, 12L, None),
      (1, 13L, Some(Double.PositiveInfinity)),
      (1, 14L, Some(Double.NegativeInfinity)))
      .toDF("g", "id", "score")
    val viaWindow = df
      .withColumn("rank", row_number().over(Window.partitionBy("g")
        .orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 4)
      .select("id", "rank").as[(Long, Int)].collect().toSet
    val viaTopK = TopKPerGroup.topK(df, Seq("g"), "score", "id", 4)
      .select("id", "rank").as[(Long, Int)].collect().toSet
    assert(viaTopK == viaWindow)
    assert(viaTopK == Set((11L, 1), (13L, 2), (10L, 3), (14L, 4)))
  }

  test("merge law: topk(topk(state) ∪ batch) == topk(all) — the " +
      "incremental-maintenance contract (insert-only)") {
    val rnd = new scala.util.Random(7)
    val all = (1L to 2000L).map(i =>
      (s"g${i % 5}", i, rnd.nextInt(1000).toDouble))
    def topSet(df: org.apache.spark.sql.DataFrame) =
      TopKPerGroup.topK(df, Seq("g"), "score", "id", k = 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
        .toSet
    for (cut <- Seq(0.3, 0.7)) {
      val (a, b) = all.partition(t => rnd.nextDouble() < cut)
      val state = TopKPerGroup.topK(
          a.toDF("g", "id", "score"), Seq("g"), "score", "id", k = 4)
        .drop("rank")
      val merged = topSet(state.unionByName(b.toDF("g", "id", "score")))
      assert(merged == topSet(all.toDF("g", "id", "score")))
    }
  }

  test("rejects non-Double score and non-Long tie columns at plan time") {
    val df = Seq((1, 10, 2.5f)).toDF("g", "id", "score")
    assertThrows[IllegalArgumentException] {
      TopKPerGroup.topK(df, Seq("g"), "score", "id", 1) // Float score
    }
    val df2 = Seq((1, 10, 2.5)).toDF("g", "id", "score")
    assertThrows[IllegalArgumentException] {
      TopKPerGroup.topK(df2, Seq("g"), "score", "id", 1) // Int tie
    }
  }
}
