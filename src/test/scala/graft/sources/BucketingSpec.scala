package graft.sources

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("bucketed-to-bucketed join plans without a shuffle exchange") {
    val orders = (1 to 200).map(i => (i.toLong % 50, i.toLong, i * 1.5))
      .toDF("custkey", "orderkey", "total")
    val customers = (0 to 49).map(i => (i.toLong, s"c$i"))
      .toDF("custkey", "name")
    Bucketing.writeBucketed(orders, "b_orders", Seq("custkey"), 4)
    Bucketing.writeBucketed(customers, "b_customers", Seq("custkey"), 4)
    try {
      val bo = Bucketing.readBucketed(spark, "b_orders")
      val bc = Bucketing.readBucketed(spark, "b_customers")
      val joined = bo.join(bc, Seq("custkey"))
        .hint("merge") // force SMJ so broadcast doesn't mask bucketing
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 200)
      // correctness: bucketed join equals plain join
      val plainCount = orders.join(customers, Seq("custkey")).count()
      assert(joined.count() == plainCount)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customers")
    }
  }
}
