package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration surface for graft's custom Catalyst expressions.
  *
  * Two entry points:
  *  - build-time: `SparkSession.builder().withExtensions(new
  *    GraftExtensions)` — the standard extension hook;
  *  - in-session: [[GraftExtensions.register]] on a live session
  *    (temp-function registry), which is what SparkEntry's
  *    driver-provided sessions use.
  *
  * After either, `graft_dot(a, b)` is callable from SQL text as well
  * as through the typed [[DotProduct.dot]] Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotDescriptor)
    e.injectFunction(GraftExtensions.cosineDescriptor)
  }
}

object GraftExtensions {
  private def dotBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
    DotProduct(exprs(0), exprs(1))
  }

  private def cosineBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_cosine takes exactly 2 arguments")
    CosineSim(exprs(0), exprs(1))
  }

  val dotDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    dotBuilder _)

  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
    cosineBuilder _)

  /** Register on a live session's temp-function registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineBuilder, "built-in")
  }
}
