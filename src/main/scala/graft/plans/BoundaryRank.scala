package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: rank(v) = #{b ∈ bounds : b ≤ v} for a
  * SORTED, DISTINCT boundary array — the equal-count bucket function
  * behind [[graft.ops.GraphStore]]'s quantile mode (bucket id of a
  * node = how many quantile boundaries it passed).
  *
  * Why it exists (the brief's extension ladder, option b): a binary
  * search is trivially a chain of `when` Columns, but Column
  * composition cannot SHARE subtrees — each of the ⌈log₂ B⌉ levels
  * references the running position three times, so the expression
  * tree grows 3^levels (measured: 76 boundaries → ~3⁸ nodes → 45 s of
  * driver-side planning/codegen per applyBatch, 19× worse at state
  * ×100 than ×10 — the plan, not the data, was the cost). The HOF
  * form `size(filter(bounds, b -> b <= v))` is linear in plan size
  * but O(B) interpreted work per row — corpus passes (init, compact)
  * pay it at millions of boundaries. This expression is O(log B) per
  * row via `java.util.Arrays.binarySearch` over ONE broadcast-shared
  * long[] reference object, O(1) in plan size, and rides inside
  * whole-stage codegen.
  */
case class BoundaryRank(child: Expression, bounds: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_boundary_rank expects a bigint input, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_boundary_rank"

  private def rankOf(v: Long): Long = {
    val idx = java.util.Arrays.binarySearch(bounds, v)
    if (idx >= 0) idx + 1L else -(idx.toLong) - 1L
  }

  override def nullSafeEval(v: Any): Any = rankOf(v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val arr = ctx.addReferenceObj("bounds", bounds, "long[]")
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = java.util.Arrays.binarySearch($arr, $x);
         |${ev.value} = $idx >= 0 ? (long) ($idx + 1) : -((long) $idx) - 1L;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BoundaryRank {
  /** Column-level entry point (classic-session bridge). */
  def rank(node: Column, bounds: Array[Long]): Column =
    Bridge.column(BoundaryRank(Bridge.expression(node), bounds))
}
