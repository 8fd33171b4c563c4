package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine similarity: dot(a,b) / (‖a‖·‖b‖) in ONE pass over the
  * two arrays, with `doGenCode` so the loop rides inside whole-stage
  * codegen.
  *
  * Why it exists: composing [[DotProduct]] three ways
  * (`dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`) walks the arrays
  * three times and re-reads each element from Tungsten memory per
  * walk. At brute-force scoring scale (corpus × query batch × 64+
  * floats) the traffic is the whole cost of the operator. The three
  * accumulators here sum in the same left-to-right element order as
  * the three separate DotProduct calls, so the result is BITWISE
  * identical to the composed form (asserted in SimilaritySpec).
  *
  * Zero vectors yield NaN (0/0), matching the composed form — callers
  * filter, and [[TopKPerGroup]] ranks NaN like the window formulation.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects two array<double> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // norms must cover the FULL arrays when lengths differ, to equal
    // the composed dot(a,a)/dot(b,b) forms
    var j = n
    while (j < x.numElements()) {
      val xi = x.getDouble(j); na += xi * xi; j += 1
    }
    var k = n
    while (k < y.numElements()) {
      val yi = y.getDouble(k); nb += yi * yi; k += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |for (int $i = $n; $i < $x.numElements(); $i++) {
         |  double $xi = $x.getDouble($i); $na += $xi * $xi;
         |}
         |for (int $i = $n; $i < $y.numElements(); $i++) {
         |  double $yi = $y.getDouble($i); $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-level entry point (classic-session bridge). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
