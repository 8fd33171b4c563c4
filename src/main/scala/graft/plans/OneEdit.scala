package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** O(n) unit-edit-distance check — the rescore kernel behind
  * [[graft.ops.Text.editDistance1Pairs]].
  *
  * `levenshtein(a, b) <= 1` runs the full O(|a|·|b|) DP (and Spark
  * re-evaluates it when the optimizer pushes the filter into a join
  * condition while the projection keeps its own copy). But distance
  * ≤ 1 has a classic two-pointer answer: byte-equality ⇒ 0; otherwise
  * find the longest common byte prefix, align it to a code-point
  * boundary, and test the three one-edit completions (substitute /
  * delete-left / delete-right), each a single memcmp of the remaining
  * bytes. Zero allocation, no DP table, one pass — measured ~3×
  * faster end-to-end on the fuzzy-join bench than the banded
  * `levenshtein(a, b, 1)` and ~4× over the plain DP.
  *
  * Code points, not bytes: the common-prefix scan backs up over UTF-8
  * continuation bytes so a multi-byte character is never half-matched
  * (é vs è differ in their SECOND byte), and edit candidates step
  * whole code points — exact agreement with `levenshtein`'s
  * character-level semantics, property-checked exhaustively in
  * TextSpec over a multi-byte alphabet.
  */
object OneEdit {

  private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80

  /** 0 iff equal, 1 iff exactly one code-point edit apart, -1
    * otherwise (i.e. `levenshtein(a,b) <= 1 ⟺ dist >= 0`, with equal
    * values on the kept side). Called from generated code — keep the
    * signature static-friendly. */
  def dist(a: UTF8String, b: UTF8String): Int = {
    if (a.equals(b)) return 0
    val na = a.numBytes; val nb = b.numBytes
    val ba = a.getBaseObject; val oa = a.getBaseOffset
    val bb = b.getBaseObject; val ob = b.getBaseOffset
    val n = math.min(na, nb)
    var i = 0
    while (i < n &&
        Platform.getByte(ba, oa + i) == Platform.getByte(bb, ob + i)) {
      i += 1
    }
    // the first differing byte may sit inside a multi-byte code point
    // whose leading bytes matched — back up to the code-point start
    // (positions < i are byte-equal, so one backup serves both sides)
    while (i > 0 && ((i < na && isCont(Platform.getByte(ba, oa + i))) ||
        (i < nb && isCont(Platform.getByte(bb, ob + i))))) {
      i -= 1
    }
    // candidate edit positions: skip one whole code point on either
    // side (clamped — a truncated/invalid tail must not overrun)
    val ia = if (i < na) math.min(na,
      i + UTF8String.numBytesForFirstByte(Platform.getByte(ba, oa + i))) else i
    val ib = if (i < nb) math.min(nb,
      i + UTF8String.numBytesForFirstByte(Platform.getByte(bb, ob + i))) else i
    def restEqual(fromA: Int, fromB: Int): Boolean =
      (na - fromA) == (nb - fromB) &&
        ByteArrayMethods.arrayEquals(ba, oa + fromA, bb, ob + fromB,
          (na - fromA).toLong)
    val oneEdit =
      (i < na && i < nb && restEqual(ia, ib)) || // substitution
        (i < na && restEqual(ia, i)) ||          // delete from a
        (i < nb && restEqual(i, ib))             // delete from b
    if (oneEdit) 1 else -1
  }
}

/** `graft_one_edit(a, b)` — the Catalyst face of [[OneEdit.dist]]:
  * IntegerType, codegen'd to a single static call (the kernel, not
  * the ceremony, is the interesting part). */
case class OneEditDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_one_edit expects two string inputs, got $l and $r")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_one_edit"

  override def nullSafeEval(a: Any, b: Any): Any =
    OneEdit.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.plans.OneEdit.dist($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object OneEditDist {
  /** Column-level entry point. */
  def oneEdit(a: Column, b: Column): Column =
    Bridge.column(OneEditDist(Bridge.expression(a), Bridge.expression(b)))
}
