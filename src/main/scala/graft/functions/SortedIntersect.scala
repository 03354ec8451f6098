package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Static kernel: |a ∩ b| for two SORTED long arrays — one linear
  * merge, zero allocation. The built-in `array_intersect` builds an
  * OpenHashSet AND materializes the intersection array per evaluation;
  * the linking scorer evaluates millions of candidate pairs per stage
  * and needs only the COUNT, so the hash set and the output array are
  * pure overhead in the engine's hottest join.
  */
object SortedArrays {
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** sorted_intersect_count(array<long>, array<long>) — intersection
  * SIZE of two sets represented as SORTED, DISTINCT long arrays.
  * PRECONDITION (caller-owned, not checked): both arrays ascending
  * with no duplicates — [[graft.link.Linking.withShingles]] sorts at
  * the source, so every stored shingle table carries the invariant.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<long>, got $other")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrays.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedArrays.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column API. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
