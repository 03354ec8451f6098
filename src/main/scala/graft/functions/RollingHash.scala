package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the rolling-hash fingerprint — shared by the
  * interpreted eval and the generated code (the standard pattern of
  * Spark's own built-ins: codegen emits a static call, so the
  * expression stays inside whole-stage codegen with no fallback).
  */
object RollingHash {
  /** Polynomial base; arithmetic wraps mod 2^64 (exact on Long). */
  final val Base = 1000003L

  /** Minimum rolling hash over all `window`-byte spans of the UTF-8
    * bytes — a 1-permutation MinHash over the byte-shingle set: equal
    * for identical content, stable under row order, and cheap enough
    * to fingerprint 100 TB of text in one codegen'd scan.
    * Shorter-than-window (non-empty) input hashes its whole bytes;
    * empty input returns 0.
    */
  def minHash(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) mod 2^64
    var pow = 1L
    var k = 1
    while (k < w) { pow *= Base; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * pow) * Base + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** rolling_minhash(str, window) — custom Catalyst expression with real
  * codegen (SURVEY.md §4.2 kept the option open; this is the one
  * operator worth a native Expression: per-row fingerprinting sits in
  * the hottest scan loop of the dedup pipeline).
  */
case class RollingMinHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_minhash expects (string, int), got " +
        s"(${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_minhash"

  override protected def nullSafeEval(str: Any, window: Any): Any =
    RollingHash.minHash(str.asInstanceOf[UTF8String],
      window.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, w) =>
      s"graft.functions.RollingHash.minHash($s, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingMinHash =
    copy(left = newLeft, right = newRight)
}

object functions {
  /** Column API for the fingerprint expression. */
  def rolling_minhash(text: Column, window: Int): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(window)))

  /** SQL registration: makes `rolling_minhash(col, w)` usable from
    * spark.sql / expr strings in a given session.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_minhash", exprs => RollingMinHash(exprs(0), exprs(1)),
      "scala_udf")
}
