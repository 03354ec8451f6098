package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel for n-signature MinHash over a string set — shared by
  * interpreted eval and generated code ([[RollingHash]] pattern).
  *
  * One xxhash64 per element, then n cheap bijective permutations
  * h_i(x) = A_i·x + B_i (A_i odd, 64-bit wrap — a valid permutation of
  * the hash space, the standard multiply-shift MinHash family), with a
  * running min per i. Replaces the explode → groupBy → n×min(xxhash64)
  * aggregation plan, which shuffles |set| rows per input row and
  * re-hashes every element n times: here the whole signature is one
  * tight per-row loop inside whole-stage codegen, no shuffle at all.
  * Wrapping multiply is intentional and safe here — this runs as JVM
  * long arithmetic inside the expression kernel, outside ANSI SQL
  * overflow checking.
  */
object MinHash {

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def permParams(n: Int, seed: Long): (Array[Long], Array[Long]) = {
    val a = new Array[Long](n)
    val b = new Array[Long](n)
    var i = 0
    while (i < n) {
      a(i) = splitmix64(seed + 2L * i) | 1L
      b(i) = splitmix64(seed + 2L * i + 1L)
      i += 1
    }
    (a, b)
  }

  /** n signed-min signatures of the string set; null for an empty set
    * (an empty blocking set must produce NO band keys, not colliding
    * sentinel keys).
    */
  def sigs(arr: ArrayData, n: Int, seed: Long): ArrayData = {
    val len = arr.numElements()
    if (len == 0) return null
    val (a, b) = permParams(n, seed)
    val mins = Array.fill(n)(Long.MaxValue)
    var e = 0
    while (e < len) {
      val s = arr.getUTF8String(e)
      val base = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      var i = 0
      while (i < n) {
        val h = base * a(i) + b(i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  /** Same over a set already represented by 64-bit element hashes
    * (the hashed-shingle linking path): the element IS the base hash —
    * re-mixed through XXH64.hashLong so the signature family stays
    * independent of however the caller hashed its elements.
    */
  def sigsLong(arr: ArrayData, n: Int, seed: Long): ArrayData = {
    val len = arr.numElements()
    if (len == 0) return null
    val (a, b) = permParams(n, seed)
    val mins = Array.fill(n)(Long.MaxValue)
    var e = 0
    while (e < len) {
      val base = XXH64.hashLong(arr.getLong(e), seed)
      var i = 0
      while (i < n) {
        val h = base * a(i) + b(i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }
}

/** minhash_sigs(array<string> | array<long>, n, seed) — n MinHash
  * signatures of a shingle set (strings, or elements pre-hashed to 64
  * bits), null on empty input. Sits in the hottest loop of
  * entity-linking candidate generation (every surface form, every
  * signature), hence a native codegen'd Expression.
  */
case class MinHashSigs(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) if n > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string> or array<long> with n > 0, got $other (n=$n)")
  }

  private def kernel: String = child.dataType match {
    case ArrayType(LongType, _) => "sigsLong"
    case _ => "sigs"
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(arr: Any): Any = child.dataType match {
    case ArrayType(LongType, _) =>
      MinHash.sigsLong(arr.asInstanceOf[ArrayData], n, seed)
    case _ => MinHash.sigs(arr.asInstanceOf[ArrayData], n, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel may return null (empty set) even for a non-null child, so
    // nullSafeCodeGen with an explicit post-call null check
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinHash.$kernel($a, $n, ${seed}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  /** Column API. */
  def apply(shingles: Column, n: Int, seed: Long): Column =
    ColumnBridge.column(new MinHashSigs(ColumnBridge.expression(shingles), n, seed))
}
