package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Static kernel for hyperplane sign-LSH band keys — shared by the
  * interpreted eval and the generated code (same pattern as
  * [[RollingHash]]: codegen emits a static call, so the expression
  * stays inside whole-stage codegen with no fallback).
  *
  * Hyperplanes are Rademacher (±1 per coordinate), drawn from a
  * splitmix64 stream seeded by (seed, coordinate) — deterministic at
  * any dimension with no fitted model to broadcast, and ±1 projections
  * satisfy the sign-LSH collision property for dense vectors (by CLT
  * the projection of the difference vector behaves Gaussian): a pair
  * at angle θ flips each sign bit with probability θ/π.
  */
object SignLsh {

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** `bands` compound keys, each packing `bitsPerBand` sign bits of
    * independent Rademacher projections — one tight pass over the
    * vector: per coordinate, (nBits/64) hashes supply all sign bits.
    * Null for an empty or all-zero vector (same contract as
    * [[MinHash.sigs]]): a degenerate embedding carries no direction,
    * and giving all of them the same all-zero sentinel keys would make
    * every zero vector collide with every other in EVERY band — a
    * quadratic candidate blowup in the bucket join.
    */
  def bandKeys(arr: ArrayData, bands: Int, bitsPerBand: Int,
               seed: Long): ArrayData = {
    val v = arr.toDoubleArray()
    val keys = bandKeysOf(v, bands, bitsPerBand, seed)
    if (keys == null) null else new GenericArrayData(keys)
  }

  /** Same kernel over a plain array — for computing a QUERY vector's
    * band keys on the driver (probe-side of [[graft.ops.Similarity.lshTopK]]).
    */
  def bandKeysOf(v: Array[Double], bands: Int, bitsPerBand: Int,
                 seed: Long): Array[Long] = {
    if (v.length == 0 || !v.exists(_ != 0.0)) return null
    val nBits = bands * bitsPerBand
    val dots = new Array[Double](nBits)
    val words = (nBits + 63) >>> 6
    var i = 0
    while (i < v.length) {
      val x = v(i)
      var h = splitmix64(seed ^ (i.toLong * 0x9E3779B97F4A7C15L))
      var bit = 0
      var w = 0
      while (w < words) {
        if (w > 0) h = splitmix64(h)
        var j = 0
        val lim = math.min(64, nBits - (w << 6))
        while (j < lim) {
          if (((h >>> j) & 1L) == 1L) dots(bit) += x else dots(bit) -= x
          bit += 1
          j += 1
        }
        w += 1
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = 0L
      var j = 0
      while (j < bitsPerBand) {
        k = (k << 1) | (if (dots(b * bitsPerBand + j) > 0) 1L else 0L)
        j += 1
      }
      keys(b) = k
      b += 1
    }
    keys
  }
}

/** sign_lsh_bands(array<double>, bands, bitsPerBand, seed) — band keys
  * for LSH candidate generation over an embedding column. Sits in the
  * hottest scan loop of near-dup detection (every row, every band),
  * hence a native codegen'd Expression rather than nested higher-order
  * functions (whose per-element interpreted lambdas re-evaluate the
  * shared projections per band) or a UDF (ser/de per row).
  */
case class SignLshBands(child: Expression, bands: Int, bitsPerBand: Int,
                        seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
      if bands > 0 && bitsPerBand > 0 && bitsPerBand <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bands expects array<double> with 0 < bitsPerBand <= 64, " +
        s"got $other (bands=$bands, bitsPerBand=$bitsPerBand)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_lsh_bands"

  override protected def nullSafeEval(arr: Any): Any =
    SignLsh.bandKeys(arr.asInstanceOf[ArrayData], bands, bitsPerBand, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel may return null (empty/all-zero vector) even for a
    // non-null child, so nullSafeCodeGen with an explicit post-call
    // null check (MinHashSigs pattern)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.SignLsh.bandKeys($a, $bands, $bitsPerBand, ${seed}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBands =
    copy(child = newChild)
}

object SignLshBands {
  /** Column API. */
  def apply(emb: Column, bands: Int, bitsPerBand: Int, seed: Long): Column =
    ColumnBridge.column(new SignLshBands(ColumnBridge.expression(emb),
      bands, bitsPerBand, seed))
}
