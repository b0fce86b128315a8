package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Seeded fast random rotation for RaBitQ-style quantization
  * (Gao & Long, SIGMOD 2024, arXiv:2405.12497; the structured-rotation
  * trick of Fastfood/FALCONN): each round applies a deterministic ±1
  * sign flip followed by a Walsh–Hadamard transform, so `rounds` rounds
  * approximate a uniform random rotation in O(d·rounds·log d) instead
  * of a dense d×d matvec. The composition is exactly orthonormal
  * (H/√d and diag(±1) both are), so angles and norms are preserved —
  * which is what lets sign bits taken AFTER the rotation carry equal
  * information per dimension even when the input data is anisotropic.
  *
  * Input shorter than a power of two is zero-padded (norm unchanged).
  * Native kernel + codegen call, same shape as [[TextHash]].
  */
object Rotation {

  /** splitmix64-style avalanche for the deterministic sign flips. */
  private def mix(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 31); x *= 0x94D049BB133111EBL; x ^= (x >>> 27)
    x
  }

  def fwhtRotateKernel(arr: ArrayData, seed: Long, rounds: Int): ArrayData = {
    val n0 = arr.numElements()
    var d = 1
    while (d < n0) d <<= 1
    val v = new Array[Float](d)
    var i = 0
    while (i < n0) { v(i) = arr.getFloat(i); i += 1 }
    val scale = (1.0 / math.sqrt(d)).toFloat
    var r = 0
    while (r < rounds) {
      i = 0
      while (i < d) {
        val h = mix(seed + r * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L)
        if ((h & 1L) == 1L) v(i) = -v(i)
        i += 1
      }
      var len = 1
      while (len < d) {
        var base = 0
        while (base < d) {
          var j = 0
          while (j < len) {
            val a = v(base + j); val b = v(base + j + len)
            v(base + j) = a + b; v(base + j + len) = a - b
            j += 1
          }
          base += len << 1
        }
        len <<= 1
      }
      i = 0
      while (i < d) { v(i) *= scale; i += 1 }
      r += 1
    }
    new GenericArrayData(v)
  }

  /** Asymmetric RaBitQ estimator kernel: `Σ_i (bit_i ? +q_i : -q_i)` —
    * the dot of a packed sign code (one long per 64 dims, the
    * [[graft.operators.Quantized.signCode]] layout) against a
    * FULL-PRECISION float query. The paper scores quantized documents
    * against the exact rotated query (only the doc side pays storage),
    * which is strictly more informative than sign-quantizing both sides.
    */
  def signDotKernel(code: ArrayData, q: ArrayData): Float = {
    val dq = q.numElements()
    var acc = 0f
    var i = 0
    while (i < dq) {
      val word = code.getLong(i >> 6)
      val qi = q.getFloat(i)
      acc += (if (((word >>> (i & 63)) & 1L) == 1L) qi else -qi)
      i += 1
    }
    acc
  }

  private val kernelClass = "graft.functions.Rotation"

  private case class FwhtRotate(child: Expression, seed: Long, rounds: Int)
      extends UnaryExpression {
    override def prettyName: String = "fwht_rotate"
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() = {
      require(child.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }, s"fwht_rotate expects array<float>, got ${child.dataType}")
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
    override def nullSafeEval(input: Any): Any =
      fwhtRotateKernel(input.asInstanceOf[ArrayData], seed, rounds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$kernelClass.fwhtRotateKernel($a, ${seed}L, $rounds)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private case class SignDot(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def prettyName: String = "sign_dot"
    override def dataType: DataType = FloatType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(code: Any, q: Any): Any =
      signDotKernel(code.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$kernelClass.signDotKernel($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** array<float> (any length) -> rotated array<float> of the next
    * power-of-two length.
    */
  def fwhtRotate(v: Column, seed: Long = 42L, rounds: Int = 3): Column =
    SqlBridge.column(FwhtRotate(SqlBridge.expr(v), seed, rounds))

  /** packed sign code (array<long>) · float query -> Σ ±q_i. */
  def signDot(code: Column, q: Column): Column =
    SqlBridge.column(SignDot(SqlBridge.expr(code), SqlBridge.expr(q)))
}
