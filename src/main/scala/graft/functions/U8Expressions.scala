package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** uint8 / int8 vector kernels (reference supports uint8/int8 vector dtypes
  * — flat_index.py:195-197; queries stay float32, index.py:309-312, so the
  * distances are ASYMMETRIC: float query vs byte-packed stored vector).
  *
  * Stored vectors are BinaryType — one byte per dimension, 4x denser than
  * array<float> on disk and in shuffle, which is the point at 100 TB.
  * `signed=false` widens with `(b & 0xFF)` (uint8), `signed=true` keeps the
  * JVM byte sign (int8) — SURVEY §7.3's unsigned-byte pitfall.
  *
  * Like the float family, both eval and codegen dispatch through
  * [[graft.functions.VecKernels]] (Panama lanes after a one-pass widen
  * when the module is present — the reference's u8 AVX scoring analogue;
  * scalar otherwise), so the two execution modes of a plan agree. */
abstract class ByteVectorDistance extends BinaryExpression {
  def signed: Boolean

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, binary), got ${l.catalogString}, ${r.catalogString}")
    }
  }
  override def dataType: DataType = FloatType
  override def nullIntolerant: Boolean = true

  /** Static [[VecKernels]] method this expression maps to (dims check
    * included there). */
  protected def kernelName: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (q, v) => s"graft.functions.VecKernels.$kernelName($q, $v, $signed)")
}

/** Squared L2 between a float query and a byte-packed vector. */
case class U8SumOfSquaresDistance(left: Expression, right: Expression, signed: Boolean = false)
    extends ByteVectorDistance {
  override def prettyName: String = "dist_sos_u8"
  override protected def kernelName: String = "sosU8"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.sosU8(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]], signed)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product between a float query and a byte-packed vector. */
case class U8DotProduct(left: Expression, right: Expression, signed: Boolean = false)
    extends ByteVectorDistance {
  override def prettyName: String = "dot_product_u8"
  override protected def kernelName: String = "dotU8"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.dotU8(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]], signed)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance between a float query and a byte-packed vector. */
case class U8CosineDistance(left: Expression, right: Expression, signed: Boolean = false)
    extends ByteVectorDistance {
  override def prettyName: String = "dist_cosine_u8"
  override protected def kernelName: String = "cosineDistanceU8"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.cosineDistanceU8(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]], signed)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Pack an array<float> of byte-ranged values into binary storage
  * (values outside the dtype range are clamped). */
case class PackBytes(child: Expression, signed: Boolean = false)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_bytes"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    val lo = if (signed) -128.0f else 0.0f
    val hi = if (signed) 127.0f else 255.0f
    var i = 0
    while (i < n) {
      val x = math.max(lo, math.min(hi, a.getFloat(i)))
      out(i) = if (signed) x.toByte else (x.toInt & 0xFF).toByte
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Inverse of [[PackBytes]]: widen binary byte-packed storage back to
  * array<float> (consolidation re-ingests through the float path). */
case class UnpackBytes(child: Expression, signed: Boolean = false)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.catalogString}")
    }
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unpack_bytes"

  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val out = new Array[Float](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = if (signed) b(i).toFloat else (b(i) & 0xFF).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
