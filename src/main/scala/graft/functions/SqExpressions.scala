package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) kernels: per-dimension 8-bit affine
  * quantization of float vectors.
  *
  * The reference's lossy-compression story is product quantization
  * (src/include/index/ivf_pq_index.h); SQ8 is the classic middle point of
  * the same trade — 4x less scan IO than floats at far higher fidelity
  * than PQ's m-byte codes, with the same candidate-then-exact-re-rank
  * query shape. Codes are one byte per dimension:
  * `code_d = round((x_d - min_d) / scale_d)` clamped to [0, 255] with
  * `scale_d = (max_d - min_d) / 255` trained per dimension; query-time
  * distance is asymmetric (exact float query vs dequantized code), so the
  * only approximation is the stored side's rounding.
  *
  * Both kernels are codegen'd Catalyst expressions — the scoring loop
  * stays inside whole-stage codegen next to the parquet scan, exactly
  * like the PQ table-lookup functor ([[PqAsymmetricDistance]]).
  */

/** Encode a float vector into SQ8 codes: one byte per dimension.
  * A dimension with `scale_d = 0` (constant across the training set)
  * encodes as 0 and dequantizes to `min_d` exactly. */
case class Sq8Encode(
    child: Expression,
    mins: Array[Float],
    scales: Array[Float]) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(v: Any): Any =
    Sq8Encode.encode(v.asInstanceOf[ArrayData], mins, scales)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sqMins", mins, "float[]")
    val scalesRef = ctx.addReferenceObj("sqScales", scales, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.Sq8Encode.encode($a, $minsRef, $scalesRef);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Sq8Encode {
  def encode(v: ArrayData, mins: Array[Float], scales: Array[Float]): Array[Byte] = {
    val d = v.numElements()
    if (d != mins.length) throw new IllegalArgumentException(
      s"graft: sq8_encode dims $d != trained ${mins.length}")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val s = scales(i)
      val code = if (s == 0.0f) 0
        else {
          val c = Math.round((v.getFloat(i) - mins(i)) / s)
          if (c < 0) 0 else if (c > 255) 255 else c
        }
      out(i) = code.toByte
      i += 1
    }
    out
  }
}

/** Asymmetric SQ8 squared-L2: exact float query (`right`) vs dequantized
  * codes (`left`, binary) — `sum_d (q_d - (min_d + scale_d * code_d))^2`.
  * One fused loop; no float array is materialized per row. */
case class Sq8AsymmetricL2(
    left: Expression,
    right: Expression,
    mins: Array[Float],
    scales: Array[Float]) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_asymmetric_l2 requires (binary, array<float>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  }
  override def dataType: DataType = FloatType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_asymmetric_l2"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Sq8AsymmetricL2.distance(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[ArrayData], mins, scales)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sqMins", mins, "float[]")
    val scalesRef = ctx.addReferenceObj("sqScales", scales, "float[]")
    nullSafeCodeGen(ctx, ev, (codes, q) => {
      s"${ev.value} = graft.functions.Sq8AsymmetricL2.distance($codes, $q, $minsRef, $scalesRef);"
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Sq8AsymmetricL2 {
  def distance(codes: Array[Byte], q: ArrayData,
      mins: Array[Float], scales: Array[Float]): Float = {
    val d = codes.length
    if (q.numElements() != d) throw new IllegalArgumentException(
      s"graft: sq8_asymmetric_l2 query dims ${q.numElements()} != codes $d")
    var acc = 0.0f
    var i = 0
    while (i < d) {
      val diff = q.getFloat(i) - (mins(i) + scales(i) * (codes(i) & 0xFF))
      acc += diff * diff
      i += 1
    }
    acc
  }
}
