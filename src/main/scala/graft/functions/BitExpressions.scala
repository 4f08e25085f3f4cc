package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary (1-bit sign) vector quantization primitives.
  *
  * The reference's quantization story is product quantization
  * (reference: src/include/detail/ivf/ivf_pq.h and
  * apis/python/src/tiledb/vector_search/ivf_pq_index.py); sign/binary
  * quantization is the complementary classic (Charikar hyperplane sketches
  * degenerate to coordinate signs): 1 bit per dimension, Hamming distance
  * as the candidate metric, exact re-rank of the shortlist. At 100 TB the
  * point is the scan payload — the candidate stage reads an 8-byte word
  * per 64 dims instead of 4 bytes per dim, a 32× reduction, and the inner
  * loop is XOR+POPCNT instead of float FMA.
  *
  * Both expressions stay inside whole-stage codegen via static
  * [[VecKernels]] calls (the engine's distances pattern).
  */

/** Pack a float vector's coordinate signs into a little-endian long-word
  * sketch: bit `(i % 64)` of word `(i / 64)` is set iff `v(i) >= 0`
  * (so `-0.0f` counts non-negative, matching SQL `x >= 0` replay). */
case class SignPack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_pack"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.signPack(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.signPack($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two [[SignPack]] sketches (same word count). */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_dist"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.hamming(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.hamming($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
