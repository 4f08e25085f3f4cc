package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distance kernels over `ArrayType(FloatType)` vectors, as native Catalyst
  * expressions with whole-stage codegen. Both the interpreted eval and the
  * generated code dispatch into [[graft.functions.VecKernels]], which picks
  * the Panama Vector API lanes when the JVM has `jdk.incubator.vector`
  * (the analogue of the reference's AVX scoring paths,
  * detail/scoring/l2_distance_avx.h) and the plain scalar float loop
  * otherwise — so the two execution modes of a plan always agree.
  *
  * Semantics mirror the reference scoring functions
  * (reference: src/include/scoring.h:90-428):
  *   - sum_of_squares_distance  (squared L2)        scoring.h:90-124
  *   - sqrt_sum_of_squares_distance (true L2)       scoring.h:126-165
  *   - inner product (dot); the reference's 1/dot reciprocal trick
  *     (scoring.h:344-380) is applied at the index layer, not here
  *   - cosine_distance = 1 - cos                    scoring.h:392-420
  * Accumulation is in float32 to match the reference's `score_type = float`
  * (reference: src/include/detail/flat/qv.h:197).
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = FloatType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Static [[VecKernels]] method this expression maps to (dims check
    * included there). */
  protected def kernelName: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.$kernelName($a, $b)")
}

/** Squared L2 distance (reference: scoring.h:90-124, SUM_OF_SQUARES metric). */
case class SumOfSquaresDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "dist_sos"
  override protected def kernelName: String = "sos"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.sos(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** FLOAT-EXACT sos bounds for L2-radius comparisons — not a naive r*r:
  * `dist_l2` is `(float) sqrt((double) sos)`, and `r * r` in float math can
  * land one ulp off the true boundary, silently losing rows whose radius
  * was copied from an observed distance (the standard radius-search
  * pattern). Bounds are resolved once per literal radius by ulp-walking
  * from r² (a handful of steps); used by the SQL predicate rewrite
  * ([[graft.plans.OptimizeDistancePredicates]]) and the programmatic
  * [[graft.operators.Knn.rangeSearch]].
  *
  * For r < 0 the raw negative bound is kept — dist_sos is non-negative, so
  * the truth table is identical to the original AND null inputs still
  * evaluate to NULL. NaN bounds pass through: Spark orders NaN greatest on
  * both the l2 and sos sides. */
object SosBounds {
  private def sqrtF(s: Float): Float = math.sqrt(s.toDouble).toFloat

  /** Largest float s with sqrtF(s) <= r: `l2 <= r` ⇔ `sos <= upper(r)`,
    * `l2 > r` ⇔ `sos > upper(r)`. */
  def upperBound(r: Float): Float = {
    if (r.isNaN || r < 0 || r.isInfinite) return r
    var s = (r.toDouble * r.toDouble).toFloat
    while (sqrtF(Math.nextUp(s)) <= r) s = Math.nextUp(s)
    while (s > 0 && sqrtF(s) > r) s = Math.nextDown(s)
    s
  }

  /** Smallest float s with sqrtF(s) >= r: `l2 < r` ⇔ `sos < lower(r)`,
    * `l2 >= r` ⇔ `sos >= lower(r)`. */
  def lowerBound(r: Float): Float = {
    if (r.isNaN || r < 0 || r.isInfinite) return r
    if (r == 0f) return 0f
    var s = (r.toDouble * r.toDouble).toFloat
    while (s > 0 && sqrtF(Math.nextDown(s)) >= r) s = Math.nextDown(s)
    while (sqrtF(s) < r) s = Math.nextUp(s)
    s
  }
}

/** True L2 distance (reference: scoring.h:126-165, L2 metric). */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "dist_l2"
  override protected def kernelName: String = "l2"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.l2(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Raw inner product (dot). The reference's INNER_PRODUCT *distance* is
  * 1/dot so min-heaps order correctly (reference: scoring.h:344-380); that
  * reciprocal + the result flip (reference:
  * apis/python/src/tiledb/vector_search/index.py:287-296) live in the index
  * layer so this primitive stays reusable. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"
  override protected def kernelName: String = "dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance = 1 - dot/(|a||b|) (reference: scoring.h:392-420).
  * Zero-norm inputs yield distance 1.0 (orthogonal-by-convention). */
case class CosineDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "dist_cosine"
  override protected def kernelName: String = "cosineDistance"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.cosineDistance(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a vector. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = FloatType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_norm"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0f; var i = 0; val n = a.numElements()
    while (i < n) { val x = a.getFloat(i); s += x * x; i += 1 }
    math.sqrt(s.toDouble).toFloat
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val x = ctx.freshName("x")
      s"""
         |float $s = 0.0f;
         |int $i = 0; final int n$i = $a.numElements();
         |while ($i < n$i) { float $x = $a.getFloat($i); $s += $x * $x; $i++; }
         |${ev.value} = (float) java.lang.Math.sqrt((double) $s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unit-normalize a vector (reference:
  * apis/python/src/tiledb/vector_search/utils.py:114-146 `normalize_vectors`;
  * used by IVF_FLAT's cosine-as-normalized-L2 strategy,
  * ivf_flat_index.py:254-255). Zero vectors pass through unchanged. */
case class NormalizeVector(child: Expression) extends UnaryExpression
    with codegen.CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_normalize"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0f; var i = 0
    while (i < n) { val x = a.getFloat(i); s += x * x; i += 1 }
    val norm = math.sqrt(s.toDouble).toFloat
    val out = new Array[Float](n)
    i = 0
    if (norm == 0.0f) { while (i < n) { out(i) = a.getFloat(i); i += 1 } }
    else { while (i < n) { out(i) = a.getFloat(i) / norm; i += 1 } }
    new GenericArrayData(out)
  }

  // Interpreted eval is fine here: normalize runs once per row at ingestion,
  // not in the per-candidate scoring loop.

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

private[graft] object VectorExprChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def unaryFloatArray(name: String, child: Expression): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an array<float> argument, got ${other.catalogString}")
  }
}

/** Scatter sparse (indices, values) pairs into a dense float vector of
  * length `dims` (absent positions 0, out-of-range indices ignored, last
  * write wins on duplicates). One pass over the non-zeros — the
  * map-lookup formulation (`element_at(map, i)` per position) scans the
  * whole map per element, O(dims·nnz) per row, which bites at
  * gene-expression widths (reference SOMA X matrices are ~20k-dim). */
case class ScatterDense(indices: Expression, values: Expression, dims: Int)
    extends BinaryExpression with CodegenFallback {
  require(dims > 0, s"scatter_dense: dims must be positive, got $dims")
  override def left: Expression = indices
  override def right: Expression = values

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (indices.dataType, values.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"scatter_dense requires (array<int>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "scatter_dense"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val idx = l.asInstanceOf[ArrayData]
    val vals = r.asInstanceOf[ArrayData]
    val n = math.min(idx.numElements(), vals.numElements())
    val out = new Array[Float](dims)
    var i = 0
    while (i < n) {
      val d = idx.getInt(i)
      if (d >= 0 && d < dims) out(d) = vals.getFloat(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.map(x => x: Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScatterDense =
    copy(indices = newLeft, values = newRight)
}

/** Strict dot product `Σᵢ x[i] · y[i]` over float vectors in DOUBLE
  * precision, accumulated strictly left-to-right (kernel:
  * [[VecKernels.dotStrict]]) — the bit-replayable sibling of
  * [[DotProduct]]: no SIMD reassociation, so a VALUE-pinned oracle (e.g.
  * MaxSim's floor-micro scores) reproduces it exactly in any engine that
  * folds doubles in list order. Same fold-order contract as
  * [[CenteredDot]]. */
case class DotProductStrict(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product_strict"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_strict requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.dotStrict(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dotStrict($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Centered dot product `Σᵢ (x[i] − m[i]) · c[i]` in DOUBLE precision,
  * accumulated strictly left-to-right — the PCA projection kernel
  * ([[graft.operators.EmbeddingOps.projectPca]]). The fold order is the
  * bit-replayable contract, so the kernel is a sequential scalar loop
  * (no SIMD reassociation); the win over the `zip_with`/`aggregate` HOF
  * formulation it replaces is staying codegen'd — one static call in the
  * whole-stage loop versus three interpreted lambda passes per row. */
case class CenteredDot(vec: Expression, mean: Expression, comp: Expression)
    extends TernaryExpression {
  override def first: Expression = vec
  override def second: Expression = mean
  override def third: Expression = comp
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centered_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(vec, mean, comp).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"centered_dot requires three array<double> arguments, got " +
        Seq(vec, mean, comp).map(_.dataType.catalogString).mkString(", "))
  }

  override protected def nullSafeEval(x: Any, m: Any, c: Any): Any =
    VecKernels.centeredDot(x.asInstanceOf[ArrayData],
      m.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, m, c) => s"graft.functions.VecKernels.centeredDot($x, $m, $c)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CenteredDot =
    copy(vec = f, mean = s, comp = t)
}
