package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (reference:
  * src/include/index/ivf_pq_index.h — codebook train :555-608, encode, and
  * the asymmetric distance-table functors in scoring.h:249-330).
  *
  * A vector is split into `numSubspaces` contiguous sub-vectors of
  * `subDim` dims; each sub-vector is coded as the index of its nearest
  * sub-centroid. Query-time distance is a table lookup per subspace
  * (asymmetric: exact query sub-vector vs quantized data).
  */

/** Encode a float vector into PQ codes: array<int> of length numSubspaces.
  * `codebooks` is flattened [subspace][code][dim] row-major. */
case class PqEncode(
    child: Expression,
    codebooks: Array[Float],
    numSubspaces: Int,
    codesPerSubspace: Int,
    subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    new GenericArrayData(
      PqEncode.encode(a, codebooks, numSubspaces, codesPerSubspace, subDim))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqEncode.encode($a, $cbRef, $numSubspaces, $codesPerSubspace, $subDim));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqEncode {
  def encode(v: ArrayData, cb: Array[Float], m: Int, codes: Int, subDim: Int): Array[Int] = {
    if (v.numElements() != m * subDim) throw new IllegalArgumentException(
      s"graft: pq_encode dims ${v.numElements()} != $m x $subDim")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Float.MaxValue
      var c = 0
      while (c < codes) {
        val off = (s * codes + c) * subDim
        var d = 0.0f
        var j = 0
        while (j < subDim) {
          val diff = v.getFloat(s * subDim + j) - cb(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }
}

/** Asymmetric PQ distance: sum over subspaces of table[s*codes + code_s].
  * `left` = array<int> codes, `right` = array<float> flattened per-query
  * distance table of length numSubspaces*codesPerSubspace. Returns the
  * summed (squared-L2) distance approximation. */
case class PqAsymmetricDistance(
    left: Expression,
    right: Expression,
    codesPerSubspace: Int) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_asymmetric_distance requires (array<int>, array<float>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  }
  override def dataType: DataType = FloatType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_asymmetric_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val table = r.asInstanceOf[ArrayData]
    var s = 0.0f
    var i = 0
    val m = codes.numElements()
    while (i < m) { s += table.getFloat(i * codesPerSubspace + codes.getInt(i)); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val m = ctx.freshName("m")
      s"""
         |float $s = 0.0f;
         |final int $m = $codes.numElements();
         |int $i = 0;
         |while ($i < $m) {
         |  $s += $table.getFloat($i * $codesPerSubspace + $codes.getInt($i));
         |  $i++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-query PQ distance table: float query → flattened
  * [subspace][code] SOS table (length numSubspaces*codesPerSubspace).
  * Computing the table inside the plan keeps arbitrarily large query
  * batches fully distributed (no driver-side table construction). */
case class PqDistanceTable(
    child: Expression,
    codebooks: Array[Float],
    numSubspaces: Int,
    codesPerSubspace: Int,
    subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_distance_table"

  override protected def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    new GenericArrayData(
      PqDistanceTable.table(q, codebooks, numSubspaces, codesPerSubspace, subDim))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, q => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqDistanceTable.table($q, $cbRef, $numSubspaces, $codesPerSubspace, $subDim));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqDistanceTable {
  def table(q: ArrayData, cb: Array[Float], m: Int, codes: Int, subDim: Int): Array[Float] = {
    if (q.numElements() != m * subDim) throw new IllegalArgumentException(
      s"graft: pq table dims ${q.numElements()} != $m x $subDim")
    val out = new Array[Float](m * codes)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < codes) {
        val off = (s * codes + c) * subDim
        var d = 0.0f
        var j = 0
        while (j < subDim) {
          val diff = q.getFloat(s * subDim + j) - cb(off + j)
          d += diff * diff
          j += 1
        }
        out(s * codes + c) = d
        c += 1
      }
      s += 1
    }
    out
  }

  /** Plain-array twin of [[table]] for kernel-side construction (the VAMANA
    * PQ walk builds each query's table inside the shard task — shipping the
    * dims-float query through the shuffle instead of the m x codes-float
    * table). Same loop, same float arithmetic, bit-identical output. */
  def table(q: Array[Float], cb: Array[Float], m: Int, codes: Int, subDim: Int): Array[Float] = {
    if (q.length != m * subDim) throw new IllegalArgumentException(
      s"graft: pq table dims ${q.length} != $m x $subDim")
    val out = new Array[Float](m * codes)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < codes) {
        val off = (s * codes + c) * subDim
        var d = 0.0f
        var j = 0
        while (j < subDim) {
          val diff = q(s * subDim + j) - cb(off + j)
          d += diff * diff
          j += 1
        }
        out(s * codes + c) = d
        c += 1
      }
      s += 1
    }
    out
  }
}
