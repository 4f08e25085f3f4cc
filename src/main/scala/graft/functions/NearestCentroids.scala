package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-n nearest centroid ids for a vector (the multi-probe generalization
  * of [[NearestCentroid]]; reference: detail/ivf/partition.h:57-65 computes
  * the same per-query top-nprobe centroid list). */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Float]],
    nprobe: Int) extends UnaryExpression {

  require(centroids.nonEmpty && nprobe > 0)
  private val dims = centroids(0).length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  private lazy val flat: Array[Float] = {
    val out = new Array[Float](centroids.length * dims)
    var c = 0
    while (c < centroids.length) {
      System.arraycopy(centroids(c), 0, out, c * dims, dims)
      c += 1
    }
    out
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    new GenericArrayData(
      NearestCentroids.topN(a, flat, centroids.length, dims, nprobe))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "float[]")
    val nc = centroids.length
    nullSafeCodeGen(ctx, ev, a => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.NearestCentroids.topN($a, $flatRef, $nc, $dims, $nprobe));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCentroids {
  def topN(v: ArrayData, flat: Array[Float], numCentroids: Int, dims: Int, n: Int): Array[Int] = {
    if (v.numElements() != dims) throw new IllegalArgumentException(
      s"graft: vector dimension mismatch: ${v.numElements()} vs $dims")
    val nn = math.min(n, numCentroids)
    val dist = new Array[Float](numCentroids)
    var c = 0
    while (c < numCentroids) {
      var s = 0.0f; var i = 0; val off = c * dims
      while (i < dims) { val d = v.getFloat(i) - flat(off + i); s += d * d; i += 1 }
      dist(c) = s
      c += 1
    }
    val idx = Array.range(0, numCentroids)
    // partial selection sort of the nn smallest (nn is small)
    var k = 0
    while (k < nn) {
      var m = k
      var j = k + 1
      while (j < numCentroids) {
        if (dist(idx(j)) < dist(idx(m)) ||
          (dist(idx(j)) == dist(idx(m)) && idx(j) < idx(m))) m = j
        j += 1
      }
      val t = idx(k); idx(k) = idx(m); idx(m) = t
      k += 1
    }
    java.util.Arrays.copyOfRange(idx, 0, nn)
  }
}
