package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmin-centroid assignment: vector → id of the nearest centroid by
  * squared L2. This is the k=1 specialization the reference calls
  * `qv_partition` (reference: src/include/detail/flat/qv.h:474-560), used
  * both for IVF partition labeling at ingestion and for nprobe centroid
  * selection at query time.
  *
  * The centroid matrix rides along as a broadcast-sized reference object in
  * the generated code (flattened row-major for locality), so assignment is
  * one codegen'd pass over the data with no join.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "NearestCentroid: centroids must be non-empty")
  private val dims = centroids(0).length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  /** Flattened row-major centroid matrix (numCentroids × dims). */
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
    NearestCentroid.assign(a, flat, centroids.length, dims)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "float[]")
    val nc = centroids.length
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.NearestCentroid.assign($a, $flatRef, $nc, $dims);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCentroid {
  /** Hot loop shared by eval and codegen. */
  def assign(v: ArrayData, flat: Array[Float], numCentroids: Int, dims: Int): Int = {
    if (v.numElements() != dims) throw new IllegalArgumentException(
      s"graft: vector dimension mismatch: ${v.numElements()} vs $dims")
    var best = 0
    var bestDist = Float.MaxValue
    var c = 0
    while (c < numCentroids) {
      var s = 0.0f
      var i = 0
      val off = c * dims
      while (i < dims) { val d = v.getFloat(i) - flat(off + i); s += d * d; i += 1 }
      if (s < bestDist) { bestDist = s; best = c }
      c += 1
    }
    best
  }

  /** Top-nprobe nearest centroid ids for one query vector (driver-side;
    * centroid count is broadcast-sized — reference:
    * src/include/detail/ivf/partition.h:57-65). */
  def topNProbe(q: Array[Float], centroids: Array[Array[Float]], nprobe: Int): Array[Int] = {
    val scored = centroids.zipWithIndex.map { case (c, idx) =>
      var s = 0.0f; var i = 0
      while (i < c.length) { val d = q(i) - c(i); s += d * d; i += 1 }
      (s, idx)
    }
    scored.sortBy(t => (t._1, t._2)).take(nprobe).map(_._2)
  }
}
