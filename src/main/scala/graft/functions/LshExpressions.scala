package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Banded sign-random-projection keys (random-hyperplane LSH, Charikar
  * SIGMOD'02 family): bit t of band b is `dot(v, planes(b*width + t)) > 0`,
  * and the b-th output element packs that band's `width` bits into a long.
  * Vectors with small angular distance agree on most bits, so they share at
  * least one full band key with high probability — the classic
  * OR-of-ANDs LSH construction.
  *
  * The dot products accumulate in FLOAT32, sequentially — deliberately:
  * DuckDB's `list_inner_product` over FLOAT lists uses the same
  * elementary-op sequence, so an oracle recomputing the signs from the
  * PERSISTED planes sees bit-identical dots and therefore identical band
  * keys (no sign-boundary drift between engines).
  *
  * One pass per (vector, plane); `bands × width` planes total. This is the
  * brief's "LSH-bucketed variant" of embedding similarity search — the
  * bucketing twin of the IVF probe ([[NearestCentroids]]), trading the
  * trained centroids for data-independent hyperplanes (no training pass
  * over the corpus at all, which matters when the corpus is a stream).
  */
case class LshBandKeys(child: Expression, planes: Array[Array[Float]], bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands > 0 && planes.nonEmpty && planes.length % bands == 0,
    s"lsh_band_keys: ${planes.length} planes must split into $bands equal bands")
  private val width = planes.length / bands
  require(width <= 64, s"lsh_band_keys: band width $width exceeds 64 bits")
  private val dims = planes(0).length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.unaryFloatArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_band_keys"

  /** Flattened row-major plane matrix (planes.length × dims). */
  @transient private lazy val flat: Array[Float] = {
    val out = new Array[Float](planes.length * dims)
    var p = 0
    while (p < planes.length) {
      System.arraycopy(planes(p), 0, out, p * dims, dims)
      p += 1
    }
    out
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dims) throw new IllegalArgumentException(
      s"graft: vector dimension mismatch: ${a.numElements()} vs $dims")
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var t = 0
      while (t < width) {
        val off = (b * width + t) * dims
        var s = 0.0f
        var i = 0
        while (i < dims) { s += a.getFloat(i) * flat(off + i); i += 1 }
        if (s > 0.0f) key |= (1L << t)
        t += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
