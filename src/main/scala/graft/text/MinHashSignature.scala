package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature in ONE pass: each shingle is FNV-hashed once, then all
  * `numHashes` affine functions update their running minimum. Replaces the
  * higher-order-function formulation (`transform(sequence, i ->
  * array_min(transform(...)))`), which Catalyst inlines on projection
  * collapse and re-evaluates the shingle pipeline once per hash function —
  * a 100x+ blowup observed at bench scale.
  *
  * Coefficients are 31-bit so `a * h31 + b` stays far from Long overflow
  * (ANSI mode). */
case class MinHashSignature(
    child: Expression,
    aCoef: Array[Long],
    bCoef: Array[Long]) extends UnaryExpression with CodegenFallback {

  require(aCoef.length == bCoef.length && aCoef.nonEmpty)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = aCoef.length
    val mins = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h31 = Fnv64.hashBytes(s.getBytes) >>> 33
        var j = 0
        while (j < m) {
          val hv = aCoef(j) * h31 + bCoef(j)
          if (hv < mins(j)) mins(j) = hv
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
