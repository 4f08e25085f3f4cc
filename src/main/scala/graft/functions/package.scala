package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.Literal

import graft.operators.{MinTopK, MinTopKLong}

/** Column-level API for the graft vector kernels.
  *
  * All functions are native Catalyst expressions (whole-stage codegen'd
  * float loops), not Scala UDFs — they stay inside WholeStageCodegen spans.
  */
package object functions {

  /** Squared L2 distance (reference metric SUM_OF_SQUARES=0). */
  def dist_sos(a: Column, b: Column): Column =
    toColumn(SumOfSquaresDistance(toExpression(a), toExpression(b)))

  /** Euclidean distance (reference metric L2=3). */
  def dist_l2(a: Column, b: Column): Column =
    toColumn(EuclideanDistance(toExpression(a), toExpression(b)))

  /** Inner product (raw dot; reference metric INNER_PRODUCT=1 is 1/dot). */
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))

  /** Strict left-to-right double-fold dot over float vectors — the
    * bit-replayable variant for value-pinned oracles (no SIMD). */
  def dot_product_strict(a: Column, b: Column): Column =
    toColumn(DotProductStrict(toExpression(a), toExpression(b)))

  /** Cosine distance 1-cos (reference metric COSINE=2). */
  def dist_cosine(a: Column, b: Column): Column =
    toColumn(CosineDistance(toExpression(a), toExpression(b)))

  def vector_norm(a: Column): Column = toColumn(L2Norm(toExpression(a)))

  /** Centered dot `Σ (x−m)·c` in double, strict left fold (PCA projection
    * kernel — bit-replayable by an oracle fold). */
  def centered_dot(x: Column, mean: Column, comp: Column): Column =
    toColumn(CenteredDot(toExpression(x), toExpression(mean), toExpression(comp)))

  def vector_normalize(a: Column): Column = toColumn(NormalizeVector(toExpression(a)))

  /** 1-bit sign sketch of a float vector (array<long> words). */
  def sign_pack(v: Column): Column = toColumn(SignPack(toExpression(v)))

  /** Hamming distance between two [[sign_pack]] sketches. */
  def hamming_dist(a: Column, b: Column): Column =
    toColumn(HammingDistance(toExpression(a), toExpression(b)))

  /** Grouped top-k: keeps the k smallest (score, id) pairs per group.
    * Returns array<struct<id:long, score:float>> sorted ascending. */
  def min_topk(score: Column, id: Column, k: Int): Column =
    toColumn(MinTopK(toExpression(score), toExpression(id), k).toAggregateExpression())

  /** Grouped top-k with exact LONG scores: keeps the k smallest (score, id)
    * pairs per group. Returns array<struct<id:long, score:long>> sorted
    * ascending. Use for integer-contract rankings (micro-scores) where a
    * float heap would collapse distinct values above 2²⁴. */
  def min_topk_long(score: Column, id: Column, k: Int): Column =
    toColumn(MinTopKLong(toExpression(score), toExpression(id), k).toAggregateExpression())

  /** Symmetric int8 quantization of a float vector (reference test helper
    * `quantize_embeddings_int8`, apis/python/test/common.py:378-388):
    * clamp(round(x * 127 / maxAbs)) — expressed with built-in functions. */
  def quantize_int8(v: Column): Column = {
    import org.apache.spark.sql.functions._
    val maxAbs = greatest(aggregate(v, lit(0.0f),
      (acc, x) => greatest(acc, abs(x))), lit(1e-12f))
    transform(v, x => round(x / maxAbs * 127.0f).cast("byte"))
  }

  /** Register SQL names for the kernels in a session (dist_l2, dist_sos,
    * dot_product, dist_cosine, vector_norm, vector_normalize, sign_pack,
    * hamming_dist, shingle_set, simhash64, winnow_fingerprint, fnv64,
    * positional_shingles, stopword_vote, min_topk). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dist_l2", es => EuclideanDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dist_sos", es => SumOfSquaresDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dist_cosine", es => CosineDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_norm", es => L2Norm(es(0)), "built-in")
    reg.createOrReplaceTempFunction("vector_normalize", es => NormalizeVector(es(0)), "built-in")
    reg.createOrReplaceTempFunction("sign_pack", es => SignPack(es(0)), "built-in")
    reg.createOrReplaceTempFunction("hamming_dist", es => HammingDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("shingle_set",
      es => graft.text.ShingleSet3(es(0)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => graft.text.SimHash64(es(0)), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      es => graft.text.WinnowFingerprint(es(0)), "built-in")
    reg.createOrReplaceTempFunction("fnv64",
      es => graft.text.Fnv64Hash(es(0)), "built-in")
    reg.createOrReplaceTempFunction("positional_shingles", {
      case Seq(t) => graft.text.PositionalShingles(t)
      case Seq(t, Literal(n: Int, _)) => graft.text.PositionalShingles(t, n)
      case other => throw new IllegalArgumentException(
        "positional_shingles(text[, n]): n must be an integer literal, got " + other)
    }, "built-in")
    reg.createOrReplaceTempFunction("stopword_vote",
      es => graft.text.StopwordVote(es(0)), "built-in")
    reg.createOrReplaceTempFunction("char_trigram_counts",
      es => graft.text.CharTrigramCounts(es(0)), "built-in")
    reg.createOrReplaceTempFunction("min_topk", es => {
      val k = es(2) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"min_topk: k must be an integer literal, got $other")
      }
      MinTopK(es(0), es(1), k)
    }, "built-in")
  }
}
