package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.FloatType

import graft.functions._
import graft.operators.{MinTopK, MinTopKLong}

/** Distance-predicate optimization: radius comparisons against a true L2
  * distance pay a `sqrt` per row that the comparison doesn't need —
  * `dist_l2(a,b) <= r` is `dist_sos(a,b) <= r*r` for r >= 0 (and constantly
  * false for r < 0 since distances are non-negative). Range/radius search
  * filters hit this shape constantly; the rewrite removes the sqrt from
  * every scanned row's hot loop.
  */
object OptimizeDistancePredicates extends Rule[LogicalPlan] {
  import graft.functions.SosBounds.{lowerBound, upperBound}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThan(EuclideanDistance(a, b), Literal(r: Float, FloatType)) =>
      LessThan(SumOfSquaresDistance(a, b), Literal(lowerBound(r), FloatType))
    case LessThanOrEqual(EuclideanDistance(a, b), Literal(r: Float, FloatType)) =>
      LessThanOrEqual(SumOfSquaresDistance(a, b), Literal(upperBound(r), FloatType))
    case GreaterThan(EuclideanDistance(a, b), Literal(r: Float, FloatType)) =>
      GreaterThan(SumOfSquaresDistance(a, b), Literal(upperBound(r), FloatType))
    case GreaterThanOrEqual(EuclideanDistance(a, b), Literal(r: Float, FloatType)) =>
      GreaterThanOrEqual(SumOfSquaresDistance(a, b), Literal(lowerBound(r), FloatType))
  }
}

/** Session extensions: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * gives any SQL-only session the graft kernels (dist_l2, dist_sos,
  * dot_product, dist_cosine, vector_norm, vector_normalize, shingle_set,
  * simhash64, winnow_fingerprint, fnv64, positional_shingles,
  * stopword_vote, min_topk) plus the distance-predicate optimizer rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo("graft", name)
    e.injectFunction((FunctionIdentifier("dist_l2"), info("dist_l2"),
      (es: Seq[Expression]) => EuclideanDistance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dist_sos"), info("dist_sos"),
      (es: Seq[Expression]) => SumOfSquaresDistance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dist_cosine"), info("dist_cosine"),
      (es: Seq[Expression]) => CosineDistance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vector_norm"), info("vector_norm"),
      (es: Seq[Expression]) => L2Norm(es(0))))
    e.injectFunction((FunctionIdentifier("vector_normalize"), info("vector_normalize"),
      (es: Seq[Expression]) => NormalizeVector(es(0))))
    // text-pipeline kernels: the dedup/fingerprint primitives belong on the
    // SQL surface too (a SQL-only session can shingle, simhash, and winnow
    // without touching the Scala API)
    e.injectFunction((FunctionIdentifier("shingle_set"), info("shingle_set"),
      (es: Seq[Expression]) => graft.text.ShingleSet3(es(0))))
    e.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => graft.text.SimHash64(es(0))))
    e.injectFunction((FunctionIdentifier("winnow_fingerprint"), info("winnow_fingerprint"),
      (es: Seq[Expression]) => graft.text.WinnowFingerprint(es(0))))
    e.injectFunction((FunctionIdentifier("fnv64"), info("fnv64"),
      (es: Seq[Expression]) => graft.text.Fnv64Hash(es(0))))
    e.injectFunction((FunctionIdentifier("char_trigram_counts"), info("char_trigram_counts"),
      (es: Seq[Expression]) => graft.text.CharTrigramCounts(es(0))))
    e.injectFunction((FunctionIdentifier("positional_shingles"), info("positional_shingles"),
      (es: Seq[Expression]) => es match {
        case Seq(t) => graft.text.PositionalShingles(t)
        case Seq(t, Literal(n: Int, _)) => graft.text.PositionalShingles(t, n)
        case other => throw new IllegalArgumentException(
          "positional_shingles(text[, n]): n must be an integer literal, got " + other)
      }))
    e.injectFunction((FunctionIdentifier("stopword_vote"), info("stopword_vote"),
      (es: Seq[Expression]) => graft.text.StopwordVote(es(0))))
    e.injectFunction((FunctionIdentifier("min_topk"), info("min_topk"),
      (es: Seq[Expression]) => es(2) match {
        case Literal(k: Int, _) => MinTopK(es(0), es(1), k)
        case other => throw new IllegalArgumentException(
          s"min_topk: k must be an integer literal, got $other")
      }))
    e.injectFunction((FunctionIdentifier("min_topk_long"), info("min_topk_long"),
      (es: Seq[Expression]) => es(2) match {
        case Literal(k: Int, _) => MinTopKLong(es(0), es(1), k)
        case other => throw new IllegalArgumentException(
          s"min_topk_long: k must be an integer literal, got $other")
      }))
    e.injectOptimizerRule(_ => OptimizeDistancePredicates)
    e.injectOptimizerRule(_ => IndexProbeRewrite)
  }
}
