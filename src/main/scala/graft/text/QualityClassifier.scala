package graft.text

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the fasttext-classifier stage of
  * a training-data pipeline (GPT-3/LLaMA-style "looks like reference text"
  * filtering), built from what this container has: MLlib logistic
  * regression over the engine's exact integer quality facets, weakly
  * supervised by the heuristic [[TextOps.qualityScore]] (top-quantile
  * documents are positives, bottom-quantile negatives — the standard
  * bootstrap when no human labels exist).
  *
  * The learned model is persisted as a (feature, weight) parquet table.
  * Scoring recomputes nothing from training: the serving path (and the
  * DuckDB oracle) evaluates the linear LOGIT `b + Σ wᵢ·fᵢ` over integer
  * facets in one fixed left-associative order — bit-identical across
  * engines, because every operand is either an exact integer-valued double
  * or a weight read from the same parquet. The sigmoid is deliberately NOT
  * applied: `exp` differs in the last ulp between libm and the JVM, and
  * thresholding the logit at 0 is the same decision as thresholding the
  * probability at 0.5.
  *
  * Scale: training aggregates a bounded facet frame (one pass over the
  * corpus, 5 doubles per row) and fits on it; scoring is a pure projection
  * — no shuffle, no UDF, embarrassingly parallel.
  */
object QualityClassifier {

  /** Facet names, in the FIXED order the logit sums them. */
  val featureNames: Seq[String] =
    Seq("n_chars", "n_tokens", "n_distinct_tokens", "n_stopwords", "n_punct")

  private val InterceptKey = "__intercept"

  /** The exact integer facet columns (shared with `text_quality`'s oracle-
    * proven SQL replica). */
  private def facetCols(text: Column): Seq[(String, Column)] =
    TextOps.qualityFacets(text).map { case (n, c) => n -> c.cast("long") }

  /** Train on weak labels from the heuristic score: documents in the top
    * `quantile` are positives, bottom `quantile` negatives, the middle is
    * dropped (standard self-training margin). Persists
    * `(feature, weight)` rows plus the intercept under `uri/weights`. */
  def train(
      docs: DataFrame,
      uri: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      quantile: Double = 0.3): Unit = {
    require(quantile > 0 && quantile < 0.5,
      s"graft: label quantile must be in (0, 0.5), got $quantile")
    val spark = docs.sparkSession
    val facets = docs.select(
      (col(idCol) +: facetCols(col(textCol)).map { case (n, c) => c.as(n) }) :+
        TextOps.qualityScore(col(textCol)).as("__score"): _*)
    // deterministic rank: unique (score, id) total order
    val pr = percent_rank().over(Window.orderBy(col("__score"), col(idCol)))
    val labeled = facets.withColumn("__pr", pr)
      .withColumn("label",
        when(col("__pr") >= 1 - quantile, 1.0)
          .when(col("__pr") <= quantile, 0.0))
      .where(col("label").isNotNull)
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray)
      .setOutputCol("features")
      .transform(labeled.select(
        col("label") +: featureNames.map(n => col(n).cast("double")): _*))
    val model = new LogisticRegression()
      .setMaxIter(100).setRegParam(0.01).setStandardization(true)
      .fit(assembled)
    val rows = featureNames.zip(model.coefficients.toArray) :+
      (InterceptKey -> model.intercept)
    import spark.implicits._
    rows.toDF("feature", "weight").coalesce(1)
      .write.mode("overwrite").parquet(s"$uri/weights")
  }

  /** Score `docs` with the persisted model: `(id, logit, keep)` where
    * `keep = logit > 0` (= p > 0.5). The logit is evaluated in the fixed
    * feature order as one left-associative sum so any engine reading the
    * same weights reproduces it bit-for-bit. */
  def scoreLogit(
      docs: DataFrame,
      uri: String,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = readWeights(docs.sparkSession, uri)
    val facets = facetCols(col(textCol)).toMap
    val logit = featureNames.foldLeft(lit(w(InterceptKey))) { (acc, n) =>
      acc + lit(w(n)) * facets(n).cast("double")
    }
    docs.select(col(idCol), logit.as("logit"))
      .withColumn("keep", col("logit") > lit(0.0))
  }

  /** The persisted weight map (features + intercept). */
  def readWeights(spark: SparkSession, uri: String): Map[String, Double] = {
    val m = spark.read.parquet(s"$uri/weights")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val missing = (featureNames :+ InterceptKey).filterNot(m.contains)
    require(missing.isEmpty,
      s"graft: weights at $uri/weights missing ${missing.mkString(", ")}")
    m
  }
}
