package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{QualityClassifier, TextOps}

class QualityClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  private lazy val uri = {
    val u = Files.createTempDirectory("graft_qclf").toString
    QualityClassifier.train(docs, u)
    u
  }

  test("persisted weights carry every feature plus the intercept") {
    val w = QualityClassifier.readWeights(spark, uri)
    assert(w.keySet === (QualityClassifier.featureNames :+ "__intercept").toSet)
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("classifier separates its weak-label quantiles") {
    import spark.implicits._
    val scored = QualityClassifier.scoreLogit(docs, uri)
      .join(docs.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("h")), "doc_id")
    val n = scored.count()
    val topAvg = scored.orderBy(col("h").desc).limit((n * 0.3).toInt)
      .agg(avg("logit")).head().getDouble(0)
    val botAvg = scored.orderBy(col("h").asc).limit((n * 0.3).toInt)
      .agg(avg("logit")).head().getDouble(0)
    assert(topAvg > botAvg,
      s"top-quantile mean logit $topAvg must exceed bottom $botAvg")
  }

  test("boundary-comparison weak labels match a percent_rank reference") {
    // driver-side replica of the old global-window labeling: unique
    // (score, id) sort, pr = r/(n-1) in doubles, same when() precedence
    val q = 0.3
    val keys = docs.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (s, id) }
    val n = keys.length
    val expected = keys.zipWithIndex.flatMap { case ((id, _), r) =>
      val pr = r.toDouble / (n - 1).toDouble
      if (pr >= 1 - q) Some(id -> 1.0)
      else if (pr <= q) Some(id -> 0.0)
      else None
    }.toMap
    val got = QualityClassifier.weakLabels(docs, "text", "doc_id", q)
      .select("doc_id", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("weak labeling accepts an IntegerType id column") {
    // IntegerType.typeName is "integer" — a name-list guard with "int"
    // once rejected valid int ids; the type-match guard must not
    val intIds = docs.select(col("doc_id").cast("int").as("doc_id"), col("text"))
    assert(QualityClassifier.weakLabels(intIds, "text", "doc_id", 0.3).count() > 0)
  }

  test("logit equals the manual fixed-order dot product, keep = logit>0") {
    val w = QualityClassifier.readWeights(spark, uri)
    val facets = docs.select(
      col("doc_id") +: TextOps.qualityFacets(col("text"))
        .map { case (n, c) => c.cast("long").as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        QualityClassifier.featureNames.zipWithIndex
          .map { case (n, i) => n -> r.getLong(i + 1) }.toMap).toMap
    val out = QualityClassifier.scoreLogit(docs, uri).collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      val f = facets(r.getLong(0))
      val expected = QualityClassifier.featureNames.foldLeft(w("__intercept")) {
        (acc, n) => acc + w(n) * f(n).toDouble
      }
      assert(r.getDouble(1) === expected) // bit-exact, same fold order
      assert(r.getBoolean(2) === (expected > 0.0))
    }
  }
}
