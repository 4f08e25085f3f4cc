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
