package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Ingest, LocalKMeans}

class LocalKMeansSpec extends AnyFunSuite {
  import SparkTestSession._

  private def randPts(n: Int, dims: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dims)(rnd.nextFloat()))
  }

  test("fit returns min(k, n) centroids and is deterministic") {
    val pts = randPts(1000, 8, seed = 7L)
    val a = LocalKMeans.fit(pts, 16)
    val b = LocalKMeans.fit(pts, 16)
    assert(a.length === 16)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "same input -> same centers")
    assert(LocalKMeans.fit(pts.take(5), 16).length === 5, "k > n degenerates to n")
    assert(LocalKMeans.fit(Array.empty[Array[Float]], 4).isEmpty)
  }

  test("centers are finite and fixup yields exactly k distinct on degenerate input") {
    // all-identical points: Lloyd alone cannot separate k clusters
    val same = Array.fill(200)(Array.fill(4)(1.5f))
    val cents = Ingest.trainCentroidsLocal(same, 8)
    assert(cents.length === 8)
    assert(cents.map(_.toSeq).distinct.length === 8, "fixup must de-duplicate")
    cents.foreach(_.foreach(x => assert(java.lang.Float.isFinite(x))))
  }

  test("clusters recover well-separated blobs") {
    val rnd = new java.util.Random(11L)
    val centersTrue = Array(Array(0f, 0f), Array(10f, 10f), Array(-10f, 5f))
    val pts = Array.tabulate(600) { i =>
      val c = centersTrue(i % 3)
      Array(c(0) + rnd.nextFloat() * 0.5f, c(1) + rnd.nextFloat() * 0.5f)
    }
    val fit = LocalKMeans.fit(pts, 3)
    // each true blob center has a fitted center within its radius
    centersTrue.foreach { c =>
      val near = fit.exists(f =>
        math.pow(f(0) - c(0), 2) + math.pow(f(1) - c(1), 2) < 1.0)
      assert(near, s"no fitted center near blob (${c(0)},${c(1)})")
    }
  }

  test("past the local gate, training falls back to the distributed path") {
    import spark.implicits._
    val df = (0 until 500).map(i =>
      Seq.tabulate(8)(d => (i % 7 + d * 0.1).toFloat)).toDF("vector")
      .select(col("vector").cast("array<float>").as("vector"))
    spark.conf.set("spark.graft.maxLocalTrainBytes", "1")
    try {
      val cents = Ingest.trainCentroidsOnSample(df, 4)
      assert(cents.length === 4, "MLlib fallback path still honors exact-k")
    } finally spark.conf.unset("spark.graft.maxLocalTrainBytes")
  }
}
