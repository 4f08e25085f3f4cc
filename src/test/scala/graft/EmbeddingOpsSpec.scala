package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbeddingOps

class EmbeddingOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private lazy val uri = {
    val u = Files.createTempDirectory("graft_pca").toString
    EmbeddingOps.trainPca(emb, u, k = 8)
    u
  }

  test("persisted model: singleton mean + k unit-norm components of dim d") {
    val d = emb.head().getSeq[Float](emb.columns.indexOf("embedding")).length
    val mean = spark.read.parquet(s"$uri/mean").collect()
    assert(mean.length === 1)
    assert(mean.head.getSeq[Double](0).length === d)
    val comps = spark.read.parquet(s"$uri/components")
      .orderBy("comp_idx").collect()
    assert(comps.map(_.getLong(0)).toSeq === (0L until 8L))
    comps.foreach { r =>
      val c = r.getSeq[Double](1)
      assert(c.length === d)
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9,
        "PCA components must be unit-norm")
    }
  }

  test("projection equals a driver-side exact centered dot, bit for bit") {
    val mean = spark.read.parquet(s"$uri/mean").head().getSeq[Double](0).toArray
    val comps = spark.read.parquet(s"$uri/components").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = EmbeddingOps.projectPca(emb, uri).collect()
    assert(got.length === vecs.size * 8)
    got.foreach { r =>
      val (id, j, proj) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val x = vecs(id); val c = comps(j)
      var s = 0.0
      var i = 0
      while (i < x.length) { s += (x(i).toDouble - mean(i)) * c(i); i += 1 }
      assert(proj === s, s"vec $id comp $j") // bit-exact: same fold order
    }
  }

  test("centered_dot: interpreted eval matches codegen and the HOF fold") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(0.5, 0.25, -1.0), Array(2.0, -3.0, 0.125)),
      (2L, Array(-4.0, 0.0, 8.5), Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))
    ).toDF("id", "x", "m", "c")
    val viaKernel = df.select(col("id"),
        graft.functions.centered_dot(col("x"), col("m"), col("c")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaHof = df.select(col("id"),
        aggregate(zip_with(zip_with(col("x"), col("m"), (a, b) => a - b),
            col("c"), (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaKernel === viaHof)
    assert(viaKernel(1L) === (1.0 - 0.5) * 2.0 + (2.0 - 0.25) * -3.0 + (3.0 - -1.0) * 0.125)
  }

  test("projection plan broadcasts components and stays codegen'd") {
    val plan = EmbeddingOps.projectPca(emb, uri)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"components must broadcast:\n$plan")
    assert(plan.contains("centered_dot"), s"kernel expression missing:\n$plan")
    assert(!plan.toLowerCase.contains("lambdafunction"),
      s"interpreted HOF lambdas crept back into the projection:\n$plan")
  }

  test("cluster outliers rank the farthest normalized members per centroid") {
    import org.apache.spark.sql.functions._
    val full = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val centroids = Array(
      Array.fill(64)(0.1f),
      Array.tabulate(64)(i => if (i % 2 == 0) 0.15f else -0.15f))
    val got = graft.operators.EmbeddingOps.clusterOutliers(full, centroids, topK = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    // naive recompute in float32 (the engine's normalize/distance math)
    def norm(v: Array[Float]): Array[Float] = {
      var s = 0.0f; v.foreach(x => s += x * x)
      val n = math.sqrt(s.toDouble).toFloat
      if (n == 0f) v else v.map(_ / n)
    }
    def d(a: Array[Float], b: Array[Float]): Float = {
      var s = 0.0f
      for (i <- a.indices) { val t = a(i) - b(i); s += t * t }
      math.sqrt(s.toDouble).toFloat
    }
    val rows = full.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), norm(r.getSeq[Float](1).toArray)))
    val expect = rows
      .map { case (id, nv) =>
        val ds = centroids.map(c => d(nv, c))
        val cid = ds.indices.minBy(i => (ds(i), i))
        (cid, id, ds(cid))
      }
      .groupBy(_._1).toSeq
      .flatMap { case (_, g) =>
        g.sortBy { case (_, id, dist) => (-dist, id) }.take(2).zipWithIndex
          .map { case ((c, id, _), i) => (c, id, i + 1) }.toSeq
      }.toSet
    assert(got == expect)
  }
}
