package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{hamming_dist, sign_pack}
import graft.operators.{BinaryKnn, DistanceMetric, Knn}

/** Binary sign-quantization ANN: pack/hamming kernels and the two-stage
  * search ([[graft.operators.BinaryKnn]]). */
class BinaryKnnSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("sign_pack packs bit (i%64) of word (i/64), -0.0 counts non-negative") {
    import spark.implicits._
    // 3 dims: signs (+, -, +) -> word0 = 0b101 = 5
    val small = Seq(Tuple1(Array(1.0f, -2.0f, 0.5f))).toDF("v")
      .select(sign_pack($"v")).head().getSeq[Long](0)
    assert(small == Seq(5L))
    // 65 dims spills into a second word; -0.0f packs as set
    val big = Array.tabulate(65)(i => if (i % 3 == 0) 1.0f else -1.0f)
    big(64) = -0.0f
    val words = Seq(Tuple1(big)).toDF("v")
      .select(sign_pack($"v")).head().getSeq[Long](0)
    var expect0 = 0L
    for (i <- 0 until 64 if big(i) >= 0.0f) expect0 |= 1L << i
    assert(words == Seq(expect0, 1L)) // -0.0f >= 0 -> bit set
  }

  test("hamming_dist equals the naive sign-mismatch count on real vectors") {
    import spark.implicits._
    val rows = emb.limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val df = rows.toSeq.toDF("id", "v")
    val got = df.as("a").crossJoin(df.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        hamming_dist(sign_pack(col("a.v")), sign_pack(col("b.v"))).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    for ((ia, va) <- rows; (ib, vb) <- rows) {
      val naive = va.zip(vb).count { case (x, y) => (x >= 0) != (y >= 0) }
      assert(got((ia, ib)) == naive, s"pair ($ia,$ib)")
    }
  }

  test("fetchK = |db| makes the binary path exactly brute force") {
    val uri = Files.createTempDirectory("graft_binknn").toString
    BinaryKnn.buildSketch(
      emb.select(col("vec_id").as("id"), col("embedding").as("vector")), uri)
    val n = emb.count().toInt
    val queries = emb.where(col("vec_id") < 5)
    val got = BinaryKnn.search(spark, uri, emb, queries, 5, fetchK = n,
        DistanceMetric.L2, idCol = "vec_id", vecCol = "embedding",
        qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Knn.bruteForce(emb, queries, 5, DistanceMetric.L2,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
  }

  test("4k re-rank budget recalls most exact neighbors on the fixture") {
    val uri = Files.createTempDirectory("graft_binknn2").toString
    BinaryKnn.buildSketch(
      emb.select(col("vec_id").as("id"), col("embedding").as("vector")), uri)
    val queries = emb.where(col("vec_id") < 10)
    val got = BinaryKnn.search(spark, uri, emb, queries, 10, fetchK = 40,
        DistanceMetric.L2, idCol = "vec_id", vecCol = "embedding",
        qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Knn.bruteForce(emb, queries, 10, DistanceMetric.L2,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"binary-hamming recall@10 = $recall")
  }
}
