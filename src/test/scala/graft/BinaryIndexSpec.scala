package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Ingest, VectorIndex}
import graft.operators.{DistanceMetric, Knn}

/** BINARY sign-sketch index type: full [[graft.index.VectorIndex]]
  * lifecycle (ingest, probe-all exactness, updates merge, time travel,
  * filtered queries, consolidation with sketch regeneration). */
class BinaryIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft_binidx").toString

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    .cache()

  private lazy val n: Int = emb.count().toInt

  private lazy val queries5: DataFrame = emb.where(col("external_id") < 5)
    .select(col("external_id").as("qid"), col("vector").as("qvec"))

  private def ids(df: DataFrame): Map[Long, Seq[Long]] =
    df.orderBy("qid", "rank").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(2)).toSeq }

  private def exact(db: DataFrame, k: Int, metric: DistanceMetric): Map[Long, Seq[Long]] =
    ids(Knn.bruteForce(db, queries5, k, metric,
      idCol = "external_id", vecCol = "vector"))

  test("probe-all (nprobe >= n) equals brute force for L2 / SOS / COSINE") {
    for (m <- Seq(DistanceMetric.L2, DistanceMetric.SumOfSquares, DistanceMetric.Cosine)) {
      val uri = tmp()
      val idx = Ingest.ingest(spark, uri, emb, "BINARY", m, timestamp = 1000L)
      assert(ids(idx.query(queries5, 10, nprobe = n)) === exact(emb, 10, m),
        s"metric $m")
      // the versioned sketch table exists and covers the base
      assert(spark.read.parquet(s"$uri/sketch/v=1000").count() == n)
    }
  }

  test("INNER_PRODUCT and byte dtypes are rejected with named errors") {
    val e1 = intercept[IllegalArgumentException] {
      Ingest.ingest(spark, tmp(), emb, "BINARY", DistanceMetric.InnerProduct,
        timestamp = 1000L)
    }
    assert(e1.getMessage.contains("INNER_PRODUCT"))
    val e2 = intercept[IllegalArgumentException] {
      Ingest.ingest(spark, tmp(), emb, "BINARY", DistanceMetric.L2,
        dtype = "uint8", timestamp = 1000L)
    }
    assert(e2.getMessage.contains("float32"))
  }

  test("updates and deletes merge into probe-all queries exactly") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "BINARY", DistanceMetric.L2,
      timestamp = 1000L)
    // move vectors 20..24 far away, delete 25..29
    val moved = emb.where(col("external_id").between(20, 24))
      .select(col("external_id"),
        transform(col("vector"), x => x + lit(100.0f)).as("vector"))
    idx.updateBatch(moved, ts = 1500L)
    idx.deleteBatch(emb.where(col("external_id").between(25, 29))
      .select("external_id"), ts = 1500L)
    val current = VectorIndex.open(spark, uri)
    val truth = emb.where(!col("external_id").between(20, 29)).unionByName(moved)
    assert(ids(current.query(queries5, 10, nprobe = n)) === exact(truth, 10, DistanceMetric.L2))
    // consolidation folds the log and regenerates the sketch for the new version
    val folded = current.consolidateUpdates(newTs = 2000L)
    assert(spark.read.parquet(s"$uri/sketch/v=2000").count() == n - 5)
    assert(ids(folded.query(queries5, 10, nprobe = n)) === exact(truth, 10, DistanceMetric.L2))
  }

  test("time travel reads the matching base AND sketch version") {
    val uri = tmp()
    val half = emb.where(col("external_id") % 2 === 0)
    Ingest.ingest(spark, uri, half, "BINARY", DistanceMetric.L2, timestamp = 1000L)
    Ingest.ingest(spark, uri, emb, "BINARY", DistanceMetric.L2,
      timestamp = 2000L, appendMeta = true)
    val at1500 = VectorIndex.open(spark, uri, Some(1500L))
    assert(ids(at1500.query(queries5, 10, nprobe = n)) === exact(half, 10, DistanceMetric.L2))
    val now = VectorIndex.open(spark, uri)
    assert(ids(now.query(queries5, 10, nprobe = n)) === exact(emb, 10, DistanceMetric.L2))
  }

  test("filtered queries fill k from the allowed set (pre-filter on the sketch)") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "BINARY", DistanceMetric.L2,
      timestamp = 1000L)
    val allowed = emb.where(col("external_id") % 3 === 0).select("external_id")
    val got = ids(idx.queryFiltered(queries5, 10, allowed, nprobe = n))
    val truth = exact(emb.where(col("external_id") % 3 === 0), 10, DistanceMetric.L2)
    assert(got === truth)
  }

  test("the default fetchK knob returns k rows and clears a recall floor") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "BINARY", DistanceMetric.L2,
      timestamp = 1000L)
    val got = ids(idx.query(queries5, 10)) // nprobe <= 0 -> fetchK = 16k
    val truth = exact(emb, 10, DistanceMetric.L2)
    assert(got.values.forall(_.size == 10))
    val recall = got.map { case (q, s) => (s.toSet & truth(q).toSet).size }.sum /
      (10.0 * got.size)
    assert(recall >= 0.5, s"recall@10 = $recall")
  }
}
