package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Ingest, IvfSq8Index, VectorIndex}
import graft.operators.{DistanceMetric, Knn}

/** IVF_SQ8 scalar-quantized index type: exactness at probe-all with a
  * candidate-covering kFactor, default-config recall, lifecycle (updates,
  * consolidation with quantizer retrain, time travel), rejections, and
  * the scale posture — the candidate scan must read the 1-byte/dim codes
  * column, not the float vectors. */
class IvfSq8IndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft_sq8idx").toString

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

  private def coveringQuery(uri: String, k: Int): DataFrame =
    VectorIndex.open(spark, uri).asInstanceOf[IvfSq8Index]
      .queryBase(queries5, k, nprobe0 = 1 << 30, kFactor = 1e9f / k)

  test("probe-all + covering kFactor equals brute force for L2 / SOS / COSINE") {
    for (m <- Seq(DistanceMetric.L2, DistanceMetric.SumOfSquares, DistanceMetric.Cosine)) {
      val uri = tmp()
      Ingest.ingest(spark, uri, emb, "IVF_SQ8", m, timestamp = 1000L)
      assert(ids(coveringQuery(uri, 10)) === exact(emb, 10, m), s"metric $m")
    }
  }

  test("reported distances match brute force after the exact re-rank") {
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "IVF_SQ8", DistanceMetric.L2, timestamp = 1000L)
    val got = coveringQuery(uri, 10)
      .orderBy("qid", "rank").select("distance").collect().map(_.getFloat(0))
    val want = Knn.bruteForce(emb, queries5, 10, DistanceMetric.L2,
        idCol = "external_id", vecCol = "vector")
      .orderBy("qid", "rank").select("distance").collect().map(_.getFloat(0))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-3f * math.max(1.0f, w), s"$g vs $w")
    }
  }

  test("quantization error alone (probe-all, kFactor=4) clears a 0.95 recall floor") {
    // probe-all isolates the SQ8 rounding from the IVF partition pruning
    // (which costs the same recall it costs IVF_FLAT at equal nprobe):
    // what remains is the shortlist ordering error of 8-bit codes — tiny
    // next to PQ's 256-cell subspace collapse (reference gates PQ at 0.75)
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "IVF_SQ8", DistanceMetric.L2, timestamp = 1000L)
    val got = ids(VectorIndex.open(spark, uri)
      .asInstanceOf[IvfSq8Index]
      .queryBase(queries5, 10, nprobe0 = 1 << 30, kFactor = 4.0f))
    val want = exact(emb, 10, DistanceMetric.L2)
    val recall = want.keys.toSeq
      .map(q => got.getOrElse(q, Nil).toSet.intersect(want(q).toSet).size / 10.0)
      .sum / want.size
    assert(recall >= 0.95, s"recall $recall")
  }

  test("at equal nprobe the SQ8 path's recall tracks IVF_FLAT (pruning, not codes, is the cost)") {
    val sqUri = tmp()
    Ingest.ingest(spark, sqUri, emb, "IVF_SQ8", DistanceMetric.L2, timestamp = 1000L)
    val flatUri = tmp()
    Ingest.ingest(spark, flatUri, emb, "IVF_FLAT", DistanceMetric.L2, timestamp = 1000L)
    val want = exact(emb, 10, DistanceMetric.L2)
    def recallOf(df: DataFrame): Double = {
      val got = ids(df)
      want.keys.toSeq
        .map(q => got.getOrElse(q, Nil).toSet.intersect(want(q).toSet).size / 10.0)
        .sum / want.size
    }
    val rSq = recallOf(VectorIndex.open(spark, sqUri).query(queries5, 10, nprobe = 4))
    val rFlat = recallOf(VectorIndex.open(spark, flatUri).query(queries5, 10, nprobe = 4))
    assert(rSq >= rFlat - 0.05, s"sq8 $rSq vs ivf_flat $rFlat")
  }

  test("INNER_PRODUCT and byte dtypes are rejected with named errors") {
    val e1 = intercept[IllegalArgumentException] {
      Ingest.ingest(spark, tmp(), emb, "IVF_SQ8", DistanceMetric.InnerProduct,
        timestamp = 1000L)
    }
    assert(e1.getMessage.contains("INNER_PRODUCT"))
    val e2 = intercept[IllegalArgumentException] {
      Ingest.ingest(spark, tmp(), emb, "IVF_SQ8", DistanceMetric.L2,
        dtype = "uint8", timestamp = 1000L)
    }
    assert(e2.getMessage.contains("float32"))
  }

  test("updates and deletes merge exactly; consolidation retrains the quantizer") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "IVF_SQ8", DistanceMetric.L2,
      timestamp = 1000L)
    val moved = emb.where(col("external_id").between(20, 24))
      .select(col("external_id"),
        transform(col("vector"), x => x + lit(100.0f)).as("vector"))
    idx.updateBatch(moved, ts = 1500L)
    idx.deleteBatch(emb.where(col("external_id").between(25, 29))
      .select("external_id"), ts = 1600L)
    val merged = emb.where(!col("external_id").between(20, 29)).unionByName(moved)
    spark.conf.set(IvfSq8Index.KFactorKey, "1000000")
    try {
      val live = VectorIndex.open(spark, uri)
      assert(ids(live.query(queries5, 10, nprobe = 1 << 30)) ===
        exact(merged, 10, DistanceMetric.L2))
      // consolidate: fresh base version re-quantized over the merged state
      live.consolidateUpdates(newTs = 3000L)
      assert(Storage.nonEmpty(s"$uri/sq_params/v=3000"))
      val folded = VectorIndex.open(spark, uri)
      assert(ids(folded.query(queries5, 10, nprobe = 1 << 30)) ===
        exact(merged, 10, DistanceMetric.L2))
      // time travel back to v1000 serves the ORIGINAL base + quantizer
      val old = VectorIndex.open(spark, uri, timestamp = Some(1000L))
      assert(ids(old.query(queries5, 10, nprobe = 1 << 30)) ===
        exact(emb, 10, DistanceMetric.L2))
    } finally spark.conf.unset(IvfSq8Index.KFactorKey)
  }

  test("scale posture: the candidate scan reads codes, not float vectors") {
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "IVF_SQ8", DistanceMetric.L2, timestamp = 1000L)
    val idx = VectorIndex.open(spark, uri).asInstanceOf[IvfSq8Index]
    val plan = idx.queryBase(queries5, 10, nprobe0 = 2, kFactor = 4.0f)
      .queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.exists(s => s.contains("sq:binary") && !s.contains("vector")),
      s"no codes-only scan in:\n$plan")
    // nprobe partition pruning reaches the physical scan
    assert(plan.contains("partition_id"), plan)
  }

  private object Storage {
    def nonEmpty(path: String): Boolean = {
      val d = new java.io.File(path)
      d.isDirectory && d.listFiles().exists(_.getName.endsWith(".parquet"))
    }
  }
}
