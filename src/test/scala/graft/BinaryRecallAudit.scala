package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BinaryKnn, DistanceMetric, Knn}

/** Recall audit for the binary sign-quantization path: sweeps the re-rank
  * budget `fetchK` and prints recall@10 vs exact L2 — the table recorded
  * in PERF.md (the fetchK→recall trade IS the operator's tuning knob; at
  * fetchK = |db| it is exact by construction, spec-asserted).
  * Run: `sbt "Test/runMain graft.BinaryRecallAudit [sfDir]"`. */
object BinaryRecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("binary-recall-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count().toInt
    val queries = emb.where(col("vec_id") < 100)
    val k = 10
    val exact = Knn.bruteForce(emb, queries, k, DistanceMetric.L2,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uri = Files.createTempDirectory("graft_bin_audit").toString
    BinaryKnn.buildSketch(
      emb.select(col("vec_id").as("id"), col("embedding").as("vector")), uri)
    println(f"n=$n%d  queries=100  k=$k%d  (64-dim sign sketch)")
    println("fetchK  recall@10")
    for (f <- Seq(k, 2 * k, 4 * k, 8 * k, 16 * k, n)) {
      val got = BinaryKnn.search(spark, uri, emb, queries, k, fetchK = f,
          DistanceMetric.L2, idCol = "vec_id", vecCol = "embedding",
          qidCol = "vec_id", qvecCol = "embedding")
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$f%6d  ${(got & exact).size.toDouble / exact.size}%.4f")
    }
    spark.stop()
  }
}
