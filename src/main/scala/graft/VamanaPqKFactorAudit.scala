package graft

import org.apache.spark.sql.SparkSession

import graft.index.{Ingest, VamanaIndex}
import graft.operators.{DistanceMetric, Knn}

/** kFactor sensitivity of the Vamana PQ-traversal arm (reference:
  * ivf_pq_index.py:40-45's k_factor — re-rank breadth is the recovery
  * knob for quantization loss). The 250k [[VamanaSweepBench]] run showed
  * the PQ beam's recall ceiling ≈0.875 at kFactor=4; this audit builds
  * the same fixture ONCE and sweeps kFactor at fixed fan-out/beam to
  * measure how much exact-re-rank breadth recovers, mirroring the 10M
  * IVF_PQ curve (where k_factor 32 restored the IVF ceiling).
  *
  * Usage: `runMain graft.VamanaPqKFactorAudit [sfDir] [reps] [nq]
  * [jitter] [replicas] [shards]` (defaults match the 250k sweep:
  * /root/testdata/sf0.1, 125, 100, 0.5, 2, 100). Prints one
  * `VKFA {...}` line per (S, l_search, kFactor) cell, for PERF.md.
  * Maintenance benchmark, not wired into Bench.
  */
object VamanaPqKFactorAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(125)
    val nq = args.lift(2).map(_.toInt).getOrElse(100)
    val jitter = args.lift(3).map(_.toDouble).getOrElse(0.5)
    val replicas = args.lift(4).map(_.toInt).getOrElse(2)
    val shardsOpt = args.lift(5).map(_.toInt).orElse(Some(100))
    val spark = SparkSession.builder()
      .appName("graft-vamana-pq-kfactor").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, reps, nq, jitter, replicas, shardsOpt)
    finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, reps: Int, nq: Int,
      jitter: Double, replicas: Int, shardsOpt: Option[Int]): Unit = {
    val (corpusPath, big, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, jitter)
    println(s"VKFA_CORPUS n=$n dims=64 reps=$reps replicas=$replicas")

    val queries = SweepFixture.queries(spark, sfDir, nq).cache()
    queries.count()

    val k = 10
    val exact = SweepFixture.groundTruth(
      Knn.bruteForce(big, queries, k, DistanceMetric.L2,
        idCol = "external_id", vecCol = "vector", qidCol = "qid", qvecCol = "qvec"))
    println(s"VKFA_EXACT queries=${exact.size} k=$k")

    val uri = java.nio.file.Files.createTempDirectory("vam_kfa_idx").toString
    val t0 = System.nanoTime()
    val idx = Ingest.ingest(spark, uri, big, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = shardsOpt, shardReplicas = Some(replicas))
      .asInstanceOf[VamanaIndex]
    idx.buildPqCodes()
    val shards = graft.index.IndexMeta.read(uri).partitionHistory.last
    println(f"VKFA_BUILD shards=$shards build_s=${(System.nanoTime() - t0) / 1e9}%.1f")

    for (s <- Seq(4, 0); ls <- Seq(100, 200); kf <- Seq(4f, 8f, 16f, 32f)) {
      val t1 = System.nanoTime()
      val got = SweepFixture.groundTruth(
        idx.withPqTraversal(kf).queryLSearch(queries, k, ls, nprobeShards = s))
      val queryS = (System.nanoTime() - t1) / 1e9
      val recall = SweepFixture.recall(exact, got, k)
      val sLabel = if (s == 0) "all" else s.toString
      println(f"VKFA {S: $sLabel%s, l_search: $ls, k_factor: ${kf.toInt}, " +
        f"recall: $recall%.4f, query_s: $queryS%.2f}")
    }
    graft.index.Storage.deleteRecursively(uri)
    graft.index.Storage.deleteRecursively(corpusPath)
  }

}
