package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Ingest, VamanaIndex, VectorIndex}
import graft.operators.{DistanceMetric, Knn}

/** Reference-scale VAMANA benchmark (reference: local-benchmarks.py Vamana
  * l_search sweeps at SIFT scale): builds a sharded, boundary-replicated
  * graph over a large replicated+jittered corpus and sweeps
  * l_search × nprobeShards, reporting recall@10 vs exact brute force plus
  * build/query wall-clock — the graph-ANN sibling of [[IvfSweepBench]],
  * at the scale where the per-shard build and the routed read path (not
  * per-query constants) dominate.
  *
  * Usage: `runMain graft.VamanaSweepBench [sfDir] [reps] [nq] [jitter]
  * [shardReplicas] [shards] [pq]` (defaults /root/testdata/sf0.1, 125 →
  * 250,000 vectors, 100 queries, jitter parameter 0.5 → ±0.25/lane,
  * 2 replicas, auto shards — pass `shards` explicitly at large reps:
  * the sequential per-shard build is the unit of work, so shard size,
  * not corpus size, sets wall-clock; `pq=1` adds the PQ-traversal arm
  * ([[VamanaIndex.withPqTraversal]]) next to every float cell).
  * Prints one `VSWEEP {...}` line per cell, for PERF.md. Maintenance
  * benchmark, not wired into Bench.
  */
object VamanaSweepBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(125)
    val nq = args.lift(2).map(_.toInt).getOrElse(100)
    val jitter = args.lift(3).map(_.toDouble).getOrElse(0.5)
    val replicas = args.lift(4).map(_.toInt).getOrElse(2)
    val shardsOpt = args.lift(5).map(_.toInt)
    val pq = args.lift(6).exists(_ == "1")
    // Optional grid overrides (comma lists; S=0 means all-shard) — the
    // default grid scans 12 cells, too many at 10M where each all-shard
    // cell is a full-corpus graph traversal.
    val sList = args.lift(7).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 4, 8, 0))
    val lsList = args.lift(8).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(50, 100, 200))
    val spark = SparkSession.builder()
      .appName("graft-vamana-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, reps, nq, jitter, replicas, shardsOpt, pq, sList, lsList)
    finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, reps: Int, nq: Int,
      jitter: Double, replicas: Int, shardsOpt: Option[Int] = None,
      pq: Boolean = false, sList: Seq[Int] = Seq(2, 4, 8, 0),
      lsList: Seq[Int] = Seq(50, 100, 200)): Unit = {
    val (corpusPath, big, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, jitter)
    println(s"VSWEEP_CORPUS n=$n dims=64 reps=$reps replicas=$replicas")

    val queries = SweepFixture.queries(spark, sfDir, nq).cache()
    queries.count()

    val k = 10
    val exact = SweepFixture.groundTruth(
      Knn.bruteForce(big, queries, k, DistanceMetric.L2,
        idCol = "external_id", vecCol = "vector", qidCol = "qid", qvecCol = "qvec"))
    println(s"VSWEEP_EXACT queries=${exact.size} k=$k")

    val uri = java.nio.file.Files.createTempDirectory("vam_sweep_idx").toString
    val t0 = System.nanoTime()
    val idx = Ingest.ingest(spark, uri, big, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = shardsOpt, shardReplicas = Some(replicas))
      .asInstanceOf[VamanaIndex]
    val buildS = (System.nanoTime() - t0) / 1e9
    val shards = graft.index.IndexMeta.read(uri).partitionHistory.last
    println(f"VSWEEP_BUILD shards=$shards build_s=$buildS%.1f")

    val pqIdx = if (pq) {
      val t2 = System.nanoTime()
      idx.buildPqCodes()
      println(f"VSWEEP_PQ_BUILD codes_s=${(System.nanoTime() - t2) / 1e9}%.1f")
      Some(idx.withPqTraversal())
    } else None

    // the calibration audit: per routing width S, the AUTO k_factor the
    // build-time calibration would pick (graft.index.KFactorCalibration —
    // saturated-pool agreement at that S), printed next to the grid cells
    // so PERF.md can place AUTO against the measured knee. persist=false:
    // every S calibrates against the same on-disk index.
    if (pq) for (s <- sList; if s == 0 || s < shards) {
      val tc = System.nanoTime()
      val auto = idx.withNprobeShards(s).calibratePqKFactor(
        k = k, lSearch = lsList.max, persist = false)
      val sLabel = if (s == 0) "all" else s.toString
      println(f"VSWEEP_PQ_AUTO {shards: $shards, S: $sLabel%s, " +
        f"auto_k_factor: $auto%.0f, calib_s: ${(System.nanoTime() - tc) / 1e9}%.1f}")
    }

    for (s <- sList; ls <- lsList) {
      if (s == 0 || s < shards) {
        val t1 = System.nanoTime()
        val got = SweepFixture.groundTruth(
          idx.queryLSearch(queries, k, ls, nprobeShards = s))
        val queryS = (System.nanoTime() - t1) / 1e9
        val recall = SweepFixture.recall(exact, got, k)
        val sLabel = if (s == 0) "all" else s.toString
        println(f"VSWEEP {shards: $shards, S: $sLabel%s, l_search: $ls, " +
          f"recall: $recall%.4f, query_s: $queryS%.2f}")
        pqIdx.foreach { pidx =>
          val t2 = System.nanoTime()
          val gotPq = SweepFixture.groundTruth(
            pidx.queryLSearch(queries, k, ls, nprobeShards = s))
          val pqS = (System.nanoTime() - t2) / 1e9
          val recallPq = SweepFixture.recall(exact, gotPq, k)
          println(f"VSWEEP_PQ {shards: $shards, S: $sLabel%s, l_search: $ls, " +
            f"recall: $recallPq%.4f, query_s: $pqS%.2f}")
        }
      }
    }
    graft.index.Storage.deleteRecursively(uri)
    graft.index.Storage.deleteRecursively(corpusPath)
  }

}
