package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Ingest, VectorIndex}
import graft.operators.{DistanceMetric, Knn}

/** The reference-scale IVF_FLAT benchmark (reference:
  * local-benchmarks.py:339-378 — SIFT-style sweep of partitions × nprobe
  * at k=100): builds IVF_FLAT indexes over a ≥1M-vector corpus and sweeps
  * nprobe, reporting recall@100 against exact brute force plus query
  * wall-clock. This is the scale where PLANS dominate (partition pruning,
  * shuffle shape), not per-query constant overheads — the regime the
  * sf0.01–0.1 driver bench can't reach.
  *
  * Corpus: the sf embeddings table replicated `reps` times with a
  * deterministic per-(id, replica, lane) Murmur3 jitter — keeps the
  * original cluster structure (what IVF partitions latch onto) while
  * making every replica a distinct point. Queries are the UN-jittered
  * replica-0 rows of the first `nq` ids; ground truth is exact
  * [[Knn.bruteForce]] top-k over the full corpus.
  *
  * Usage: `runMain graft.IvfSweepBench [sfDir] [reps] [nq]`
  * (defaults /root/testdata/sf0.1, 500 → 1,000,000 vectors, 100 queries).
  * Prints one `SWEEP {...}` line per (partitions, nprobe) cell, for
  * PERF.md. Not wired into Bench: this is a maintenance benchmark, run
  * when index plumbing changes, like the Vamana recall audits.
  */
object IvfSweepBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(500)
    val nq = args.lift(2).map(_.toInt).getOrElse(100)
    val jitter = args.lift(3).map(_.toDouble).getOrElse(0.5)
    val mode = args.lift(4).getOrElse("all") // all | flat | pq | pq10m | sq8 | sqrtn | pqauto
    val spark = SparkSession.builder()
      .appName("graft-ivf-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, reps, nq, jitter, mode)
    finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, reps: Int, nq: Int, jitter: Double,
      mode: String = "all"): Unit = {
    val (corpusPath, big, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, jitter)
    println(s"SWEEP_CORPUS n=$n dims=64 reps=$reps")

    val queries = SweepFixture.queries(spark, sfDir, nq).cache()
    queries.count()

    val k = 100
    val exact = SweepFixture.groundTruth(
      Knn.bruteForce(big, queries, k, DistanceMetric.L2,
        idCol = "external_id", vecCol = "vector", qidCol = "qid", qvecCol = "qvec"))
    println(s"SWEEP_EXACT queries=${exact.size} k=$k")

    // the reference sweep's partition counts, plus √N (the reference
    // ingestion default at this corpus size). Mode "sqrtn" runs ONLY the
    // reference-default geometry — the 10M-scale run, where the full
    // partition grid would cost hours for information the 1M grid already
    // recorded (PERF.md) and the open question is how the √N build and the
    // driver-side probe bookkeeping scale with the partition count.
    val sqrtN = math.sqrt(n.toDouble).toInt
    val partsGrid = mode match {
      case "sqrtn" => Seq(sqrtN)
      case "pq" | "pq10m" | "sq8" | "pqauto" => Seq.empty // type-only modes skip the FLAT grid
      case _ => Seq(20, 50, 100, 200, sqrtN)
    }
    for (parts <- partsGrid) {
      val uri = java.nio.file.Files.createTempDirectory(s"ivf_sweep_p$parts").toString
      val t0 = System.nanoTime()
      Ingest.ingest(spark, uri, big, "IVF_FLAT", DistanceMetric.L2,
        timestamp = 1000L, partitions = Some(parts))
      val buildS = (System.nanoTime() - t0) / 1e9
      val idx = VectorIndex.open(spark, uri)
      val sqrtParts = math.max(1, math.sqrt(parts.toDouble).toInt)
      val probes =
        if (mode == "sqrtn") Seq(1, 4, 16, sqrtParts, 0) // 0 = the √parts default
        else if (parts == sqrtN) Seq(0, 1, 2, 4, 8, 16, 31)
        else (1 to 20)
      for (nprobe <- probes) {
        val t1 = System.nanoTime()
        val got = SweepFixture.groundTruth(idx.query(queries, k, nprobe))
        val queryS = (System.nanoTime() - t1) / 1e9
        val recall = SweepFixture.recall(exact, got, k)
        println(f"SWEEP {partitions: $parts, nprobe: $nprobe, recall: $recall%.4f, " +
          f"query_s: $queryS%.2f, build_s: $buildS%.1f}")
      }
      graft.index.Storage.deleteRecursively(uri)
    }

    if (mode == "flat" || mode == "sqrtn") {
      graft.index.Storage.deleteRecursively(corpusPath); return
    }
    // mode "pq10m": ONLY the PQ reference-default geometry (the 10M-scale
    // run — the full k_factor grid is the 1M sweep's job)
    if (mode == "pq10m") {
      val uriPq = java.nio.file.Files.createTempDirectory("ivf_sweep_pq10m").toString
      val t0 = System.nanoTime()
      Ingest.ingest(spark, uriPq, big, "IVF_PQ", DistanceMetric.L2,
        timestamp = 1000L, partitions = Some(sqrtN))
      val buildPqS = (System.nanoTime() - t0) / 1e9
      val pq = VectorIndex.open(spark, uriPq).asInstanceOf[graft.index.IvfPqIndex]
      val sqrtParts = math.max(1, math.sqrt(sqrtN.toDouble).toInt)
      for (kf <- Seq(4.0f, 16.0f, 32.0f); nprobe <- Seq(sqrtParts)) {
        val t1 = System.nanoTime()
        val got = SweepFixture.groundTruth(pq.queryBase(queries, k, nprobe, kf, None))
        val queryS = (System.nanoTime() - t1) / 1e9
        val recall = SweepFixture.recall(exact, got, k)
        println(f"SWEEP_PQ {partitions: $sqrtN, nprobe: $nprobe, k_factor: $kf%.0f, " +
          f"recall: $recall%.4f, query_s: $queryS%.2f, build_s: $buildPqS%.1f}")
      }
      graft.index.Storage.deleteRecursively(uriPq)
      graft.index.Storage.deleteRecursively(corpusPath)
      return
    }
    // mode "pqauto": the k_factor CALIBRATION audit — build IVF_PQ (and
    // IVF_SQ8) at the √N geometry, run the build-time auto-calibration
    // (graft.index.KFactorCalibration: saturated-pool agreement at the
    // default nprobe), then sweep the full grid against EXACT ground truth
    // and report where the measured knee sits. AUTO is validated when it
    // lands within one grid step of the knee — at 1M AND 10M, where the
    // measured knees differ by a decade (PQ 4 vs 32, PERF.md).
    if (mode == "pqauto") {
      val uriPq = java.nio.file.Files.createTempDirectory("ivf_sweep_pqauto").toString
      val t0b = System.nanoTime()
      Ingest.ingest(spark, uriPq, big, "IVF_PQ", DistanceMetric.L2,
        timestamp = 1000L, partitions = Some(sqrtN))
      val buildPqS = (System.nanoTime() - t0b) / 1e9
      val pq = VectorIndex.open(spark, uriPq).asInstanceOf[graft.index.IvfPqIndex]
      val tCal = System.nanoTime()
      val autoPq = pq.calibrateKFactor(k = k)
      println(f"SWEEP_PQ_AUTO {partitions: $sqrtN, auto_k_factor: $autoPq%.0f, " +
        f"calib_s: ${(System.nanoTime() - tCal) / 1e9}%.1f, build_s: $buildPqS%.1f}")
      val grid = graft.index.KFactorCalibration.Grid
      val recalls = grid.map { kf =>
        val t1 = System.nanoTime()
        val got = SweepFixture.groundTruth(pq.queryBase(queries, k, 0, kf, None))
        val queryS = (System.nanoTime() - t1) / 1e9
        val recall = SweepFixture.recall(exact, got, k)
        println(f"SWEEP_PQ {partitions: $sqrtN, nprobe: 0, k_factor: $kf%.0f, " +
          f"recall: $recall%.4f, query_s: $queryS%.2f}")
        kf -> recall
      }
      val maxR = recalls.map(_._2).max
      val knee = recalls.find(_._2 >= 0.95 * maxR).map(_._1).getOrElse(grid.max)
      println(f"SWEEP_PQ_KNEE {measured_knee: $knee%.0f, auto: $autoPq%.0f, " +
        f"within_one_step: ${autoPq >= knee / 2 && autoPq <= knee * 2}}")
      graft.index.Storage.deleteRecursively(uriPq)

      val uriSq = java.nio.file.Files.createTempDirectory("ivf_sweep_sq8auto").toString
      val t0s = System.nanoTime()
      Ingest.ingest(spark, uriSq, big, "IVF_SQ8", DistanceMetric.L2,
        timestamp = 1000L, partitions = Some(sqrtN))
      val buildSqS = (System.nanoTime() - t0s) / 1e9
      val sq = VectorIndex.open(spark, uriSq).asInstanceOf[graft.index.IvfSq8Index]
      val tCal2 = System.nanoTime()
      val autoSq = sq.calibrateKFactor(k = k)
      println(f"SWEEP_SQ8_AUTO {partitions: $sqrtN, auto_k_factor: $autoSq%.0f, " +
        f"calib_s: ${(System.nanoTime() - tCal2) / 1e9}%.1f, build_s: $buildSqS%.1f}")
      val recallsSq = Seq(1.0f, 2.0f, 4.0f, 8.0f).map { kf =>
        val got = SweepFixture.groundTruth(sq.queryBase(queries, k, 0, kf, None))
        val recall = SweepFixture.recall(exact, got, k)
        println(f"SWEEP_SQ8 {partitions: $sqrtN, nprobe: 0, k_factor: $kf%.0f, " +
          f"recall: $recall%.4f}")
        kf -> recall
      }
      val maxRs = recallsSq.map(_._2).max
      val kneeSq = recallsSq.find(_._2 >= 0.95 * maxRs).map(_._1).getOrElse(8.0f)
      println(f"SWEEP_SQ8_KNEE {measured_knee: $kneeSq%.0f, auto: $autoSq%.0f, " +
        f"within_one_step: ${autoSq >= kneeSq / 2 && autoSq <= kneeSq * 2}}")
      graft.index.Storage.deleteRecursively(uriSq)
      graft.index.Storage.deleteRecursively(corpusPath)
      return
    }
    // mode "sq8": IVF_SQ8 at the √N geometry — k_factor × nprobe recall
    // for the scalar-quantized candidate scan. Expectation (and the
    // reason SQ8 exists next to PQ): per-dim rounding error is tiny vs
    // PQ's 256-cell subspace collapse, so the curve should sit at the
    // IVF_FLAT ceiling from small k_factor even where PQ needs 16–32.
    if (mode == "sq8") {
      val uriSq = java.nio.file.Files.createTempDirectory("ivf_sweep_sq8").toString
      val t0 = System.nanoTime()
      Ingest.ingest(spark, uriSq, big, "IVF_SQ8", DistanceMetric.L2,
        timestamp = 1000L, partitions = Some(sqrtN))
      val buildSqS = (System.nanoTime() - t0) / 1e9
      val sq = VectorIndex.open(spark, uriSq).asInstanceOf[graft.index.IvfSq8Index]
      for (kf <- Seq(1.0f, 2.0f, 4.0f); nprobe <- Seq(8, 31)) {
        val t1 = System.nanoTime()
        val got = SweepFixture.groundTruth(sq.queryBase(queries, k, nprobe, kf, None))
        val queryS = (System.nanoTime() - t1) / 1e9
        val recall = SweepFixture.recall(exact, got, k)
        println(f"SWEEP_SQ8 {partitions: $sqrtN, nprobe: $nprobe, k_factor: $kf%.0f, " +
          f"recall: $recall%.4f, query_s: $queryS%.2f, build_s: $buildSqS%.1f}")
      }
      graft.index.Storage.deleteRecursively(uriSq)
      graft.index.Storage.deleteRecursively(corpusPath)
      return
    }
    // IVF_PQ at the √N geometry: k_factor (exact-re-rank candidate
    // inflation) × nprobe, the reference's PQ accuracy/latency curve
    // (local-benchmarks.py PQ sweeps; k_factor: ivf_pq_index.py:40-45)
    val uriPq = java.nio.file.Files.createTempDirectory("ivf_sweep_pq").toString
    val t0 = System.nanoTime()
    Ingest.ingest(spark, uriPq, big, "IVF_PQ", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(sqrtN))
    val buildPqS = (System.nanoTime() - t0) / 1e9
    val pq = VectorIndex.open(spark, uriPq).asInstanceOf[graft.index.IvfPqIndex]
    for (kf <- Seq(1.0f, 2.0f, 4.0f, 8.0f); nprobe <- Seq(8, 31)) {
      val t1 = System.nanoTime()
      val got = SweepFixture.groundTruth(pq.queryBase(queries, k, nprobe, kf, None))
      val queryS = (System.nanoTime() - t1) / 1e9
      val recall = SweepFixture.recall(exact, got, k)
      println(f"SWEEP_PQ {partitions: $sqrtN, nprobe: $nprobe, k_factor: $kf%.0f, " +
        f"recall: $recall%.4f, query_s: $queryS%.2f, build_s: $buildPqS%.1f}")
    }
    graft.index.Storage.deleteRecursively(uriPq)
    graft.index.Storage.deleteRecursively(corpusPath)
  }

}
