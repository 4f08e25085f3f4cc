package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DistanceMetric, MmrDiversify}

/** Large-scale MMR sweep on the shared replicated-corpus fixture — the
  * production recall/latency trade of the IVF-served seam
  * ([[MmrDiversify.rerankCandidates]], the driver row's deployment
  * shape) at REAL nprobe values, not just the probe-all correctness
  * point. "Recall" here is SELECTION AGREEMENT: the fraction of the
  * exact-scan MMR's k picks the IVF-served greedy also picks — the
  * greedy chain is deterministic given the candidate set, so any
  * disagreement is purely shortlist membership drift from partition
  * pruning. The exact scan ([[MmrDiversify.rerank]]) is the floor every
  * budget must beat on wall clock.
  *
  * Run: `sbt "Test/runMain graft.MmrSweepBench [sfDir] [reps]"`. */
object MmrSweepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(128)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("mmr-sweep")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (corpusPath, corpus, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, 0.05)
    try {
      val k = 10
      val candidates = 100
      val qs = SweepFixture.queries(spark, sfDir, 10)
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      def picks(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        SweepFixture.groundTruth(df.select(col("qid"), col("id")))
      val (exact, tExact) = timed {
        picks(MmrDiversify.rerank(corpus, qs, k, candidates,
          idCol = "external_id", vecCol = "vector"))
      }
      println(f"MMRSWEEP n=$n exact_scan=$tExact%6.2f s (shortlist=$candidates, k=$k)")
      // IVF_FLAT InnerProduct index over the full vectors — the same
      // metric the exact shortlist ranks by, so probe-all reproduces the
      // exact picks bit-identically (spec-pinned) and lower nprobe shows
      // the pure partition-pruning cost
      val parts = math.max(1, math.sqrt(n.toDouble).toInt)
      val uri = java.nio.file.Files.createTempDirectory("graft_mmr_ivf").toString
      val (_, tBuild) = timed {
        graft.index.Ingest.ingest(spark, uri,
          corpus.select(col("external_id"), col("vector")),
          "IVF_FLAT", DistanceMetric.InnerProduct, timestamp = 1000L,
          partitions = Some(parts))
      }
      println(f"MMRSWEEP ivf_build parts=$parts wall=$tBuild%6.2f s")
      val idx = graft.index.VectorIndex.open(spark, uri)
      val sqrtP = math.max(1, math.round(math.sqrt(parts.toDouble)).toInt)
      for (nprobe <- Seq(1, sqrtP, 2 * sqrtP, parts).distinct) {
        val (got, t) = timed {
          val cand = idx.query(qs, candidates, nprobe).select("qid", "id")
          picks(MmrDiversify.rerankCandidates(cand, corpus, qs, k,
            idCol = "external_id", vecCol = "vector"))
        }
        val agree = SweepFixture.recall(exact, got, k)
        println(f"MMRSWEEP ivf parts=$parts%4d nprobe=$nprobe%4d " +
          f"agreement@$k=$agree%6.4f wall=$t%6.2f s")
      }
      graft.index.Storage.deleteRecursively(uri)
    } finally {
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(corpusPath), true)
      spark.stop()
    }
  }
}
