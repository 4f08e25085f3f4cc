package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DistanceMetric, Knn}

/** Large-scale matryoshka sweep on the shared replicated-corpus fixture
  * ([[SweepFixture]], same corpus as the IVF/Vamana/MaxSim sweeps):
  * measures the prefix-dimension shortlist trade ([[Knn.matryoshka]]) at
  * a scale where plans dominate — recall@10 vs exact brute force and
  * wall seconds across (prefixDims, shortlist) budgets, plus the exact
  * scan as the floor. The fixture's vectors are NOT matryoshka-trained
  * (a prefix is only a random projection), so the recall column is the
  * operator's honest WORST case; trained MRL embeddings concentrate
  * signal in the prefix.
  *
  * Run: `sbt "Test/runMain graft.MatryoshkaSweepBench [sfDir] [reps]"`. */
object MatryoshkaSweepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(128)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("matryoshka-sweep")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (corpusPath, corpus, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, 0.05)
    try {
      val k = 10
      val qs = SweepFixture.queries(spark, sfDir, 10)
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (exact, tExact) = timed {
        SweepFixture.groundTruth(
          Knn.bruteForce(corpus, qs, k, DistanceMetric.Cosine,
            idCol = "external_id", vecCol = "vector"))
      }
      println(f"MATSWEEP n=$n exact_scan=$tExact%6.2f s (the floor every budget must beat)")
      for {
        prefix <- Seq(8, 16, 32)
        shortlist <- Seq(k, 10 * k, 100 * k)
      } {
        val (got, t) = timed {
          SweepFixture.groundTruth(
            Knn.matryoshka(corpus, qs, k, shortlist, prefix, DistanceMetric.Cosine,
              idCol = "external_id", vecCol = "vector"))
        }
        val r = SweepFixture.recall(exact, got, k)
        println(f"MATSWEEP prefix=$prefix%3d shortlist=$shortlist%5d recall@10=$r%6.4f wall=$t%6.2f s")
      }
      // PRODUCTION-SEAM arms: the prefix shortlist served by an IVF_FLAT
      // index over the materialized 16-dim prefix (the driver row's
      // deployment shape, knn_matryoshka) probed at REAL nprobe values —
      // the recall/latency trade actually shipped at scale, not just the
      // probe-all correctness point. Recall decomposes as (prefix
      // information loss) × (partition pruning loss); the probe-all row
      // isolates the former, the √P rows add the latter.
      val prefix = 16
      val shortlist = 100 * k
      val parts = math.max(1, math.sqrt(n.toDouble).toInt) // the ingest default, pinned
      val uri = java.nio.file.Files.createTempDirectory("graft_mat_ivf").toString
      graft.index.Ingest.ingest(spark, uri,
        corpus.select(col("external_id"),
          slice(col("vector"), 1, prefix).as("vector")),
        "IVF_FLAT", DistanceMetric.Cosine, timestamp = 1000L,
        partitions = Some(parts))
      val idx = graft.index.VectorIndex.open(spark, uri)
      val sqrtP = math.max(1, math.round(math.sqrt(parts.toDouble)).toInt)
      val qPre = qs.select(col("qid"), slice(col("qvec"), 1, prefix).as("qvec"))
      for (nprobe <- Seq(1, sqrtP, 2 * sqrtP, parts).distinct) {
        val (got, t) = timed {
          val cand = idx.query(qPre, shortlist, nprobe).select("qid", "id")
          SweepFixture.groundTruth(
            Knn.matryoshkaRerank(cand, corpus, qs, k, DistanceMetric.Cosine,
              idCol = "external_id", vecCol = "vector"))
        }
        val r = SweepFixture.recall(exact, got, k)
        println(f"MATSWEEP ivf prefix=$prefix%3d shortlist=$shortlist%5d parts=$parts%4d " +
          f"nprobe=$nprobe%4d recall@10=$r%6.4f wall=$t%6.2f s")
      }
    } finally {
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(corpusPath), true)
      spark.stop()
    }
  }
}
