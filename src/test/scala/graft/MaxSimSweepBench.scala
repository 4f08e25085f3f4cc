package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{Ingest, VectorIndex}
import graft.operators.{DistanceMetric, MaxSim}

/** Large-scale MaxSim sweep on the shared replicated-corpus fixture
  * ([[SweepFixture]], same corpus construction as [[IvfSweepBench]] /
  * [[VamanaSweepBench]]): measures BOTH serving paths of the
  * late-interaction operator at a scale where plans, not overheads,
  * dominate —
  *
  *   - the exact-scan shortlist ([[MaxSim.topK]]) across budgets, and
  *   - the IVF-served shortlist through the [[MaxSim.rerank]] seam
  *     (per-query-vector index probes at several nprobe), the plan the
  *     100 TB deployment runs.
  *
  * Prints recall@10 of OBJECT sets vs exact MaxSim (full shortlist) and
  * wall seconds per configuration — the table recorded in PERF.md.
  * Run: `sbt "Test/runMain graft.MaxSimSweepBench [sfDir] [reps]"`. */
object MaxSimSweepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(128)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("maxsim-sweep")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (corpusPath, corpus, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, 0.05)
    try {
      // group by id MOD n/4, not DIV 4: the replicated fixture lays the
      // same base vector's jittered copies consecutively, so DIV-grouping
      // would make every "object" four near-identical vectors (degenerate
      // MaxSim — any shortlist saturates). MOD-grouping strides the
      // corpus, so each object carries four DIFFERENT base embeddings —
      // the heterogeneous multi-vector shape the operator exists for.
      val nObj = (n / 4).toInt
      val vecs = corpus.select(
        pmod(col("external_id"), lit(nObj.toLong)).as("obj"),
        col("external_id").as("vid"),
        col("vector")).cache()
      vecs.count()
      val qs = vecs.where(col("obj") < 10)
        .select(col("obj").as("qid"), col("vid").as("qvid"), col("vector").as("qvec"))
        .cache()
      val k = 10
      println(s"vectors=$n objects=${n / 4} queries=10x4 k=$k")

      def objSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        df.select("qid", "obj").collect()
          .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSet }

      val t0 = System.nanoTime()
      val exact = objSets(MaxSim.topK(vecs, qs, k, n.toInt))
      println(f"exact (shortlistK=n): ${(System.nanoTime() - t0) / 1e9}%.1f s")

      println("path            budget  recall@10  sec")
      for (sl <- Seq(16, 32, 64, 128)) {
        val t = System.nanoTime()
        val got = objSets(MaxSim.topK(vecs, qs, k, sl))
        val sec = (System.nanoTime() - t) / 1e9
        val rec = SweepFixture.recall(exact, got, k)
        println(f"scan-shortlist  $sl%6d  $rec%9.4f  $sec%.1f")
      }

      // the 100 TB seam: IVF probes feed the same re-rank
      val uri = java.nio.file.Files.createTempDirectory("graft_maxsim_sweep_idx").toString
      val parts = math.max(1, math.sqrt(n.toDouble).toInt)
      val tb = System.nanoTime()
      Ingest.ingest(spark, uri,
        vecs.select(col("vid").as("external_id"), col("vector")),
        "IVF_FLAT", DistanceMetric.InnerProduct,
        timestamp = 1000L, partitions = Some(parts))
      println(f"ivf build: $parts%d partitions, ${(System.nanoTime() - tb) / 1e9}%.1f s")
      val idx = VectorIndex.open(spark, uri)
      val qv = qs.select(col("qvid").as("qid"), col("qvec"))
      for (nprobe <- Seq(4, 16, 64)) {
        val t = System.nanoTime()
        val hits = idx.query(qv, k = 64, nprobe = nprobe)
          .select(col("qid").as("qvid"), col("id").as("vid"))
        val got = objSets(MaxSim.rerank(vecs, qs, hits, k))
        val sec = (System.nanoTime() - t) / 1e9
        val rec = SweepFixture.recall(exact, got, k)
        println(f"ivf-shortlist   $nprobe%6d  $rec%9.4f  $sec%.1f")
      }
      graft.index.Storage.deleteRecursively(uri)
    } finally {
      graft.index.Storage.deleteRecursively(corpusPath)
      spark.stop()
    }
  }
}
