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
  * [shardReplicas] [shards]` (defaults /root/testdata/sf0.1, 125 →
  * 250,000 vectors, 100 queries, jitter parameter 0.5 → ±0.25/lane,
  * 2 replicas, auto shards — pass `shards` explicitly at large reps:
  * the sequential per-shard build is the unit of work, so shard size,
  * not corpus size, sets wall-clock).
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
    val spark = SparkSession.builder()
      .appName("graft-vamana-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "48g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, reps, nq, jitter, replicas, shardsOpt)
    finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, reps: Int, nq: Int,
      jitter: Double, replicas: Int, shardsOpt: Option[Int] = None): Unit = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // the IvfSweepBench fixture: replica 0 bit-exact, others jittered
    // uniform on ±jitter/2 per lane (deterministic Murmur3)
    val corpus = base
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select(
        (col("vec_id") * reps + col("r")).as("external_id"),
        expr(s"""transform(embedding, (x, i) ->
             CASE WHEN r = 0 THEN x
             ELSE x + float((pmod(hash(vec_id, r, i), 1000) - 500) / 1000.0 * $jitter) END)""")
          .as("vector"))
    val corpusPath = java.nio.file.Files.createTempDirectory("vam_sweep_corpus").toString
    corpus.write.mode("overwrite").parquet(corpusPath)
    val big = spark.read.parquet(corpusPath)
    val n = big.count()
    println(s"VSWEEP_CORPUS n=$n dims=64 reps=$reps replicas=$replicas")

    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .cache()
    queries.count()

    val k = 10
    val exact = groundTruth(
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

    for (s <- Seq(2, 4, 8, 0); ls <- Seq(50, 100, 200)) {
      if (s == 0 || s < shards) {
        val t1 = System.nanoTime()
        val got = groundTruth(idx.queryLSearch(queries, k, ls, nprobeShards = s))
        val queryS = (System.nanoTime() - t1) / 1e9
        val recall = exact.keys.toSeq.map { q =>
          (got.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / k
        }.sum / exact.size
        val sLabel = if (s == 0) "all" else s.toString
        println(f"VSWEEP {shards: $shards, S: $sLabel%s, l_search: $ls, " +
          f"recall: $recall%.4f, query_s: $queryS%.2f}")
      }
    }
    graft.index.Storage.deleteRecursively(uri)
    graft.index.Storage.deleteRecursively(corpusPath)
  }

  private def groundTruth(res: DataFrame): Map[Long, Set[Long]] =
    res.select("qid", "id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
}
