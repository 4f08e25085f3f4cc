package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{Ingest, VectorIndex}
import graft.operators.DistanceMetric

/** Update-lifecycle benchmark at corpus scale (reference:
  * index.py:418-577 `update_batch` / `delete_batch` /
  * `consolidate_updates`): the U1–U8 paths are hash-oracle-green at
  * driver SF, but their COSTS — the log append, the three-way
  * read-merge a query pays while updates are pending, and the
  * consolidation re-ingest — only show their scale shape on a corpus
  * where the base dwarfs the update batch. Builds IVF_FLAT at the √N
  * reference geometry over the shared [[SweepFixture]] corpus, then
  * times: pristine query → 1% upsert batch → 0.1% tombstone batch →
  * merged-read query (asserting tombstones are invisible) →
  * consolidate → post-consolidation query (same assertion).
  *
  * Usage: `runMain graft.MaintenanceScaleBench [sfDir] [reps] [nq]`
  * (defaults /root/testdata/sf0.1, 500 → 1M vectors, 100 queries).
  * Prints `MAINT {...}` lines for PERF.md. Maintenance benchmark, not
  * wired into Bench.
  */
object MaintenanceScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(500)
    val nq = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .appName("graft-maint-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, reps, nq)
    finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, reps: Int, nq: Int): Unit = {
    val (corpusPath, big, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, 0.5)
    println(s"MAINT_CORPUS n=$n dims=64 reps=$reps")
    val queries = SweepFixture.queries(spark, sfDir, nq).cache()
    queries.count()
    val k = 10

    val uri = java.nio.file.Files.createTempDirectory("maint_sweep_idx").toString
    val sqrtN = math.max(1, math.sqrt(n.toDouble).toInt)
    var t0 = System.nanoTime()
    Ingest.ingest(spark, uri, big, "IVF_FLAT", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(sqrtN))
    println(f"MAINT_BUILD partitions=$sqrtN build_s=${(System.nanoTime() - t0) / 1e9}%.1f")
    val idx = VectorIndex.open(spark, uri)
    val nprobe = math.max(1, math.sqrt(sqrtN.toDouble).toInt)

    def timedQuery(handle: VectorIndex, label: String,
        deletedInvisible: Boolean): Unit = {
      val t = System.nanoTime()
      val res = handle.query(queries, k, nprobe).cache()
      val rows = res.count()
      val wall = (System.nanoTime() - t) / 1e9
      // tombstoned ids must never surface in a merged read
      val leaked = if (deletedInvisible)
        res.where(pmod(col("id"), lit(1000)) === 7).count() else -1L
      res.unpersist()
      println(f"MAINT_QUERY phase=$label%s nprobe=$nprobe rows=$rows " +
        f"leaked_tombstones=$leaked wall_s=$wall%.2f")
      require(leaked <= 0, s"graft: $label surfaced $leaked tombstoned ids")
    }

    timedQuery(idx, "pristine", deletedInvisible = false)

    // 1% upsert batch: existing ids, re-jittered vectors (a real
    // re-embed), appended to the updates log
    val upserts = big.where(pmod(col("external_id"), lit(100)) === 0)
      .select(col("external_id"),
        expr("transform(vector, x -> float(x + 0.01))").as("vector"))
    t0 = System.nanoTime()
    idx.updateBatch(upserts, ts = 2000L)
    println(f"MAINT_UPDATE batch=${n / 100} wall_s=${(System.nanoTime() - t0) / 1e9}%.1f")

    // 0.1% tombstone batch
    val dels = big.where(pmod(col("external_id"), lit(1000)) === 7)
      .select("external_id")
    t0 = System.nanoTime()
    idx.deleteBatch(dels, ts = 3000L)
    println(f"MAINT_DELETE batch=${n / 1000} wall_s=${(System.nanoTime() - t0) / 1e9}%.1f")

    // the merged read path: base scan + anti-join against the log +
    // additions union, all while the log is raw parquet appends
    val merged = VectorIndex.open(spark, uri)
    timedQuery(merged, "merged_read", deletedInvisible = true)

    t0 = System.nanoTime()
    val consolidated = merged.consolidateUpdates(newTs = 4000L)
    println(f"MAINT_CONSOLIDATE wall_s=${(System.nanoTime() - t0) / 1e9}%.1f")
    timedQuery(consolidated, "consolidated", deletedInvisible = true)

    graft.index.Storage.deleteRecursively(uri)
    graft.index.Storage.deleteRecursively(corpusPath)
  }
}
