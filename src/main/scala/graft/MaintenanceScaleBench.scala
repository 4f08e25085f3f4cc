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
  * Usage: `runMain graft.MaintenanceScaleBench [sfDir] [reps] [nq] [mode]`
  * (defaults /root/testdata/sf0.1, 500 → 1M vectors, 100 queries, mode
  * `ivf`). Mode `vamana` runs [[runVamana]] — the graph-index
  * consolidation arm. Prints `MAINT {...}` lines for PERF.md.
  * Maintenance benchmark, not wired into Bench.
  */
object MaintenanceScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(500)
    val nq = args.lift(2).map(_.toInt).getOrElse(100)
    val mode = args.lift(3).getOrElse("ivf") // ivf | vamana
    val spark = SparkSession.builder()
      .appName("graft-maint-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (mode == "vamana") runVamana(spark, sfDir, reps)
      else run(spark, sfDir, reps, nq)
    } finally spark.stop()
  }

  /** VAMANA consolidation cost vs touched shards — the one lifecycle
    * whose scale shape the IVF arm can't show: a graph re-ingest is the
    * sequential per-shard build kernel again (2573.9 s at 10M, PERF.md),
    * while [[graft.index.VamanaIndex.consolidateUpdates]]'s incremental
    * path byte-copies untouched shards and re-runs the kernel only for
    * shards whose membership changed. The arm upserts batches drawn from
    * a CONTROLLED shard prefix (1% of shards, then 4%) and times each
    * fold; cost ∝ touched shards means the second wall ≈ 4× the first's
    * kernel share and BOTH ≪ the fresh build — three printed numbers.
    * Fixed shard granularity (n/2500, the sweep-validated geometry —
    * per-shard build is superlinear in shard size, so auto geometry at
    * 10M would hide the effect behind giant shards). */
  def runVamana(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    val (corpusPath, big, n) = SweepFixture.replicatedCorpus(spark, sfDir, reps, 0.5)
    val shards = math.max(4, (n / 2500L).toInt)
    println(s"VMAINT_CORPUS n=$n dims=64 reps=$reps shards=$shards")

    val uri = java.nio.file.Files.createTempDirectory("vmaint_idx").toString
    var t0 = System.nanoTime()
    Ingest.ingest(spark, uri, big, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(shards))
    val buildS = (System.nanoTime() - t0) / 1e9
    println(f"VMAINT_BUILD shards=$shards build_s=$buildS%.1f")

    /** Shard dirs of `layer/v=ts` whose part-file NAME SET changed vs the
      * prior version — rewritten shards get fresh part-uuid names while
      * byte-copied shards keep theirs, so this counts REBUILT shards
      * from the filesystem, independent of the engine's own bookkeeping. */
    def rebuiltShards(prevTs: Long, ts: Long): Int = {
      (0 until shards).count { sid =>
        val prev = graft.index.Storage.listFiles(s"$uri/graph/v=$prevTs/shard_id=$sid")
          .map(_._1).toSet
        val cur = graft.index.Storage.listFiles(s"$uri/graph/v=$ts/shard_id=$sid")
          .map(_._1).toSet
        prev != cur
      }
    }

    // upsert batches drawn from a shard PREFIX, filtered to re-embeds
    // whose new value still assigns to its home shard — k-means cells
    // hold many boundary points, so even a +0.001/lane drift scatters a
    // FEW rows into almost every shard, and a handful of drifters is
    // enough to touch all of them (measured: touched=1 → rebuilt=8 on
    // the unfiltered batch). Pinning the batch in place is what makes
    // "cost ∝ touched" measurable; a drifting re-embed costs exactly
    // like an add into the drift target, which the fold prices the same.
    def upsertAndFold(prevTs: Long, ts: Long, touchShards: Int): Unit = {
      import org.apache.spark.sql.graftshim.{toColumn, toExpression}
      val cents = spark.read.parquet(s"$uri/centroids/v=$prevTs")
        .orderBy("partition_id").collect()
        .map(r => r.getSeq[Float](r.fieldIndex("centroid")).toArray)
      val rows = spark.read.parquet(s"$uri/base/v=$prevTs")
        .where(col("shard_id") < touchShards)
        .select(col("external_id"), col("shard_id"),
          expr("transform(vector, x -> float(x + 0.001))").as("vector"))
        .where(toColumn(graft.functions.NearestCentroid(
          toExpression(col("vector")), cents)) === col("shard_id"))
        .select("external_id", "vector")
      val batch = rows.count()
      val idx = VectorIndex.open(spark, uri)
      var t = System.nanoTime()
      idx.updateBatch(rows, ts = ts - 500)
      val appendS = (System.nanoTime() - t) / 1e9
      t = System.nanoTime()
      VectorIndex.open(spark, uri).consolidateUpdates(newTs = ts)
      val foldS = (System.nanoTime() - t) / 1e9
      val rebuilt = rebuiltShards(prevTs, ts)
      println(f"VMAINT_FOLD touched=$touchShards rebuilt=$rebuilt " +
        f"batch=$batch append_s=$appendS%.1f consolidate_s=$foldS%.1f " +
        f"vs_build=${foldS / buildS}%.3f")
    }

    upsertAndFold(1000L, 2000L, math.max(1, shards / 100)) // ~1% of shards
    upsertAndFold(2000L, 3000L, math.max(2, shards / 25)) // ~4% of shards

    // sanity: an updated vector still finds itself post-fold (the graph
    // for its shard was really rebuilt over the new vectors)
    val probe = spark.read.parquet(s"$uri/base/v=3000")
      .where(col("shard_id") === 0).limit(1)
      .select(col("external_id").as("qid"), col("vector").as("qvec"))
      .localCheckpoint()
    val hit = VectorIndex.open(spark, uri).query(probe, 1)
      .select("id").collect().map(_.getLong(0))
    val qid = probe.select("qid").head().getLong(0)
    require(hit.headOption.contains(qid),
      s"graft: post-fold self-query returned ${hit.toSeq}, expected $qid")
    println(s"VMAINT_SELFQUERY ok id=$qid")

    graft.index.Storage.deleteRecursively(uri)
    graft.index.Storage.deleteRecursively(corpusPath)
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
