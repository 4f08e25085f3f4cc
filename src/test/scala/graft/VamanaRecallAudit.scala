package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{Ingest, VamanaIndex}
import graft.operators.{DistanceMetric, Knn}

/** Shard-boundary recall audit for sharded VAMANA builds: sweeps shard
  * count × lSearch and prints recall@10 vs exact L2 — the table recorded in
  * PERF.md (reference recall gate: test_ingestion.py:23 expects ≥ 0.85).
  * Run: `sbt "Test/runMain graft.VamanaRecallAudit [sfDir]"`. */
object VamanaRecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("vamana-recall-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The fixture embeddings tables are small (500–2000 rows) — every shard
    // would be smaller than lSearch and recall trivially 1.0. Augment with
    // `replicas` deterministic sinusoidal perturbations of each base vector
    // so 16 shards still hold ~600+ vectors each and the greedy search is
    // genuinely approximate.
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val shardList = args.drop(2).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 4, 16))
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    val emb = base
      .crossJoin(spark.range(replicas).select(col("id").as("replica")))
      .select(
        (col("replica") * 1000000L + col("external_id")).as("external_id"),
        expr("""transform(vector, (x, i) ->
                 float(x + 0.15 * sin(replica * 13.7 + i * 0.31 + external_id * 0.017)))""")
          .as("vector"))
      .cache()
    val n = emb.count()
    val k = 10
    val queries = emb.where(col("external_id") < 100)
      .select(col("external_id").as("qid"), col("vector").as("qvec"))

    def idsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    val exact = idsOf(Knn.bruteForce(emb, queries, k, DistanceMetric.L2,
      idCol = "external_id", vecCol = "vector"))

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = idsOf(df)
      exact.keys.toSeq
        .map(q => got.getOrElse(q, Set.empty[Long]).intersect(exact(q)).size.toDouble / k)
        .sum / exact.size
    }

    println(s"# VAMANA shard-boundary recall audit  (n=$n, k=$k, 100 queries, $dir)")
    println("| shards | shardReplicas | nprobeShards | lSearch | recall@10 |")
    println("|---|---|---|---|---|")
    val repsList = args.drop(3).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 2))
    for (shards <- shardList; reps <- (if (shards > 1) repsList else Seq(1))) {
      val uri = Files.createTempDirectory(s"graft_vam_audit_${shards}_$reps").toString
      val idx = Ingest.ingest(spark, uri, emb, "VAMANA", DistanceMetric.L2,
        timestamp = 1000L, partitions = Some(shards), shardReplicas = Some(reps))
        .asInstanceOf[VamanaIndex]
      // S = 0 is the all-shard exact merge; S < shards is the routed path
      // (per-query top-S shards by shard-centroid distance).
      val probeList = Seq(0, 1, 2, 4).filter(s => s == 0 || s < shards)
      for (s <- probeList; ls <- Seq(50, 100, 200)) {
        val r = recallOf(idx.queryLSearch(queries, k, ls, nprobeShards = s))
        val sLabel = if (s == 0) "all" else s.toString
        println(f"| $shards | $reps | $sLabel | $ls | $r%.4f |")
      }
    }
    spark.stop()
  }
}
