package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{Ingest, VamanaIndex}
import graft.operators.DistanceMetric

/** QUERY-side cost of shard routing (build excluded): one boundary-
  * replicated sharded build, then timed query batches at nprobeShards ∈
  * sweep ∪ {all}. Run:
  * `sbt "Test/runMain graft.VamanaRoutingLatencyAudit [sfDir] [replicas] [shards]"`.
  * Numbers land in PERF.md next to the recall sweep — routing trades a
  * bounded recall loss (measured there) for this fan-out/read reduction. */
object VamanaRoutingLatencyAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val shards = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    // batch size matters: routing prunes reads to <= batch x S shards, so
    // the win is largest for small (serving-style) batches — a batch that
    // covers every shard anyway only saves beam compute, not IO
    val nq = args.drop(3).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("vamana-routing-latency-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
      .crossJoin(spark.range(replicas).select(col("id").as("replica")))
      .select(
        (col("replica") * 1000000L + col("external_id")).as("external_id"),
        expr("""transform(vector, (x, i) ->
                 float(x + 0.04 * replica * sin(replica * 13.7 + i * 0.31 + external_id * 0.017)))""")
          .as("vector"))
      .cache()
    val n = emb.count()
    val uri = Files.createTempDirectory("graft_vam_lat").toString
    val t0 = System.nanoTime()
    val idx = Ingest.ingest(spark, uri, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(shards), shardReplicas = Some(3))
      .asInstanceOf[VamanaIndex]
    val buildSec = (System.nanoTime() - t0) / 1e9
    val queries = emb.where(col("external_id") < nq)
      .select(col("external_id").as("qid"), col("vector").as("qvec")).cache()
    queries.count()

    println(f"# VAMANA routing query-latency audit (n=$n, $shards shards x3 replicas, $nq queries, build $buildSec%.1f s)")
    println("| nprobeShards | warm query sec |")
    println("|---|---|")
    for (s <- Seq(1, 2, 4, -1)) {
      // warm once (parquet footers, code), then time
      idx.queryLSearch(queries, 10, lSearch = 100, nprobeShards = s).count()
      val t = System.nanoTime()
      idx.queryLSearch(queries, 10, lSearch = 100, nprobeShards = s).count()
      val sec = (System.nanoTime() - t) / 1e9
      val label = if (s == -1) "all" else s.toString
      println(f"| $label | $sec%.2f |")
    }
    spark.stop()
  }
}
