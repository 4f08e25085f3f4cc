package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.index.{Ingest, VectorIndex}
import graft.operators.{DistanceMetric, Knn}

/** Prints physical plans of the load-bearing operators so the shapes can be
  * audited: partition pruning on IVF probes, broadcast joins, partial
  * (ObjectHashAggregate) top-k, parquet filter/column pushdown. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = SparkTestSession.sf0001
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    val q = emb.where(col("external_id") < 3)
      .select(col("external_id").as("qid"), col("vector").as("qvec"))

    println("===== brute-force knn =====")
    Knn.bruteForce(emb, q, 5, DistanceMetric.L2,
      idCol = "external_id", vecCol = "vector").explain("formatted")

    val uri = Files.createTempDirectory("graft_audit").toString
    val idx = Ingest.ingest(spark, uri, emb, "IVF_FLAT", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(16))
    println("===== ivf nprobe=2 query =====")
    idx.query(q, 5, nprobe = 2).explain("formatted")

    println("===== parquet scan with projection over lineitem =====")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_quantity"))
      .explain("formatted")

    println("===== brute-force knn PAST the broadcast gate (partitioned cross join) =====")
    spark.conf.set(graft.Conf.MaxBroadcastBytesKey, "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try Knn.bruteForce(emb, q, 5, DistanceMetric.L2,
      idCol = "external_id", vecCol = "vector").explain("formatted")
    finally {
      spark.conf.unset(graft.Conf.MaxBroadcastBytesKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    println("===== duplicated-span dedup (hash agg + hash join, no all-pairs) =====")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.text.Dedup.duplicatedSpans(docs).explain("formatted")

    println("===== binary sign-sketch ANN (bits-only scan -> MinTopK -> re-rank join) =====")
    val binUri = Files.createTempDirectory("graft_audit_bin").toString
    val embRaw = spark.read.parquet(s"$dir/embeddings.parquet")
    graft.operators.BinaryKnn.buildSketch(
      embRaw.select(col("vec_id").as("id"), col("embedding").as("vector")), binUri)
    graft.operators.BinaryKnn.search(spark, binUri, embRaw,
      embRaw.where(col("vec_id") < 3), 5, fetchK = 20,
      DistanceMetric.L2, idCol = "vec_id", vecCol = "embedding",
      qidCol = "vec_id", qvecCol = "embedding").explain("formatted")

    println("===== BM25 indexed serving (term pushdown on sorted postings) =====")
    val bm25Uri = Files.createTempDirectory("graft_audit_bm25").toString
    graft.text.Bm25.fit(docs, bm25Uri)
    graft.text.Bm25.topkIndexed(spark, docs.where(col("doc_id") < 3), 5, bm25Uri)
      .explain("formatted")

    println("===== DSIR scoring (one pass, gated model broadcast, partial agg) =====")
    val dsirUri = Files.createTempDirectory("graft_audit_dsir").toString
    graft.text.Dsir.fit(docs, col("lang") === "en", dsirUri)
    graft.text.Dsir.score(docs, dsirUri).explain("formatted")

    println("===== hash split/sample (pure projection, no exchange) =====")
    docs.select(col("doc_id"),
      graft.text.TextOps.hashSplit(col("doc_id"), 800, 100, salt = "s1"))
      .explain("formatted")

    println("===== sequence packing (shard-partitioned window, no global sort) =====")
    graft.text.TextOps.packSequences(docs, 256, 8, col("doc_id"), salt = "s1")
      .explain("formatted")

    println("===== SQL probe over a sharded VAMANA table (shard_id pruning) =====")
    val vamUri = Files.createTempDirectory("graft_audit_vam").toString
    Ingest.ingest(spark, vamUri, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(4), shardReplicas = Some(2))
    graft.functions.registerAll(spark)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.IndexProbeRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IndexProbeRewrite
    graft.plans.GraftSql.registerIndexTable(spark, "audit_vam", vamUri, nprobe = 2)
    val qv = emb.where(col("external_id") === 0).select("vector")
      .head().getSeq[Float](0)
    val qlit = "cast(array(" + qv.map(x =>
      String.format(java.util.Locale.ROOT, "%.9e", Float.box(x))).mkString(",") +
      ") as array<float>)"
    spark.sql(s"SELECT external_id FROM audit_vam ORDER BY dist_l2(vector, $qlit) LIMIT 10")
      .explain("formatted")

    println("===== filtered IVF query (allow semi-join UNDER partition pruning) =====")
    val allow = emb.where(col("external_id") % 3 === 0).select("external_id")
    idx.queryFiltered(q, 5, allow, nprobe = 2).explain("formatted")

    println("===== filtered SQL top-k (probe filter + user WHERE compose) =====")
    spark.sql(s"""SELECT external_id FROM audit_vam
                 |WHERE external_id % 3 = 0
                 |ORDER BY dist_l2(vector, $qlit) LIMIT 10""".stripMargin)
      .explain("formatted")

    println("===== temperature mixture (two hash aggs + bounded-group window + per-group cumsum) =====")
    graft.text.TextOps.mixTemperature(docs, 60000L).explain("formatted")

    println("===== per-group quantile cut (two windows, group-local sorts) =====")
    graft.text.TextOps.topQuantileByGroup(docs, 3000, "lang",
      graft.text.TextOps.tokenCount(col("text"))).explain("formatted")

    println("===== hard negatives (blocked pair join, label conjunct pre-score) =====")
    val labeled = spark.read.parquet(s"$dir/embeddings.parquet")
    graft.operators.KnnGraph.hardNegatives(labeled, 3, DistanceMetric.L2,
      partitions = 8, nprobe = 2, idCol = "vec_id", vecCol = "embedding")
      .explain("formatted")
    spark.stop()
  }
}
