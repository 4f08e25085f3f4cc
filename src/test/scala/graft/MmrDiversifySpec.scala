package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DistanceMetric, Knn, MmrDiversify}

class MmrDiversifySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val queries = emb.where(col("vec_id") < 4)

  test("lambda = 1.0 (ppm 1e6) is plain relevance top-k, in order") {
    val mmr = MmrDiversify.rerank(emb, queries, 8, candidates = 40,
        lambdaPpm = 1000000L,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "rank", "id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val exact = Knn.bruteForce(emb, queries, 8, DistanceMetric.InnerProduct,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "rank", "id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    // same SET at any lambda-1 tie structure; same ORDER when the pinned
    // micro scores are strict (floor can merge float-adjacent scores, in
    // which case MMR's id tiebreak and the heap's id tiebreak still agree)
    assert(mmr === exact, "lambda=1 MMR must reduce to relevance top-k")
  }

  test("near-duplicates are deferred: diversity pick beats the clone") {
    // 0 and 1 are clones along e1; 2 is orthogonal along e2 with smaller
    // relevance; the query points along e1+0.3*e2.
    val db = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.8f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.5f))).toDF("id", "vector")
    val q = Seq((100L, Array(1.0f, 0.3f, 0.1f))).toDF("qid", "qvec")
    val picks = MmrDiversify.rerank(db, q, 3, candidates = 4, lambdaPpm = 500000L)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    // relevance order is 0, 1, 2 — but at lambda .5 the clone (1) must
    // fall behind the orthogonal 2
    assert(picks.head === 0L, "first pick is pure relevance")
    assert(picks(1) === 2L, s"second pick should diversify away from the clone, got $picks")
    // the clone's penalty cancels its relevance entirely (sim to pick 1
    // ~= rel), so even low-relevance-but-orthogonal 3 outranks it
    assert(picks(2) === 3L, s"orthogonal low-rel pick should beat the clone, got $picks")
  }

  test("candidate pool smaller than corpus bounds the output; n < k degrades") {
    val db = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f))).toDF("id", "vector")
    val q = Seq((7L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = MmrDiversify.rerank(db, q, 5, candidates = 5).collect()
    assert(out.length === 2, "only n candidates exist -> n rows, no crash")
    assert(out.map(_.getInt(1)).sorted.toSeq === Seq(1, 2))
  }

  test("greedy chain is deterministic across repartitionings") {
    val a = MmrDiversify.rerank(emb, queries, 6, candidates = 30,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .orderBy("qid", "rank").collect().map(_.toSeq)
    val b = MmrDiversify.rerank(emb.repartition(17), queries, 6, candidates = 30,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .orderBy("qid", "rank").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq,
      "integer-pinned greedy must not depend on physical partitioning")
  }

  test("plan posture: no Window; heap shortlist; bounded-candidate broadcast fetch") {
    val plan = MmrDiversify.rerank(emb, queries, 5, candidates = 25,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "MMR must not plan a window")
    assert(plan.contains("min_topk") || plan.contains("MinTopK"),
      "shortlist reduces through the top-k heap aggregate")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "the bounded candidate list should broadcast into the vector fetch")
  }

  test("IVF-served candidates at probe-all reproduce the exact-scan MMR bit-identically") {
    val uri = java.nio.file.Files.createTempDirectory("graft_mmr_ivf").toString
    graft.index.Ingest.ingest(spark, uri,
      emb.select(col("vec_id").as("external_id"), col("embedding").as("vector")),
      "IVF_FLAT", DistanceMetric.InnerProduct, timestamp = 1000L, partitions = Some(4))
    val qs = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val hits = graft.index.VectorIndex.open(spark, uri)
      .query(qs, k = 25, nprobe = 4)
      .select("qid", "id")
    // the production path: shortlist physically pruned by the probe...
    val physical = hits.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*partition_id[^\\]]*\\]".r
      .findFirstIn(physical).isDefined,
      s"expected partition_id PartitionFilters on the shortlist scan:\n${physical.take(2000)}")
    // ...then the greedy stage over those candidates — at probe-all the
    // candidate SET equals the exact scan's, so picks are bit-identical
    val viaIndex = graft.operators.MmrDiversify.rerankCandidates(
        hits, emb, queries, k = 6,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val viaScan = graft.operators.MmrDiversify.rerank(
        emb, queries, k = 6, candidates = 25,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(viaIndex === viaScan)
  }

  test("duplicated candidate rows cannot surface one id at two ranks") {
    val db = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("id", "vector")
    val q = Seq((7L, Array(1.0f, 0.2f))).toDF("qid", "qvec")
    val dupCand = Seq((7L, 0L), (7L, 0L), (7L, 1L), (7L, 2L), (7L, 1L))
      .toDF("qid", "id")
    val picks = graft.operators.MmrDiversify.rerankCandidates(dupCand, db, q, k = 3)
      .select("id").as[Long].collect().toSeq
    assert(picks.sorted === Seq(0L, 1L, 2L),
      s"each candidate id must appear exactly once: $picks")
  }

  test("rank-1 objective is lambda*rel; penalties only lower later picks") {
    val out = MmrDiversify.rerank(emb, queries, 5, candidates = 25,
        lambdaPpm = 700000L,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .select("qid", "rank", "id", "mmr_micro").collect()
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.filter(_.getInt(1) === 1).foreach { r =>
      val expect = 700000L *
        MmrDiversify.simMicro(vecs(r.getLong(2)), vecs(r.getLong(0)))
      assert(r.getLong(3) === expect, s"rank-1 objective for qid ${r.getLong(0)}")
    }
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "the greedy objective must not increase along the chain")
    }
  }
}
