package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DistanceMetric, Knn}

/** [[Knn.matryoshka]] — prefix-dim shortlist + full-dim exact re-rank. */
class MatryoshkaSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val queries = emb.where(col("vec_id") < 5)

  private def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select("qid", "rank", "id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }

  test("shortlist = |db| reproduces brute force exactly (every metric)") {
    val n = emb.count().toInt
    for (metric <- Seq(DistanceMetric.Cosine, DistanceMetric.L2,
        DistanceMetric.InnerProduct, DistanceMetric.SumOfSquares)) {
      val exact = ids(Knn.bruteForce(emb, queries, 10, metric,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding"))
      val mat = ids(Knn.matryoshka(emb, queries, 10, shortlist = n, prefixDims = 16,
        metric = metric,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding"))
      assert(mat === exact, s"probe-all matryoshka must equal brute force under $metric")
    }
  }

  test("prefixDims = full dims with shortlist = k is brute force; recall grows with budget") {
    val dims = emb.head().getSeq[Float](emb.columns.indexOf("embedding")).length
    val exact = ids(Knn.bruteForce(emb, queries, 10, DistanceMetric.Cosine,
      idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding"))
    val fullPrefix = ids(Knn.matryoshka(emb, queries, 10, shortlist = 10,
      prefixDims = dims, metric = DistanceMetric.Cosine,
      idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding"))
    assert(fullPrefix === exact,
      "a full-dim prefix shortlist of exactly k IS the exact answer")
    def recall(shortlist: Int): Double = {
      val got = ids(Knn.matryoshka(emb, queries, 10, shortlist, prefixDims = 32,
        metric = DistanceMetric.Cosine,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding"))
      exact.map { case (q, e) => got(q).toSet.intersect(e.toSet).size / 10.0 }
        .sum / exact.size
    }
    val r10 = recall(10)
    val r80 = recall(80)
    assert(r80 >= r10, s"recall must not shrink with a larger shortlist ($r10 -> $r80)")
    // the synthetic embeddings are NOT matryoshka-trained, so a prefix is
    // only a random projection — the honest worst case. Half the dims at
    // 8x budget measured 0.84 here; trained MRL embeddings concentrate
    // the signal in the prefix and sit far higher.
    assert(r80 >= 0.8, s"32-of-64-dim shortlist at 8x budget should recall >= 0.8, got $r80")
  }

  test("re-ranked distances are the FULL-dimension distances, rank-ordered") {
    val out = Knn.matryoshka(emb, queries, 5, shortlist = 50, prefixDims = 16,
        metric = DistanceMetric.L2,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .collect()
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.foreach { r =>
      val (q, id, d) = (r.getLong(0), r.getLong(2), r.getFloat(3))
      val expect = math.sqrt(vecs(q).zip(vecs(id)).map { case (a, b) =>
        (a - b).toDouble * (a - b) }.sum)
      assert(math.abs(d - expect) < 1e-3, s"distance of ($q,$id)")
    }
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getFloat(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "distances must ascend with rank")
    }
  }

  test("prefix-INDEX-served shortlist at probe-all equals the slice form (the 100 TB seam)") {
    // the deployment shape: the 16-dim prefix MATERIALIZED as its own
    // IVF index (the scan shrinks dims/prefix x on top of the pruning),
    // probed for the shortlist, full vectors only touched by the re-rank
    val uri = java.nio.file.Files.createTempDirectory("graft_mat_ivf").toString
    graft.index.Ingest.ingest(spark, uri,
      emb.select(col("vec_id").as("external_id"),
        org.apache.spark.sql.functions.slice(col("embedding"), 1, 16).as("vector")),
      "IVF_FLAT", DistanceMetric.Cosine, timestamp = 1000L, partitions = Some(4))
    val qs = queries.select(col("vec_id").as("qid"),
      org.apache.spark.sql.functions.slice(col("embedding"), 1, 16).as("qvec"))
    val hits = graft.index.VectorIndex.open(spark, uri)
      .query(qs, k = 30, nprobe = 4)
      .select("qid", "id")
    val viaIndex = ids(Knn.matryoshkaRerank(hits, emb, queries, 10,
      metric = DistanceMetric.Cosine,
      idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding"))
    val viaSlice = ids(Knn.matryoshka(emb, queries, 10, shortlist = 30, prefixDims = 16,
      metric = DistanceMetric.Cosine,
      idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding"))
    assert(viaIndex === viaSlice,
      "probe-all prefix-index shortlist must reproduce the in-plan slice shortlist")
  }

  test("duplicated candidate rows cannot occupy two top-k slots with one id") {
    import spark.implicits._
    val dup = queries.select(col("vec_id").as("qid"), col("vec_id").as("id"))
      .union(queries.select(col("vec_id").as("qid"), col("vec_id").as("id")))
    val out = Knn.matryoshkaRerank(dup, emb, queries, k = 5,
      metric = DistanceMetric.Cosine,
      idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
    val perQuery = out.groupBy("qid").count().as[(Long, Long)].collect().toMap
    assert(perQuery.values.forall(_ == 1L),
      s"one distinct candidate -> one row per query: $perQuery")
  }

  test("plan posture: no Window; heap aggregates; broadcast candidate fetch") {
    val plan = Knn.matryoshka(emb, queries, 10, shortlist = 30, prefixDims = 16,
        metric = DistanceMetric.Cosine,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "matryoshka must not plan a window")
    assert(plan.contains("min_topk") || plan.contains("MinTopK"),
      "both stages reduce through the top-k heap aggregate")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "the bounded candidate list should broadcast into the re-rank fetch")
  }
}
