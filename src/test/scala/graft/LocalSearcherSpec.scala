package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Ingest, VectorIndex}
import graft.operators.DistanceMetric

/** The serving-mode snapshot must reproduce the distributed query path:
  * same ids, same (toleranced) distances, for every metric, with the
  * updates-log merge applied — at zero Spark jobs per query. */
class LocalSearcherSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft_serve").toString

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    .cache()

  private lazy val queries = emb.where(col("external_id") < 10)
    .select(col("external_id").as("qid"), col("vector").as("qvec"))

  private lazy val queryVecs: Map[Long, Array[Float]] =
    queries.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** Distributed results as qid -> Seq[(id, distance)] ordered by rank. */
  private def distributed(idx: VectorIndex, k: Int, nprobe: Int = 0)
      : Map[Long, Seq[(Long, Float)]] =
    idx.query(queries, k, nprobe).orderBy("qid", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(2), r.getFloat(3))).toSeq }

  private def assertMatches(
      local: Map[Long, Array[(Long, Float)]],
      dist: Map[Long, Seq[(Long, Float)]],
      tol: Float = 1e-4f): Unit = {
    assert(local.keySet === dist.keySet)
    local.keys.foreach { q =>
      assert(local(q).map(_._1).toSeq === dist(q).map(_._1), s"ids for qid=$q")
      local(q).map(_._2).zip(dist(q).map(_._2)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= tol * math.max(1.0f, math.abs(b)),
          s"distance mismatch for qid=$q: $a vs $b")
      }
    }
  }

  private def serveAll(idx: VectorIndex, k: Int, nprobe: Int = 0)
      : Map[Long, Array[(Long, Float)]] = {
    val s = idx.localSearcher()
    queryVecs.map { case (q, v) => q -> s.query(v, k, nprobe) }
  }

  test("FLAT: local results equal distributed for L2, SOS, IP, cosine") {
    for (metric <- Seq(DistanceMetric.L2, DistanceMetric.SumOfSquares,
        DistanceMetric.InnerProduct, DistanceMetric.Cosine)) {
      val uri = tmp()
      val idx = Ingest.ingest(spark, uri, emb, "FLAT", metric, timestamp = 1000L)
      assertMatches(serveAll(idx, 10), distributed(idx, 10))
    }
  }

  test("IVF_FLAT: local probe-all and default-nprobe equal distributed") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "IVF_FLAT", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(16))
    assertMatches(serveAll(idx, 10, nprobe = 1 << 30), distributed(idx, 10, 1 << 30))
    // same centroids -> same probed partitions -> identical approximate sets
    assertMatches(serveAll(idx, 10), distributed(idx, 10))
  }

  test("IVF_FLAT cosine: normalized store served correctly") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "IVF_FLAT", DistanceMetric.Cosine,
      timestamp = 1000L, partitions = Some(8))
    assertMatches(serveAll(idx, 10, nprobe = 8), distributed(idx, 10, 8))
  }

  test("updates merge: deletes masked, upserts override, additions found") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    idx.deleteBatch(emb.where(col("external_id") % 20 === 0), ts = 1100L)
    idx.updateBatch(emb.where(col("external_id") % 20 === 1)
      .select(col("external_id"), reverse(col("vector")).as("vector")), ts = 1100L)
    idx.updateBatch(emb.where(col("external_id") < 5)
      .select((col("external_id") + 1000000L).as("external_id"),
        reverse(col("vector")).as("vector")), ts = 1100L)
    val reopened = VectorIndex.open(spark, uri)
    val local = serveAll(reopened, 10)
    assertMatches(local, distributed(reopened, 10))
    // deleted ids never appear
    local.values.foreach(_.foreach { case (id, _) => assert(id % 20 != 0 || id >= 1000000L) })
  }

  test("uint8 FLAT: packed store unpacks to the same results as distributed") {
    val uri = tmp()
    val quantized = emb.select(col("external_id"),
      expr("transform(vector, x -> float(greatest(0.0, least(255.0, floor((x + 1.0) * 127.5)))))")
        .as("vector"))
    val idx = Ingest.ingest(spark, uri, quantized, "FLAT", DistanceMetric.L2,
      dtype = "uint8", timestamp = 1000L)
    assertMatches(serveAll(idx, 10), distributed(idx, 10))
  }

  test("serving gate refuses an over-budget corpus with a clear error") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    spark.conf.set(graft.index.LocalSearcher.MaxLocalServeBytesKey, "1024")
    try {
      val e = intercept[IllegalArgumentException](idx.localSearcher())
      assert(e.getMessage.contains("maxLocalServeBytes"))
    } finally spark.conf.unset(graft.index.LocalSearcher.MaxLocalServeBytesKey)
  }

  test("queryFiltered: local pre-filter equals the distributed filtered query") {
    val uri = Files.createTempDirectory("graft_serve_filt").toString
    val idx = Ingest.ingest(spark, uri, emb, "IVF_FLAT", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(8))
    val allow = emb.where(col("external_id") % 3 === 0).select("external_id")
    val dist = idx.queryFiltered(queries, 10, allow, nprobe = 1 << 30)
      .orderBy("qid", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(2), r.getFloat(3))).toSeq }
    val s = idx.localSearcher()
    val local = queryVecs.map { case (q, v) =>
      q -> s.queryFiltered(v, 10, _ % 3 == 0, nprobe = 1 << 30)
    }
    assert(local.values.forall(_.forall(_._1 % 3 == 0)))
    assert(local.values.forall(_.length === 10)) // k slots fill from allowed
    assertMatches(local, dist)
  }

  test("IVF_PQ and VAMANA snapshots serve exact brute force") {
    val uriPq = tmp()
    val pq = Ingest.ingest(spark, uriPq, emb, "IVF_PQ", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(8))
    val exact = distributed(
      VectorIndex.open(spark, tmpFlat), 10)
    val localPq = serveAll(pq, 10)
    assert(localPq.keys.toSet === exact.keySet)
    localPq.keys.foreach(q => assert(localPq(q).map(_._1).toSeq === exact(q).map(_._1)))

    val uriV = tmp()
    val vam = Ingest.ingest(spark, uriV, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L)
    val localV = serveAll(vam, 10)
    localV.keys.foreach(q => assert(localV(q).map(_._1).toSeq === exact(q).map(_._1)))

    // BINARY snapshots serve exact brute force too — equal to the
    // distributed path at probe-all (the sketch is a distributed-scan
    // optimization; a local snapshot scans the floats directly)
    val uriB = tmp()
    val bin = Ingest.ingest(spark, uriB, emb, "BINARY", DistanceMetric.L2,
      timestamp = 1000L)
    val localB = serveAll(bin, 10)
    localB.keys.foreach(q => assert(localB(q).map(_._1).toSeq === exact(q).map(_._1)))
  }

  test("BINARY cosine: raw store scored as cosine, equal to distributed") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "BINARY", DistanceMetric.Cosine,
      timestamp = 1000L)
    // scoring path: a BINARY base stores RAW vectors (Ingest skips
    // normalize-at-ingest), so the local snapshot must use the raw-store
    // cosine path (divide by candidate norm), not sqDist/2 — a stale
    // normalizedStore flag here produced wrong distances AND wrong top-k.
    // Compare at probe-all (fetchK = |base|): the distributed sketch
    // shortlist is exact there, so local must match it bit-for-rank.
    assertMatches(serveAll(idx, 10), distributed(idx, 10, 1 << 30))
    // ids also equal exact FLAT cosine brute force (probe-all semantics)
    val flatUri = tmp()
    val flat = Ingest.ingest(spark, flatUri, emb, "FLAT", DistanceMetric.Cosine,
      timestamp = 1000L)
    val exact = distributed(flat, 10)
    val localB = serveAll(idx, 10)
    localB.keys.foreach(q => assert(localB(q).map(_._1).toSeq === exact(q).map(_._1)))

    // additions keep RAW magnitudes: add reversed 3x-scaled vectors (reverse
    // gives a distinct direction — a pure scaled copy would cosine-TIE its
    // original for every query and flip ranks on float rounding), update,
    // serve, consolidate — cosine results are scale-invariant, but the
    // STORED consolidated base must hold the raw (scaled) values, not
    // silently normalized ones
    idx.updateBatch(emb.where(col("external_id") < 5)
      .select((col("external_id") + 2000000L).as("external_id"),
        expr("reverse(transform(vector, x -> x * 3.0f))").as("vector")), ts = 1100L)
    val reopened = VectorIndex.open(spark, uri)
    assertMatches(serveAll(reopened, 10), distributed(reopened, 10, 1 << 30))
    val cons = reopened.consolidateUpdates(newTs = 1200L)
    assertMatches(serveAll(cons, 10), distributed(cons, 10, 1 << 30))
    val orig = emb.where(col("external_id") < 5).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    cons.baseVectors().where(col("external_id") >= 2000000L).collect()
      .foreach { r =>
        val got = r.getSeq[Float](r.fieldIndex("vector")).toArray
        val want = orig(r.getLong(r.fieldIndex("external_id")) - 2000000L)
          .map(_ * 3.0f).reverse
        got.zip(want).foreach { case (g, w) =>
          assert(math.abs(g - w) <= 1e-5f * math.max(1.0f, math.abs(w)),
            "consolidated BINARY base must keep raw magnitudes")
        }
      }
  }

  private lazy val tmpFlat: String = {
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    uri
  }
}
