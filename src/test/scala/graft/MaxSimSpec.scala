package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaxSim

/** Late-interaction (MaxSim) retrieval ([[graft.operators.MaxSim]]):
  * exactness at full shortlist, candidate-re-rank exactness at a small
  * shortlist, and the windowless plan posture. */
class MaxSimSpec extends AnyFunSuite {
  import SparkTestSession._

  // 30 objects x 4 vectors from the fixture; first 5 objects are queries
  private lazy val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .where(col("vec_id") < 120)
    .select(expr("vec_id DIV 4").as("obj"), col("vec_id").as("vid"),
      col("embedding").as("vector"))
  private lazy val qs = vecs.where(col("obj") < 5)
    .select(col("obj").as("qid"), col("vid").as("qvid"), col("vector").as("qvec"))

  /** Driver-side MaxSim replay sharing NOTHING with the operator: raw
    * vectors are collected and the strict left-to-right double-fold dot,
    * max, floor-micro, sum, and top-k all re-run in plain Scala — so a
    * defect in the DotProductStrict kernel itself breaks this spec too. */
  private lazy val exactScores: Map[(Long, Long), Long] = {
    def fold(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val dv = vecs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val qv = dv.filter(_._1 < 5)
    (for {
      (qid, _, q) <- qv
      (obj, _, _) <- dv.map(t => (t._1, 0, 0)).distinct
    } yield ((qid, obj), {
      val m = dv.filter(_._1 == obj).map(t => fold(t._3, q)).max
      math.floor(m * 1000000.0).toLong
    })).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
  }

  private def exactTopK(k: Int): Map[Long, Seq[(Long, Long)]] =
    exactScores.toSeq
      .map { case ((qid, obj), s) => (qid, obj, s) }
      .groupBy(_._1)
      .view.mapValues(_.sortBy { case (_, obj, s) => (-s, obj) }
        .take(k).map { case (_, obj, s) => (obj, s) })
      .toMap

  test("shortlistK >= |vectors| reproduces exact MaxSim, ranks and micros") {
    val got = MaxSim.topK(vecs, qs, k = 8, shortlistK = 120)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val want = exactTopK(8)
    assert(got.map(_._1).distinct.sorted.toSeq == (0L until 5L))
    for ((qid, rank, obj, micro) <- got) {
      val (wObj, wMicro) = want(qid)(rank - 1)
      assert(obj == wObj && micro == wMicro,
        s"qid=$qid rank=$rank: got ($obj, $micro), want ($wObj, $wMicro)")
    }
  }

  test("small shortlist: re-rank is exact on surfaced candidates, order holds") {
    val got = MaxSim.topK(vecs, qs, k = 8, shortlistK = 4)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // every surfaced object's score is the EXACT MaxSim score (stage 3
    // re-ranks candidates against the full query vector set)
    for ((qid, _, obj, micro) <- got)
      assert(micro == exactScores((qid, obj)), s"qid=$qid obj=$obj")
    // scores non-increasing within a query, ties broken by ascending obj
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, o1, s1), (_, _, o2, s2)) =>
          assert(s1 > s2 || (s1 == s2 && o1 < o2))
        case _ =>
      }
    }
    // a 4-deep shortlist over 4 query vectors still recalls most of the
    // exact top-8 on this fixture; the floor guards against regressions
    // that silently drop candidates (e.g. losing the obj join)
    val want = exactTopK(8)
    val hits = got.count { case (qid, _, obj, _) =>
      want(qid).exists(_._1 == obj)
    }
    assert(hits >= 30, s"recall collapsed: $hits/40 exact hits surfaced")
  }

  test("IVF-served shortlist at probe-all feeds the identical MaxSim result (the 100 TB seam)") {
    import graft.index.{Ingest, VectorIndex}
    import graft.operators.DistanceMetric
    val uri = java.nio.file.Files.createTempDirectory("graft_maxsim_ivf").toString
    Ingest.ingest(spark, uri,
      vecs.select(col("vid").as("external_id"), col("vector")),
      "IVF_FLAT", DistanceMetric.InnerProduct,
      timestamp = 1000L, partitions = Some(4))
    val hits = VectorIndex.open(spark, uri)
      .query(qs.select(col("qvid").as("qid"), col("qvec")), k = 12, nprobe = 4)
      .select(col("qid").as("qvid"), col("id").as("vid"))
    // the shortlist scan must PRUNE PHYSICALLY: the probe's partition ids
    // reach the parquet scan as PartitionFilters (the driver query serves
    // through this exact seam)
    val physical = hits.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*partition_id[^\\]]*\\]".r
      .findFirstIn(physical).isDefined,
      s"expected partition_id PartitionFilters on the shortlist scan:\n${physical.take(2500)}")
    val viaIndex = MaxSim.rerank(vecs, qs, hits, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val viaScan = MaxSim.topK(vecs, qs, k = 8, shortlistK = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(viaIndex == viaScan)
  }

  test("edges: k past the candidate pool under-fills, empty queries empty, bad k named") {
    // k larger than the object count: every object returns, ranked — no
    // padding rows, no failure
    val all = MaxSim.topK(vecs, qs, k = 1000, shortlistK = 120)
      .groupBy("qid").count().collect()
    assert(all.length == 5, s"every query must answer: ${all.toSeq}")
    all.foreach(r => assert(r.getLong(1) == 30L, r.toString))
    // an empty query batch is an empty result, not a crashed plan
    assert(MaxSim.topK(vecs, qs.where(col("qid") < 0), k = 5, shortlistK = 8)
      .count() == 0L)
    // invalid knobs fail with named errors
    val e1 = intercept[IllegalArgumentException] {
      MaxSim.topK(vecs, qs, k = 0, shortlistK = 8)
    }
    assert(e1.getMessage.contains("k must be positive"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      MaxSim.topK(vecs, qs, k = 5, shortlistK = 0)
    }
    assert(e2.getMessage.contains("shortlistK must be positive"), e2.getMessage)
  }

  test("plan posture: no Window anywhere in the MaxSim plan") {
    val plan = MaxSim.topK(vecs, qs, k = 8, shortlistK = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"MaxSim must stay windowless:\n$plan")
  }
}
