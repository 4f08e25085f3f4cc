package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexMeta, VectorIndex}
import graft.operators.{DistanceMetric, Knn}

/** Frozen-layout backwards compatibility (reference:
  * backwards-compatibility-data/ + test_backwards_compatibility.py:1-74):
  * the committed fixtures under src/test/resources/graft-compat were
  * written by [[CompatFixtureGen]] at the storage version in their
  * directory name and are NEVER regenerated. Every released layout must
  * stay openable and queryable; a failure here means a layout change
  * shipped without a conscious [[IndexMeta.StorageVersion]] bump. */
class CompatSpec extends AnyFunSuite {
  import SparkTestSession._

  private val roots: Seq[(String, java.io.File)] = {
    val base = new java.io.File("src/test/resources/graft-compat")
    assert(base.isDirectory, s"compat fixtures missing at ${base.getAbsolutePath}")
    base.listFiles().filter(_.isDirectory).toSeq.sortBy(_.getName)
      .map(d => d.getName -> d)
  }

  test("a fixture directory exists for the CURRENT storage version") {
    assert(roots.exists(_._1 == IndexMeta.StorageVersion),
      s"no frozen fixture for storage version ${IndexMeta.StorageVersion} — " +
        "run `sbt \"Test/runMain graft.CompatFixtureGen\"` once and commit it")
  }

  private def exactTop(db: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Seq[Long]] =
    Knn.bruteForce(db, queries, k, DistanceMetric.L2,
        idCol = "external_id", vecCol = "vector")
      .orderBy("qid", "rank").collect()
      .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(2)).toSeq }

  // the corpus doesn't depend on the fixture version — one cached copy
  private lazy val frozen = CompatFixtureGen.corpus(spark).cache()
  private lazy val frozenU8 = CompatFixtureGen.corpusU8(spark).cache()

  for ((version, dir) <- roots) {
    lazy val queries = frozen.where(col("external_id") < 5)
      .select(col("external_id").as("qid"), col("vector").as("qvec"))
    lazy val queriesU8 = frozenU8.where(col("external_id") < 5)
      .select(col("external_id").as("qid"), col("vector").as("qvec"))

    test(s"v$version: every frozen index opens with correct metadata") {
      for (sub <- dir.listFiles().filter(_.isDirectory).map(_.getName).sorted) {
        val idx = VectorIndex.open(spark, s"${dir.getPath}/$sub")
        assert(idx.meta.storageVersion == version, s"$sub version drifted")
        assert(idx.meta.dimensions === 8, s"$sub dims")
        assert(idx.meta.baseSizes === List(60L), s"$sub baseSizes")
      }
    }

    test(s"v$version: FLAT f32 serves exact results and its frozen updates log") {
      val idx = VectorIndex.open(spark, s"${dir.getPath}/flat_f32")
      val got = idx.query(queries, 5).orderBy("qid", "rank")
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSeq }
      // expected = frozen corpus with the fixture's logged update applied
      // (id 59 deleted, id 58's vector reversed)
      val merged = frozen.where(col("external_id") < 58)
        .unionByName(frozen.where(col("external_id") === 58)
          .select(col("external_id"), reverse(col("vector")).as("vector")))
      assert(got === exactTop(merged, queries, 5))
    }

    test(s"v$version: FLAT u8 byte layout decodes exactly") {
      val idx = VectorIndex.open(spark, s"${dir.getPath}/flat_u8")
      assert(idx.meta.dtype === "uint8")
      val got = idx.query(queriesU8, 5).orderBy("qid", "rank")
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSeq }
      assert(got === exactTop(frozenU8, queriesU8, 5))
    }

    test(s"v$version: IVF_FLAT probe-all equals brute force (f32 + u8)") {
      val idx = VectorIndex.open(spark, s"${dir.getPath}/ivf_flat_f32")
      val got = idx.query(queries, 5, nprobe = 1 << 30).orderBy("qid", "rank")
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSeq }
      assert(got === exactTop(frozen, queries, 5))
      val idxU8 = VectorIndex.open(spark, s"${dir.getPath}/ivf_flat_u8")
      val gotU8 = idxU8.query(queriesU8, 5, nprobe = 1 << 30).orderBy("qid", "rank")
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSeq }
      assert(gotU8 === exactTop(frozenU8, queriesU8, 5))
    }

    test(s"v$version: IVF_PQ opens, probes, and finds the self-match") {
      val idx = VectorIndex.open(spark, s"${dir.getPath}/ivf_pq_f32")
      assert(idx.meta.numSubspaces === 4)
      val hits = idx.query(queries, 3, nprobe = 1 << 30)
      assert(hits.groupBy("qid").count().where(col("count") =!= 3).count() === 0)
      // PQ is approximate but the frozen codebooks must still place each
      // query's own vector in its top-3
      val self = hits.where(col("qid") === col("id")).count()
      assert(self >= 4, s"PQ self-match degraded: $self of 5")
    }

    test(s"v$version: VAMANA graph + persisted build params serve searches") {
      val idx = VectorIndex.open(spark, s"${dir.getPath}/vamana_f32")
        .asInstanceOf[graft.index.VamanaIndex]
      assert(idx.meta.lBuild === 30 && idx.meta.rMaxDegree === 8)
      assert(idx.shardCentroids.length === 2)
      val hits = idx.queryLSearch(queries, 5, lSearch = 30)
      assert(hits.where(col("rank") === 1 && col("qid") === col("id")).count() === 5)
    }

    // BINARY exists only in fixture dirs generated after round 9 — the
    // frozen 0.3 dir predates the type, so the test is conditional
    if (new java.io.File(dir, "binary_f32").isDirectory)
      test(s"v$version: BINARY base + sketch serve probe-all exact results") {
        val idx = VectorIndex.open(spark, s"${dir.getPath}/binary_f32")
        val n = frozen.count().toInt
        val got = idx.query(queries, 5, nprobe = n)
          .orderBy("qid", "rank").collect()
          .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(2)).toSeq }
        assert(got === exactTop(frozen, queries, 5))
      }
  }
}
