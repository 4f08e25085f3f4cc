package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.objects.{DirectoryImageReader, DocumentsTableReader, HashTextEmbedding, ImageStatsEmbedding, ObjectIndex, StubImageEmbedding}

/** Per-JVM embed-call counter for the partition-granularity assertion —
  * local-mode executors share the JVM, so a static AtomicLong sees every
  * task's increments. */
object ObjectSpecCounters {
  val embedded = new java.util.concurrent.atomic.AtomicLong(0L)
}

class ObjectSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String = Files.createTempDirectory("graft_obj").toString

  private lazy val reader = new DocumentsTableReader(sf0001)
  private lazy val objIndex = ObjectIndex.create(
    spark, tmp(), reader, new HashTextEmbedding(64), timestamp = 1000L)

  test("reader chunks every document and keeps provenance") {
    val objs = reader.readObjects(spark)
    assert(objs.count() >= 500)
    // every chunk id decodes back to its doc
    val bad = objs.where(col("external_id") !== col("doc_id") * 1000 +
      pmod(col("external_id"), lit(1000))).count()
    assert(bad === 0)
  }

  test("semantic search: a document's own text retrieves its chunk first") {
    import spark.implicits._
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    val hits = objIndex.query(queries, k = 3, nprobe = 1 << 30)
    val top1 = hits.where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) / 1000 === q, s"query $q should retrieve its own doc first")
    }
  }

  test("fetchObjects materializes result objects via a distributed semi-join") {
    import spark.implicits._
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text"))
    val hits = objIndex.query(queries, k = 3, nprobe = 1 << 30)
    val objs = objIndex.fetchObjects(hits)
    val wantIds = hits.select("external_id").distinct().as[Long].collect().toSet
    val gotIds = objs.select("external_id").as[Long].collect().toSet
    assert(gotIds === wantIds)
    assert(objs.columns.contains("text"))
    // stays a plan (join), not a driver isin list
    assert(objs.queryExecution.optimizedPlan.toString.toLowerCase.contains("join"))
  }

  test("metadata pushdown filter restricts results; repack keeps k per query") {
    import spark.implicits._
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    val hits = objIndex.query(queries, k = 5,
      metadataCond = Some("lang = 'en'"), nprobe = 1 << 30)
    assert(hits.where(col("lang") =!= "en").count() === 0)
    val perQuery = hits.groupBy("qid").count().as[(Long, Long)].collect().toMap
    assert(perQuery.values.forall(_ <= 5))
    assert(perQuery.values.exists(_ > 0))
  }

  test("prefilter mode fills k from the allowed set where the overfetch under-fills") {
    import spark.implicits._
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    // fetchFactor=1 sabotages the reference strategy on purpose: fetch_k=k
    // unfiltered hits rarely contain k allowed ones under a selective cond
    val post = objIndex.query(queries, k = 5, metadataCond = Some("lang = 'de'"),
      nprobe = 1 << 30, fetchFactor = 1)
    val pre = objIndex.query(queries, k = 5, metadataCond = Some("lang = 'de'"),
      nprobe = 1 << 30, fetchFactor = 1,
      filterMode = ObjectIndex.FilterPre)
    assert(pre.where(col("lang") =!= "de").count() === 0)
    val postCnt = post.groupBy("qid").count().as[(Long, Long)].collect().toMap
    val preCnt = pre.groupBy("qid").count().as[(Long, Long)].collect().toMap
    // pre-filter fills all k slots for every query (the fixture has >= 5
    // allowed chunks); the k-overfetch post-filter cannot for them all
    assert(preCnt.size === 5 && preCnt.values.forall(_ === 5L),
      s"prefilter should fill k=5 per query, got $preCnt")
    assert(postCnt.values.sum < preCnt.values.sum,
      s"expected the sabotaged overfetch to under-fill: post=$postCnt pre=$preCnt")
    // with a generous overfetch the two modes agree on the survivor SET
    val postBig = objIndex.query(queries, k = 5, metadataCond = Some("lang = 'de'"),
      nprobe = 1 << 30, fetchFactor = 1000)
    val a = postBig.select("qid", "external_id").as[(Long, Long)].collect().toSet
    val b = pre.select("qid", "external_id").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("multi-embedding fusion sums scores across a query's embeddings") {
    import spark.implicits._
    // embedding that emits TWO embeddings per object (ColPali-style)
    class TwoVec extends HashTextEmbedding(64) {
      override def embed(objects: Iterator[(Long, String)]) =
        objects.flatMap { case (id, text) =>
          val half = text.length / 2
          super.embed(Iterator((id, text.take(half)))).map { case (i, _, v) => (i, 0, v) } ++
            super.embed(Iterator((id, text.drop(half)))).map { case (i, _, v) => (i, 1, v) }
        }
    }
    val uri = tmp()
    val idx = ObjectIndex.create(spark, uri, reader, new TwoVec, timestamp = 1000L)
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") === 7).select(col("doc_id").as("qid"), col("text"))
    val hits = idx.query(queries, k = 5, nprobe = 1 << 30)
    assert(hits.count() === 5)
    assert(hits.where(col("rank") === 1).select(col("external_id"))
      .head().getLong(0) / 1000 === 7L)
  }

  test("rank fusion mode: position scoring, distance-scale-free") {
    import spark.implicits._
    // same 2-embedding shape as the fusion test above
    class TwoVec extends HashTextEmbedding(64) {
      override def embed(objects: Iterator[(Long, String)]) =
        objects.flatMap { case (id, text) =>
          val half = text.length / 2
          super.embed(Iterator((id, text.take(half)))).map { case (i, _, v) => (i, 0, v) } ++
            super.embed(Iterator((id, text.drop(half)))).map { case (i, _, v) => (i, 1, v) }
        }
    }
    val idx = ObjectIndex.create(spark, tmp(), reader, new TwoVec, timestamp = 1000L)
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") === 7).select(col("doc_id").as("qid"), col("text"))
    val k = 5
    val viaRank = idx.query(queries, k, nprobe = 1 << 30,
      fusionMode = ObjectIndex.FusionRank)
    val viaRecip = idx.query(queries, k, nprobe = 1 << 30,
      fusionMode = ObjectIndex.FusionReciprocal)
    // both modes: k results, the query's own doc first (its chunks win in
    // both of its embeddings)
    assert(viaRank.count() === k)
    assert(viaRank.where(col("rank") === 1).select(col("external_id"))
      .head().getLong(0) / 1000 === 7L)
    assert(viaRecip.where(col("rank") === 1).select(col("external_id"))
      .head().getLong(0) / 1000 === 7L)
    // rank-mode scores are drawn from the position lattice: each
    // per-embedding score is 1 - (pos-1)/fetchK with fetchK=k, so every
    // fused score is a sum of at most 2 lattice values — verify each score
    // decomposes, which a reciprocal-distance score would not
    val lattice = (1 to k).map(p => 1.0 - (p - 1).toDouble / k)
    val eps = 1e-9
    viaRank.select("score").as[Double].collect().foreach { s =>
      val ok = lattice.exists(a => math.abs(s - a) < eps) ||
        lattice.exists(a => lattice.exists(b => math.abs(s - (a + b)) < eps))
      assert(ok, s"rank-fusion score $s not on the position lattice")
    }
    // an invalid mode is rejected
    intercept[IllegalArgumentException] {
      idx.query(queries, k, fusionMode = "borda")
    }
  }

  test("maxsim fusion: late-interaction dot scoring over a multi-vector IP index") {
    import spark.implicits._
    import graft.operators.DistanceMetric
    // the PRODUCTION multi-vector model (the ColPali stand-in the driver
    // query indexes with), not a local twin
    val emb = new graft.objects.SplitHalvesEmbedding(64)
    val uriMs = tmp()
    val idx = ObjectIndex.create(spark, uriMs, reader, emb,
      metric = DistanceMetric.InnerProduct, timestamp = 1000L)
    // a healthy multi-vector index is CLEAN under the fsck: id
    // multiplicity is the declared layout (meta.multiVector), and the
    // object-layer coverage checks hold
    assert(graft.index.IndexDoctor.checkObjectIndex(spark, uriMs).isEmpty)
    val qText = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") === 7).select(col("text")).head().getString(0)
    val queries = Seq((7L, qText)).toDF("qid", "text")
    val k = 5
    val hits = idx.query(queries, k, nprobe = 1 << 30,
      fusionMode = ObjectIndex.FusionMaxSim)
    assert(hits.count() === k)
    val top = hits.where(col("rank") === 1)
      .select(col("external_id"), col("score")).head()
    assert(top.getLong(0) / 1000 === 7L, "own doc's chunk must rank first")
    // quantitative semantics: the reported score is Σ over the query's 2
    // embeddings of the max dot against the winning object's 2 vectors,
    // recomputed driver-side from the deterministic embedding (tolerance
    // covers the index's 1/(1/dot) float round trip)
    val winText = reader.readObjects(spark)
      .where(col("external_id") === top.getLong(0))
      .select(col("text")).head().getString(0)
    def vecsOf(id: Long, text: String) =
      emb.embed(Iterator((id, text))).map(_._3).toSeq
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val want = vecsOf(0L, qText)
      .map(q => vecsOf(1L, winText).map(d => dot(q, d)).max).sum
    assert(math.abs(top.getDouble(1) - want) < 1e-3,
      s"maxsim score ${top.getDouble(1)} != driver replay $want")
    // a non-IP index refuses the mode with a named error
    val cosIdx = objIndex // shared Cosine fixture
    val e = intercept[IllegalArgumentException] {
      cosIdx.query(queries, k, fusionMode = ObjectIndex.FusionMaxSim)
    }
    assert(e.getMessage.contains("INNER_PRODUCT"), e.getMessage)
    // the mode composes with metadata filtering through the generic
    // fetch-inflate/repack path: every result satisfies the condition
    val filtered = idx.query(queries, k, metadataCond = Some("lang = 'en'"),
      nprobe = 1 << 30, fusionMode = ObjectIndex.FusionMaxSim)
    assert(filtered.count() > 0)
    assert(filtered.where(col("lang") =!= "en").count() === 0)
  }

  test("incremental maintenance: add/update/delete fold through the logs, doctor stays clean") {
    import spark.implicits._
    val full = new DocumentsTableReader(sf0001)
    val emb = new HashTextEmbedding(64)
    val uri = tmp()
    // create on the EVEN docs only, then the reader diff adds the odds —
    // the reference's update_index() flow (object_index.py:736-881)
    ObjectIndex.create(spark, uri,
      new graft.objects.FilteredObjectReader(full, "doc_id % 2 = 0"),
      emb, indexType = "FLAT", timestamp = 1000L)
    val idx = new ObjectIndex(spark, uri, full, emb)
    assert(idx.metadata.where(col("doc_id") % 2 === 1).count() === 0)
    idx.updateIndexFromReader(ts = 2000L)
    val fullCount = full.readMetadata(spark).count()
    assert(idx.metadata.count() === fullCount)
    // a second diff pass is a no-op, not a duplicate append
    idx.updateIndexFromReader(ts = 2100L)
    assert(idx.metadata.count() === fullCount)
    // incremental build answers EXACTLY like a from-scratch full build
    // (FLAT raw store: same bits, base+additions merge is exact)
    val fullIdx = ObjectIndex.create(spark, tmp(), full, emb,
      indexType = "FLAT", timestamp = 1000L)
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 5).select(col("doc_id").as("qid"), col("text"))
    def snap(i: ObjectIndex) = i.query(queries, k = 5, nprobe = 1 << 30)
      .select("qid", "rank", "external_id")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(snap(idx) === snap(fullIdx))
    // metadata coverage holds THROUGH the incremental path
    assert(graft.index.IndexDoctor.checkObjectIndex(spark, uri).isEmpty)

    // UPDATE an existing object: new content re-embeds, metadata overwrites
    val newText = "volcanic turnip cartography " * 20
    idx.updateIndex(
      Seq((0L, 0L, newText)).toDF("external_id", "doc_id", "text"),
      full.readMetadata(spark).where(col("external_id") === 0L)
        .withColumn("lang", lit("xx")),
      ts = 3000L)
    assert(idx.metadata.where(col("external_id") === 0L)
      .select("lang").head().getString(0) === "xx")
    // DELETE: vector tombstone + metadata tombstone
    // chunk 0 of doc 2 (ids are doc_id*1000 + i, so 2000 always exists)
    idx.deleteObjects(Seq(2000L).toDF("external_id"), ts = 4000L)
    assert(idx.metadata.where(col("external_id") === 2000L).count() === 0)
    val deep = idx.query(queries, k = 50, nprobe = 1 << 30)
    assert(deep.where(col("external_id") === 2000L).count() === 0,
      "a deleted object must never surface")
    assert(graft.index.IndexDoctor.checkObjectIndex(spark, uri).isEmpty,
      "update+delete logs must stay doctor-clean")

    // CONSOLIDATE folds both logs into fresh bases; answers unchanged
    val before = idx.query(queries, k = 5, nprobe = 1 << 30)
      .select("qid", "rank", "external_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val idx2 = idx.consolidate(5000L)
    // the vector updates log persists (its entries are WINDOWED OUT of the
    // new version — VectorIndex semantics); the metadata log compacts away
    assert(!graft.index.Storage.nonEmptyDir(
      ObjectIndex.metadataUpdatesPath(uri)))
    assert(idx2.index.meta.ingestionTimestamps.last === 5000L)
    assert(idx2.metadata.count() === fullCount - 1)
    assert(idx2.metadata.where(col("external_id") === 0L)
      .select("lang").head().getString(0) === "xx")
    val after = idx2.query(queries, k = 5, nprobe = 1 << 30)
      .select("qid", "rank", "external_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(after === before)
    assert(graft.index.IndexDoctor.checkObjectIndex(spark, uri).isEmpty)

    // drifted metadata batch schema is refused with a named error
    val e = intercept[IllegalArgumentException] {
      idx2.updateIndex(
        Seq((0L, 0L, "x")).toDF("external_id", "doc_id", "text"),
        full.readMetadata(spark).where(col("external_id") === 0L).drop("lang"),
        ts = 6000L)
    }
    assert(e.getMessage.contains("metadata batch schema"), e.getMessage)
    // multi-vector embeddings refuse the updates-log path outright
    val e2 = intercept[IllegalArgumentException] {
      new ObjectIndex(spark, uri, full, new graft.objects.SplitHalvesEmbedding(64))
        .updateIndex(
          Seq((0L, 0L, "x")).toDF("external_id", "doc_id", "text"),
          full.readMetadata(spark).where(col("external_id") === 0L),
          ts = 6000L)
    }
    assert(e2.getMessage.contains("multi-vector"), e2.getMessage)
  }

  test("returnMetadata=false skips attrs and the metadata scan without changing ranking") {
    import spark.implicits._
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    val withM = objIndex.query(queries, k = 5, nprobe = 1 << 30)
    val noM = objIndex.query(queries, k = 5, nprobe = 1 << 30, returnMetadata = false)
    assert(!noM.columns.contains("lang") && !noM.columns.contains("source"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "external_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(ids(noM) === ids(withM))
    // without a condition the metadata table never enters the plan
    assert(!noM.queryExecution.executedPlan.toString.contains("object_metadata"),
      "returnMetadata=false must not scan the metadata table")
    // a condition still applies — as a semi join — and agrees with the
    // attrs-returning filter on the survivor set
    val cond = objIndex.query(queries, k = 5, metadataCond = Some("lang = 'en'"),
      nprobe = 1 << 30, returnMetadata = false)
    val condM = objIndex.query(queries, k = 5, metadataCond = Some("lang = 'en'"),
      nprobe = 1 << 30)
    assert(ids(cond) === ids(condM))
  }

  test("candidate-restricted metadata merge keeps the semi joins under the window") {
    import spark.implicits._
    val uri = tmp()
    Seq((1L, "en"), (2L, "de")).toDF("external_id", "lang")
      .write.parquet(s"$uri/object_metadata")
    Seq((2L, "fr", 5L, false), (1L, null.asInstanceOf[String], 6L, true))
      .toDF("external_id", "lang", "__meta_ts", "__meta_deleted")
      .write.parquet(s"$uri/object_metadata_updates")
    // semantics: restricted view == merged view filtered to the keys
    // (2 overwritten to fr; 1 tombstoned so even if keyed it yields nothing)
    val got = ObjectIndex.mergedMetadata(spark, uri, Some(Seq(1L, 2L).toDF("external_id")))
      .as[(Long, String)].collect().toSeq.sorted
    assert(got === Seq((2L, "fr")))
    // posture: both sources restrict BELOW the last-write-wins window, so
    // a per-query hit join never windows the whole metadata table
    val plan = ObjectIndex.mergedMetadata(spark, uri, Some(Seq(2L).toDF("external_id")))
      .queryExecution.optimizedPlan.toString
    val wi = plan.indexOf("Window")
    assert(wi >= 0, s"expected a window in the merged plan:\n$plan")
    val semis = "LeftSemi".r.findAllMatchIn(plan).map(_.start).toSeq
    assert(semis.size === 2 && semis.forall(_ > wi),
      s"expected BOTH sources key-restricted under the window:\n$plan")
  }

  test("reader diff with a content fingerprint re-embeds changed objects only") {
    import spark.implicits._
    // source table with a fingerprint column; the reader points at a temp
    // dir so rewriting it simulates the source mutating under the index
    val src = Files.createTempDirectory("graft_incr_src").toString
    def srcDf(mutateId: Option[Long]) = {
      val base = spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      val mutated = mutateId match {
        case Some(id) => base.withColumn("text",
          when(col("doc_id") === id, lit("entirely rewritten content " * 10))
            .otherwise(col("text")))
        case None => base
      }
      mutated.withColumn("text_fp", xxhash64(col("text")))
    }
    srcDf(None).write.mode("overwrite").parquet(s"$src/docs")
    val reader = new graft.objects.ParquetTableReader(
      s"$src/docs", idCol = "doc_id", contentCol = "text")
    val emb = new HashTextEmbedding(64)
    val uri = tmp()
    ObjectIndex.create(spark, uri, reader, emb, indexType = "FLAT", timestamp = 1000L)
    val idx = new ObjectIndex(spark, uri, reader, emb)
    // no change → no-op even with the fingerprint diff enabled
    idx.updateIndexFromReader(1500L, contentHashCol = Some("text_fp"))
    assert(!graft.index.Storage.nonEmptyDir(s"$uri/updates"))
    // mutate doc 3's text at the source; the fingerprint diff must
    // re-embed EXACTLY that object
    srcDf(Some(3L)).write.mode("overwrite").parquet(s"$src/docs")
    idx.updateIndexFromReader(2000L, contentHashCol = Some("text_fp"))
    val logIds = spark.read.parquet(s"$uri/updates")
      .select("external_id").distinct().as[Long].collect().toSeq
    assert(logIds === Seq(3L), s"only the changed object may re-embed, got $logIds")
    // stored metadata carries the new fingerprint; the new text now
    // retrieves doc 3 first
    val newFp = srcDf(Some(3L)).where(col("doc_id") === 3)
      .select("text_fp").head().getLong(0)
    assert(idx.metadata.where(col("external_id") === 3)
      .select("text_fp").head().getLong(0) === newFp)
    val q = Seq((99L, "entirely rewritten content " * 10)).toDF("qid", "text")
    val top = idx.query(q, k = 1).select("external_id").head().getLong(0)
    assert(top === 3L, s"updated content must serve the new vector, got $top")
    // a fingerprint column the metadata does not carry is a named error
    val e = intercept[IllegalArgumentException] {
      idx.updateIndexFromReader(3000L, contentHashCol = Some("nope"))
    }
    assert(e.getMessage.contains("contentHashCol"), e.getMessage)
  }

  test("partition-granular reader diff: only changed partitions re-embed; removals tombstone") {
    import spark.implicits._
    val src = tmp()
    // 40 docs in 4 partitions p0..p3 (doc_id % 4), per-row fingerprints
    def srcDf(drop: Set[Long], mutate: Set[Long]) =
      spark.range(40).toDF("doc_id")
        .where(if (drop.isEmpty) lit(true) else !col("doc_id").isin(drop.toSeq: _*))
        .select(col("doc_id"),
          concat(lit("part doc body "), col("doc_id"),
            if (mutate.isEmpty) lit("")
            else when(col("doc_id").isin(mutate.toSeq: _*), lit(" MUTATED"))
              .otherwise(lit(""))).as("text"),
          concat(lit("p"), col("doc_id") % 4).as("part"))
        .withColumn("text_fp", xxhash64(col("text")))
    srcDf(Set.empty, Set.empty).write.mode("overwrite").parquet(s"$src/docs")
    val rdr = new graft.objects.ParquetTableReader(
      s"$src/docs", idCol = "doc_id", contentCol = "text")
    // counting embedding: every object that reaches embed() increments
    class CountingEmbedding extends HashTextEmbedding(32) {
      override def embed(objects: Iterator[(Long, String)]): Iterator[(Long, Int, Array[Float])] =
        super.embed(objects.map { o => ObjectSpecCounters.embedded.incrementAndGet(); o })
    }
    val emb = new CountingEmbedding
    val uri = tmp()
    ObjectIndex.create(spark, uri, rdr, emb, indexType = "FLAT", timestamp = 1000L)
    val idx = new ObjectIndex(spark, uri, rdr, emb)
    // unchanged source → signatures equal on all 4 partitions → no-op
    ObjectSpecCounters.embedded.set(0L)
    idx.updateIndexFromReaderPartitions(1500L, "part", Some("text_fp"))
    assert(ObjectSpecCounters.embedded.get() === 0L, "no-op must embed nothing")
    assert(!graft.index.Storage.nonEmptyDir(s"$uri/updates"))
    // mutate doc 5 and remove doc 9 — both in partition p1; the diff must
    // re-embed EXACTLY p1's 9 current docs (work = 1/4 of the corpus, not
    // 40) and tombstone doc 9
    srcDf(Set(9L), Set(5L)).write.mode("overwrite").parquet(s"$src/docs")
    ObjectSpecCounters.embedded.set(0L)
    idx.updateIndexFromReaderPartitions(2000L, "part", Some("text_fp"))
    assert(ObjectSpecCounters.embedded.get() === 9L,
      s"only p1's 9 current docs may re-embed, got ${ObjectSpecCounters.embedded.get()}")
    val logIds = spark.read.parquet(s"$uri/updates")
      .select("external_id").distinct().as[Long].collect().toSet
    assert(logIds === (1L until 40L by 4).toSet,
      s"updates log must hold exactly p1's ids (upserts + doc 9's tombstone): $logIds")
    // serving: the mutated content retrieves doc 5; doc 9 is gone
    val qTop = idx.query(Seq((99L, "part doc body 5 MUTATED")).toDF("qid", "text"), k = 1)
      .select("external_id").head().getLong(0)
    assert(qTop === 5L, s"mutated content must serve the new vector, got $qTop")
    val nine = idx.query(Seq((99L, "part doc body 9")).toDF("qid", "text"), k = 40)
      .where(col("external_id") === 9L).count()
    assert(nine === 0L, "removed doc must not surface")
    // metadata merged view reflects the move: doc 9 gone, doc 5's new fp
    assert(idx.metadata.where(col("external_id") === 9L).isEmpty)
    val fp5 = srcDf(Set(9L), Set(5L)).where(col("doc_id") === 5).select("text_fp").head().getLong(0)
    assert(idx.metadata.where(col("external_id") === 5L)
      .select("text_fp").head().getLong(0) === fp5)
    // a partition column the metadata does not carry is a named error
    val e = intercept[IllegalArgumentException] {
      idx.updateIndexFromReaderPartitions(3000L, "nope")
    }
    assert(e.getMessage.contains("partitionCol"), e.getMessage)
  }

  test("parquet 1-D table reader: documents table as a direct object source") {
    import spark.implicits._
    val reader = new graft.objects.ParquetTableReader(
      s"$sf0001/documents.parquet", idCol = "doc_id", contentCol = "text")
    val objs = reader.readObjects(spark)
    assert(objs.columns.contains("external_id") && objs.columns.contains("text"))
    assert(objs.count() === 500)
    // metadata = non-content columns
    val md = reader.readMetadata(spark)
    assert(!md.columns.contains("text") && md.columns.contains("lang"))
    // end-to-end: index + self-retrieval over whole (unchunked) documents
    val idx = ObjectIndex.create(spark, tmp(), reader, new HashTextEmbedding(64),
      indexType = "FLAT", timestamp = 1000L)
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 3).select(col("doc_id").as("qid"), col("text"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(q => assert(top1(q) === q))
  }

  test("image directory reader: binaryFile objects, metadata, self-retrieval") {
    import spark.implicits._
    val imgDir = Files.createTempDirectory("graft_imgs")
    val rnd = new java.util.Random(3)
    for (i <- 0 until 20) {
      val b = new Array[Byte](256 + 16 * i); rnd.nextBytes(b)
      Files.write(imgDir.resolve(f"img_$i%03d.png"), b)
    }
    // a non-matching file the glob must prune
    Files.write(imgDir.resolve("notes.txt"), "not an image".getBytes)
    val reader = new DirectoryImageReader(imgDir.toString, "*.png")
    val objs = reader.readObjects(spark)
    assert(objs.count() === 20)
    assert(objs.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    // dense ids in path order
    assert(objs.agg(min(col("external_id")), max(col("external_id")))
      .head().toSeq === Seq(0L, 19L))
    val idx = ObjectIndex.create(spark, tmp(), reader, new StubImageEmbedding(32),
      indexType = "FLAT",
      metric = graft.operators.DistanceMetric.L2, timestamp = 1000L)
    assert(idx.metadata.columns.toSet === Set("external_id", "path", "length"))
    val queries = objs.where(col("external_id") < 3)
      .select(col("external_id").as("qid"), col("payload"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(q => assert(top1(q) === q, s"query $q should retrieve itself"))
  }

  test("bioimage pyramid reader: level halving quarters tiles, ids keep provenance") {
    import spark.implicits._
    val imgDir = Files.createTempDirectory("graft_bioimgs")
    val rnd = new java.util.Random(5)
    for (i <- 0 until 4) {
      // ~1024x1024 stub geometry (side = ceil(sqrt(len)))
      val b = new Array[Byte](1024 * 1024); rnd.nextBytes(b)
      Files.write(imgDir.resolve(f"slide_$i%02d.ome.tiff"), b)
    }
    def reader(l: Int) = new graft.objects.BioimageDirectoryReader(
      imgDir.toString, "*.ome.tiff", level = l, tileSize = 256)
    val l0 = reader(0).readObjects(spark)
    val l1 = reader(1).readObjects(spark)
    val l2 = reader(2).readObjects(spark)
    // 1024/256 = 4x4 tiles at level 0, 2x2 at level 1, 1 at level 2 (per image)
    assert(l0.count() === 4 * 16)
    assert(l1.count() === 4 * 4)
    assert(l2.count() === 4 * 1)
    // ids unique; provenance recoverable
    assert(l0.select("external_id").distinct().count() === 64)
    assert(l0.where(col("image_id") === 2L && col("tile_x") === 3 && col("tile_y") === 3)
      .count() === 1)
    assert(l0.schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    // tiles of one image at one level all report the level geometry
    assert(l1.select("level_width").distinct().as[Int].collect().toSeq === Seq(512))
    // a zero-byte file is skipped by the binaryFile source (no splits) —
    // the scan neither crashes nor emits phantom tiles
    Files.write(imgDir.resolve("empty.ome.tiff"), Array.emptyByteArray)
    assert(reader(0).readObjects(spark).count() === 4 * 16)
    Files.delete(imgDir.resolve("empty.ome.tiff"))
    // index + self-retrieval over level-1 tiles
    val idx = ObjectIndex.create(spark, tmp(), reader(1), new StubImageEmbedding(32),
      indexType = "FLAT", metric = graft.operators.DistanceMetric.L2, timestamp = 1000L)
    assert(idx.metadata.columns.contains("tile_x"))
    val queries = l1.where(col("external_id") < 3)
      .select(col("external_id").as("qid"), col("payload"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    top1.foreach { case (q, hit) => assert(hit === q, s"tile $q should retrieve itself") }
  }

  test("sparse matrix reader: long-format pivots to dense vectors, index round-trips") {
    import spark.implicits._
    // long-format sparse table from the embeddings fixture: non-zero
    // (vec_id, idx, value) entries; the reader must pivot them back
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("idx", "value")))
      .where(col("value") =!= 0.0f)
    val dir = tmp()
    emb.select(col("vec_id").as("obs_id"), col("idx").as("var_idx"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/sparse")
    val reader = new graft.objects.SparseMatrixTableReader(s"$dir/sparse", dims = 64)
    val objs = reader.readObjects(spark)
    assert(objs.count() === 500)
    // pivoted vector equals the original dense embedding
    val orig = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .where(col("vec_id") === 7).select("embedding").head().getSeq[Float](0)
    val piv = objs.where(col("external_id") === 7).select("payload").head().getSeq[Float](0)
    assert(piv === orig)
    // end-to-end: identity-vector embedding + FLAT index = exact self-retrieval
    val idx = ObjectIndex.create(spark, tmp(), reader,
      new graft.objects.IdentityVectorEmbedding(64),
      indexType = "FLAT", metric = graft.operators.DistanceMetric.L2,
      timestamp = 1000L)
    val queries = objs.where(col("external_id") < 3)
      .select(col("external_id").as("qid"), col("payload"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(q => assert(top1(q) === q))
  }

  test("word2vec: a real trained model drives the pipeline, in-JVM and via a python subprocess") {
    import spark.implicits._
    import graft.objects.WordVectorTextEmbedding
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet")
    val model = WordVectorTextEmbedding.train(docsDf, dim = 32, seed = 42L)
    val wvDir = Files.createTempDirectory("graft_w2v")
    WordVectorTextEmbedding.save(spark, model, s"$wvDir/wv")
    val loaded = WordVectorTextEmbedding.load(spark, s"$wvDir/wv")

    // e2e: the reference's update_index → query shape (ObjectIndex.create
    // is the two-stage embed+ingest DAG) on REAL learned vectors
    val uri = tmp()
    val idx = ObjectIndex.create(spark, uri, reader, loaded,
      indexType = "FLAT", metric = graft.operators.DistanceMetric.Cosine,
      timestamp = 1000L)
    val queries = docsDf.where(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text"))
    val jvmTop = idx.query(queries, k = 3)
      .select(col("qid"), col("rank"), col("external_id"))
      .as[(Long, Int, Long)].collect()
    // a chunk of the query's own document must rank first (the model
    // actually separates documents — a broken model collapses everything)
    jvmTop.filter(_._2 == 1).foreach { case (q, _, id) => assert(id / 1000 === q) }

    // the SAME learned weights through a LIVE python encoder process: the
    // SubprocessEmbedding line protocol carries a real model end-to-end
    val tsv = wvDir.resolve("wv.tsv")
    WordVectorTextEmbedding.exportTsv(loaded, tsv)
    val script =
      """import sys, base64
        |vecs = {}
        |with open(sys.argv[1], encoding='utf-8') as f:
        |    for line in f:
        |        w, vs = line.rstrip('\n').split('\t')
        |        vecs[w] = [float(x) for x in vs.split(' ')]
        |dim = len(next(iter(vecs.values())))
        |for line in sys.stdin:
        |    t = base64.b64decode(line.strip()).decode('utf-8')
        |    acc = [0.0] * dim
        |    n = 0
        |    for tok in t.strip().lower().split():
        |        v = vecs.get(tok)
        |        if v is not None:
        |            acc = [a + b for a, b in zip(acc, v)]
        |            n += 1
        |    if n:
        |        acc = [a / n for a in acc]
        |    print(' '.join(repr(a) for a in acc))
        |    sys.stdout.flush()
        |""".stripMargin
    val cmd = Seq("python3", "-u", "-c", script, tsv.toString)
    val sub = new graft.objects.SubprocessEmbedding(cmd, dimensions = 32)
    val uriSub = tmp()
    ObjectIndex.create(spark, uriSub, reader, sub,
      indexType = "FLAT", metric = graft.operators.DistanceMetric.Cosine,
      timestamp = 1000L)
    // stored vectors from the python process match the in-JVM model's
    // (python averages in float64, the JVM in float32 — tolerance, not
    // bit-equality, is the contract across runtimes)
    val jvmVecs = graft.index.VectorIndex.open(spark, uri).baseVectors()
      .select("external_id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val subVecs = graft.index.VectorIndex.open(spark, uriSub).baseVectors()
      .select("external_id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(subVecs.keySet === jvmVecs.keySet)
    subVecs.foreach { case (id, sv) =>
      sv.zip(jvmVecs(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4f * math.max(1.0f, math.abs(b)),
          s"python vs JVM model output diverged for id=$id")
      }
    }
    // python tokenization note: str.split() and the JVM's trim+"\\s+" agree
    // on this corpus (ASCII whitespace); the vector comparison above is
    // the real parity check
  }

  test("MLP: a real trained neural net embeds via its hidden layer, forward pass pinned, python parity") {
    import spark.implicits._
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet")
    val t = graft.objects.MlpTextEmbedding.train(docsDf,
      featureDim = 64, hidden = 16, maxIter = 300)

    // 1. the weight-layout parse is LOAD-BEARING: a manual forward (hidden
    // sigmoid + output softmax) from the extracted matrices must match
    // MLlib's own predictProbability — any column-major/offset slip fails here
    val sample = docsDf.limit(20).select("text").as[String].collect()
    sample.foreach { text =>
      val x = t.embedding.features(text)
      val h = t.embedding.hidden(x)
      val logits: Array[Double] = t.w2.zip(t.b2).map { case (row, bias) =>
        var s = bias.toDouble
        var i = 0
        while (i < row.length) { s += row(i).toDouble * h(i); i += 1 }
        s
      }
      val m = logits.max
      val ex = logits.map(l => math.exp(l - m)); val z = ex.sum
      val probs = ex.map(_ / z)
      val mlProbs = t.model.predictProbability(
        org.apache.spark.ml.linalg.Vectors.dense(x.map(_.toDouble))).toArray
      probs.zip(mlProbs).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"forward-pass drift: $a vs $b") }
    }

    // 2. the network actually LEARNED the task (not a random projection):
    // train accuracy beats the majority-class baseline with margin
    val labeled = docsDf.select(col("text").cast("string"), col("lang").cast("string"))
      .as[(String, String)].collect()
    val correct = labeled.count { case (text, lang) =>
      val x = t.embedding.features(text)
      val pred = t.model.predict(
        org.apache.spark.ml.linalg.Vectors.dense(x.map(_.toDouble))).toInt
      t.labels(pred) == lang
    }
    val majority = labeled.groupBy(_._2).values.map(_.length).max
    assert(correct > majority + labeled.length / 10,
      s"MLP must beat majority class: $correct correct vs majority $majority of ${labeled.length}")

    // 3. e2e: the hidden-layer embeddings index and serve through the
    // object layer; every query's own chunk surfaces at ~zero distance
    // (identical text ⇒ identical activations; other docs may saturate
    // nearby, so the contract is self-hit presence, not rank-1)
    val uri = tmp()
    val idx = ObjectIndex.create(spark, uri, reader, t.embedding,
      indexType = "FLAT", metric = graft.operators.DistanceMetric.Cosine,
      timestamp = 1000L)
    val queries = docsDf.where(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text"))
    val hits = idx.query(queries, k = 10)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect()
    (0L until 3L).foreach { q =>
      assert(hits.exists { case (qid, id) => qid == q && id / 1000 == q },
        s"query $q's own chunk must surface in its top-10")
    }

    // 4. the SAME neural weights through a LIVE python process: hashed
    // bag-of-words (FNV-1a 64) + sigmoid(W·x + b) recomputed outside the
    // JVM, stored vectors compared — the SubprocessEmbedding contract on
    // genuine trained-network weights
    val wDir = Files.createTempDirectory("graft_mlp")
    val tsv = wDir.resolve("mlp.tsv")
    graft.objects.MlpTextEmbedding.exportTsv(t.embedding, tsv)
    val script =
      """import sys, base64, math
        |with open(sys.argv[1]) as f:
        |    fd, hid = map(int, f.readline().split())
        |    b1 = [float(v) for v in f.readline().split()]
        |    w1 = [[float(v) for v in f.readline().split()] for _ in range(hid)]
        |MASK = (1 << 64) - 1
        |def fnv(tok):
        |    h = 0xcbf29ce484222325
        |    for byt in tok.encode('utf-8'):
        |        h = ((h ^ byt) * 0x100000001b3) & MASK
        |    return h - (1 << 64) if h >= (1 << 63) else h
        |for line in sys.stdin:
        |    text = base64.b64decode(line.strip()).decode('utf-8')
        |    x = [0.0] * fd
        |    for tok in text.strip().split():
        |        h = fnv(tok)
        |        sign = 1.0 if ((h >> 32) & 1) == 0 else -1.0
        |        x[h % fd] += sign
        |    n = math.sqrt(sum(v * v for v in x))
        |    if n > 0:
        |        x = [v / n for v in x]
        |    out = []
        |    for o in range(hid):
        |        s = b1[o] + sum(w1[o][i] * x[i] for i in range(fd))
        |        out.append(1.0 / (1.0 + math.exp(-s)))
        |    print(' '.join(repr(v) for v in out))
        |    sys.stdout.flush()
        |""".stripMargin
    val sub = new graft.objects.SubprocessEmbedding(
      Seq("python3", "-u", "-c", script, tsv.toString), dimensions = 16)
    val uriSub = tmp()
    ObjectIndex.create(spark, uriSub, reader, sub,
      indexType = "FLAT", metric = graft.operators.DistanceMetric.Cosine,
      timestamp = 1000L)
    val jvmVecs = graft.index.VectorIndex.open(spark, uri).baseVectors()
      .select("external_id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val subVecs = graft.index.VectorIndex.open(spark, uriSub).baseVectors()
      .select("external_id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(subVecs.keySet === jvmVecs.keySet)
    subVecs.foreach { case (id, sv) =>
      sv.zip(jvmVecs(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4f,
          s"python vs JVM neural forward diverged for id=$id: $a vs $b")
      }
    }
  }

  test("subprocess embedding: external encoder process drives the pipeline") {
    import spark.implicits._
    // stdlib-only deterministic "model": md5 over the text, digest bytes
    // cycled into 16 floats — stands in for any line-protocol encoder
    // (ONNX runner, python model server)
    val script =
      """import sys, base64, hashlib
        |for line in sys.stdin:
        |    t = base64.b64decode(line.strip())
        |    d = hashlib.md5(t).digest()
        |    print(' '.join(str((d[i % 16] - 128) / 128.0) for i in range(16)))
        |    sys.stdout.flush()
        |""".stripMargin
    val cmd = Seq("python3", "-u", "-c", script)
    val emb = new graft.objects.SubprocessEmbedding(cmd, dimensions = 16)
    val idx = ObjectIndex.create(spark, tmp(), reader, emb,
      indexType = "FLAT", metric = graft.operators.DistanceMetric.Cosine,
      timestamp = 1000L)
    // self-retrieval end-to-end through the external process
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 3).select(col("doc_id").as("qid"), col("text"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(q => assert(top1(q) / 1000 === q))
    // the stored vector equals the protocol's deterministic output,
    // computed independently here
    val text0 = reader.readObjects(spark).where(col("external_id") === 0)
      .select("text").head().getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(text0.getBytes("UTF-8"))
    val expected = Array.tabulate(16)(i => ((md(i % 16) & 0xff) - 128) / 128.0f)
    val stored = idx.index.baseVectors().where(col("external_id") === 0)
      .select("vector").head().getSeq[Float](0).toArray
    // FLAT cosine stores raw vectors; protocol floats round-trip via strings
    expected.zip(stored).foreach { case (e, s) => assert(math.abs(e - s) < 1e-6) }
    // a dead encoder fails loudly, not silently
    val bad = new graft.objects.SubprocessEmbedding(
      Seq("python3", "-c", "import sys; sys.exit(1)"), 16)
    val e = intercept[Exception] {
      ObjectIndex.create(spark, tmp(), reader, bad, indexType = "FLAT",
        timestamp = 1000L)
    }
    assert(e.getMessage != null)
  }

  test("multimodal: stub features are deterministic, unit-norm, null-safe") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", Array[Byte](1, 2, 3, 4, 5)),
      (2L, "audio", Array[Byte](9, 9, 9)),
      (3L, "image", null.asInstanceOf[Array[Byte]])
    ).toDF("obj_id", "modality", "payload")
    val f1 = Multimodal.extractFeatures(media, 16).orderBy("obj_id").collect()
    val f2 = Multimodal.extractFeatures(media, 16).orderBy("obj_id").collect()
    assert(f1.map(_.toString).toSeq === f2.map(_.toString).toSeq)
    val v = f1(0).getSeq[Float](2)
    assert(math.abs(v.map(x => x * x).sum - 1.0f) < 1e-5)
    assert(f1(2).isNullAt(2))
  }

  test("real image decode: grid RGB sums reproduce the pixel formula") {
    import spark.implicits._
    val media = (0 until 6).map { i =>
      (i.toLong, Multimodal.testCardPng(i, 16 + i, 12 + i))
    }.toDF("obj_id", "payload")
    val got = Multimodal.decodeImageStats(media, grid = 4)
      .orderBy("obj_id", "cell")
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
    assert(got.length === 6 * 16)
    // driver-side replay of the formula: PNG is lossless, so the decoded
    // sums must equal the generator's arithmetic exactly
    val expected = for {
      i <- 0 until 6; w = 16 + i; h = 12 + i
      cell <- 0 until 16
    } yield {
      var (rs, gs, bs) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w
           if (y * 4 / h) * 4 + (x * 4 / w) == cell) {
        rs += (3 * x + 5 * y + 7 * i) % 256
        gs += (11 * x + 13 * y + 17 * i) % 256
        bs += (19 * x + 23 * y + 29 * i) % 256
      }
      (i.toLong, w, h, cell, rs, gs, bs)
    }
    assert(got.toSeq === expected)
  }

  test("real image embedding: ImageIO-decoded PNGs index and self-retrieve") {
    import spark.implicits._
    val imgDir = Files.createTempDirectory("graft_realimgs")
    for (i <- 0 until 12) {
      Files.write(imgDir.resolve(f"card_$i%03d.png"),
        Multimodal.testCardPng(i, 20 + 2 * i, 14 + i))
    }
    val reader = new DirectoryImageReader(imgDir.toString, "*.png")
    val idx = ObjectIndex.create(spark, tmp(), reader, new ImageStatsEmbedding(48),
      indexType = "FLAT",
      metric = graft.operators.DistanceMetric.L2, timestamp = 1000L)
    val queries = reader.readObjects(spark).where(col("external_id") < 4)
      .select(col("external_id").as("qid"), col("payload"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 4L).foreach(q => assert(top1(q) === q, s"query $q should retrieve itself"))
    // extractFeatures must route the PNG through the REAL decoder: the
    // pooled-pixel feature differs from the byte-level stub signature
    val png = Multimodal.testCardPng(0, 16, 12)
    val viaPipeline = Multimodal
      .extractFeatures(Seq((0L, "image", png)).toDF("obj_id", "modality", "payload"), 48)
      .head().getSeq[Float](2)
    assert(viaPipeline === Multimodal.imageFeature(Multimodal.decodeImage(png).get, 48).toSeq)
    assert(viaPipeline !== Multimodal.stubDecode(png, 48).toSeq)
  }

  test("JPEG decode: sniffed, decoded, dims preserved (lossy, so stats-only)") {
    val img = Multimodal.testCardImage(3, 32, 24)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val jpeg = out.toByteArray
    assert(Multimodal.isDecodableImage(jpeg))
    val back = Multimodal.decodeImage(jpeg).get
    assert(back.getWidth === 32 && back.getHeight === 24)
    // JPEG is lossy: assert the pooled feature is close to the PNG
    // original's, not equal — proves real pixel decode either way
    val fPng = Multimodal.imageFeature(img, 48)
    val fJpg = Multimodal.imageFeature(back, 48)
    val cos = fPng.zip(fJpg).map { case (a, b) => a.toDouble * b }.sum
    assert(cos > 0.999, s"JPEG feature should track the original, cos=$cos")
    assert(fJpg.toSeq !== Multimodal.stubDecode(jpeg, 48).toSeq)
  }

  test("real WAV decode: windowed amplitude sums reproduce the tone formula") {
    import spark.implicits._
    val media = (0 until 5).map { i =>
      (i.toLong, Multimodal.testToneWav(i, 400 + 16 * i))
    }.toDF("obj_id", "payload")
    val got = Multimodal.decodeAudioStats(media, windows = 16)
      .orderBy("obj_id", "window")
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(got.length === 5 * 16)
    assert(got.forall(_._2 === 8000)) // header sample-rate survives encode+decode
    val expected = for {
      i <- 0 until 5; n = 400 + 16 * i
      w <- 0 until 16
    } yield {
      val s = (0 until n).filter(j => j * 16 / n == w)
        .map(j => math.abs(((j * (3 + i) + 7 * i) % 2048) - 1024).toLong).sum
      (i.toLong, 8000, n.toLong, w, s)
    }
    assert(got.toSeq === expected)
    // extractFeatures routes the WAV through the REAL decoder
    val wav = Multimodal.testToneWav(0, 400)
    val viaPipeline = Multimodal
      .extractFeatures(Seq((0L, "audio", wav)).toDF("obj_id", "modality", "payload"), 16)
      .head().getSeq[Float](2)
    assert(viaPipeline ===
      Multimodal.audioFeature(Multimodal.decodeWav(wav).get._2, 16).toSeq)
    assert(viaPipeline !== Multimodal.stubDecode(wav, 16).toSeq)
  }

  test("real AIFF and AU decode: same formula samples as WAV across containers") {
    import spark.implicits._
    for (i <- 0 until 3) {
      val n = 400 + 16 * i
      val wav = Multimodal.decodeAudio(Multimodal.testToneWav(i, n))
      val aiff = Multimodal.decodeAudio(Multimodal.testToneAiff(i, n))
      val au = Multimodal.decodeAudio(Multimodal.testToneAu(i, n))
      assert(wav.isDefined && aiff.isDefined && au.isDefined)
      // container + endianness differ; the decoded PCM must not
      assert(aiff.get._2.toSeq === wav.get._2.toSeq, s"AIFF samples, tone $i")
      assert(au.get._2.toSeq === wav.get._2.toSeq, s"AU samples, tone $i")
      assert(aiff.get._1 === 8000 && au.get._1 === 8000)
    }
    // and through the batch stats path, mixed containers in one frame
    val media = Seq(
      (0L, Multimodal.testToneWav(0, 400)),
      (1L, Multimodal.testToneAiff(0, 400)),
      (2L, Multimodal.testToneAu(0, 400))).toDF("obj_id", "payload")
    val rows = Multimodal.decodeAudioStats(media, windows = 4)
      .orderBy("obj_id", "window")
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(rows.length === 12)
    val byObj = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._5).toSeq }
    assert(byObj(1L) === byObj(0L) && byObj(2L) === byObj(0L))
  }

  test("real AVI decode: container walk + per-frame grid sums match the formula") {
    import spark.implicits._
    // PNG-in-AVI clip: lossless frames, exact formula replay
    val clip = Multimodal.testClipAvi(seed = 2, nFrames = 4, w = 20, h = 14, fps = 10)
    assert(Multimodal.isDecodableVideo(clip))
    val Some((w, h, us, frames)) = Multimodal.parseAviFrames(clip)
    assert((w, h, us, frames.length) === (20, 14, 100000, 4))
    val media = Seq((7L, clip)).toDF("obj_id", "payload")
    val got = Multimodal.decodeVideoStats(media, grid = 2)
      .orderBy("frame_idx", "cell")
      .as[(Long, Int, Int, Int, Int, Int, Long, Long, Long)].collect()
    assert(got.length === 4 * 4)
    val expected = for (f <- 0 until 4; cell <- 0 until 4) yield {
      val s = 2 + 31 * f
      var r = 0L; var g = 0L; var b = 0L
      for (y <- 0 until 14; x <- 0 until 20
           if (y * 2 / 14) * 2 + (x * 2 / 20) == cell) {
        r += (3 * x + 5 * y + 7 * s) % 256
        g += (11 * x + 13 * y + 17 * s) % 256
        b += (19 * x + 23 * y + 29 * s) % 256
      }
      (7L, f, 4, 20, 14, cell, r, g, b)
    }
    assert(got.toSeq === expected)

    // RIFF even-offset padding: an odd-length chunk between two real
    // frames must not desynchronize the walk — the junk frame shows up
    // as a decode GAP (frame index preserved), not as corruption
    val png = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(Multimodal.testCardImage(5, 8, 8), "png", out)
      out.toByteArray
    }
    val padded = Multimodal.buildAvi(Seq(png, Array[Byte](1, 2, 3), png), 8, 8, 5)
    val Some((_, _, _, fr2)) = Multimodal.parseAviFrames(padded)
    assert(fr2.length === 3 && fr2(1).toSeq === Seq[Byte](1, 2, 3))
    val gapRows = Multimodal.decodeVideoStats(
      Seq((1L, padded)).toDF("obj_id", "payload"), grid = 1).collect()
    assert(gapRows.map(_.getInt(1)).toSet === Set(0, 2)) // frame 1 is the gap

    // Motion-JPEG: real JPEG frames decode through the same walk; JPEG is
    // lossy so the contract is geometry + closeness, not equality
    val jpgFrames = (0 until 3).map { f =>
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(Multimodal.testCardImage(9 + f, 16, 12), "jpg", out)
      out.toByteArray
    }
    val mjpg = Multimodal.buildAvi(jpgFrames, 16, 12, 10, fourccCodec = "MJPG")
    val mj = Multimodal.decodeVideoStats(
      Seq((3L, mjpg)).toDF("obj_id", "payload"), grid = 1)
      .orderBy("frame_idx").collect()
    assert(mj.length === 3)
    assert(mj.forall(r => r.getInt(3) === 16 && r.getInt(4) === 12))
    mj.zipWithIndex.foreach { case (r, f) =>
      val s = 9 + f
      var exp = 0L
      for (y <- 0 until 12; x <- 0 until 16) exp += (3 * x + 5 * y + 7 * s) % 256
      val gotR = r.getLong(6)
      assert(math.abs(gotR - exp) <= 16 * 12 * 8, // ≤8 grey-levels/pixel drift
        s"MJPEG frame $f red sum $gotR too far from $exp")
    }

    // truncated container degrades to None, not an exception
    assert(Multimodal.parseAviFrames(clip.take(clip.length / 2)) === None)
    // extractFeatures routes AVI payloads through REAL frame decode
    // (temporal mean of per-frame pooled features), not the byte stub
    val viaPipeline = Multimodal
      .extractFeatures(Seq((7L, "video", clip)).toDF("obj_id", "modality", "payload"), 48)
      .head().getSeq[Float](2)
    assert(viaPipeline === Multimodal.videoFeatureOf(clip, 48).get.toSeq)
    assert(viaPipeline !== Multimodal.stubDecode(clip, 48).toSeq)
    // sampleFrames serves REAL container frames for AVI payloads
    val sampled = Multimodal.sampleFrames(
      Seq((7L, "video", clip)).toDF("obj_id", "modality", "payload"), everyN = 2)
      .orderBy("frame_idx").collect()
    assert(sampled.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(sampled.forall(r => Multimodal.isDecodableImage(r.getAs[Array[Byte]](2))))
  }

  test("TIFF pyramid reader: real page decode, rect tile reads match the formula") {
    import spark.implicits._
    import graft.objects.TiffPyramidReader
    val dir = Files.createTempDirectory("graft_tiffs")
    // 3 images × 3 pyramid pages: page l of image i is a 40>>l × 24>>l
    // test card (real multi-page TIFFs via the JDK TIFF writer)
    for (i <- 0 until 3) {
      val pages = (0 until 3).map(l =>
        Multimodal.testCardImage(i, 40 >> l, 24 >> l))
      Files.write(dir.resolve(f"img_$i%02d.tif"),
        TiffPyramidReader.writePyramidTiff(pages))
    }
    val reader = new graft.objects.TiffPyramidReader(
      dir.toString, "*.tif", level = 1, tileSize = 8)
    val tiles = reader.readObjects(spark)
      .orderBy("external_id").collect()
    // level 1 = 20×12 → 3×2 tiles per image
    assert(tiles.length === 3 * 6)
    assert(tiles.forall(r => r.getInt(6) === 20 && r.getInt(7) === 12))
    // metadata pass agrees with the decode pass on geometry, sans payload
    val meta = reader.readMetadata(spark).orderBy("external_id").collect()
    assert(meta.map(_.getLong(0)).toSeq === tiles.map(_.getLong(0)).toSeq)
    // the (tx=1, ty=0) tile of image 2: decode its PNG payload and check
    // every pixel against the level-1 formula over the tile's source rect
    val t = tiles.find(r => r.getLong(1) === 2L &&
      r.getInt(4) === 1 && r.getInt(5) === 0).get
    val img = Multimodal.decodeImage(t.getAs[Array[Byte]](8)).get
    assert(img.getWidth === 8 && img.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val (gx, gy) = (8 + x, y) // page-global coords
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === (3 * gx + 5 * gy + 7 * 2) % 256)
      assert(((rgb >> 8) & 0xff) === (11 * gx + 13 * gy + 17 * 2) % 256)
      assert((rgb & 0xff) === (19 * gx + 23 * gy + 29 * 2) % 256)
    }
    // end-to-end: the real-pixel tiles index and self-retrieve
    val idx = ObjectIndex.create(spark, tmp(), reader, new ImageStatsEmbedding(48),
      indexType = "FLAT",
      metric = graft.operators.DistanceMetric.L2, timestamp = 1000L)
    val queries = reader.readObjects(spark).where(col("external_id") < 3)
      .select(col("external_id").as("qid"), col("payload"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(q => assert(top1(q) === q, s"tile $q should retrieve itself"))
  }

  test("OME-TIFF metadata: real OME-XML block written, read back, parsed; non-OME total") {
    import spark.implicits._
    import graft.objects.TiffPyramidReader
    val dir = Files.createTempDirectory("graft_ome_tiffs")
    val omeXml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">
        | <Image ID="Image:0" Name="well_a1">
        |  <Pixels ID="Pixels:0" DimensionOrder="XYCZT" Type="uint8"
        |          SizeX="40" SizeY="24" SizeC="2" SizeZ="3" SizeT="1"
        |          PhysicalSizeX="0.25" PhysicalSizeY="0.25">
        |   <Channel ID="Channel:0:0" Name="DAPI" SamplesPerPixel="1"/>
        |   <Channel ID="Channel:0:1" Name="GFP" SamplesPerPixel="1"/>
        |  </Pixels>
        | </Image>
        |</OME>""".stripMargin
    val pages = (0 until 2).map(l => Multimodal.testCardImage(0, 40 >> l, 24 >> l))
    Files.write(dir.resolve("a_ome.tif"),
      TiffPyramidReader.writePyramidTiff(pages, Some(omeXml)))
    Files.write(dir.resolve("b_plain.tif"),
      TiffPyramidReader.writePyramidTiff(pages))
    val reader = new TiffPyramidReader(dir.toString, "*.tif")
    val rows = reader.readOmeMetadata(spark)
      .orderBy("path").collect()
    assert(rows.length === 2)
    val ome = rows(0); val plain = rows(1)
    assert(ome.getBoolean(2), "a_ome.tif must parse as OME")
    assert(ome.getInt(3) === 40 && ome.getInt(4) === 24)
    assert(ome.getInt(5) === 2 && ome.getInt(6) === 3 && ome.getInt(7) === 1)
    assert(ome.getDouble(8) === 0.25 && ome.getDouble(9) === 0.25)
    assert(ome.getSeq[String](10) === Seq("DAPI", "GFP"))
    // plain TIFF: total frame, geometry from the page-0 header
    assert(!plain.getBoolean(2))
    assert(plain.getInt(3) === 40 && plain.getInt(4) === 24)
    assert(plain.getSeq[String](10).isEmpty)
    // the OME block survives alongside REAL pixel decode (same file
    // serves tiles through the rect-read path)
    val tiles = new TiffPyramidReader(dir.toString, "a_ome.tif", level = 1, tileSize = 8)
      .readObjects(spark).collect()
    assert(tiles.length === 3 * 2 &&
      tiles.forall(r => Multimodal.isDecodableImage(r.getAs[Array[Byte]](8))))
    // hostile description: a DTD-carrying payload is refused as not-OME
    // (the hardened parser never resolves it), not an exception
    assert(TiffPyramidReader.parseOmeXml(
      """<?xml version="1.0"?><!DOCTYPE OME [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<OME><Image><Pixels SizeX="1" SizeY="1">&x;</Pixels></Image></OME>"""
        .stripMargin).isEmpty)
    assert(TiffPyramidReader.parseOmeXml("just a comment, not xml").isEmpty)
  }

  test("multimodal: frame sampling emits every Nth frame") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](1024)(i => (i % 127).toByte)
    val media = Seq((5L, "video", payload)).toDF("obj_id", "modality", "payload")
    val frames = Multimodal.sampleFrames(media, everyN = 2, frameBytes = 256)
      .orderBy("frame_idx").as[(Long, Int, Array[Byte])].collect()
    assert(frames.map(_._2).toSeq === Seq(0, 2))
    assert(frames.head._3.length === 256)
  }
}
