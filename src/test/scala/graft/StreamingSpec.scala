package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Ingest, VectorIndex}
import graft.operators.DistanceMetric
import graft.streaming.EventOps

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("loadEvents leaves no session-conf side effect and still executes") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val before = spark.conf.get(key) // registered default ("false")
    val events = EventOps.loadEvents(spark, sf0001)
    assert(spark.conf.get(key) === before, "legacy conf leaked from loadEvents")
    // execution after restore still decodes the nano column correctly
    assert(events.where(col("ts").isNotNull).count() > 0)
    // a pre-existing explicit value is restored, not clobbered
    spark.conf.set(key, "false")
    EventOps.loadEvents(spark, sf0001).count()
    assert(spark.conf.get(key) === "false")
    spark.conf.unset(key)
  }

  test("streaming image decode equals the batch decode (stateless, no state store)") {
    import graft.multimodal.Multimodal
    val dir = Files.createTempDirectory("graft_stream_imgs")
    for (i <- 0 until 6) {
      Files.write(dir.resolve(f"card_$i%02d.png"),
        Multimodal.testCardPng(i, 16 + i, 12 + i))
    }
    // ids from the path (zipWithIndex isn't streamable); real ImageIO
    // decode runs unchanged on the stream — decodeImageStats is stateless
    def media(df: org.apache.spark.sql.DataFrame) = df.select(
      regexp_extract(col("path"), "card_(\\d+)", 1).cast("long").as("obj_id"),
      col("content").as("payload"))
    val schema = spark.read.format("binaryFile").load(dir.toString).schema
    val stream = spark.readStream.format("binaryFile").schema(schema)
      .load(dir.toString)
    val q = Multimodal.decodeImageStats(media(stream), grid = 4)
      .writeStream.format("memory").queryName("img_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("img_stream")
      .orderBy("obj_id", "cell").collect().toSeq
    val batch = Multimodal.decodeImageStats(
        media(spark.read.format("binaryFile").load(dir.toString)), grid = 4)
      .orderBy("obj_id", "cell").collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming token-window chunking equals the batch plan (stateless)") {
    val docsDir = Files.createTempDirectory("graft_stream_chunks")
    spark.read.parquet(s"$sf0001/documents.parquet").limit(40)
      .write.mode("overwrite").parquet(docsDir.toString)
    val schema = spark.read.parquet(docsDir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir.toString)
    val q = graft.text.TextOps.chunkTokenWindows(stream, window = 16, stride = 12)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("chunk_stream")
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    val batch = graft.text.TextOps.chunkTokenWindows(
        spark.read.parquet(docsDir.toString), window = 16, stride = 12)
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming DSIR scoring equals batch (stream-static model join)") {
    val docsDir = Files.createTempDirectory("graft_stream_dsir")
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet").limit(30)
    fixture.write.mode("overwrite").parquet(docsDir.toString)
    val modelUri = Files.createTempDirectory("graft_stream_dsir_model").toString
    graft.text.Dsir.fit(fixture, col("lang") === "en", modelUri)
    val schema = spark.read.parquet(docsDir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir.toString)
    // score() is a projection + stream-static broadcast join + per-doc
    // aggregate; complete-mode aggregation makes it streamable unchanged
    val q = graft.text.Dsir.score(stream, modelUri)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("dsir_stream")
      .orderBy("doc_id").collect().toSeq
    val batch = graft.text.Dsir.score(
        spark.read.parquet(docsDir.toString), modelUri)
      .orderBy("doc_id").collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming per-source cap equals batch (complete-mode heap aggregate)") {
    val docsDir = Files.createTempDirectory("graft_stream_cap")
    spark.read.parquet(s"$sf0001/documents.parquet").limit(60)
      .write.mode("overwrite").parquet(docsDir.toString)
    val schema = spark.read.parquet(docsDir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir.toString)
    // capPerGroup is one grouped MinTopKLong aggregate + explode —
    // complete-mode output re-emits the per-group heap each batch, so the
    // curation cap runs on a live corpus feed unchanged
    val q = graft.text.TextOps.capPerGroup(stream, n = 3,
        groupCol = "source", scoreCol = col("n_chars"))
      .writeStream.format("memory").queryName("cap_stream")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("cap_stream")
      .orderBy("source", "cap_rank").collect().toSeq
    val batch = graft.text.TextOps.capPerGroup(
        spark.read.parquet(docsDir.toString), n = 3,
        groupCol = "source", scoreCol = col("n_chars"))
      .orderBy("source", "cap_rank").collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming BPE token counts equal batch (stateless encode chain + complete agg)") {
    val docsDir = Files.createTempDirectory("graft_stream_bpe")
    spark.read.parquet(s"$sf0001/documents.parquet").limit(60)
      .write.mode("overwrite").parquet(docsDir.toString)
    val batchDocs = spark.read.parquet(docsDir.toString)
    // merges are a FITTED MODEL (batch-trained, like centroids); the
    // encode chain is pure expressions, so it rides a stream unchanged
    val merges = graft.text.BpeTrainer.train(batchDocs, 6).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val schema = batchDocs.schema
    val stream = spark.readStream.schema(schema).parquet(docsDir.toString)
    val q = graft.text.BpeTrainer.encodeTokenCounts(stream, merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("bpe_stream").orderBy("doc_id").collect().toSeq
    val batch = graft.text.BpeTrainer.encodeTokenCounts(batchDocs, merges)
      .orderBy("doc_id").collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming windowed counts equal the batch plan") {
    val events = EventOps.loadEvents(spark, sf0001)
    val batch = events
      .groupBy(window(col("ts"), "300 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val rawDir = Files.createTempDirectory("graft_events_us").toString
    events.write.mode("overwrite").parquet(rawDir)  // rewrite at us precision
    val q = EventOps.streamingWindowedCounts(
      spark, rawDir, spark.read.parquet(rawDir).schema, "win_test")
    q.awaitTermination()
    val streamed = spark.table("win_test")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming exact dedup keeps one doc per fingerprint with bounded state") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L))
      .select("doc_id", "text", "ts")
    val dir = Files.createTempDirectory("graft_sdedup").toString
    docs.write.mode("overwrite").parquet(dir)
    val q = EventOps.streamingExactDedup(
      spark, dir, spark.read.parquet(dir).schema, "sdedup_test")
    q.awaitTermination()
    val out = spark.table("sdedup_test")
    // one survivor per distinct content fingerprint, same as batch dedup
    val batchDistinct = docs
      .select(graft.text.TextOps.tokenSetFingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(out.count() === batchDistinct)
    assert(out.select("fp").distinct().count() === batchDistinct)
    assert(batchDistinct < docs.count(), "fixture should contain exact dups")
  }

  test("arriving fvecs shards stream into a live index (vecs source -> updates sink)") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    val uri = Files.createTempDirectory("graft_vstream_idx").toString
    Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)

    // an "embedding job" drops an fvecs shard directory via the DSv2 writer
    val shardDir = Files.createTempDirectory("graft_vstream_src").resolve("upd.fvecs").toString
    emb.where(col("external_id") < 5).orderBy("external_id")
      .select(reverse(col("vector")).as("vector"))
      .write.format("vecs").mode("overwrite").save(shardDir)

    val src = spark.readStream.format("vecs").load(shardDir)
      .select((col("row_id") + 5000L).as("external_id"),
        col("vector"), lit(1100L).as("ts"))
    val q = EventOps.streamUpdatesIntoIndex(src, uri, "vecs_upd_test")
    q.awaitTermination()

    val idx = VectorIndex.open(spark, uri)
    assert(idx.meta.hasUpdates)
    val queries = emb.where(col("external_id") === 0)
      .select(lit(0L).as("qid"), reverse(col("vector")).as("qvec"))
    val top = idx.query(queries, 1).select("id").head().getLong(0)
    assert(top === 5000L, "vector from the streamed fvecs shard should be retrievable")
  }

  test("streaming updates sink feeds the index read-merge path") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    val uri = Files.createTempDirectory("graft_stream_idx").toString
    Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)

    // stream a batch of updates (new ids with reversed vectors) from parquet
    val updDir = Files.createTempDirectory("graft_upd_src").toString
    emb.where(col("external_id") < 5)
      .select((col("external_id") + 5000L).as("external_id"),
        reverse(col("vector")).as("vector"), lit(1100L).as("ts"))
      .write.mode("overwrite").parquet(updDir)
    val src = spark.readStream
      .schema(spark.read.parquet(updDir).schema)
      .parquet(updDir)
    val q = EventOps.streamUpdatesIntoIndex(src, uri, "upd_test")
    q.awaitTermination()

    val idx = VectorIndex.open(spark, uri)
    assert(idx.meta.hasUpdates)
    // querying with one of the streamed vectors must hit its new id first
    val queries = emb.where(col("external_id") === 0)
      .select(lit(0L).as("qid"), reverse(col("vector")).as("qvec"))
    val top = idx.query(queries, 1).select("id").head().getLong(0)
    assert(top === 5000L, "streamed update should be retrievable (exact match)")
  }

  test("streaming k-NN answers each micro-batch identically to the batch query") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    val uri = Files.createTempDirectory("graft_sknn_idx").toString
    val idx = Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)

    val batchQueries = emb.where(col("external_id") < 10)
      .select(col("external_id").as("qid"), col("vector").as("qvec"))
    val qDir = Files.createTempDirectory("graft_sknn_q").toString
    batchQueries.write.mode("overwrite").parquet(qDir)
    val outDir = Files.createTempDirectory("graft_sknn_out").toString + "/hits"

    val src = spark.readStream
      .schema(spark.read.parquet(qDir).schema)
      .parquet(qDir)
    val q = EventOps.streamingKnn(src, uri, outDir, k = 5, queryName = "sknn_test")
    q.awaitTermination()

    val streamed = spark.read.parquet(outDir)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val batch = idx.query(batchQueries, 5)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(streamed === batch)

    // filtered stream: a static allow-list pre-filters every micro-batch
    val allow = emb.where(col("external_id") % 3 === 0).select("external_id")
    val outF = Files.createTempDirectory("graft_sknn_outf").toString + "/hits"
    val srcF = spark.readStream
      .schema(spark.read.parquet(qDir).schema)
      .parquet(qDir)
    val qf = EventOps.streamingKnn(srcF, uri, outF, k = 5,
      queryName = "sknn_filt_test", allowIds = Some(allow))
    qf.awaitTermination()
    val streamedF = spark.read.parquet(outF)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val batchF = idx.queryFiltered(batchQueries, 5, allow)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(streamedF === batchF)
    assert(streamedF.forall(_._3 % 3 == 0))
  }

  test("mapGroupsWithState running totals equal the batch aggregate") {
    val events = EventOps.loadEvents(spark, sf0001)
    val dir = Files.createTempDirectory("graft_events_state").toString
    events.write.mode("overwrite").parquet(dir)
    val q = EventOps.statefulUserTotals(
      spark, dir, spark.read.parquet(dir).schema, "state_test")
    q.awaitTermination()
    val streamed = spark.table("state_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = events.groupBy(col("user_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }

  test("sessionization matches a hand-computed gaps-and-islands answer") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2026-01-01 00:00:00"), (1L, "2026-01-01 00:05:00"), // session 1
      (1L, "2026-01-01 00:20:00"), // gap 15m >= 10m -> session 2
      (2L, "2026-01-01 01:00:00") // single session
    ).toDF("user_id", "ts_s").select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val got = EventOps.sessionized(rows, gapSec = 600)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming object arrivals fold into the index and skip redelivered batches") {
    import spark.implicits._
    val docsPath = s"$sf0001/documents.parquet"
    val full = new graft.objects.ParquetTableReader(
      docsPath, idCol = "doc_id", contentCol = "text")
    val emb = new graft.objects.HashTextEmbedding(64)
    // index created on the EVEN objects; the odd ones ARRIVE as a stream
    val uri = Files.createTempDirectory("graft_stream_objidx").toString
    graft.objects.ObjectIndex.create(spark, uri,
      new graft.objects.FilteredObjectReader(full, "external_id % 2 = 0"),
      emb, indexType = "FLAT", timestamp = 1000L)
    val idx = new graft.objects.ObjectIndex(spark, uri, full, emb)
    val feedDir = Files.createTempDirectory("graft_stream_objfeed").toString
    full.readObjects(spark).where(col("external_id") % 2 === 1)
      .write.mode("overwrite").parquet(feedDir)
    val schema = spark.read.parquet(feedDir).schema
    val q = EventOps.streamObjectsIntoIndex(
      spark.readStream.schema(schema).parquet(feedDir), idx, "obj_idx_stream")
    try q.processAllAvailable() finally q.stop()
    // the streamed index answers EXACTLY like a from-scratch full build
    // (FLAT raw store, base+additions merge is exact)
    val fullIdx = graft.objects.ObjectIndex.create(spark,
      Files.createTempDirectory("graft_stream_objfull").toString,
      full, emb, indexType = "FLAT", timestamp = 1000L)
    val queries = spark.read.parquet(docsPath).where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    def snap(i: graft.objects.ObjectIndex) = i.query(queries, k = 5)
      .select("qid", "rank", "external_id")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(snap(idx) === snap(fullIdx))
    val nAll = full.readMetadata(spark).count()
    assert(idx.metadata.count() === nAll)
    assert(graft.index.IndexDoctor.checkObjectIndex(spark, uri).isEmpty)
    // redelivery: a fresh stream over the same feed restarts at batch 0,
    // which uri/stream_commits records — the sink must skip it (a replay
    // would double-append identical log rows at the same ts)
    val q2 = EventOps.streamObjectsIntoIndex(
      spark.readStream.schema(schema).parquet(feedDir), idx, "obj_idx_stream2")
    try q2.processAllAvailable() finally q2.stop()
    assert(idx.metadata.count() === nAll, "redelivered batch must be a no-op")
    assert(snap(idx) === snap(fullIdx))
  }

  test("streaming shard export equals batch and skips redelivered batches") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val uri = Files.createTempDirectory("graft_stream_shards").toString
    graft.text.ShardExport.write(a, uri, numShards = 4)
    val bDir = Files.createTempDirectory("graft_stream_shards_feed")
    b.write.mode("overwrite").parquet(bDir.toString)
    val schema = spark.read.parquet(bDir.toString).schema
    val q = EventOps.streamDocsIntoShards(
      spark.readStream.schema(schema).parquet(bDir.toString), uri, "shard_stream")
    try q.processAllAvailable() finally q.stop()
    // streamed export serves the manifest of a batch export over A ∪ B
    val fullUri = Files.createTempDirectory("graft_stream_shards_full").toString
    graft.text.ShardExport.write(docs, fullUri, numShards = 4)
    def m(u: String) = graft.text.ShardExport.manifest(spark, u)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m(uri) == m(fullUri))
    assert(graft.text.ShardExport.fsck(spark, uri).isEmpty)
    // redelivery: a fresh stream over the SAME feed restarts at batch 0,
    // which uri/commits already records — the sink must skip it (without
    // the commit log, append's duplicate-id refusal would fail the query)
    val q2 = EventOps.streamDocsIntoShards(
      spark.readStream.schema(schema).parquet(bDir.toString), uri, "shard_stream2")
    try q2.processAllAvailable() finally q2.stop()
    assert(m(uri) == m(fullUri), "redelivered batch must be a no-op")
  }
}
