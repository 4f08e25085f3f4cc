package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Ingest, IndexDoctor, IndexMeta, VectorIndex}
import graft.operators.DistanceMetric

/** Integrity checker ([[graft.index.IndexDoctor]]): healthy indexes report
  * nothing; seeded corruptions surface as named findings. */
class IndexDoctorSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String = Files.createTempDirectory("graft_doctor").toString

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    .cache()

  test("healthy FLAT / IVF_FLAT / IVF_PQ / VAMANA / BINARY report no findings") {
    for ((t, parts) <- Seq("FLAT" -> None, "IVF_FLAT" -> Some(8),
        "IVF_PQ" -> Some(8), "VAMANA" -> Some(2), "BINARY" -> None)) {
      val uri = tmp()
      Ingest.ingest(spark, uri, emb, t, DistanceMetric.L2,
        timestamp = 1000L, partitions = parts)
      val findings = IndexDoctor.check(spark, uri)
      assert(findings.isEmpty, s"$t: $findings")
    }
    // boundary-replicated VAMANA stores each vector in several shards plus
    // the neighbor-exchange portal copies: the doctor must count DISTINCT
    // ids against baseSizes, not raw rows
    val uriR = tmp()
    Ingest.ingest(spark, uriR, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(4), shardReplicas = Some(2))
    val fr = IndexDoctor.check(spark, uriR)
    assert(fr.isEmpty, s"replicated VAMANA: $fr")
    // a double-written file WITHIN one shard is still corruption under
    // replication: (shard_id, external_id) must be unique
    val oneShard = spark.read.parquet(s"$uriR/base/v=1000")
      .withColumn("shard_id", lit(0)).limit(2)
    oneShard.write.mode("append").partitionBy("shard_id")
      .parquet(s"$uriR/base/v=1000")
    val frDup = IndexDoctor.check(spark, uriR)
    assert(frDup.exists(x => x.severity == "error" &&
      x.detail.contains("once per shard")), frDup.toString)
    // and a duplicated row in an UNREPLICATED layout is still corruption
    val uriD = tmp()
    Ingest.ingest(spark, uriD, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    emb.where(col("external_id") === 7L).write.mode("append")
      .parquet(s"$uriD/base/v=1000")
    val fd = IndexDoctor.check(spark, uriD)
    assert(fd.exists(x => x.severity == "error" &&
      x.detail.contains("duplicate external_id")), fd.toString)
  }

  test("VAMANA graph/base incoherence and medoid loss are named errors") {
    // a base row whose adjacency vanished: invisible to search
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(2))
    val victim = spark.read.parquet(s"$uri/graph/v=1000")
      .where(!col("is_medoid")).head()
    val vid = victim.getLong(victim.fieldIndex("external_id"))
    val kept = spark.read.parquet(s"$uri/graph/v=1000")
      .where(col("external_id") =!= vid).collect()
    val schema = spark.read.parquet(s"$uri/graph/v=1000").schema
    spark.createDataFrame(spark.sparkContext.parallelize(kept.toSeq), schema)
      .write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$uri/graph/v=1000")
    val f = IndexDoctor.check(spark, uri)
    assert(f.exists(x => x.severity == "error" && x.check == "graph.v=1000" &&
      x.detail.contains("invisible to search")), f.toString)

    // every medoid flag cleared: no entry point in any shard
    val uri2 = tmp()
    Ingest.ingest(spark, uri2, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(2))
    val g2 = spark.read.parquet(s"$uri2/graph/v=1000")
      .withColumn("is_medoid", lit(false)).collect()
    val schema2 = spark.read.parquet(s"$uri2/graph/v=1000").schema
    spark.createDataFrame(spark.sparkContext.parallelize(g2.toSeq), schema2)
      .write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$uri2/graph/v=1000")
    val f2 = IndexDoctor.check(spark, uri2)
    assert(f2.exists(x => x.severity == "error" && x.check == "graph.v=1000" &&
      x.detail.contains("medoid")), f2.toString)

    // adjacency for an id with no vector: dropped at query assembly
    val uri3 = tmp()
    Ingest.ingest(spark, uri3, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(2))
    val ghost = spark.read.parquet(s"$uri3/graph/v=1000")
      .where(!col("is_medoid")).limit(1)
      .withColumn("external_id", lit(99999999L))
    ghost.write.mode("append").partitionBy("shard_id")
      .parquet(s"$uri3/graph/v=1000")
    val f3 = IndexDoctor.check(spark, uri3)
    assert(f3.exists(x => x.severity == "error" && x.check == "graph.v=1000" &&
      x.detail.contains("without a base vector")), f3.toString)

    // a DUPLICATED medoid row is the other side of the exactly-one check
    val uri4 = tmp()
    Ingest.ingest(spark, uri4, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(2))
    val extraMedoid = spark.read.parquet(s"$uri4/graph/v=1000")
      .where(!col("is_medoid")).limit(1)
      .withColumn("is_medoid", lit(true))
    // replace that point's row so keys stay coherent but medoids = 2
    val vid4 = extraMedoid.head().getLong(extraMedoid.head().fieldIndex("external_id"))
    val rest = spark.read.parquet(s"$uri4/graph/v=1000")
      .where(col("external_id") =!= vid4)
    val schema4 = spark.read.parquet(s"$uri4/graph/v=1000").schema
    spark.createDataFrame(
      spark.sparkContext.parallelize((rest.collect() ++ extraMedoid.collect()).toSeq),
      schema4)
      .write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$uri4/graph/v=1000")
    val f4 = IndexDoctor.check(spark, uri4)
    assert(f4.exists(x => x.severity == "error" && x.check == "graph.v=1000" &&
      x.detail.contains("medoid")), f4.toString)

    // a WHOLE shard vanishing (base + graph lost together) warns against
    // the recorded geometry — row-level checks cannot see it
    val uri5 = tmp()
    Ingest.ingest(spark, uri5, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(4), shardReplicas = Some(2))
    def rmDir(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmDir)); f.delete(); ()
    }
    rmDir(new java.io.File(s"$uri5/base/v=1000/shard_id=1"))
    rmDir(new java.io.File(s"$uri5/graph/v=1000/shard_id=1"))
    val f5 = IndexDoctor.check(spark, uri5)
    assert(f5.exists(x => x.severity == "warn" && x.check == "graph.v=1000" &&
      x.detail.contains("shards have any rows")), f5.toString)
  }

  test("VAMANA PQ attachment: healthy is clean; partial writes and coverage gaps are named errors") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(2))
      .asInstanceOf[graft.index.VamanaIndex]
    idx.buildPqCodes()
    assert(IndexDoctor.check(spark, uri).isEmpty,
      "healthy PQ attachment must report nothing")

    // a code row deleted: the point is invisible to PQ traversal
    val keep = spark.read.parquet(s"$uri/pq/v=1000")
    val victim = keep.head().getLong(keep.schema.fieldIndex("external_id"))
    val kept = keep.where(col("external_id") =!= victim).collect()
    spark.createDataFrame(spark.sparkContext.parallelize(kept.toSeq), keep.schema)
      .write.mode("overwrite").partitionBy("shard_id").parquet(s"$uri/pq/v=1000")
    val f = IndexDoctor.check(spark, uri)
    assert(f.exists(x => x.severity == "error" && x.check == "pq.v=1000" &&
      x.detail.contains("invisible to PQ traversal")), f.toString)

    // codebooks without codes: partial buildPqCodes write
    val uri2 = tmp()
    val idx2 = Ingest.ingest(spark, uri2, emb, "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(2))
      .asInstanceOf[graft.index.VamanaIndex]
    idx2.buildPqCodes()
    def rmAll(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete(); ()
    }
    rmAll(new java.io.File(s"$uri2/pq/v=1000"))
    val f2 = IndexDoctor.check(spark, uri2)
    assert(f2.exists(x => x.severity == "error" && x.check == "pq.v=1000" &&
      x.detail.contains("partial buildPqCodes write")), f2.toString)
  }

  test("an index with a consistent updates log stays clean; a stale flag warns") {
    val uri = tmp()
    val idx = Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2,
      timestamp = 1000L)
    idx.deleteBatch(emb.where(col("external_id") === 3L), ts = 1100L)
    assert(IndexDoctor.check(spark, uri).isEmpty)
    // simulate a stale hasUpdates flag with no log behind it
    val uri2 = tmp()
    Ingest.ingest(spark, uri2, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    IndexMeta.write(uri2, IndexMeta.read(uri2).copy(hasUpdates = true))
    val f = IndexDoctor.check(spark, uri2)
    assert(f.exists(x => x.severity == "warn" && x.check == "updates"), f.toString)
  }

  test("an unrecognized index type is an error BEFORE open() can MatchError") {
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    IndexMeta.write(uri, IndexMeta.read(uri).copy(indexType = "ivf_flat"))
    val f = IndexDoctor.check(spark, uri)
    assert(f.exists(x => x.severity == "error" && x.check == "meta.indexType"), f.toString)
  }

  test("a corrupt version parquet becomes a finding, not a stack trace") {
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    // truncate every parquet footer in the version dir
    new java.io.File(s"$uri/base/v=1000").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val ch = java.nio.channels.FileChannel.open(f.toPath,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.truncate(math.max(0, f.length() - 16)) finally ch.close()
      }
    val f = IndexDoctor.check(spark, uri)
    assert(f.exists(x => x.severity == "error" && x.check == "base.v=1000"), f.toString)
  }

  test("a missing BINARY sketch and a count drift are named errors") {
    val uri = tmp()
    Ingest.ingest(spark, uri, emb, "BINARY", DistanceMetric.L2, timestamp = 1000L)
    // corrupt 1: drop the sketch
    val sketch = new java.io.File(s"$uri/sketch/v=1000")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(sketch)
    val f1 = IndexDoctor.check(spark, uri)
    assert(f1.exists(x => x.severity == "error" && x.check == "sketch.v=1000"), f1.toString)
    // corrupt 2: extra base rows behind the meta's back
    val uri2 = tmp()
    Ingest.ingest(spark, uri2, emb, "FLAT", DistanceMetric.L2, timestamp = 1000L)
    emb.limit(3).write.mode("append").parquet(s"$uri2/base/v=1000")
    val f2 = IndexDoctor.check(spark, uri2)
    // re-appending EXISTING ids surfaces as duplicate rows; appending new
    // ids would surface as a distinct-count drift — both are base errors
    assert(f2.exists(x => x.severity == "error" && x.check == "base.v=1000" &&
      (x.detail.contains("duplicate external_id") ||
        x.detail.contains("distinct id count"))), f2.toString)
  }

  // ---- text-side artifacts ([[graft.text.TextDoctor]]) ----

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  /** Rewrite a small persisted table in place (collect, transform, overwrite). */
  private def rewrite(path: String)(
      f: Seq[org.apache.spark.sql.Row] => Seq[org.apache.spark.sql.Row]): Unit = {
    val df = spark.read.parquet(path)
    val schema = df.schema
    val rows = f(df.collect().toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(path)
  }

  test("object-layer doctor: healthy index clean; seeded metadata corruptions named") {
    val uri = tmp()
    graft.objects.ObjectIndex.create(spark, uri,
      new graft.objects.DocumentsTableReader(sf0001),
      new graft.objects.HashTextEmbedding(64), timestamp = 1000L)
    assert(IndexDoctor.checkObjectIndex(spark, uri).isEmpty)

    val metaPath = s"$uri/object_metadata"
    val original = spark.read.parquet(metaPath).collect().toSeq

    // drop two objects' metadata -> their hits would silently vanish: error
    rewrite(metaPath)(rows => rows.filterNot { r =>
      val id = r.getAs[Long]("external_id"); id == 0L || id == 1000L
    })
    val missing = IndexDoctor.checkObjectIndex(spark, uri)
    assert(missing.exists(f => f.severity == "error" &&
      f.check == "object_metadata" && f.detail.contains("NO metadata row")),
      missing.toString)

    // duplicate a metadata row -> hit multiplication: error
    rewrite(metaPath)(_ => original ++ original.take(1))
    val dup = IndexDoctor.checkObjectIndex(spark, uri)
    assert(dup.exists(f => f.severity == "error" &&
      f.detail.contains("duplicate metadata rows")), dup.toString)

    // orphan metadata id (absent from base) -> warn only
    val schema = spark.read.parquet(metaPath).schema
    val orphan = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      original.head.toSeq.updated(
        schema.fieldIndex("external_id"), 999999999L).toArray, schema)
    rewrite(metaPath)(_ => original :+ orphan)
    val warned = IndexDoctor.checkObjectIndex(spark, uri)
    assert(warned.exists(f => f.severity == "warn" &&
      f.detail.contains("absent from base")), warned.toString)
    assert(!warned.exists(_.severity == "error"), warned.toString)

    // missing table entirely -> error naming total result loss
    graft.index.Storage.deleteRecursively(metaPath)
    val gone = IndexDoctor.checkObjectIndex(spark, uri)
    assert(gone.exists(f => f.severity == "error" &&
      f.detail.contains("missing/empty")), gone.toString)
  }

  test("multi-vector layouts: BINARY/IVF healthy under the fsck, VAMANA refused at ingest") {
    // two vectors per external id, declared via multiVector
    val multi = emb.limit(40).unionByName(
      emb.limit(40).withColumn("vector", reverse(col("vector"))))
    for ((t, parts) <- Seq("BINARY" -> None, "IVF_FLAT" -> Some(4),
        "IVF_PQ" -> Some(4), "FLAT" -> None)) {
      val uri = tmp()
      Ingest.ingest(spark, uri, multi, t, DistanceMetric.L2,
        timestamp = 1000L, partitions = parts, multiVector = true)
      val findings = IndexDoctor.check(spark, uri)
      assert(findings.isEmpty, s"$t multi-vector: $findings")
    }
    // VAMANA graphs key nodes by external_id — refused with a named error
    val e = intercept[IllegalArgumentException] {
      Ingest.ingest(spark, tmp(), multi, "VAMANA", DistanceMetric.L2,
        timestamp = 1000L, partitions = Some(2), multiVector = true)
    }
    assert(e.getMessage.contains("multi-vector"), e.getMessage)
    // a hand-rolled meta claiming the combination is itself a finding
    val uriV = tmp()
    Ingest.ingest(spark, uriV, emb.limit(40), "VAMANA", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(2))
    val m = IndexMeta.read(uriV)
    IndexMeta.write(uriV, m.copy(multiVector = true))
    val vf = IndexDoctor.check(spark, uriV)
    assert(vf.exists(f => f.severity == "error" &&
      f.check == "meta.multiVector"), vf.toString)
  }

  test("healthy BM25 / LM / DSIR models report no findings") {
    import graft.text.{Bm25, Dsir, LangModel, TextDoctor}
    val b = tmp(); Bm25.fit(docs, b)
    assert(TextDoctor.checkBm25(spark, b).isEmpty)
    val l = tmp(); LangModel.trainCharTrigram(docs.where(col("lang") === "en"), l)
    assert(TextDoctor.checkLangModel(spark, l).isEmpty)
    val d = tmp(); Dsir.fit(docs, col("lang") === "en", d)
    assert(TextDoctor.checkDsir(spark, d).isEmpty)
  }

  test("seeded BM25 corruption in each table surfaces as a named finding") {
    import graft.text.{Bm25, TextDoctor}
    import org.apache.spark.sql.Row
    // idf drift: one perturbed idf_micro breaks replay
    val u1 = tmp(); Bm25.fit(docs, u1)
    rewrite(s"$u1/idf") { rows =>
      rows.head match { case Row(t, df, i: Long) =>
        Row(t, df, i + 1L) +: rows.tail }
    }
    val f1 = TextDoctor.checkBm25(spark, u1)
    assert(f1.exists(x => x.severity == "error" && x.check == "bm25.idf" &&
      x.detail.contains("replay")), f1.toString)
    // postings loss: dropping one term's rows breaks df = posting count
    val u2 = tmp(); Bm25.fit(docs, u2)
    val victim = spark.read.parquet(s"$u2/postings").head().getString(0)
    rewrite(s"$u2/postings")(_.filterNot(_.getString(0) == victim))
    val f2 = TextDoctor.checkBm25(spark, u2)
    assert(f2.exists(x => x.severity == "error" && x.check == "bm25.idf"), f2.toString)
    // meta drift: n_docs below the distinct posting ids is impossible
    val u3 = tmp(); Bm25.fit(docs, u3)
    rewrite(s"$u3/meta") {
      case Seq(Row(n: Long, a: Double, t: Long)) => Seq(Row(n - 10L, a, t))
    }
    val f3 = TextDoctor.checkBm25(spark, u3)
    assert(f3.exists(x => x.severity == "error" && x.check == "bm25.meta"), f3.toString)
    // tf corruption: a doc whose term frequencies no longer sum to dl
    val u4 = tmp(); Bm25.fit(docs, u4)
    rewrite(s"$u4/postings") { rows =>
      rows.head match { case Row(t, id, tf: Long, dl) =>
        Row(t, id, tf + 1L, dl) +: rows.tail }
    }
    val f4 = TextDoctor.checkBm25(spark, u4)
    assert(f4.exists(x => x.severity == "error" && x.check == "bm25.postings" &&
      x.detail.contains("sum to dl")), f4.toString)
  }

  test("seeded LM and DSIR corruptions surface as named findings") {
    import graft.text.{Dsir, LangModel, TextDoctor}
    import org.apache.spark.sql.Row
    val l = tmp(); LangModel.trainCharTrigram(docs.where(col("lang") === "en"), l)
    // a context vanishing from model2 breaks unseen-char scoring
    val victim = spark.read.parquet(s"$l/model2").head().getString(0)
    rewrite(s"$l/model2")(_.filterNot(_.getString(0) == victim))
    val fl = TextDoctor.checkLangModel(spark, l)
    assert(fl.exists(x => x.severity == "error" && x.check == "lm.model2"), fl.toString)
    // a positive log-prob is impossible under smoothing
    val l2 = tmp(); LangModel.trainCharTrigram(docs.where(col("lang") === "en"), l2)
    rewrite(s"$l2/model3") { rows =>
      rows.head match { case Row(g, c, lp: Long) => Row(g, c, -lp) +: rows.tail }
    }
    val fl2 = TextDoctor.checkLangModel(spark, l2)
    assert(fl2.exists(x => x.severity == "error" && x.check == "lm.model3"), fl2.toString)
    // DSIR: a dropped bucket breaks the dense-model contract scoring relies on
    val d = tmp(); Dsir.fit(docs, col("lang") === "en", d)
    rewrite(s"$d/model")(_.filterNot(_.getLong(0) == 7L))
    val fd = TextDoctor.checkDsir(spark, d)
    assert(fd.exists(x => x.severity == "error" && x.check == "dsir.model"), fd.toString)
    // DSIR meta: n_raw below n_target is impossible (target ⊆ raw)
    val d2 = tmp(); Dsir.fit(docs, col("lang") === "en", d2)
    rewrite(s"$d2/meta") {
      case Seq(Row(nt: Long, nr: Long, b: Int)) => Seq(Row(nr + 1L, nt, b))
    }
    val fd2 = TextDoctor.checkDsir(spark, d2)
    assert(fd2.exists(x => x.severity == "error" && x.check == "dsir.meta"), fd2.toString)
  }

  test("a truncated text table is a finding, not a stack trace") {
    import graft.text.{Bm25, TextDoctor}
    val u = tmp(); Bm25.fit(docs, u)
    new java.io.File(s"$u/idf").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val ch = java.nio.channels.FileChannel.open(f.toPath,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.truncate(math.max(0, f.length() - 16)) finally ch.close()
      }
    val f = TextDoctor.checkBm25(spark, u)
    assert(f.exists(x => x.severity == "error" && x.check == "bm25.idf" &&
      x.detail.contains("unreadable")), f.toString)
    // the other tables were still checked (no cascade abort)
    assert(f.forall(x => x.check.startsWith("bm25.")), f.toString)
  }
}
