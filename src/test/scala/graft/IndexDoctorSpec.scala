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
    assert(f2.exists(x => x.severity == "error" && x.check == "base.v=1000" &&
      x.detail.contains("row count")), f2.toString)
  }
}
