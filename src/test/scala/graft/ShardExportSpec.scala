package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.ShardExport

class ShardExportSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  private def export(numShards: Int = 4): String = {
    val uri = Files.createTempDirectory("graft_shard_export").toString
    ShardExport.write(docs, uri, numShards)
    uri
  }

  test("export covers the corpus exactly and fsck is clean") {
    import spark.implicits._
    val uri = export()
    val m = ShardExport.manifest(spark, uri)
    val rows = m.as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == docs.count(), "every document lands in exactly one shard")
    // the shard files themselves hold the corpus: same ids, no dup/drop
    val shardIds = spark.read.parquet(s"$uri/shards").select("doc_id")
    assert(shardIds.count() == docs.count())
    assert(shardIds.distinct().count() == docs.count())
    assert(ShardExport.fsck(spark, uri).isEmpty)
  }

  test("routing is deterministic: two exports produce identical manifests") {
    import spark.implicits._
    val a = ShardExport.manifest(spark, export())
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = ShardExport.manifest(spark, export())
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("append: write(A); append(B) serves the manifest of write(A ∪ B), fsck clean") {
    import spark.implicits._
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val incUri = Files.createTempDirectory("graft_shard_append").toString
    ShardExport.write(a, incUri, 4)
    ShardExport.append(b, incUri)
    val full = ShardExport.manifest(spark, export())
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val inc = ShardExport.manifest(spark, incUri)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(inc == full, "combined manifest must be bit-identical to a full export's")
    // the byte-level audit: appended files agree with the combined stats
    assert(ShardExport.fsck(spark, incUri).isEmpty)
    // empty batch: a no-op, manifest untouched
    ShardExport.append(b.where(lit(false)), incUri)
    assert(ShardExport.manifest(spark, incUri)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq == full)
  }

  test("append refuses duplicate ids — within the batch and vs the export") {
    import spark.implicits._
    val uri = export()
    val vsExport = intercept[IllegalArgumentException](
      ShardExport.append(docs.limit(1), uri))
    assert(vsExport.getMessage.contains("already exported"))
    // fixture mirrors the export's full schema — the schema guard runs first
    val inner = Seq(
      (900001L, "x y", "en", "web", 3L),
      (900001L, "z w", "en", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val within = intercept[IllegalArgumentException](ShardExport.append(inner, uri))
    assert(within.getMessage.contains("within itself"))
  }

  test("append refuses a batch whose schema differs from the export's") {
    import spark.implicits._
    val uri = export()
    val narrow = Seq((900001L, "x y")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](ShardExport.append(narrow, uri))
    assert(e.getMessage.contains("mix schemas"))
    // same names, different type (n_chars int vs the export's long)
    val retyped = Seq((900002L, "x y", "en", "web", 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e2 = intercept[IllegalArgumentException](ShardExport.append(retyped, uri))
    assert(e2.getMessage.contains("mix schemas"))
  }

  test("fsck reports a shard directory lost after export") {
    val uri = export()
    val dir = Paths.get(uri, "shards", "shard=0")
    assert(Files.exists(dir), "fixture should populate shard 0")
    Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach((p: Path) => Files.delete(p))
    val f = ShardExport.fsck(spark, uri)
    assert(f.exists(x => x.check == "shard=0" && x.detail.contains("no shard files")), f.toString)
  }

  test("fsck reports a file moved into the wrong shard (misrouted + drift)") {
    val uri = export()
    val src = Files.list(Paths.get(uri, "shards", "shard=0"))
      .filter((p: Path) => p.toString.endsWith(".parquet")).findFirst().get()
    Files.move(src, Paths.get(uri, "shards", "shard=1", "moved-" + src.getFileName.toString))
    val f = ShardExport.fsck(spark, uri)
    assert(f.exists(_.check == "routing"), f.toString)
    assert(f.exists(_.check == "shard=0"), f.toString) // stats drifted both sides
    assert(f.exists(_.check == "shard=1"), f.toString)
  }

  test("fsck reports a tampered manifest (silent drift protection)") {
    import spark.implicits._
    val uri = export()
    val rows = ShardExport.manifest(spark, uri)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    val tampered = rows.map(r => if (r._1 == 0) r.copy(_2 = r._2 + 1) else r)
    tampered.toDF("shard", "n_docs", "n_tokens", "content_sig", "id_lo", "id_hi")
      .repartition(1).write.mode("overwrite").parquet(s"$uri/manifest")
    val f = ShardExport.fsck(spark, uri)
    assert(f.exists(x => x.check == "shard=0" && x.detail.contains("drifted")), f.toString)
    assert(!f.exists(_.check == "routing"))
  }

  test("unreadable meta/shards surface as findings, not exceptions") {
    val uri = Files.createTempDirectory("graft_shard_export_bad").toString
    val f = ShardExport.fsck(spark, uri)
    assert(f.exists(_.check == "meta"), f.toString)
  }
}
