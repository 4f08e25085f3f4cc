package graft.objects

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** End-to-end coverage of the subprocess encoder adapter against a real
  * external process: a vendored dependency-free python3 encoder
  * (src/test/resources/graft-encoder/hash_encoder.py) speaking the
  * line-oriented base64→floats protocol. Covers the dims contract, process
  * reuse across embed calls, restart after the process dies, and a full
  * ObjectIndex build+query through the adapter (the reference's
  * model-backed path, embeddings/sentence_transformers_embedding.py —
  * model swapped for a deterministic stand-in, process plumbing real). */
class SubprocessEmbeddingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Dims = 16

  private def scriptPath: String =
    Paths.get(getClass.getResource("/graft-encoder/hash_encoder.py").toURI).toString

  private def command(dims: Int = Dims): Seq[String] =
    Seq("python3", scriptPath, dims.toString)

  test("encoder protocol round-trip: deterministic, dims-correct, unit-norm") {
    val emb = new SubprocessEmbedding(command(), Dims)
    emb.init()
    val out = emb.embed(Iterator((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta"))).toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    assert(out.forall(_._3.length === Dims))
    assert(out(0)._3.toSeq === out(1)._3.toSeq, "same text must encode identically")
    assert(out(0)._3.toSeq !== out(2)._3.toSeq)
    val norm = math.sqrt(out(0)._3.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // empty text is a legal request (base64("") = empty LINE) and must get
    // a response — a skipped reply would desync the protocol and hang the
    // next encode forever
    val empty = emb.embed(Iterator((4L, ""), (5L, "after empty"))).toSeq
    assert(empty.map(_._1) === Seq(4L, 5L))
    assert(empty(0)._3.forall(_ == 0.0f))
    assert(empty(1)._3.length === Dims)
  }

  test("one process per (executor, command), reused across embed calls") {
    val cmd = command()
    val first = SubprocessEmbedding.ensure(cmd)
    new SubprocessEmbedding(cmd, Dims).embed(Iterator((1L, "x"))).toSeq
    new SubprocessEmbedding(cmd, Dims).embed(Iterator((2L, "y"))).toSeq
    assert(SubprocessEmbedding.ensure(cmd) eq first,
      "embed calls must reuse the live encoder, not respawn it")
  }

  test("a dead encoder is evicted and the next call restarts it") {
    val cmd = command()
    val emb = new SubprocessEmbedding(cmd, Dims)
    val before = SubprocessEmbedding.ensure(cmd)
    // the magic input makes the script exit; the in-flight encode fails
    val died = intercept[IllegalArgumentException] {
      emb.embed(Iterator((1L, "__die__"))).toSeq
    }
    assert(died.getMessage.contains("encoder"))
    // wait out the asynchronous process death before the retry
    var waited = 0
    while (before.alive && waited < 5000) { Thread.sleep(50); waited += 50 }
    assert(!before.alive)
    // a retry (fresh embed call, as a Spark task retry would issue) works
    val retried = emb.embed(Iterator((2L, "hello world"))).toSeq
    assert(retried.head._3.length === Dims)
    assert(!(SubprocessEmbedding.ensure(cmd) eq before), "dead encoder must be evicted")
  }

  test("dims contract: adapter refuses an encoder emitting the wrong width") {
    val emb = new SubprocessEmbedding(command(dims = 8), Dims) // script emits 8, adapter wants 16
    val e = intercept[IllegalArgumentException] {
      emb.embed(Iterator((1L, "hello"))).toSeq
    }
    assert(e.getMessage.contains("dims"))
  }

  test("ObjectIndex builds and queries through the subprocess encoder end-to-end") {
    import spark.implicits._
    val uri = Files.createTempDirectory("graft_subproc_idx").toString
    val reader = new DocumentsTableReader(sf0001)
    val idx = ObjectIndex.create(spark, uri,
      reader, new SubprocessEmbedding(command(64), 64), timestamp = 1000L)
    val queries = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    val hits = idx.query(queries, k = 3, nprobe = 1 << 30)
    val top1 = hits.where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) / 1000 === q,
        s"query $q should retrieve its own doc's chunk first through the encoder")
    }
  }
}
