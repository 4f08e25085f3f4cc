package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.LangModel

class LangModelSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  private lazy val modelUri = {
    val uri = Files.createTempDirectory("graft_lm").toString
    LangModel.trainCharTrigram(docs.where(col("lang") === "en"), uri)
    uri
  }

  test("trigram extraction: sliding, lowercased, empty under 3 chars") {
    import spark.implicits._
    val rows = Seq("AbCd", "ab", "", "日本語です").toDF("text")
      .select(LangModel.trigramArray(col("text"))).collect()
      .map(_.getSeq[String](0))
    assert(rows(0) === Seq("abc", "bcd"))
    assert(rows(1) === Seq.empty)
    assert(rows(2) === Seq.empty)
    assert(rows(3) === Seq("日本語", "本語で", "語です"))
  }

  test("smoothed conditional probabilities sum to ~1 per context") {
    import spark.implicits._
    val m3 = spark.read.parquet(s"$modelUri/model3")
    val v = spark.read.parquet(s"$modelUri/meta").head().getLong(0)
    // per context: sum over SEEN thirds of p + (V - seen) * p_unseen == 1
    val m2 = spark.read.parquet(s"$modelUri/model2")
    val sums = m3.groupBy("ctx")
      .agg(sum(exp(col("logp_micro").cast("double") / 1e6)).as("seen_p"),
        count(lit(1)).as("n_seen"))
      .join(m2, "ctx")
      .select((col("seen_p") +
        (lit(v) - col("n_seen")) * exp(col("unseen_logp_micro").cast("double") / 1e6))
        .as("total"))
      .as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(t => assert(math.abs(t - 1.0) < 1e-3, s"context mass $t"))
  }

  test("corpus text scores far above junk under the trained model") {
    import spark.implicits._
    // the fixture's langs all share one ASCII vocabulary (labels only), so
    // the discrimination check is corpus-vs-junk, the filter's actual job
    val corpusAvg = LangModel.scoreDocs(docs, modelUri)
      .agg(avg("avg_logp")).head().getDouble(0)
    val junk = Seq((1L, "zq xj qv kz jx vq zk qj xz vk " * 8)).toDF("doc_id", "text")
    val junkScore = LangModel.scoreDocs(junk, modelUri).head().getDouble(3)
    assert(corpusAvg > junkScore + 1.0,
      s"corpus $corpusAvg should clearly beat junk $junkScore")
  }

  test("unseen context falls back to the persisted ln(1/V) constant") {
    import spark.implicits._
    val logp0 = spark.read.parquet(s"$modelUri/meta").head().getLong(1)
    val weird = Seq((1L, "\u00a7\u00b6\u2020")).toDF("doc_id", "text")
    val row = LangModel.scoreDocs(weird, modelUri).head()
    assert(row.getLong(1) === 1L) // one trigram
    assert(row.getLong(2) === logp0)
  }

  test("char_trigram_counts equals the trigramArray multiset on real docs") {
    import spark.implicits._
    graft.functions.registerAll(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val viaArray = docs.select(col("doc_id"),
        explode(LangModel.trigramArray(col("text"))).as("gram"))
      .groupBy("doc_id", "gram").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaCounts = docs.selectExpr("doc_id", "char_trigram_counts(text) AS gc")
      .select(col("doc_id"), explode(col("gc")).as("g"))
      .select(col("doc_id"), col("g.gram"), col("g.cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaCounts === viaArray)
  }

  test("ccnet buckets: per-language thirds, head beats tail, no-gram docs null") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = LangModel.ccnetBuckets(docs, modelUri).cache()
    assert(out.count() === docs.count())
    // per-language bucket sizes differ by at most 1 (floor split)
    val sizes = out.where(col("ppl_bucket").isNotNull)
      .groupBy("lang", "ppl_bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach(r => assert(r.getLong(1) <= 1, s"uneven split: $r"))
    // the head bucket's mean log-prob strictly beats the tail's, per lang
    val scored = LangModel.scoreDocs(docs, modelUri).join(out, "doc_id")
    val byBucket = scored.where(col("ppl_bucket").isNotNull)
      .groupBy("lang", "ppl_bucket").agg(avg("avg_logp").as("m"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    byBucket.keys.map(_._1).toSet.foreach { (lang: String) =>
      assert(byBucket((lang, 0)) > byBucket((lang, 2)),
        s"$lang head should out-score tail")
    }
    // driver-side replica: rank per lang by (avg_logp desc, id), floor split
    val perp = LangModel.scoreDocs(docs, modelUri)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .where(col("avg_logp").isNotNull)
      .select("doc_id", "lang", "avg_logp")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = perp.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy { case (id, _, lp) => (-lp, id) }
      val n = ordered.length
      ordered.zipWithIndex.map { case ((id, _, _), r) => id -> (r * 3 / n) }
    }.toMap
    val got = out.where(col("ppl_bucket").isNotNull)
      .select("doc_id", "ppl_bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expected)
  }

  test("scoring keeps every input document (left-outer, zero-gram nulls)") {
    import spark.implicits._
    val tiny = Seq((1L, "hello world"), (2L, "ab")).toDF("doc_id", "text")
    val out = LangModel.scoreDocs(tiny, modelUri).orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(1).getLong(1) === 0L)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
  }
}
