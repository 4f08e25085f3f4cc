package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Dsir, Fnv64Public}

/** DSIR importance selection ([[graft.text.Dsir]]): feature extraction,
  * model shape, score direction, and the deterministic top-slice. */
class DsirSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  private lazy val uri: String = {
    val u = Files.createTempDirectory("graft_dsir").toString
    Dsir.fit(docs, col("lang") === "en", u)
    u
  }

  test("bigram bucket counts match a naive FNV recompute") {
    import spark.implicits._
    val text = "The quick  brown fox\tjumps over the LAZY dog"
    val got = Seq(Tuple1(text)).toDF("text")
      .select(explode(org.apache.spark.sql.graftshim.toColumn(
        graft.text.BigramBucketCounts(
          org.apache.spark.sql.graftshim.toExpression(col("text")), 4096))))
      .select("col.bucket", "col.cnt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = text.toLowerCase.trim.split("\\s+")
    val naive = toks.sliding(2).toSeq
      .map(p => java.lang.Long.remainderUnsigned(
        Fnv64Public.hash(p(0) + " " + p(1)), 4096L))
      .groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    assert(got == naive)
    assert(got.values.sum == toks.length - 1)
  }

  test("model is dense over the feature space and finite") {
    val m = spark.read.parquet(s"$uri/model")
    assert(m.count() == Dsir.DefaultBuckets)
    assert(m.select(countDistinct("bucket")).head().getLong(0) == Dsir.DefaultBuckets)
    // unseen-everywhere buckets carry the constant smoothing ratio
    val meta = spark.read.parquet(s"$uri/meta").head()
    val (nt, nr) = (meta.getLong(0), meta.getLong(1))
    val expect = math.round(
      (math.log(1.0 / (nt.toDouble + 4096)) -
        math.log(1.0 / (nr.toDouble + 4096))) * 1e6)
    val zeroW = m.join(
        spark.read.parquet(s"$uri/model").select("bucket"), Seq("bucket"))
      .agg(max("logw_micro")).head().getLong(0)
    assert(zeroW == expect, "an unseen bucket must hold ln((nr+B)/(nt+B)) " +
      "(raw ⊇ target, so it is the maximal weight)")
  }

  test("target-language documents score higher on average") {
    val scored = Dsir.score(docs, uri)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .where(col("n_bigrams") > 0)
      .withColumn("avg_w", col("score_micro").cast("double") / col("n_bigrams"))
    val byLang = scored.groupBy("lang").agg(avg("avg_w")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = byLang.filterNot(_._1 == "en").values
    assert(others.forall(_ < byLang("en")),
      s"en must out-score every non-target language: $byLang")
  }

  test("top-slice selection keeps exactly ceil(n*permille/1000) documents") {
    val out = Dsir.select(docs, uri, keepPermille = 200).cache()
    val n = out.count()
    val m = (n * 200 + 999) / 1000
    assert(out.where(col("selected")).count() == m)
    // deterministic: re-running the selection flags the same set
    val again = Dsir.select(docs, uri, keepPermille = 200)
      .where(col("selected")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val first = out.where(col("selected")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == first)
    out.unpersist()
  }
}
