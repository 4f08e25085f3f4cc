package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bm25

/** BM25 retrieval ([[graft.text.Bm25]]): idf shape, score direction,
  * self-retrieval, and determinism. */
class Bm25Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  private lazy val uri: String = {
    val u = Files.createTempDirectory("graft_bm25").toString
    Bm25.fit(docs, u)
    u
  }

  test("idf is positive and decreases with document frequency") {
    val idf = spark.read.parquet(s"$uri/idf")
      .select("df", "idf_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(idf.forall(_._2 > 0), "Lucene idf variant is strictly positive")
    val byDf = idf.groupBy(_._1).map { case (d, g) => d -> g.map(_._2).toSet }
    assert(byDf.values.forall(_.size == 1), "idf is a function of df alone")
    val sorted = byDf.toSeq.sortBy(_._1).map(_._2.head)
    assert(sorted == sorted.sorted.reverse, "higher df must mean lower idf")
  }

  test("every query document retrieves itself in its own top-k") {
    // rank 1 is NOT guaranteed (a near-duplicate with higher tf of the
    // query's terms can legitimately outscore the query itself — the
    // fixture contains such a pair), but the self-match shares every term
    // at full tf and must land in the shortlist
    val hits = Bm25.topk(docs, docs.where(col("doc_id") < 5), 10, uri)
      .select("qid", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    (0L until 5L).foreach { q =>
      assert(hits(q).contains(q), s"query $q missing from its own top-10: ${hits(q)}")
    }
  }

  test("adding a rare query term boosts only documents containing it") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta zzzrare"),
      (2L, "delta epsilon zeta"),
      (3L, "zzzrare alpha beta")).toDF("doc_id", "text")
    val u = Files.createTempDirectory("graft_bm25_toy").toString
    Bm25.fit(corpus, u)
    val q = Seq((100L, "zzzrare")).toDF("doc_id", "text")
    val hits = Bm25.topk(corpus, q, 10, u)
      .select("id", "score_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(1L, 3L), "only docs containing the term score")
    assert(hits(3L) > hits(1L) || hits(3L) == hits(1L),
      "equal tf; shorter/equal dl must not lose") // dl equal here: scores tie
    assert(hits(1L) == hits(3L), "identical tf and dl ⇒ identical integer score")
  }

  test("indexed serving equals ad-hoc scoring, on and off the pushdown gate") {
    val q = docs.where(col("doc_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "score_micro", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val adhoc = rows(Bm25.topk(docs, q, 10, uri))
    assert(rows(Bm25.topkIndexed(spark, q, 10, uri)) == adhoc)
    spark.conf.set(Bm25.MaxPushdownTermsKey, "1") // force the join fallback
    try assert(rows(Bm25.topkIndexed(spark, q, 10, uri)) == adhoc)
    finally spark.conf.unset(Bm25.MaxPushdownTermsKey)
  }

  test("fit(A) + append(B) serves identically to fit(A ∪ B)") {
    val a = docs.where(col("doc_id") < 25)
    val b = docs.where(col("doc_id") >= 25 && col("doc_id") < 50)
    val full = Files.createTempDirectory("graft_bm25_full").toString
    Bm25.fit(docs.where(col("doc_id") < 50), full)
    val inc = Files.createTempDirectory("graft_bm25_inc").toString
    Bm25.fit(a, inc)
    Bm25.append(b, inc)
    // model tables agree exactly (idf micro-nats and meta doubles)
    def idf(u: String) = spark.read.parquet(s"$u/idf")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(idf(inc) == idf(full))
    assert(spark.read.parquet(s"$inc/meta").head() ==
      spark.read.parquet(s"$full/meta").head())
    // and so does the served ranking
    val q = docs.where(col("doc_id") < 3)
    def rows(u: String) = Bm25.topkIndexed(spark, q, 10, u)
      .select("qid", "id", "score_micro", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(rows(inc) == rows(full))
  }

  test("max-score pruning is exact on a stop-word-skewed corpus") {
    import spark.implicits._
    // inject a stop word into EVERY document: its posting run is the whole
    // corpus, the worst case the df cap exists for
    val skew = docs.where(col("doc_id") < 80)
      .select(col("doc_id"), concat_ws(" ", lit("the"), col("text")).as("text"))
    val u = Files.createTempDirectory("graft_bm25_maxscore").toString
    Bm25.fit(skew, u)
    // queries: normal docs (stop word + content terms) plus one ALL-HOT
    // query ("the the the") that has no rare term to generate candidates
    // from and must fall back to full evaluation
    val q = skew.where(col("doc_id") < 4)
      .unionByName(Seq((900L, "the the the")).toDF("doc_id", "text"))
    def served(cap: Long): Set[(Long, Long, Long, Int)] = {
      spark.conf.set(Bm25.MaxScoreDfCapKey, cap.toString)
      try Bm25.topkIndexed(spark, q, 10, u)
        .select("qid", "id", "score_micro", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      finally spark.conf.unset(Bm25.MaxScoreDfCapKey)
    }
    val exact = served(0) // pruning disabled: the reference answer
    assert(exact.exists(_._1 == 900L), "the all-hot query must still answer")
    // cap 5: 'the' (df=80) is hot, content vocabulary mostly rare —
    // pruned candidates + hot bound (and fallback for qid 900)
    assert(served(5) === exact)
    // cap 1: nearly the whole vocabulary is hot — most queries fail the
    // bound and fall back; the union must still be exactly the answer
    assert(served(1) === exact)
    // cap above every df: nothing is hot, the pruned path degenerates to
    // the plain candidate evaluation
    assert(served(1000000) === exact)
  }

  test("append refuses a batch with already-indexed ids") {
    val u = Files.createTempDirectory("graft_bm25_dup").toString
    Bm25.fit(docs.where(col("doc_id") < 20), u)
    val before = spark.read.parquet(s"$u/postings").count()
    val e = intercept[IllegalArgumentException](
      Bm25.append(docs.where(col("doc_id") >= 15 && col("doc_id") < 25), u))
    assert(e.getMessage.contains("already indexed"))
    // the refusal happens BEFORE any postings write — the table is intact
    assert(spark.read.parquet(s"$u/postings").count() == before)
  }

  test("append: empty batch is a no-op, within-batch duplicates are refused") {
    val u = Files.createTempDirectory("graft_bm25_edge").toString
    Bm25.fit(docs.where(col("doc_id") < 20), u)
    val metaBefore = spark.read.parquet(s"$u/meta").head()
    val postingsBefore = spark.read.parquet(s"$u/postings").count()
    // empty batch: previously NPE'd on the null sum; must change nothing
    Bm25.append(docs.where(org.apache.spark.sql.functions.lit(false)), u)
    assert(spark.read.parquet(s"$u/meta").head() == metaBefore)
    assert(spark.read.parquet(s"$u/postings").count() == postingsBefore)
    // a batch repeating its own (all-new) ids must be refused BEFORE
    // writing — it would double-count postings just like a corpus dup
    val fresh = docs.where(col("doc_id") >= 20 && col("doc_id") < 25)
    val e = intercept[IllegalArgumentException](Bm25.append(fresh.union(fresh), u))
    assert(e.getMessage.contains("within itself"))
    assert(spark.read.parquet(s"$u/postings").count() == postingsBefore)
  }

  test("append onto a legacy meta (no total_dl) migrates and stays bit-identical") {
    val a = docs.where(col("doc_id") < 25)
    val b = docs.where(col("doc_id") >= 25 && col("doc_id") < 50)
    val full = Files.createTempDirectory("graft_bm25_leg_full").toString
    Bm25.fit(docs.where(col("doc_id") < 50), full)
    val inc = Files.createTempDirectory("graft_bm25_leg_inc").toString
    Bm25.fit(a, inc)
    // simulate a model written before total_dl existed
    val legacy = spark.read.parquet(s"$inc/meta").select("n_docs", "avgdl").collect()
    import spark.implicits._
    legacy.map(r => (r.getLong(0), r.getDouble(1))).toSeq.toDF("n_docs", "avgdl")
      .repartition(1).write.mode("overwrite").parquet(s"$inc/meta")
    Bm25.append(b, inc)
    // migrated meta persists the totals and matches the one-shot fit exactly
    assert(spark.read.parquet(s"$inc/meta").head() ==
      spark.read.parquet(s"$full/meta").head())
    def idf(u: String) = spark.read.parquet(s"$u/idf")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(idf(inc) == idf(full))
  }

  test("postings compaction preserves results and consolidates files") {
    val u = Files.createTempDirectory("graft_bm25_compact").toString
    Bm25.fit(docs.where(col("doc_id") < 20), u)
    for (lo <- 20 to 44 by 5)
      Bm25.append(docs.where(col("doc_id") >= lo && col("doc_id") < lo + 5), u)
    val q = docs.where(col("doc_id") < 3)
    def rows() = Bm25.topkIndexed(spark, q, 10, u)
      .select("qid", "id", "score_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def nFiles() = new java.io.File(s"$u/postings").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = rows()
    val filesBefore = nFiles()
    Bm25.compactPostings(spark, u)
    assert(rows() == before)
    assert(nFiles() < filesBefore,
      s"compaction should shrink the file count ($filesBefore -> ${nFiles()})")
  }

  test("serving snapshot: bit-equal scores and ranks at zero Spark jobs") {
    import graft.text.Bm25Server
    val server = Bm25Server.load(spark, uri)
    val q = docs.where(col("doc_id") < 5)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val dist = Bm25.topkIndexed(spark, docs.where(col("doc_id") < 5), 10, uri)
      .select("qid", "id", "score_micro", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getLong(2))).toSeq
      }
    q.foreach { case (qid, text) =>
      // identical ids, identical integer micro-scores, identical order —
      // the pinned double expression evaluated JVM-side must agree
      // bit-for-bit with the distributed plan
      assert(server.query(text, 10).toSeq === dist(qid), s"qid=$qid")
    }
    // unseen vocabulary scores nothing; empty/null text returns empty
    assert(server.query("zzzunseen qqqnever", 10).isEmpty)
    assert(server.query("   ", 10).isEmpty)
    assert(server.query(null, 10).isEmpty)
    // whitespace-semantics parity: Spark trim strips SPACES only, so a
    // query with a trailing newline tokenizes to [.., ""] on the
    // distributed path — the server must produce the same term set (the
    // toy corpus below gives the "" token a posting via an empty doc)
    import spark.implicits._
    val toy = Seq((0L, ""), (1L, "hello world"), (2L, "hello")).toDF("doc_id", "text")
    val tu = java.nio.file.Files.createTempDirectory("graft_bm25_ws").toString
    Bm25.fit(toy, tu)
    val toyServer = Bm25Server.load(spark, tu)
    val qNl = Seq((9L, "hello\n")).toDF("doc_id", "text")
    val distNl = Bm25.topkIndexed(spark, qNl, 10, tu)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(toyServer.query("hello\n", 10).toSeq === distNl,
      "trailing-newline tokenization must match the distributed split")
    assert(distNl.map(_._1).contains(0L),
      "fixture sanity: the empty doc scores via the empty token")
    // the serve gate refuses an over-budget postings table with sizing
    spark.conf.set(graft.index.LocalSearcher.MaxLocalServeBytesKey, "16")
    try {
      val e = intercept[IllegalArgumentException](Bm25Server.load(spark, uri))
      assert(e.getMessage.contains("maxLocalServeBytes"))
    } finally spark.conf.unset(graft.index.LocalSearcher.MaxLocalServeBytesKey)
  }

  test("ranking is deterministic across runs") {
    val a = Bm25.topk(docs, docs.where(col("doc_id") < 5), 10, uri)
      .select("qid", "rank", "id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Bm25.topk(docs, docs.where(col("doc_id") < 5), 10, uri)
      .select("qid", "rank", "id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
