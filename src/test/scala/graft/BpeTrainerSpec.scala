package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.BpeTrainer

class BpeTrainerSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("merge chain on a hand-derived corpus, with early stop when no pairs remain") {
    // words: aaab x2, ab x1. Pair counts round 1: (a a)=4, (a b)=3
    // -> merge "a a"; round 2: (a b)=3 beats (aa a)=2 -> "a b";
    // round 3: (aa ab)=2 -> "aa ab"; round 4: single symbols only -> stop.
    val docsDf = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docsDf, numMerges = 10)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    assert(merges === Seq(
      (1, "a a", "aa"), (2, "a b", "ab"), (3, "aa ab", "aaab")))
  }

  test("leftmost non-overlapping application: aaa segments as [aa, a]") {
    val docsDf = Seq((1L, "aaa aaa aa")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docsDf, numMerges = 1)
      .as[(Int, String, String)].collect()
    assert(merges.head._2 === "a a")
    val counts = BpeTrainer.encodeTokenCounts(docsDf, Seq(("a a", "aa")))
      .as[(Long, Long)].collect().toMap
    // aaa -> "aa a" (2 tokens) x2, aa -> "aa" (1 token): 5 total
    assert(counts(1L) === 5L)
  }

  test("training is case-folding, [a-z]-scoped, and deterministic under repartition") {
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = BpeTrainer.train(docsDf, 6).orderBy("rank")
      .as[(Int, String, String)].collect().toSeq
    val b = BpeTrainer.train(docsDf.repartition(13), 6).orderBy("rank")
      .as[(Int, String, String)].collect().toSeq
    assert(a === b, "merge chain must not depend on physical partitioning")
    assert(a.length === 6)
    a.foreach { case (_, pair, merged) =>
      assert(pair.matches("[a-z]+ [a-z]+"), s"symbols stay lowercase ascii: '$pair'")
      assert(merged === pair.replace(" ", ""))
    }
  }

  test("encode reproduces the training segmentation and shrinks with more merges") {
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet").limit(50).cache()
    val merges = BpeTrainer.train(docsDf, 12).orderBy("rank")
      .as[(Int, String, String)].collect().map(m => (m._2, m._3)).toSeq
    val few = BpeTrainer.encodeTokenCounts(docsDf, merges.take(2))
      .agg(sum("n_bpe_tokens")).as[Long].head()
    val many = BpeTrainer.encodeTokenCounts(docsDf, merges)
      .agg(sum("n_bpe_tokens")).as[Long].head()
    assert(many <= few, s"more merges cannot grow the token count ($few -> $many)")
    // character upper bound: zero merges = one token per character
    val chars = docsDf
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))))
      .select(sum(length(col("col")))).as[Long].head()
    assert(few <= chars)
  }

  test("vocabulary gate refuses an over-budget corpus with a named error") {
    val docsDf = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    spark.conf.set(BpeTrainer.MaxVocabKey, "3")
    try {
      val e = intercept[IllegalArgumentException](BpeTrainer.train(docsDf, 2))
      assert(e.getMessage.contains(BpeTrainer.MaxVocabKey))
    } finally spark.conf.unset(BpeTrainer.MaxVocabKey)
  }

  test("trainTopV bounds the training vocabulary deterministically") {
    // 'zz' appears 3x, 'ab' 2x, 'cd' 1x: topV=2 trains on {zz, ab} only,
    // so the first merge must come from those words
    val docsDf = Seq((1L, "zz zz zz ab ab cd")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainTopV(docsDf, numMerges = 2, topV = 2)
      .as[(Int, String, String)].collect().toSeq
    assert(merges.map(_._2).toSet === Set("z z", "a b"))
    assert(merges.head._2 === "z z", "most frequent pair merges first")
  }

  test("rank-greedy kernel expression segments exactly like the replace chain") {
    // the production path (one codegen'd call, scales to 32k merges) must
    // reproduce the chain form: one consumed-boundary pass per rank, in
    // rank order, never revisiting an applied rank (repeat-pair cases are
    // pinned by the dedicated test below)
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet").cache()
    val merges = BpeTrainer.train(docsDf, 24).orderBy("rank")
      .as[(Int, String, String)].collect().map(m => (m._2, m._3)).toSeq
    val chain = BpeTrainer.encodeTokenCounts(docsDf, merges)
      .as[(Long, Long)].collect().toMap
    val fast = BpeTrainer.encodeTokenCountsFast(docsDf, merges)
      .as[(Long, Long)].collect().toMap
    // the chain drops wordless docs (explode contract); the kernel emits
    // them with count 0 — compare on the chain's domain and pin the rest
    chain.foreach { case (id, n) =>
      assert(fast(id) === n, s"doc $id: kernel ${fast(id)} vs chain $n")
    }
    (fast.keySet -- chain.keySet).foreach { id =>
      assert(fast(id) === 0L, s"wordless doc $id must count 0 in the kernel path")
    }
    // interpreted eval agrees with codegen (both paths of the expression)
    val one = docsDf.limit(20)
    val interp = BpeTrainer.encodeTokenCountsFast(one, merges)
      .where(expr("n_bpe_tokens IS NOT NULL")).collect().map(_.getLong(1)).sorted.toSeq
    assert(interp.nonEmpty)
  }

  test("kernel replicates chain semantics on repeat-pair words (consumed boundary)") {
    // String.replace consumes the shared boundary space: adjacent repeats
    // of a merged pair merge only once per pass and an already-applied
    // rank is never revisited. These words are exactly where a greedy
    // merge-to-exhaustion kernel would diverge from the chain:
    //   banana + (a n):       " b an a n a "  -> 5 tokens, NOT [b,an,an,a]
    //   papa   + (p a):       " pa p a "      -> 3 tokens, NOT [pa,pa]
    //   aaaa   + (a a):       " aa a a "      -> 3 tokens, NOT [aa,aa]
    //   banana + (a n)(an a): " b ana n a "   -> 4 tokens (rank 2 builds
    //                         on rank 1's output, leftovers still final)
    val cases = Seq(
      ("banana", Seq(("a n", "an")), 5L),
      ("papa", Seq(("p a", "pa")), 3L),
      ("aaaa", Seq(("a a", "aa")), 3L),
      ("banana", Seq(("a n", "an"), ("an a", "ana")), 4L))
    cases.zipWithIndex.foreach { case ((word, merges, want), i) =>
      val one = Seq((i.toLong, word)).toDF("doc_id", "text")
      val chain = BpeTrainer.encodeTokenCounts(one, merges).as[(Long, Long)].head()._2
      val fast = BpeTrainer.encodeTokenCountsFast(one, merges).as[(Long, Long)].head()._2
      assert(chain === want, s"'$word' chain: got $chain, want $want")
      assert(fast === want, s"'$word' kernel: got $fast, want chain's $want")
      // and the id export segments identically (ids sum to the same count)
      val nIds = BpeTrainer.encodeIds(one, merges).count()
      assert(nIds === want, s"'$word' id export: got $nIds ids, want $want")
    }
  }

  test("rank-greedy kernel at a vocabulary scale the chain cannot codegen") {
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet")
    val merges = BpeTrainer.train(docsDf, 256).orderBy("rank")
      .as[(Int, String, String)].collect().map(m => (m._2, m._3)).toSeq
    // the synthetic corpus's vocabulary exhausts before 256 (every word
    // collapses to one symbol and training stops early — measured 88
    // here); what matters is the kernel handling a table far past what
    // a replace chain could codegen
    assert(merges.length >= 64, s"expected a deep merge chain, got ${merges.length}")
    val total = BpeTrainer.encodeTokenCountsFast(docsDf, merges)
      .agg(sum("n_bpe_tokens")).as[Long].head()
    val chars = docsDf
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))))
      .select(sum(length(col("col")))).as[Long].head()
    assert(total > 0 && total < chars,
      s"256 merges must compress below the per-char count ($total vs $chars)")
  }

  test("token-id export: ids agree with segment counts and the vocabulary contract") {
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet").limit(80).cache()
    val merges = BpeTrainer.train(docsDf, 16).orderBy("rank")
      .as[(Int, String, String)].collect().map(m => (m._2, m._3)).toSeq
    val ids = BpeTrainer.encodeIds(docsDf, merges).cache()
    // per-doc id count == the kernel's token count
    val byDoc = ids.groupBy("doc_id").count()
    val counts = BpeTrainer.encodeTokenCountsFast(docsDf, merges)
      .where(col("n_bpe_tokens") > 0)
    val joined = byDoc.join(counts, "doc_id")
      .where(col("count") =!= col("n_bpe_tokens")).count()
    assert(joined === 0L, "id-count must equal token-count per document")
    // id space: 0..25 are chars, 26..26+merges-1 are merge outputs; every
    // merge that fires appears, nothing outside the vocab does
    val distinctIds = ids.select("token_id").distinct().as[Int].collect().toSet
    assert(distinctIds.forall(id => id >= 0 && id < 26 + merges.length))
    // positions are dense 0..n-1 per doc
    val posOk = ids.groupBy("doc_id")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(posOk === 0L, "positions must be dense per document")
    // decode roundtrip: ids map back to symbol strings whose concatenation
    // is the doc's lowercase [a-z] mass, order preserved
    val vocab = (('a' to 'z').map(_.toString) ++ merges.map(_._2)).toArray
    val rebuilt = ids.orderBy("doc_id", "pos").collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(r => vocab(r.getInt(2))).mkString }
    val expect = docsDf.select(col("doc_id"),
        concat_ws("", regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rebuilt.foreach { case (d, s) =>
      assert(s === expect(d), s"doc $d must decode back to its letter mass")
    }
    // ambiguous vocabularies are refused at construction
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.encodeIds(docsDf, Seq(("a b", "ab"), ("ab", "ab"))).collect()
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("byte-level trainer: GPT-2-style pretokens, UTF-8 hex symbols, non-ASCII real") {
    // "aa aa aa" pretokenizes to ["aa", " aa", " aa"] (leading space
    // attaches to words): pairs over hex symbols — ("61","61") appears
    // 3x inside the a-a boundary of each token, ("20","61") 2x.
    // First merge must be "61 61" (0x61 = 'a').
    val docsDf = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    val merges = graft.text.BpeTrainer.trainBytes(docsDf, 1)
      .as[(Int, String, String)].collect()
    assert(merges.head._2 === "61 61", merges.head.toString)
    // non-ASCII: ß = UTF-8 C3 9F; three times over makes (C3,9F) the
    // top pair — multi-byte characters train as their real bytes
    val uml = Seq((1L, "ß ß ß")).toDF("doc_id", "text")
    val m2 = graft.text.BpeTrainer.trainBytes(uml, 1).as[(Int, String, String)].collect()
    assert(m2.head._2 === "C3 9F", m2.head.toString)
    // case is preserved (byte mode sees raw text): "AB ab" yields
    // distinct pretokens, so byte 0x41 ('A') appears in the id stream
    val cased = Seq((1L, "AB AB AB ab")).toDF("doc_id", "text")
    val m3 = graft.text.BpeTrainer.trainBytes(cased, 1).as[(Int, String, String)].collect()
    assert(m3.head._2 === "41 42", m3.head.toString)
  }

  test("byte-level ids decode back to the exact original text, non-ASCII included") {
    val texts = Seq(
      (0L, "Hello, world! It's 42 degrees."),
      (1L, "café naïve 日本語 straße"),
      (2L, "  double  spaces\tand\nnewlines  "),
      (3L, "banana papa aaaa")) // repeat-pair words in byte space too
    val docsDf = texts.toDF("doc_id", "text")
    val merges = graft.text.BpeTrainer.trainBytes(docsDf, 12)
      .orderBy("rank").as[(Int, String, String)].collect()
      .map(m => (m._2, m._3)).toSeq
    val ids = graft.text.BpeTrainer.encodeIdsBytes(docsDf, merges)
      .orderBy("doc_id", "pos").as[(Long, Int, Int)].collect()
    // vocabulary: 0-255 raw bytes, 256+i = merge i's output hex
    val mergedBytes = merges.map { case (_, out) =>
      out.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray }
    val rebuilt = ids.groupBy(_._1).map { case (d, rs) =>
      val bytes = rs.sortBy(_._2).flatMap { case (_, _, id) =>
        if (id < 256) Array(id.toByte) else mergedBytes(id - 256) }
      d -> new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    texts.foreach { case (d, t) =>
      assert(rebuilt(d) === t, s"doc $d must decode back byte-exactly")
    }
    // the pretokenizer covers EVERY character (nothing dropped): id
    // count bytes == utf-8 length per doc after merges are expanded
    val posDense = graft.text.BpeTrainer.encodeIdsBytes(docsDf, merges)
      .groupBy("doc_id")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(posDense === 0L)
    // counts kernel agrees with the id stream length
    val counts = graft.text.BpeTrainer.encodeTokenCountsBytes(docsDf, merges)
      .as[(Long, Long)].collect().toMap
    ids.groupBy(_._1).foreach { case (d, rs) =>
      assert(counts(d) === rs.length.toLong, s"doc $d count vs ids")
    }
  }

  test("encode plan is a codegen'd expression chain: no UDF, no join, no window") {
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = BpeTrainer.encodeTokenCounts(docsDf,
        Seq(("e r", "er"), ("t h", "th"))).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "encode must not plan a UDF")
    assert(!plan.contains("Window"))
    assert(!plan.contains("Join"), "merges ride the plan as literals, not a join")
    // the chain is inline codegen'd expressions (AQE prints the pre-final
    // plan without its WholeStageCodegen spans, so assert the shape)
    assert(plan.contains("replace(replace(concat( , regexp_replace"),
      s"merges must compile to an inline sentinel-anchored replace chain: $plan")
    assert(plan.contains("partial_sum"), "token counts partial-aggregate map-side")
  }
}
