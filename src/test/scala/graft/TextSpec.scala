package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Dedup, TextOps}

class TextSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("normalizeText: NFC composes, invisibles strip, newlines unify, whitespace collapses") {
    import spark.implicits._
    val in = Seq(
      (1L, "cafe\u0301"),                       // decomposed -> precomposed
      (2L, "a\u200Bb\u200Cc\u200Dd\uFEFFe"), // zero-widths vanish
      (3L, "x\u0000y\u0007z"),                 // C0 controls vanish
      (4L, "line1\r\nline2\rline3\n"),       // CRLF and CR -> LF
      (5L, "  a \t\t b\tc  "),                // runs collapse, ends trim
      (6L, "\uAC00 \u1100\u1161"),            // Hangul jamo compose to a syllable
      (7L, null.asInstanceOf[String]))
    val out = in.toDF("id", "t")
      .select(col("id"), graft.text.TextOps.normalizeText(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) === "caf\u00E9")
    assert(out(2L) === "abcde")
    assert(out(3L) === "xyz")
    assert(out(4L) === "line1\nline2\nline3")
    assert(out(5L) === "a b c")
    assert(out(6L) === "\uAC00 \uAC00", "decomposed jamo must compose to the same syllable")
    assert(out(7L) === null, "null text stays null")
    // idempotence: normalize(normalize(x)) == normalize(x)
    val once = in.toDF("id", "t")
      .select(col("id"), graft.text.TextOps.normalizeText(col("t")).as("n"))
    val twice = once.select(col("id"),
      graft.text.TextOps.normalizeText(col("n")).as("n"))
    assert(once.collect().map(_.toSeq).toSeq === twice.collect().map(_.toSeq).toSeq)
  }

  test("minhash LSH finds exactly the exact-jaccard pairs at tau=0.8") {
    import spark.implicits._
    val viaLsh = Dedup.minhashLshPairs(docs, 0.8)
      .as[(Long, Long)].collect().toSet
    val sets = docs.select(col("doc_id"), TextOps.shingleSet(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val exact = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble if j >= 0.8
    } yield (ia, ib)).toSet
    assert(viaLsh === exact)
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("LSH hot-bucket cap drops over-cap buckets (anti-join path)") {
    import spark.implicits._
    // cap=1: every bucket holding a candidate pair is over cap -> no pairs
    val capped = Dedup.minhashLshPairs(docs, 0.8, maxBucketSize = 1)
      .as[(Long, Long)].collect()
    assert(capped.isEmpty)
  }

  test("ngram-jaccard refuses oversized blocks (quadratic guard)") {
    import spark.implicits._
    val labeled = docs.withColumn("lang", lit("en"))
    spark.conf.set(Dedup.MaxNgramBlockRowsKey, "100") // fixture block is 500
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.ngramJaccardPairs(labeled, 0.8, blockCols = Seq("lang")).collect()
      }
      assert(e.getMessage.contains("quadratic") &&
        e.getMessage.contains("minhashLshPairs"), e.getMessage)
    } finally spark.conf.unset(Dedup.MaxNgramBlockRowsKey)
    // under the cap the operator runs as before
    assert(Dedup.ngramJaccardPairs(labeled, 0.8, blockCols = Seq("lang"))
      .as[(Long, Long)].collect().nonEmpty)
  }

  test("token-budget mixture keeps the funded prefix per bucket") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a", "one two three"),            // 3 tokens, cum 3
      (2L, "a", "four five six seven"),      // 4 tokens, cum 7 (crosses 6)
      (3L, "a", "eight nine"),               // prefix spent: out
      (10L, "b", "x y z w v u t s")          // 8 tokens, crosses alone: in
    ).toDF("doc_id", "src", "text")
    val kept = TextOps.sampleByTokenBudget(corpus, tokenBudget = 6,
        bucketCols = Seq("src"), orderCol = col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    // doc 2 crosses the budget but its prefix was funded -> kept; doc 3's
    // budget was spent before it -> out; bucket b's first doc always in
    assert(kept === Seq(1L, 2L, 10L))
    // determinism: same priority order -> same sample
    val again = TextOps.sampleByTokenBudget(corpus, 6, Seq("src"), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === kept)
  }

  test("temperature mixture: sqrt-flattened shares, epoch repeats, partial pass") {
    import spark.implicits._
    // group a: 900 tokens (9 docs × 100), group b: 100 tokens (1 doc).
    // weights = floor(sqrt): 30 and 10; shares = 750000 / 250000 ppm.
    // budget 2000 → targets 1500 and 500:
    //   a: 1500 DIV 900 = 1 full epoch, partial budget 600 → docs with
    //      cum_before < 600 (the first 6 of 9) are in the partial pass
    //   b: 500 DIV 100 = 5 full epochs, partial budget 0 → no partial
    val hundred = Seq.fill(100)("w").mkString(" ")
    val corpus = ((1L to 9L).map(i => (i, "a", hundred)) :+ ((10L, "b", hundred)))
      .toDF("doc_id", "grp", "text")
    val out = TextOps.mixTemperature(corpus, totalTokenBudget = 2000L,
        groupCol = "grp")
      .select("doc_id", "grp", "n_tokens", "share_ppm", "n_epochs", "kept_partial")
      .as[(Long, String, Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(out.length === 10)
    val a = out.filter(_._2 == "a")
    assert(a.forall(r => r._3 == 100L && r._4 == 750000L && r._5 == 1L))
    assert(a.map(r => r._1 -> r._6).toMap ===
      (1L to 9L).map(i => i -> (if (i <= 6) 1 else 0)).toMap)
    val b = out.filter(_._2 == "b")
    assert(b === Array((10L, "b", 100L, 250000L, 5L, 0)))
    // low-resource upsampling is the point: b holds 10% of the corpus but
    // sqrt flattening funds it 25% of the budget (5 epochs vs 1)

    // NULL groups are excluded from output AND allocation (their weight
    // must not strand budget share): same corpus plus a null-group doc
    // yields identical rows
    val withNull = corpus.unionByName(
      Seq((99L, null.asInstanceOf[String], hundred)).toDF("doc_id", "grp", "text"))
    val out2 = TextOps.mixTemperature(withNull, totalTokenBudget = 2000L,
        groupCol = "grp")
      .select("doc_id", "grp", "n_tokens", "share_ppm", "n_epochs", "kept_partial")
      .as[(Long, String, Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(out2 === out)

    // α = 0.75 (word2vec/XLM flattening), composed from sqrt/multiply:
    // weights floor(900^.75)=164, floor(100^.75)=31; shares 841025/158974
    val out75 = TextOps.mixTemperature(corpus, totalTokenBudget = 2000L,
        groupCol = "grp", alpha = 0.75)
      .select("doc_id", "grp", "share_ppm").distinct()
      .as[(Long, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(out75 === Map(
      "a" -> 164L * 1000000L / 195L, "b" -> 31L * 1000000L / 195L))
    // α = 1.0 is plain proportional: shares 900/1000 and 100/1000
    val out1 = TextOps.mixTemperature(corpus, totalTokenBudget = 2000L,
        groupCol = "grp", alpha = 1.0)
      .select("grp", "share_ppm").distinct()
      .as[(String, Long)].collect().toMap
    assert(out1 === Map("a" -> 900000L, "b" -> 100000L))
    // unsupported α refuses loudly (general pow is not engine-deterministic)
    val e = intercept[IllegalArgumentException] {
      TextOps.mixTemperature(corpus, 2000L, groupCol = "grp", alpha = 0.7)
    }
    assert(e.getMessage.contains("alpha"))
  }

  test("temperature mixture matches an independent reference on a seeded corpus") {
    import spark.implicits._
    // 60 docs, 4 groups, seeded token counts — computed two ways: the
    // distributed window/join plan vs a straight-line scala fold
    val rnd = new scala.util.Random(42)
    val rows = (1L to 60L).map { i =>
      val grp = s"g${rnd.nextInt(4)}"
      val n = 1 + rnd.nextInt(40)
      (i, grp, Seq.fill(n)("t").mkString(" "), n.toLong)
    }
    val corpus = rows.map { case (i, g, t, _) => (i, g, t) }.toDF("doc_id", "grp", "text")
    val budget = 1500L
    val got = TextOps.mixTemperature(corpus, budget, groupCol = "grp")
      .select("doc_id", "share_ppm", "n_epochs", "kept_partial")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

    val byGroup = rows.groupBy(_._2)
    val gtok = byGroup.view.mapValues(_.map(_._4).sum).toMap
    val weight = gtok.view.mapValues(t => math.sqrt(t.toDouble).toLong).toMap
    val totalW = weight.values.sum
    val expect = byGroup.flatMap { case (g, ds) =>
      val ppm = weight(g) * 1000000L / totalW
      val target = budget * ppm / 1000000L
      val epochs = target / gtok(g)
      val partial = target % gtok(g)
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, _, n) =>
        val kept = if (cum < partial) 1 else 0
        cum += n
        id -> (ppm, epochs, kept)
      }
    }
    assert(got === expect)
    // allocation invariants: shares never over-commit, budgets never exceed
    val ppmSum = weight.keys.map(g => weight(g) * 1000000L / totalW).sum
    assert(ppmSum <= 1000000L)
    val spent = gtok.keys.map { g =>
      val target = budget * (weight(g) * 1000000L / totalW) / 1000000L
      (target / gtok(g)) * gtok(g) + (target % gtok(g))
    }.sum
    assert(spent <= budget)
  }

  test("top-quantile cut keeps exact per-group ranks with deterministic ties") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a", "w w w w w"),  // 5 tokens
      (2L, "a", "w w w"),      // 3
      (3L, "a", "w w w"),      // 3 — tie with doc 2, id breaks it
      (4L, "a", "w w"),        // 2
      (5L, "a", "w"),          // 1
      (10L, "b", "w w"), (11L, "b", "w"), (12L, "b", "w w w")
    ).toDF("doc_id", "grp", "text")
    val out = TextOps.topQuantileByGroup(corpus, permyriad = 4000,
        groupCol = "grp", scoreCol = TextOps.tokenCount(col("text")))
      .select("doc_id", "grp_rank", "grp_size", "kept")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    // group a: ceil(5 * 0.4) = 2 kept — ranks 1 (doc 1) and 2 (doc 2, the
    // tie at 3 tokens breaks by smaller id); group b: ceil(3 * 0.4) = 2
    assert(out(1L) === ((1L, 1L, 5L, 1)))
    assert(out(2L) === ((2L, 2L, 5L, 1)))
    assert(out(3L) === ((3L, 3L, 5L, 0)))
    assert(out(5L)._4 === 0)
    assert(out(12L) === ((12L, 1L, 3L, 1)))
    assert(out(10L) === ((10L, 2L, 3L, 1)))
    assert(out(11L) === ((11L, 3L, 3L, 0)))
    // permyriad bounds refuse loudly
    val e = intercept[IllegalArgumentException] {
      TextOps.topQuantileByGroup(corpus, 10001, "grp", col("doc_id"))
    }
    assert(e.getMessage.contains("permyriad"))
  }

  test("BPE-ish pretokenizer counts match hand-tokenized expectations") {
    import spark.implicits._
    val got = Seq(
      "hello world, it's 42 tokens-ish!", // hello| world|,| it|'s| 42| tokens|-|ish|!
      "don't",                            // don|'t
      "a1b2",                             // a|1|b|2
      ""
    ).toDF("text")
      .select(TextOps.bpeTokenCount(col("text"))).as[Int].collect().toSeq
    assert(got === Seq(10, 2, 4, 0))
    // subword estimate is never below... not guaranteed in general, but on
    // whitespace-separated corpora each ws token yields >= 1 piece
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val bad = docs.where(
      TextOps.bpeTokenCount(col("text")) < TextOps.tokenCount(col("text"))).count()
    assert(bad === 0)
  }

  test("decontamination flags benchmark-overlapping documents only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated words describing nothing shared at all here"),
      (3L, "partially shared the quick brown fox appears again")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over something else")
    ).toDF("doc_id", "text")
    val hits = Dedup.contaminationHits(corpus, benchmark)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown" / "quick brown fox" / "brown fox jumps"
    // / "fox jumps over"; doc 3 shares the first two; doc 2 shares none
    assert(hits(1L) === 4)
    assert(hits(3L) === 2)
    assert(!hits.contains(2L))
    // minOverlap raises the bar
    val strict = Dedup.contaminationHits(corpus, benchmark, minOverlap = 3)
      .as[(Long, Long)].collect().toMap
    assert(strict.keySet === Set(1L))
    // scale shape: the benchmark side broadcasts, the corpus side never
    // shuffles before the final keyed count
    val plan = Dedup.contaminationHits(corpus, benchmark)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("dedup switches to reliable checkpoints when a checkpoint dir is set") {
    import spark.implicits._
    val base = Dedup.minhashLshPairs(docs, 0.8).as[(Long, Long)].collect().toSet
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val viaCkpt = Dedup.minhashLshPairs(docs, 0.8).as[(Long, Long)].collect().toSet
      assert(viaCkpt === base)
      // the reliable-checkpoint path actually wrote RDD checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "expected reliable checkpoint files under the configured dir")
    } finally {
      // the SHARED context must revert to localCheckpoint behavior — other
      // suites' plan-shape assertions depend on it
      org.apache.spark.GraftTestShims.clearCheckpointDir(spark.sparkContext)
    }
  }

  test("simhash: identical token multisets collide; pairs are plausible near-dups") {
    import spark.implicits._
    val planted = Seq(
      (9001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9002L, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      (9003L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token differs
      (9004L, "completely different words entirely here now today ok")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(planted, maxHamming = 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((9001L, 9002L)))
    assert(!pairs.exists { case (a, b) => b == 9004L || a == 9004L })
  }

  test("langId is deterministic and votes by stopword profile") {
    import spark.implicits._
    val planted = Seq(
      (1L, "the cat sat of the mat and it is that for"),
      (2L, "der hund und die katze ist ein mit von das"),
      (3L, "xyzzy qwerty asdf")).toDF("doc_id", "text")
    val got = planted.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(2L) === "de")
    assert(got(3L) === "und")
  }

  test("winnow fingerprint overlaps heavily for locally-edited text, not for unrelated") {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val edited = base.replace("lazy", "hazy")
    val other = "entirely unrelated content with zero overlap whatsoever in any window"
    val df = Seq((1L, base), (2L, edited), (3L, other)).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        toColumn(graft.text.WinnowFingerprint(toExpression(col("text")))).as("fp"))
      .as[(Long, Seq[Long])].collect().map { case (i, f) => i -> f.toSet }.toMap
    val simEdit = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).union(fps(2L)).size
    val simOther = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).union(fps(3L)).size
    assert(simEdit > 0.6, s"local edit should retain most fingerprints, got $simEdit")
    assert(simOther < 0.1, s"unrelated text should share ~none, got $simOther")
  }

  test("connected components: chains collapse to the min id, singletons stay themselves") {
    import spark.implicits._
    // a 6-node chain (worst case for plain propagation — pointer jumping
    // must close it within maxIter), a 2-cycle, and isolated vertices
    val nodes = (1L to 12L).toDF("id")
    val edges = Seq(
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), // chain 2..7
      (9L, 10L), (10L, 9L) // cycle (duplicate reversed edge)
    ).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, edges, maxIter = 6)
      .as[(Long, Long)].collect().toMap
    (2L to 7L).foreach(v => assert(got(v) === 2L, s"chain vertex $v"))
    assert(got(9L) === 9L && got(10L) === 9L)
    Seq(1L, 8L, 11L, 12L).foreach(v => assert(got(v) === v, s"singleton $v"))
  }

  test("connected components: distributed path (past the local-edge gate) agrees") {
    import spark.implicits._
    val nodes = (1L to 12L).toDF("id")
    val edges = Seq(
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (9L, 10L), (10L, 9L)).toDF("id_a", "id_b")
    spark.conf.set("spark.graft.maxLocalCCEdges", "1")
    try {
      val got = Dedup.connectedComponents(nodes, edges, maxIter = 6)
        .as[(Long, Long)].collect().toMap
      (2L to 7L).foreach(v => assert(got(v) === 2L, s"chain vertex $v"))
      assert(got(9L) === 9L && got(10L) === 9L)
      Seq(1L, 8L, 11L, 12L).foreach(v => assert(got(v) === v, s"singleton $v"))
    } finally spark.conf.unset("spark.graft.maxLocalCCEdges")
  }

  test("connected components converge on an empty edge set") {
    import spark.implicits._
    val nodes = (1L to 4L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, edges).as[(Long, Long)].collect().toMap
    (1L to 4L).foreach(v => assert(got(v) === v))
  }

  test("ANN embedding cosine pairs: exact precision, high recall vs all-pairs") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val ann = Dedup.embeddingCosinePairsAnn(emb, 0.4)
      .as[(Long, Long)].collect().toSet
    // exact all-pairs reference, computed locally over the 500-vector fixture
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / math.sqrt(na * nb)
    }
    // epsilon margins on both sides: the ANN path evaluates float cosine
    // over normalized floats, this loop double cosine over raw — a pair at
    // the exact threshold may flip between the two arithmetics
    val exactLoose = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib && cos(va, vb) >= 0.4 - 1e-3
    } yield (ia, ib)).toSet
    val exactStrict = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib && cos(va, vb) >= 0.4 + 1e-3
    } yield (ia, ib)).toSet
    assert(exactStrict.nonEmpty, "fixture should contain cosine near-dup pairs")
    // precision is exact by construction (candidates are verified)
    assert(ann.subsetOf(exactLoose), s"false positives: ${ann.diff(exactLoose)}")
    val recall = exactStrict.intersect(ann).size.toDouble / exactStrict.size
    assert(recall >= 0.8, s"multi-probe blocking recall $recall below gate")
  }

  test("PII redaction replaces emails, IPs, and phone runs with type tokens") {
    import spark.implicits._
    val planted = Seq(
      (1L, "contact me at alice.smith+spam@example.co.uk for details"),
      (2L, "server at 192.168.001.255 timed out"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "no pii here at all"),
      (5L, "id 5551234567 on file"),
      (6L, "In 2026. 50 people attended"), // sentence boundary is not a phone
      (7L, "pages 100 - 200 cover it")). // spaced range is not a phone
      toDF("doc_id", "text")
    val got = planted.select(col("doc_id"), TextOps.redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "contact me at [EMAIL] for details")
    assert(got(2L) === "server at [IP] timed out")
    assert(got(3L) === "call [PHONE] now")
    assert(got(4L) === "no pii here at all")
    assert(got(5L) === "id [PHONE] on file")
    assert(got(6L) === "In 2026. 50 people attended")
    assert(got(7L) === "pages 100 - 200 cover it")
  }

  test("repetition ratio: boilerplate loops high, diverse text zero") {
    import spark.implicits._
    val planted = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "every token in this sentence differs from the others"),
      (3L, "ab cd")).toDF("doc_id", "text") // < 3 tokens -> 0
    val got = planted.select(col("doc_id"), TextOps.repetitionRatio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.5, s"boilerplate should score high, got ${got(1L)}")
    assert(got(2L) === 0.0)
    assert(got(3L) === 0.0)
  }

  test("semantic dedup: canonical is the component min; partitions cover the corpus") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = Dedup.dedupAssignmentsEmbedding(emb, 0.4)
      .as[(Long, Long, Boolean)].collect()
    assert(got.length === emb.count())
    val byComp = got.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min === comp, s"component $comp min-id invariant")
      assert(members.count(_._3) === 1, s"component $comp has exactly one canonical")
    }
    // the pair stage found something (matches the ANN pair spec's fixture)
    assert(byComp.size < got.length, "at least one multi-member component")
  }

  test("ANN embedding dedup plans an equi-join on blocks, never a cross product") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = graft.text.Dedup.embeddingCosinePairsAnn(emb, 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "all-pairs join would not scale")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "NLJ = undeclared all-pairs")
  }

  test("exact dedup groups by token-set fingerprint find the planted families") {
    val groups = Dedup.exactGroups(docs, fingerprint = TextOps.tokenSetFingerprint)
    val multi = groups.where(col("cnt") > 1)
    assert(multi.count() > 0, "fixture contains token-set duplicate families")
    // canonical_id must be the min doc_id of its group
    val total = groups.agg(sum(col("cnt"))).head().getLong(0)
    assert(total === docs.count())
  }

  test("duplicated spans: cross-doc 5-token spans found, overlaps merge, short docs zero") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),          // shares span w/ 2
      (2L, "intro alpha beta gamma delta epsilon tail"),
      (3L, "one two three four five six seven"),            // clean
      (4L, "tiny doc"),                                     // < 5 tokens
      (5L, "p q r s t u"),                                  // exact copy of 6:
      (6L, "p q r s t u")                                   // 2 overlapping spans
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(corpus)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      // (doc_id, n_spans, n_dup_spans, n_dup_tokens)
      (1L, 2L, 1L, 5L),  // "alpha..epsilon" at pos 0
      (2L, 3L, 1L, 5L),  // same span at pos 1
      (3L, 3L, 0L, 0L),
      (4L, 0L, 0L, 0L),
      (5L, 2L, 2L, 6L),  // both spans dup; merged coverage = 6 tokens, not 10
      (6L, 2L, 2L, 6L)))
    // a span repeated only WITHIN one document is repetition, not dup
    val selfRep = Seq((7L, "x y z w v x y z w v"), (8L, "unrelated words entirely here now"))
      .toDF("doc_id", "text")
    val rep = Dedup.duplicatedSpans(selfRep).where(col("n_dup_spans") > 0).count()
    assert(rep === 0)
  }

  test("hash split/sample: unsigned-mod buckets match the FNV reference, draws deterministic") {
    import spark.implicits._
    val ids = docs.select(col("doc_id")).as[Long].collect()
    // engine buckets vs a direct unsigned-remainder reference on the JVM
    val got = docs.select(col("doc_id"),
        TextOps.hashBucket(col("doc_id").cast("string"), 10000, salt = "sample1"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      val expect = java.lang.Long.remainderUnsigned(
        graft.text.Fnv64Public.hash(s"$id:sample1"), 10000)
      assert(got(id) === expect, s"doc $id")
    }
    // split: assignment is a pure function of (id, salt) and lands in bounds
    val splits = docs.select(col("doc_id"),
        TextOps.hashSplit(col("doc_id"), 800, 100, salt = "split1"))
      .as[(Long, String)].collect().toMap
    assert(splits.values.toSet.subsetOf(Set("train", "val", "test")))
    val again = docs.select(col("doc_id"),
        TextOps.hashSplit(col("doc_id"), 800, 100, salt = "split1"))
      .as[(Long, String)].collect().toMap
    assert(again === splits)
    assert(splits.values.count(_ == "train") > splits.size / 2,
      "80% of buckets fund train")
    // stratified keep agrees with bucket < per-stratum cutoff
    val kept = docs.select(col("doc_id"), col("lang"),
        TextOps.stratifiedKeep(col("doc_id"), col("lang"),
          Map("en" -> 2500, "fr" -> 5000), salt = "sample1"))
      .as[(Long, String, Boolean)].collect()
    kept.foreach { case (id, lang, k) =>
      val cutoff = Map("en" -> 2500, "fr" -> 5000).getOrElse(lang, 10000)
      assert(k === (got(id) < cutoff), s"doc $id lang $lang")
    }
  }

  test("sequence packing: concat-and-split offsets, span counts, shard-local layout") {
    import spark.implicits._
    // one shard isolates the arithmetic: token counts 3, 4, 2 at seqTokens=5
    val corpus = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i")).toDF("doc_id", "text")
    val out = TextOps.packSequences(corpus, seqTokens = 5, numShards = 1,
        orderCol = col("doc_id"))
      .select("doc_id", "n_tokens", "seq_id", "seq_offset", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 3L, 0L, 0L, 1L),   // tokens 0-2 of seq 0
      (2L, 4L, 0L, 3L, 2L),   // starts at offset 3, spills into seq 1
      (3L, 2L, 1L, 2L, 1L)))  // resumes where doc 2 ended: seq 1 offset 2
    // corpus-level invariant: within each shard (ordered by doc_id) the
    // start position equals the running token total laid down before it
    val packed = TextOps.packSequences(docs, 256, 8, col("doc_id"), salt = "pack1")
      .select("shard", "doc_id", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    packed.groupBy(_._1).values.foreach { shard =>
      var cum = 0L
      shard.sortBy(_._2).foreach { case (_, id, n, seq, off) =>
        assert(seq * 256 + off === cum, s"doc $id start")
        cum += n
      }
    }
    assert(packed.map(_._1).distinct.length === 8, "all shards populated")
  }

  test("distinctive terms: tf desc / df asc / term ranking, top-k per doc") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple apple common zebra"),
      (2L, "berry common common"),
      (3L, "common plum")
    ).toDF("doc_id", "text")
    val out = TextOps.distinctiveTerms(corpus, topK = 3)
      .as[(Long, Int, String, Long, Long)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out === Seq(
      (1L, 1, "apple", 2L, 1L),   // tf 2 wins
      (1L, 2, "zebra", 1L, 1L),   // tf tie -> rarer df first
      (1L, 3, "common", 1L, 3L),
      (2L, 1, "common", 2L, 3L),  // tf beats rarity
      (2L, 2, "berry", 1L, 1L),
      (3L, 1, "plum", 1L, 1L),
      (3L, 2, "common", 1L, 3L)))
  }

  test("duplication score counts shingles shared with OTHER documents") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"),      // shingles: abc bcd cde
      (2L, "a b c x y"),      // shares abc with doc 1
      (3L, "p q r s t")       // nothing shared
    ).toDF("doc_id", "text")
    val out = Dedup.duplicationScore(corpus)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 3L, 1L, 333L),
      (2L, 3L, 1L, 333L),
      (3L, 3L, 0L, 0L)))
    // a shingle repeated WITHIN one doc only is not "shared": sets dedupe it
    val solo = Seq((7L, "x y z x y z x y z")).toDF("doc_id", "text")
    val r = Dedup.duplicationScore(solo).as[(Long, Long, Long, Long)].head()
    assert(r._3 == 0L && r._4 == 0L)
  }

  test("boilerplate line dedup: corpus-frequent lines drop, order holds, short guard") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "intro one\ncookie banner\nok\nbody a"),
      (2L, "cookie banner\nok\nbody b\ncookie banner"), // twice in ONE doc
      (3L, "ok\ncookie banner\nbody c"),
      (4L, "cookie banner") // nothing but boilerplate
    ).toDF("doc_id", "text")
    val out = Dedup.dedupBoilerplateLines(corpus, minDocFreq = 3, minLineChars = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "cookie banner": 4 distinct docs >= 3 -> dropped everywhere, BOTH
    // copies in doc 2 (df counts docs once; removal hits occurrences).
    // "ok" is in 3 docs too but under minLineChars -> never a candidate.
    assert(out(1L)._2 == "intro one\nok\nbody a")
    assert(out(1L)._3 == 4L && out(1L)._4 == 1L)
    assert(out(2L)._2 == "ok\nbody b" && out(2L)._4 == 2L)
    assert(out(3L)._2 == "ok\nbody c")
    // every line boilerplate -> the document SURVIVES as an empty string
    assert(out(4L)._2 == "" && out(4L)._3 == 1L && out(4L)._4 == 1L)
    // below-threshold corpus is a no-op (df=4 < 5)
    val untouched = Dedup.dedupBoilerplateLines(corpus, minDocFreq = 5)
    assert(untouched.where(col("removed_lines") > 0).count() == 0L)
    // minDocFreq < 2 can only mean "drop every line" - refuse it
    intercept[IllegalArgumentException](
      Dedup.dedupBoilerplateLines(corpus, minDocFreq = 1))
  }

  test("vocab seed: substring pieces, ## continuations, frequency ranking") {
    import spark.implicits._
    val corpus = Seq((1L, "aba ab"), (2L, "ab")).toDF("doc_id", "text")
    val out = TextOps.vocabSeed(corpus, topN = 100, maxPieceLen = 2)
      .as[(Int, String, Long)].collect().toSeq
    // aba -> a, ab, ##b, ##ba, ##a ; ab (x2) -> a, ab, ##b
    val expect = Map("a" -> 3L, "ab" -> 3L, "##b" -> 3L, "##ba" -> 1L, "##a" -> 1L)
    assert(out.map(t => t._2 -> t._3).toMap == expect)
    // rank order: cnt desc then piece asc ("##b" < "a" < "ab" ASCII)
    assert(out.sortBy(_._1).map(_._2) == Seq("##b", "a", "ab", "##a", "##ba"))
    // topN boundary is deterministic
    val top2 = TextOps.vocabSeed(corpus, topN = 2, maxPieceLen = 2)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(top2 == Seq("##b", "a"))
  }

  test("corpus profile: integer moments and lower median per group") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "en", "a", "one"),                    // dl 1
      (2L, "en", "a", "one two three"),          // dl 3
      (3L, "en", "a", "one two three four five"),// dl 5 -> odd group: median 3
      (4L, "fr", "b", "un deux"),                // dl 2
      (5L, "fr", "b", "un deux trois voila")     // dl 4 -> even group: LOWER median 2
    ).toDF("doc_id", "lang", "source", "text")
    val out = TextOps.corpusProfile(corpus)
      .select("lang", "n_docs", "n_tokens", "min_tokens", "max_tokens",
        "mean_tokens_x100", "median_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("en", 3L, 9L, 1L, 5L, 300L, 3L),
      ("fr", 2L, 6L, 2L, 4L, 300L, 2L)))
  }

  test("corpus profile: histogram median survives duplicate lengths, skew, null groups") {
    import spark.implicits._
    // one giant bucket dominated by duplicate lengths (the histogram path's
    // home turf: 101 rows collapse to 3 histogram rows) plus a NULL-lang
    // bucket, which is a real group and must appear in the profile
    val big = (1L to 101L).map { i =>
      val dl = if (i <= 50) 2 else if (i <= 90) 7 else 11
      (i, "en", "big", (1 to dl).map(_ => "w").mkString(" "))
    }
    val nulls = Seq(
      (200L, null.asInstanceOf[String], "n", "a b c"),
      (201L, null.asInstanceOf[String], "n", "a"))
    val corpus = (big ++ nulls).toDF("doc_id", "lang", "source", "text")
    val out = TextOps.corpusProfile(corpus)
      .select("lang", "n_docs", "median_tokens")
      .as[(String, Long, Long)].collect().toSeq.sortBy(r => Option(r._1))
    // en: n=101, rank (101+1)/2 = 51 in dl order (50x2, 40x7, 11x11) -> 7
    // null: n=2, LOWER median rank 1 -> dl 1
    assert(out === Seq((null, 2L, 1L), ("en", 101L, 7L)))
  }

  test("epoch expansion materializes n_epochs + kept_partial copies per doc") {
    import spark.implicits._
    val mixed = Seq(
      (1L, 2L, 1),  // 3 copies
      (2L, 0L, 1),  // partial epoch only
      (3L, 1L, 0),  // one full epoch
      (4L, 0L, 0)   // dropped
    ).toDF("doc_id", "n_epochs", "kept_partial")
    val out = TextOps.epochExpand(mixed)
      .as[(Long, Int, Int)].collect().sorted.toSeq
    assert(out === Seq(
      (1L, 0, 3), (1L, 1, 3), (1L, 2, 3),
      (2L, 0, 1),
      (3L, 0, 1)))
    // end-to-end: exploded cardinality equals the allocation's copy total
    val alloc = TextOps.mixTemperature(docs, totalTokenBudget = 60000L)
    val copies = alloc.select(sum(col("n_epochs") + col("kept_partial")))
      .head().getLong(0)
    assert(TextOps.epochExpand(alloc).count() == copies)
  }

  test("token-window chunking invariants hold for every doc length 1..80") {
    import spark.implicits._
    val corpus = (1 to 80)
      .map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    for ((w, st) <- Seq((64, 48), (16, 12), (8, 8), (5, 1))) {
      val rows = TextOps.chunkTokenWindows(corpus, window = w, stride = st)
        .select("doc_id", "chunk_idx", "start_tok", "n_tokens")
        .as[(Long, Int, Int, Int)].collect()
        .groupBy(_._1).map { case (id, g) => id -> g.sortBy(_._2).toSeq }
      (1 to 80).foreach { n =>
        val chunks = rows(n.toLong)
        // contiguous indices from 0; starts on the stride grid; full
        // coverage; every window adds at least one uncovered token
        assert(chunks.map(_._2) == chunks.indices.toSeq, s"n=$n w=$w s=$st")
        assert(chunks.forall { case (_, i, s, _) => s == i * st })
        val covered = chunks.flatMap { case (_, _, s, len) => s until (s + len) }.toSet
        assert(covered == (0 until n).toSet, s"n=$n w=$w s=$st coverage")
        assert(chunks.forall { case (_, _, s, len) => len == math.min(w, n - s) })
        assert(chunks.zipWithIndex.forall { case ((_, _, s, len), j) =>
          j == 0 || s + len > chunks(j - 1)._3 + chunks(j - 1)._4 - (w - st)
        }, s"n=$n w=$w s=$st zero-gain window")
      }
    }
  }

  test("token-window chunking: coverage, offsets, boundaries, hash") {
    import spark.implicits._
    // 5 tokens, window 4, stride 3 (overlap 1): starts 0 and 3
    val corpus = Seq(
      (1L, "a b c d e"),
      (2L, "x y"),          // shorter than one window -> single chunk
      (3L, "a b c d"),      // n == window -> single chunk (start 3 adds nothing)
      (4L, "a b c d e f g") // n=7: starts 0 and 3 — start 6 would add no
                            // token beyond window [3,7)'s coverage
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTokenWindows(corpus, window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens")
      .as[(Long, Int, Int, Int)].collect().sorted.toSeq
    assert(out === Seq(
      (1L, 0, 0, 4), (1L, 1, 3, 2),
      (2L, 0, 0, 2),
      (3L, 0, 0, 4),
      (4L, 0, 0, 4), (4L, 1, 3, 4)))
    // every token is covered: union of [start, start+n_tokens) == [0, n)
    val covered = out.filter(_._1 == 4L)
      .flatMap { case (_, _, s, n) => s until (s + n) }.toSet
    assert(covered == (0 until 7).toSet)
    // content signature is the hash of the whitespace-normalized window
    val h = TextOps.chunkTokenWindows(corpus, window = 4, stride = 3)
      .where(col("doc_id") === 1L && col("chunk_idx") === 1)
      .select("chunk_hash").head().getLong(0)
    assert(h == graft.text.Fnv64Public.hash("d e"))
  }

  test("capPerGroup keeps the top-n per group with (score desc, id asc) ties, windowless") {
    import spark.implicits._
    val rows = Seq(
      // group a: 4 docs, scores 5,5,3,1 -> cap 2 keeps ids 1,2 (tie by id)
      (1L, "a", 5L), (2L, "a", 5L), (3L, "a", 3L), (4L, "a", 1L),
      // group b: fewer docs than the cap -> all kept, ranked
      (5L, "b", 9L), (6L, "b", 2L),
      // null group key is a real bucket, not dropped
      (7L, null.asInstanceOf[String], 4L), (8L, null.asInstanceOf[String], 7L),
      (9L, null.asInstanceOf[String], 6L)
    ).toDF("doc_id", "source", "s")
      // a NULL-scored doc is EXCLUDED (documented contract) — even when it
      // would otherwise take a slot in an under-full group
      .unionByName(Seq((10L, "b")).toDF("doc_id", "source")
        .withColumn("s", lit(null).cast("long")))
    val out = TextOps.capPerGroup(rows, n = 2, groupCol = "source", scoreCol = col("s"))
    val got = out.collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(got == Seq(
      ("<null>", 8L, 1), ("<null>", 9L, 2),
      ("a", 1L, 1), ("a", 2L, 2),
      ("b", 5L, 1), ("b", 6L, 2)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"capPerGroup must stay windowless:\n$plan")
    assert(plan.contains("partial_min_topk_long") || plan.contains("MinTopKLong"),
      s"cap should ride the partial top-k heap:\n$plan")
  }

  test("canonicalByQuality picks max quality then min id, one canonical per component, windowless") {
    import spark.implicits._
    val assigns = Seq(
      // component 10: quality tie 7/7 between ids 11 and 12 -> canonical 11
      (10L, 10L), (11L, 10L), (12L, 10L),
      // component 20: clear winner 22
      (20L, 20L), (22L, 20L),
      // singleton component: its own canonical
      (30L, 30L)
    ).toDF("doc_id", "component")
    val qual = Seq(
      (10L, 3L), (11L, 7L), (12L, 7L), (20L, 1L), (22L, 9L), (30L, 0L)
    ).toDF("doc_id", "quality")
    val out = Dedup.canonicalByQuality(assigns, qual)
    val rows = out.as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(10L, 11L, 12L, 20L, 22L, 30L))
    val byComp = rows.groupBy(_._2)
    assert(byComp(10L).forall(r => r._3 === 11L && r._4 === 7L))
    assert(byComp(20L).forall(r => r._3 === 22L && r._4 === 9L))
    assert(byComp(30L).forall(r => r._3 === 30L && r._4 === 0L))
    byComp.values.foreach(ms => assert(ms.count(_._5) === 1, "exactly one canonical"))
    assert(rows.filter(_._5).map(_._1).toSet === Set(11L, 22L, 30L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"argmax must be an aggregate, not a window:\n$plan")
    // an id with no quality row drops out (documented inner-join contract)
    val missing = Dedup.canonicalByQuality(assigns, qual.where(col("doc_id") =!= 12L))
    assert(missing.count() === 5L)
  }

  test("canonicalByQuality refuses a float quality column by name") {
    import spark.implicits._
    val assigns = Seq((1L, 1L)).toDF("doc_id", "component")
    val qual = Seq((1L, 0.5)).toDF("doc_id", "quality")
    val e = intercept[IllegalArgumentException] {
      Dedup.canonicalByQuality(assigns, qual)
    }
    assert(e.getMessage.contains("integer-valued"), e.getMessage)
    assert(e.getMessage.contains("quality"), e.getMessage)
  }

  test("a malformed graft conf fails naming the key and value, not as a bare NumberFormatException") {
    spark.conf.set(Dedup.MaxNgramBlockRowsKey, "not-a-number")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.ngramJaccardPairs(docs, 0.8, Seq("lang", "source")).count()
      }
      assert(e.getMessage.contains(Dedup.MaxNgramBlockRowsKey), e.getMessage)
      assert(e.getMessage.contains("not-a-number"), e.getMessage)
    } finally spark.conf.unset(Dedup.MaxNgramBlockRowsKey)
  }
}
