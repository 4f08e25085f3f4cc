package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{LangModel, QualityClassifier}

/** Physical-plan assertions for the round-9 scale fixes — these lock the
  * shapes in so a refactor cannot quietly reintroduce the hazards the
  * fixes removed (single-task global windows, ungated broadcasts). */
class ScalePostureSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("classifier weak-labeling plan has no window and no exchange") {
    val plan = QualityClassifier.weakLabels(docs, "text", "doc_id", 0.3)
      .queryExecution.executedPlan.toString
    // the boundary selection runs in its own jobs; the LABELING frame the
    // regression fit consumes must be a pure scan+project+filter
    assert(!plan.contains("Window"), s"global window crept back:\n$plan")
    assert(!plan.contains("Exchange"), s"labeling should not shuffle:\n$plan")
  }

  test("text normalization is a pure scan+project: no shuffle, no window, no UDF") {
    val plan = docs
      .select(col("doc_id"), graft.text.TextOps.normalizeText(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"normalize must not shuffle:\n$plan")
    assert(!plan.contains("Window"))
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }

  test("BPE training's corpus pass partial-aggregates before the word shuffle") {
    val plan = graft.text.BpeTrainer.wordFrequencies(docs)
      .queryExecution.executedPlan.toString
    // what crosses the shuffle is one row per DISTINCT word per input
    // partition, not one per occurrence
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"word counts must map-side combine:\n$plan")
    assert(!plan.contains("Window"))
  }

  test("BPE id export: one kernel call per doc, merges as plan constants, no join") {
    val merges = Seq(("e r", "er"), ("t h", "th"), ("a n", "an"))
    val plan = graft.text.BpeTrainer.encodeIds(docs, merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"the merge table rides the plan, not a join:\n$plan")
    assert(!plan.contains("Window"))
    assert(plan.contains("bpe_token_ids") || plan.contains("BpeTokenIds"),
      s"the rank-greedy kernel expression must plan inline:\n$plan")
  }

  test("LM model joins broadcast under the gate, shuffle-hash above it") {
    val uri = Files.createTempDirectory("graft_posture_lm").toString
    LangModel.trainCharTrigram(docs.where(col("lang") === "en"), uri)
    val under = LangModel.scoreDocs(docs, uri)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(under).length >= 2,
      s"vocabulary-bounded model tables should broadcast:\n$under")
    spark.conf.set(graft.Conf.MaxBroadcastBytesKey, "1")
    try {
      val over = LangModel.scoreDocs(docs, uri)
        .queryExecution.executedPlan.toString
      assert("ShuffledHashJoin".r.findAllIn(over).length >= 2,
        s"past the gate the model joins must fall back to shuffle-hash:\n$over")
      assert(!over.contains("BroadcastHashJoin"),
        s"no forced broadcast may survive the gate:\n$over")
    } finally spark.conf.unset(graft.Conf.MaxBroadcastBytesKey)
  }

  test("LM scoring aggregates partially before the doc_id shuffle") {
    val uri = Files.createTempDirectory("graft_posture_lm2").toString
    LangModel.trainCharTrigram(docs.where(col("lang") === "en"), uri)
    val plan = LangModel.scoreDocs(docs, uri)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"map-side combine missing from the per-doc aggregate:\n$plan")
  }

  test("DSIR scoring: gated model join, map-side partial aggregation") {
    val uri = Files.createTempDirectory("graft_posture_dsir").toString
    graft.text.Dsir.fit(docs, col("lang") === "en", uri)
    val under = graft.text.Dsir.score(docs, uri)
      .queryExecution.executedPlan.toString
    assert(under.contains("BroadcastHashJoin"),
      s"the 4096-row model must broadcast under the gate:\n$under")
    assert(under.contains("partial_sum"),
      s"per-doc sums must combine map-side before the shuffle:\n$under")
    spark.conf.set(graft.Conf.MaxBroadcastBytesKey, "1")
    try {
      val over = graft.text.Dsir.score(docs, uri)
        .queryExecution.executedPlan.toString
      assert(over.contains("ShuffledHashJoin") && !over.contains("BroadcastHashJoin"),
        s"past the gate the model join must fall back to shuffle-hash:\n$over")
    } finally spark.conf.unset(graft.Conf.MaxBroadcastBytesKey)
  }

  test("BM25 scoring: query terms and idf broadcast under the gate") {
    val uri = Files.createTempDirectory("graft_posture_bm25").toString
    graft.text.Bm25.fit(docs, uri)
    val plan = graft.text.Bm25.topk(docs, docs.where(col("doc_id") < 3), 5, uri)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"both small sides (query terms, idf) should broadcast:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"postings tf aggregate must combine map-side:\n$plan")
  }

  test("BM25 indexed serving pushes the query's term literals into the postings scan") {
    val uri = Files.createTempDirectory("graft_posture_bm25idx").toString
    graft.text.Bm25.fit(docs, uri)
    val plan = graft.text.Bm25.topkIndexed(spark,
        docs.where(col("doc_id") < 3), 5, uri)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term-literal pushdown missing from the postings scan:\n$plan")
  }

  test("BM25 serving plans without a window: heap aggregate, only k rows per partition shuffle") {
    val uri = Files.createTempDirectory("graft_posture_bm25win").toString
    graft.text.Bm25.fit(docs, uri)
    for (df <- Seq(
        graft.text.Bm25.topkIndexed(spark, docs.where(col("doc_id") < 3), 5, uri),
        graft.text.Bm25.topk(docs, docs.where(col("doc_id") < 3), 5, uri))) {
      val plan = df.queryExecution.executedPlan.toString
      // a per-qid row_number window would funnel a hot-term query's
      // corpus-sized candidate set through ONE task; the MinTopKLong
      // partial→final aggregate must carry the top-k instead
      assert(!plan.contains("Window"), s"BM25 serving must not window:\n$plan")
      assert(plan.contains("min_topk_long"),
        s"BM25 serving should rank through the heap aggregate:\n$plan")
      assert(plan.contains("partial_min_topk_long") || plan.contains("min_topk_long(")
        && plan.contains("HashAggregate"),
        s"heap aggregate should run partial before the qid shuffle:\n$plan")
    }
  }

  test("boilerplate line dedup: no window, gated anti join, partial line-frequency agg") {
    val multi = docs.select(col("doc_id"),
      regexp_replace(col("text"), " ", "\n").as("text"))
    val df = graft.text.Dedup.dedupBoilerplateLines(multi, minDocFreq = 3)
    val plan = df.queryExecution.executedPlan.toString
    // reassembly must be the bounded per-doc sort_array(collect_list),
    // never a global or per-doc ORDER BY window over the exploded lines
    assert(!plan.contains("Window"),
      s"line dedup must reassemble without a window:\n$plan")
    // the drop set rides the engine-wide broadcast gate at fixture size
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"boilerplate drop set should broadcast-anti-join under the gate:\n$plan")
    // corpus-wide line frequency combines map-side before the line shuffle
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"line-frequency aggregate should run partial:\n$plan")
  }

  test("MaxSim re-rank joins ride the broadcast gate and the shortlist aggregates partially") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(expr("vec_id DIV 4").as("obj"), col("vec_id").as("vid"),
        col("embedding").as("vector"))
    val qs = vecs.where(col("obj") < 3)
      .select(col("obj").as("qid"), col("vid").as("qvid"), col("vector").as("qvec"))
    val df = graft.operators.MaxSim.topK(vecs, qs, k = 5, shortlistK = 8)
    val plan = df.queryExecution.executedPlan.toString
    // per-query-vector shortlist and per-object sum both reduce through
    // heap/partial aggregates — a window would funnel per-query candidate
    // sets through one task
    assert(!plan.contains("Window"), s"MaxSim must stay windowless:\n$plan")
    assert(plan.contains("min_topk"),
      s"shortlist and final rank should ride the heap aggregates:\n$plan")
    // candidate-sized sides broadcast under the engine gate; the corpus
    // side is never the build side of a nested-loop beyond the one scored
    // shortlist cross join
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin"),
      s"re-rank joins should be hash joins (gated broadcast):\n$plan")
    // stage-3 corpus pruning is a semi join on candidate objects
    assert(plan.contains("LeftSemi"), s"candidate fetch should semi-join:\n$plan")
  }

  test("binary-hamming candidate stage scans only the 8-byte sketch column") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val uri = Files.createTempDirectory("graft_posture_bin").toString
    graft.operators.BinaryKnn.buildSketch(
      emb.select(col("vec_id").as("id"), col("embedding").as("vector")), uri)
    val plan = graft.operators.BinaryKnn.search(spark, uri, emb,
        emb.where(col("vec_id") < 3), 5, fetchK = 20,
        graft.operators.DistanceMetric.L2, idCol = "vec_id", vecCol = "embedding",
        qidCol = "vec_id", qvecCol = "embedding")
      .queryExecution.executedPlan.toString
    // the sketch side of the shortlist must not drag the float vectors in:
    // its FileScan reads exactly (id, bits)
    val sketchScans = "ReadSchema: struct<id:bigint,bits:array<bigint>>".r
      .findAllIn(plan).length
    assert(sketchScans >= 1, s"bits-only sketch scan missing:\n$plan")
    // float vectors appear only on the re-rank side (joined by candidate id)
    assert(plan.contains("embedding"), "re-rank side must read the vectors")
  }

  test("the composed curation funnel plans with equi-joins only, no window") {
    val plan = SparkEntry.queries("pipeline_curation_funnel")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel must stay equi-joined:\n$plan")
    // the DSIR boundary runs as its own key-only sort OUTSIDE this plan;
    // the served plan itself must carry no window at all
    assert(!plan.contains("Window"), s"window crept into the funnel:\n$plan")
  }

  test("corpus profile median windows over the length histogram, never corpus rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = graft.text.TextOps.corpusProfile(docs).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, s"median path should use the histogram window:\n$plan")
    // every window's input must be the (group, dl) aggregate — its per-group
    // row count is DISTINCT lengths, so a 60%-of-corpus bucket cannot
    // funnel its document rows through one window task
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"window consumes un-aggregated corpus rows:\n$w")
    }
  }

  test("salted band join plans as a plain equi hash join (no NLJ/cartesian)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("key", "ts", "lid")
    val r = Seq((1L, 12L, 2L)).toDF("key", "ts", "rid")
    val plan = graft.operators.AsOfJoin
      .timeBandJoin(l, r, Seq("key"), "ts", "ts", band = 5L, salt = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"salted band join must stay an equi join:\n$plan")
  }

  test("embedding ANN pairs: cosine filter runs BEFORE the dedup shuffle, ids only") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pairs = graft.text.Dedup.embeddingCosinePairsAnn(emb, 0.5, partitions = 4)
    val opt = pairs.queryExecution.optimizedPlan
    // the dropDuplicates aggregate must see ONLY the 16-byte id pair —
    // the un-filtered order shuffled every candidate pair with both
    // vector payloads (~235 GB of spill at 432k vectors, measured)
    val agg = opt.collectFirst { case a: Aggregate => a }
      .getOrElse(fail(s"no dedup aggregate in:\n$opt"))
    assert(agg.output.map(_.name).sorted === Seq("id_a", "id_b"),
      s"dedup shuffle must carry ids only, got ${agg.output.map(_.name)}")
    // and the cosine predicate must already have run underneath it —
    // Catalyst folds the post-join where into the Join condition itself,
    // so accept it in either a Filter node or the join criteria
    val filtered = agg.child.collectFirst {
      case f: Filter if f.condition.toString.contains("dist_cosine") => true
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.toString.contains("dist_cosine")) => true
    }
    assert(filtered.isDefined,
      s"cosine verification must precede the dedup aggregate:\n$opt")
  }
}
