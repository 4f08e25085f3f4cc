package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{Dedup, ShardExport}

/** Corpus-scale probe for the text-side heavy hitters — the documents
  * table replicated `reps`× (ids remapped, a per-replica suffix token so
  * replicas aren't byte-identical), written to parquet, then each op
  * timed against the files. The point is the same as the vector-side
  * sweeps ([[IvfSweepBench]] / [[VamanaSweepBench]]): measure where the
  * plans, not per-query constants, dominate, and catch any stage whose
  * cost grows faster than the corpus.
  *
  * Ops timed: boilerplate line removal (corpus-wide line-frequency dedup;
  * `minDocFreq` scales with `reps` so the drop set keeps the fixture's
  * proportions), manifest-checked shard export, and the export fsck.
  *
  * Usage: `runMain graft.TextScaleBench [sfDir] [reps] [numShards]`
  * (defaults /root/testdata/sf0.1, 20 → 100k docs / ~1.8M derived lines,
  * 64 shards). Prints one `TEXTSCALE {...}` line per op, for PERF.md.
  * Maintenance benchmark, not wired into Bench.
  */
object TextScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val numShards = args.lift(2).map(_.toInt).getOrElse(64)
    val mode = args.lift(3).getOrElse("all") // all | dedup
    val spark = SparkSession.builder()
      .appName("graft-text-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (mode == "dedup") runDedup(spark, sfDir, reps)
      else run(spark, sfDir, reps, numShards)
    } finally spark.stop()
  }

  /** The dedup-family scale arm (MinHash-LSH → components → canonical,
    * plus SemDeDup embedding dedup): the vector-index family has 10M
    * evidence, the text dedup family's deepest prior point was 500k docs
    * and only for line-dedup — this arm runs the THREE pair-generating
    * pipelines on a corpus with CONTROLLED duplicate structure, so the
    * work per doc stays constant as `reps` grows and any superlinear
    * stage shows as a scaling ratio > reps ratio.
    *
    * Corpus: every base doc spawns `reps` replicas organized into
    * NEAR-DUP TRIOS — a group token is interleaved every 2 tokens
    * (shared within a trio, distinct across trios) and a member token is
    * appended (trio members differ only by it, Jaccard > 0.9). The
    * 2-token stride matters: it puts a group token inside EVERY
    * 3-shingle, driving cross-trio Jaccard to ~0 — an earlier 4-token
    * stride left cross-trio Jaccard ≈ 0.25, where banded LSH's
    * false-positive rate is ~12% (1-(1-j⁴)³² at j=0.25), and since ALL
    * same-base cross-trio pairs sit at that level, phantom candidates
    * grew as reps² (260M pairs × two shingle-set payloads at reps=1000 —
    * measured filling the disk). Real corpora don't carry
    * reps²-correlated near-threshold families; the fixture must not
    * either, or it measures its own artifact instead of the engine.
    * Expected components ≈ docs/3 regardless of scale — dup structure,
    * bucket sizes, and union-find fan-in are all scale-invariant by
    * construction. Base docs shorter than the interleave stride are
    * excluded (their replicas cannot diverge, and a reps-sized identical
    * group is a dup-BOMB stress, not a linearity measurement).
    *
    * Embedding arm: trio-grouped jittered vectors (unit base + ±0.5/lane
    * group jitter decorrelates trios; a 5e-4 member epsilon keeps trio
    * cosine ≈ 1), blocked on SAMPLED pivots (SPANN-style: for dedup
    * blocking, pivots only need balance, not optimality — sampling costs
    * O(k) where training k-means with k ∝ n would dominate the whole
    * job; this keeps BLOCK SIZE constant as n grows, the lever that
    * holds the pair join at O(n·blockSize) instead of n^1.5).
    *
    * Usage: `runMain graft.TextScaleBench <sfDir> <reps> - dedup`
    * (reps=100 → 500k docs at sf0.1, reps=1000 → 5M). */
  def runDedup(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(length(col("text")) >= 120)
    val nBase = base.count()
    val corpusPath = Files.createTempDirectory("graft_dedupscale").toString
    base.select(col("doc_id"), col("text"))
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        concat(
          // whitespace collapses FIRST: the interleave pattern matches
          // single-space gaps, and the raw documents are line-structured —
          // un-collapsed, a line-heavy doc gets no group tokens at all, its
          // `reps` replicas stay mutually near-identical, and each such doc
          // contributes (reps choose 2) pairs: measured 66 GB of pair
          // shuffle at reps=1000 from exactly this
          regexp_replace(
            regexp_replace(trim(col("text")), lit("\\s+"), lit(" ")),
            lit("(\\S+ \\S+) "),
            concat(lit("$1 g"), floor(col("rep") / 3).cast("string"), lit(" "))),
          lit(" m"), (col("rep") % 3).cast("string")).as("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val n = corpus.count()
    println(s"DEDUPSCALE_CORPUS docs=$n (reps=$reps x $nBase, trio groups)")

    def timed(op: String)(f: => String): Unit = {
      val t0 = System.nanoTime()
      val detail = f
      println(f"DEDUPSCALE op=$op%-16s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s  $detail")
    }

    var assigns: org.apache.spark.sql.DataFrame = null
    timed("minhash_cc") {
      assigns = Dedup.dedupAssignments(corpus, 0.8).cache()
      val r = assigns.agg(count(lit(1)),
        count_distinct(col("component")),
        sum(col("is_canonical").cast("long"))).head()
      s"docs=${r.getLong(0)} components=${r.getLong(1)} canonical=${r.getLong(2)}"
    }
    timed("canonical_quality") {
      val qual = corpus.select(col("doc_id"),
        graft.text.TextOps.tokenCount(col("text")).cast("long").as("quality"))
      val r = Dedup.canonicalByQuality(assigns, qual)
        .agg(count(lit(1)), sum(col("is_canonical").cast("long"))).head()
      s"docs=${r.getLong(0)} canonical=${r.getLong(1)}"
    }
    assigns.unpersist()

    // embedding arm: 2.5 vectors per doc keeps the two corpora the same
    // order of magnitude (sf0.1 embeddings = 2000 rows vs 5000 docs)
    val vreps = math.max(3, (n / 2000L).toInt)
    val vecPath = Files.createTempDirectory("graft_dedupscale_vec").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("rep", explode(sequence(lit(0), lit(vreps - 1))))
      .select((col("vec_id") * vreps + col("rep")).as("vid"),
        expr("transform(embedding, (x, i) -> float(x + " +
          "(pmod(hash(vec_id, int(rep / 3), i), 1001) - 500) / 1000.0 + " +
          "(rep % 3) * 5.0e-4))").as("embedding"))
      .select(col("vid").as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(vecPath)
    val vec = spark.read.parquet(vecPath)
    val vn = vec.count()
    // sampled-pivot blocking: k ∝ n pins the expected block size at ~500
    // (×probes=2 → ~1000 rows/block), so the block-join pair count grows
    // linearly with n instead of n^1.5 under √n blocking
    val k = math.max(64, (vn / 500L).toInt)
    val pivots = vec.select(col("vec_id"),
        graft.functions.vector_normalize(col("embedding")).as("v"))
      .orderBy(xxhash64(col("vec_id"))).limit(k)
      .collect().map(_.getSeq[Float](1).toArray)
    println(s"DEDUPSCALE_VECTORS n=$vn pivots=$k (sampled, not trained)")
    timed("semantic_cc") {
      val r = Dedup.dedupAssignmentsEmbedding(vec, 0.5,
          presetCentroids = Some(pivots))
        .agg(count(lit(1)), count_distinct(col("component")),
          sum(col("is_canonical").cast("long"))).head()
      s"vectors=${r.getLong(0)} components=${r.getLong(1)} canonical=${r.getLong(2)}"
    }

    graft.index.Storage.deleteRecursively(corpusPath)
    graft.index.Storage.deleteRecursively(vecPath)
  }

  def run(spark: SparkSession, sfDir: String, reps: Int, numShards: Int): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val nBase = base.count()
    val corpusPath = Files.createTempDirectory("graft_textscale").toString
    base
      .select(col("doc_id"), col("text"))
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        // per-replica suffix token: replicas share every line except the
        // last, so the frequency table stresses both hot and cold keys
        concat(col("text"), lit(" r"), col("rep")).as("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val n = corpus.count()
    println(s"TEXTSCALE_CORPUS docs=$n (reps=$reps x $nBase)")

    def timed(op: String)(f: => String): Unit = {
      val t0 = System.nanoTime()
      val detail = f
      println(f"TEXTSCALE op=$op%-16s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s  $detail")
    }

    // newline after every 3rd token — the driver query's derivation
    val seg = corpus.select(col("doc_id"),
      regexp_replace(trim(col("text")), "(\\S+ \\S+ \\S+) ", "$1\n").as("text"))

    timed("line_dedup") {
      val out = Dedup.dedupBoilerplateLines(seg, minDocFreq = 3 * reps)
      val r = out.agg(count(lit(1)), sum("removed_lines"), sum("n_lines")).head()
      s"docs=${r.getLong(0)} removed=${r.getLong(1)}/${r.getLong(2)} lines"
    }

    val exportUri = Files.createTempDirectory("graft_textscale_export").toString
    timed("shard_export") {
      ShardExport.write(corpus, exportUri, numShards)
      val m = ShardExport.manifest(spark, exportUri)
        .agg(count(lit(1)), sum("n_docs"), sum("n_tokens")).head()
      s"shards=${m.getLong(0)} docs=${m.getLong(1)} tokens=${m.getLong(2)}"
    }

    timed("export_fsck") {
      val findings = ShardExport.fsck(spark, exportUri)
      require(findings.isEmpty, s"fsck found: $findings")
      "findings=0"
    }

    // BPE training: the corpus pass is the scale story (word-freq explode,
    // map-side combined); the merge loop runs on the top-V capped vocab
    var merges: Seq[(String, String)] = Seq.empty
    timed("bpe_train") {
      merges = graft.text.BpeTrainer
        .trainTopV(corpus, numMerges = 64, topV = 50000)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      s"merges=${merges.length} topV=50000"
    }
    timed("bpe_encode") {
      val r = graft.text.BpeTrainer.encodeTokenCounts(corpus, merges)
        .agg(count(lit(1)), sum("n_bpe_tokens")).head()
      s"docs=${r.getLong(0)} tokens=${r.getLong(1)} (64-replace codegen chain)"
    }
    timed("bpe_encode_kern") {
      val r = graft.text.BpeTrainer.encodeTokenCountsFast(corpus, merges)
        .agg(count(lit(1)), sum("n_bpe_tokens")).head()
      s"docs=${r.getLong(0)} tokens=${r.getLong(1)} (rank-greedy kernel, same 64 merges)"
    }
    // vocabulary-scale arm: a merge table the chain form could not codegen
    var deep: Seq[(String, String)] = Seq.empty
    timed("bpe_train_deep") {
      deep = graft.text.BpeTrainer
        .trainTopV(corpus, numMerges = 2048, topV = 50000)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      s"merges=${deep.size} topV=50000"
    }
    timed("bpe_encode_deep") {
      val r = graft.text.BpeTrainer.encodeTokenCountsFast(corpus, deep)
        .agg(count(lit(1)), sum("n_bpe_tokens")).head()
      s"docs=${r.getLong(0)} tokens=${r.getLong(1)} (kernel, ${deep.size} merges)"
    }
    // BYTE-level arm: GPT-2-style pretokens, hex-pair symbols — the
    // pretoken vocabulary is larger (case preserved, punctuation and
    // whitespace tokens), so topV caps the training state the same way
    var byteMerges: Seq[(String, String)] = Seq.empty
    timed("bpe_train_bytes") {
      byteMerges = graft.text.BpeTrainer
        .trainBytesTopV(corpus, numMerges = 2048, topV = 50000)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      s"merges=${byteMerges.size} topV=50000"
    }
    timed("bpe_encode_bytes") {
      val r = graft.text.BpeTrainer.encodeTokenCountsBytes(corpus, byteMerges)
        .agg(count(lit(1)), sum("n_bpe_tokens")).head()
      s"docs=${r.getLong(0)} tokens=${r.getLong(1)} (byte kernel, ${byteMerges.size} merges)"
    }
  }
}
