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
    val spark = SparkSession.builder()
      .appName("graft-text-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, reps, numShards)
    finally spark.stop()
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
