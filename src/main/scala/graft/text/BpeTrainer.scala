package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TOKENIZER TRAINING over a document corpus — the
  * "learn the vocabulary" step of a training-data pipeline (the sibling
  * of [[TextOps]]' token COUNTING, which assumes a tokenizer already
  * exists). The algorithm is Sennrich et al. 2016 subword BPE: iterate
  * "most frequent adjacent symbol pair merges into a new symbol".
  *
  * Scale decomposition (the SentencePiece/HF trainer shape):
  *
  *   1. '''Corpus pass''' (the only corpus-sized stage): word
  *      frequencies via explode → map-side-combined count. What crosses
  *      the shuffle is one row per DISTINCT word per input partition —
  *      vocabulary-sized, not corpus-sized.
  *   2. '''Merge loop''' (driver-local over the vocab): BPE training
  *      state is the word-frequency table, which is vocab-sized BY
  *      CONSTRUCTION — so after a size-GATED collect
  *      (`spark.graft.maxBpeVocab`, named error past it; cap with
  *      [[trainTopV]] to bound any corpus) the merge loop runs locally,
  *      like every other model fit here (centroids, PQ codebooks, LM).
  *
  * Engine-neutral determinism (the oracle contract): words are
  * lowercase `[a-z]+` runs; a word's segmentation is its symbols joined
  * by single spaces WITH a sentinel space at both ends (`" f a s t "`),
  * so every symbol is space-flanked; pair selection breaks ties by
  * (count desc, then the "left right" pair STRING ascending — binary
  * order, safe because symbols are pure ASCII); a merge applies as
  * leftmost non-overlapping string replacement of `" l r "` by
  * `" lr "` — the exact semantics of SQL `replace`, so a SQL engine
  * replays every training step and [[encodeExpr]]'s replace chain
  * bit-identically. The sentinels are load-bearing: an unanchored
  * `"l r"` pattern can match ACROSS symbol boundaries (`"a s"` inside
  * `"f a st"` would fuse `a` with half of the symbol `st`), silently
  * corrupting segmentations — caught by the 500k-doc probe when the
  * rank-greedy kernel (which works on real symbol arrays) disagreed
  * with the chain by ~2% of tokens.
  */
object BpeTrainer {

  val MaxVocabKey = "spark.graft.maxBpeVocab"
  val DefaultMaxVocab = 4000000L

  /** GPT-2-style pretokenizer for BYTE-level training — the RE2-safe
    * subset, so Spark (Java regex) and the DuckDB oracle (RE2) split
    * text identically. Two documented deviations from the exact GPT-2
    * pattern: (1) the trailing-whitespace lookahead `\s+(?!\S)` is not
    * RE2-expressible, so a run of 2+ whitespace characters absorbs
    * greedily instead of donating its last space to the next word
    * (single inter-word spaces still attach to words — the common case
    * is identical); (2) `\s` is spelled as an explicit ASCII class
    * because Java's `\s` includes `\x0B` and RE2's does not. Case is
    * PRESERVED (byte-level BPE sees the raw text), unlike the
    * lowercase letter-mode trainer. */
  val BytePretokenRegex: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+|[ \\t\\n\\r\\f]+"

  /** Lowercase `[a-z]+` word frequencies — stage 1, the corpus pass. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** [[BytePretokenRegex]] pretoken frequencies — the byte-mode corpus
    * pass (case preserved, every character covered incl. non-ASCII). */
  def byteWordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(BytePretokenRegex), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** A pretoken's UTF-8 bytes as sentinel-spaced UPPERCASE-hex symbols
    * (`" 48 65 "` for "He") — the byte-mode segmentation alphabet. Hex
    * pairs keep symbols ASCII and space-free, so the sentinel-anchored
    * replace contract and the (count desc, pair asc) binary tie-break
    * carry over unchanged, and a SQL engine derives the same spacing as
    * `' ' || regexp_replace(hex(encode(word)), '(..)', '\\1 ', 'g')`. */
  private[text] def hexSpaced(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 3 + 1)
    sb.append(' ')
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xFF
      sb.append(HexDigits(v >> 4)).append(HexDigits(v & 0xF)).append(' ')
      i += 1
    }
    sb.toString
  }
  private[text] val HexDigits = "0123456789ABCDEF"

  /** Learn `numMerges` BPE merges. Returns (rank, pair, merged) with
    * rank 1-based in learning order; stops early (fewer rows) when no
    * adjacent pair remains. `maxVocab` guards the driver collect —
    * use [[trainTopV]] to bound an unbounded-vocabulary corpus first. */
  def train(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text"): DataFrame =
    trainFromFrequencies(wordFrequencies(docs, textCol), numMerges)

  /** [[train]] over the `topV` most frequent words only (ties broken by
    * word ascending, so the kept set is deterministic and replayable) —
    * the bound that makes training state fixed-size at ANY corpus size.
    * The cut rides a [[graft.functions.MinTopK]]-style heap via top-k
    * aggregation, not a global sort. */
  def trainTopV(
      docs: DataFrame,
      numMerges: Int,
      topV: Int,
      textCol: String = "text"): DataFrame = {
    val wf = wordFrequencies(docs, textCol)
    // (-freq, word) ascending == (freq desc, word asc); the pair count is
    // vocab-sized already, so a bounded sort-limit here is driver-cheap
    // and engine-replayable
    val kept = wf.orderBy(col("freq").desc, col("word")).limit(topV)
    trainFromFrequencies(kept, numMerges)
  }

  /** [[train]] at the BYTE level: GPT-2-style pretokens
    * ([[BytePretokenRegex]]), symbols = UTF-8 bytes as hex pairs
    * ([[hexSpaced]]) — non-ASCII text trains as its real byte
    * sequences. Same shape as [[train]]: one corpus pass, vocab-gated
    * driver merge loop, SQL-replayable contract. */
  def trainBytes(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text"): DataFrame =
    trainFromFrequencies(byteWordFrequencies(docs, textCol), numMerges,
      spacer = hexSpaced)

  /** [[trainBytes]] over the `topV` most frequent pretokens only. */
  def trainBytesTopV(
      docs: DataFrame,
      numMerges: Int,
      topV: Int,
      textCol: String = "text"): DataFrame = {
    val wf = byteWordFrequencies(docs, textCol)
    val kept = wf.orderBy(col("freq").desc, col("word")).limit(topV)
    trainFromFrequencies(kept, numMerges, spacer = hexSpaced)
  }

  private[text] def charSpaced(w: String): String =
    " " + w.toCharArray.mkString(" ") + " "

  private[text] def trainFromFrequencies(
      wordFreq: DataFrame, numMerges: Int,
      spacer: String => String = charSpaced): DataFrame = {
    require(numMerges >= 1, s"graft: BPE numMerges must be >= 1, got $numMerges")
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val maxVocab = graft.Conf.long(spark, MaxVocabKey, DefaultMaxVocab)
    val n = wordFreq.limit(math.min(maxVocab + 1, Int.MaxValue.toLong).toInt).count()
    require(n <= maxVocab,
      s"graft: BPE vocabulary exceeds $MaxVocabKey=$maxVocab words — cap the " +
        "corpus with trainTopV or raise the gate")
    // vocab-sized by the gate above: the standard trainer shape (the merge
    // loop needs every word's evolving segmentation — per-iteration Spark
    // jobs over a model-sized table would be pure scheduling overhead)
    val words = wordFreq.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)].collect()
    // sentinel-spaced segmentation: " f a s t " letter-mode, " 48 65 "
    // byte-mode (see class doc — the flanking spaces keep replaces
    // anchored at symbol boundaries)
    val spaced = words.map { case (w, f) => (spacer(w), f) }
    val merges = Seq.newBuilder[(Int, String, String)]
    var cur = spaced
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // count every adjacent occurrence (overlaps included), like the
      // reference BPE formulation
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      cur.foreach { case (w, f) =>
        val syms = w.trim.split(' ')
        var i = 0
        while (i < syms.length - 1) {
          val pair = syms(i) + " " + syms(i + 1)
          counts.update(pair, counts.getOrElse(pair, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bestPair: String = null
        var bestCount = Long.MinValue
        counts.foreach { case (pair, c) =>
          if (c > bestCount || (c == bestCount && pair.compareTo(bestPair) < 0)) {
            bestPair = pair; bestCount = c
          }
        }
        val merged = bestPair.replace(" ", "")
        merges += ((rank, bestPair, merged))
        // String.replace = leftmost non-overlapping, the SQL replace
        // contract; sentinel-anchored so only whole symbols match
        cur = cur.map { case (w, f) =>
          (w.replace(" " + bestPair + " ", " " + merged + " "), f)
        }
        rank += 1
      }
    }
    merges.result().toDF("rank", "pair", "merged")
  }

  /** Token count of `textCol` under a learned merge table, as a pure
    * codegen'd Column: space out the word's characters, apply each merge
    * in rank order as a `replace` (Sennrich's apply-in-learning-order
    * encoding — for merges learned by [[train]] this reproduces the
    * training segmentation), count space-separated segments. The merge
    * table is MODEL-sized and rides the plan as literals — no UDF, no
    * join, whole-stage codegen keeps the chain in one pass per row. */
  def encodeExpr(word: Column, merges: Seq[(String, String)]): Column = {
    // " f a s t " — sentinel-spaced so each replace is boundary-anchored
    val spaced = concat(lit(" "), regexp_replace(word, "(.)", "$1 "))
    merges.foldLeft(spaced) { case (c, (pair, merged)) =>
      call_function("replace", c, lit(" " + pair + " "), lit(" " + merged + " "))
    }
  }

  /** [[encodeTokenCounts]] through the chain-faithful kernel expression
    * ([[BpeTokenCount]]) — ONE codegen'd call per document instead of a
    * replace pass per merge, the form that scales to real 32k-merge
    * vocabularies. Segmentation-identical to the chain for ANY merge
    * table (one consumed-boundary pass per rank, in rank order —
    * property-pinned incl. repeat-pair words); no explode, no shuffle
    * beyond the final per-doc projection (the kernel sums words
    * internally). */
  def encodeTokenCountsFast(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    docs.select(col(idCol),
      toColumn(BpeTokenCount(toExpression(col(textCol)), merges.map(_._1).toArray))
        .as("n_bpe_tokens"))
  }

  /** Token-ID export ([[BpeTokenIds]]): one (idCol, pos, token_id) row
    * per token, pos 0-based across the document's concatenated words —
    * the form a dataloader consumes. Wordless documents emit no rows. */
  def encodeIds(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    docs
      .select(col(idCol),
        toColumn(BpeTokenIds(toExpression(col(textCol)), merges.map(_._1).toArray))
          .as("__ids"))
      .select(col(idCol), posexplode(col("__ids")).as(Seq("pos", "token_id")))
  }

  /** BYTE-level token counts under a [[trainBytes]] merge table — one
    * codegen'd [[BpeByteTokenCount]] call per document. */
  def encodeTokenCountsBytes(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    docs.select(col(idCol),
      toColumn(BpeByteTokenCount(toExpression(col(textCol)), merges.map(_._1).toArray))
        .as("n_bpe_tokens"))
  }

  /** BYTE-level token-ID export under a [[trainBytes]] merge table
    * ([[BpeByteTokenIds]]): (idCol, pos, token_id), ids 0–255 = raw
    * bytes, 256+i = merge i's output; pos 0-based across the document's
    * pretokens. Empty documents emit no rows. */
  def encodeIdsBytes(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    docs
      .select(col(idCol),
        toColumn(BpeByteTokenIds(toExpression(col(textCol)), merges.map(_._1).toArray))
          .as("__ids"))
      .select(col(idCol), posexplode(col("__ids")).as(Seq("pos", "token_id")))
  }

  /** Per-document BPE token counts under `merges` (rank-ordered pairs):
    * (idCol, n_bpe_tokens). Documents with no `[a-z]+` word drop out —
    * the same contract as the oracle's word explode. */
  def encodeTokenCounts(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
          .as("__word"))
      .select(col(idCol),
        size(split(trim(encodeExpr(col("__word"), merges)), " "))
          .cast("long").as("__nt"))
      .groupBy(idCol)
      .agg(sum(col("__nt")).as("n_bpe_tokens"))
}
