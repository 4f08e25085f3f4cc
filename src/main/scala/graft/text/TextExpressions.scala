package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit — a tiny, dependency-free, stable string hash used by the
  * signature expressions below (stability across JVMs matters more than
  * avalanche quality here). */
private[text] object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
    h
  }
}

/** 64-bit SimHash (Charikar) over a token array: per-bit votes weighted by
  * token occurrence. Near-identical token multisets land within a small
  * Hamming distance. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = Fnv64.hashBytes(s.getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken, SIGMOD'03):
  * rolling FNV hashes of character k-grams, then the minimum hash of each
  * sliding window of `w` consecutive k-gram hashes, deduplicated and
  * sorted. Robust to local edits; the standard copy-detection fingerprint. */
case class WinnowFingerprint(child: Expression, k: Int = 5, w: Int = 4)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "winnow_fingerprint: k and w must be positive")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprint requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    if (bytes.length < k) {
      return new GenericArrayData(Array(Fnv64.hashBytes(bytes)))
    }
    val nGrams = bytes.length - k + 1
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = Fnv64.Offset
      var j = 0
      while (j < k) { h ^= (bytes(i + j) & 0xffL); h *= Fnv64.Prime; j += 1 }
      grams(i) = h
      i += 1
    }
    // windows overlap, so consecutive picks repeat heavily: collect into a
    // primitive array (skipping immediate repeats), then sort + dedup in
    // place — same sorted-distinct result as a tree set without boxing a
    // Long per window
    val lastWin = math.max(0, nGrams - w)
    val picks = new Array[Long](lastWin + 1)
    var nPicks = 0
    var s = 0
    while (s <= lastWin) {
      var m = grams(s)
      var j = s + 1
      val e = math.min(s + w, nGrams)
      while (j < e) { if (grams(j) < m) m = grams(j); j += 1 }
      if (nPicks == 0 || picks(nPicks - 1) != m) { picks(nPicks) = m; nPicks += 1 }
      s += 1
    }
    java.util.Arrays.sort(picks, 0, nPicks)
    var out = 0
    var i2 = 0
    while (i2 < nPicks) {
      if (out == 0 || picks(out - 1) != picks(i2)) { picks(out) = picks(i2); out += 1 }
      i2 += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(picks, out))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Public face of the FNV hash for other graft modules (embeddings etc.). */
object Fnv64Public {
  def hash(s: String): Long = Fnv64.hashBytes(s.getBytes("UTF-8"))
}

/** FNV-1a 64-bit of a string column — the engine's stable, oracle-replayable
  * hash (DuckDB replays it in HUGEINT mod-2^64 arithmetic) exposed as an
  * expression. Used where a hash value is part of the OPERATOR CONTRACT
  * (deterministic split/sample assignment must reproduce across engines and
  * releases); engine-internal hashing (shuffle keys that never reach the
  * output) uses the codegen'd built-in `xxhash64` instead. */
case class Fnv64Hash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fnv64 requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fnv64"

  override protected def nullSafeEval(v: Any): Any =
    Fnv64.hashBytes(v.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All `n`-token shingles of whitespace-tokenized text in POSITION order
  * (with duplicates — position i holds tokens[i..i+n-1] space-joined), so
  * `posexplode` recovers (position, shingle) pairs. Documents with fewer
  * than `n` tokens yield an EMPTY array: a short document has no length-n
  * span to duplicate (unlike [[ShingleSet3]]'s degenerate whole-text
  * shingle, which exists so every doc has a similarity key).
  *
  * One pass for the same reason as [[ShingleSet3]]: a
  * `transform(sequence(...), i -> slice(split(text)...))` formulation
  * re-tokenizes the document per shingle (HOF lambdas don't CSE). */
case class PositionalShingles(child: Expression, n: Int = 5)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "positional_shingles: n must be positive")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"positional_shingles requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "positional_shingles"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass stopword-profile vote over a token array: hash-map lookup per
  * token → per-language occurrence counts → argmax (ties toward the
  * lexicographically larger code, zero hits → 'und').
  *
  * Replaces the composed-Column formulation
  * (`greatest(struct(size(filter(split(text), contains(words)))...))`):
  * higher-order-function lambdas don't common-subexpression-eliminate, so
  * that shape re-splits the document PER LANGUAGE and scans each token
  * against each word list — 6 tokenizations and 60 comparisons per token
  * where one map probe suffices (the same HOF-CSE trap ShingleSet3
  * documents above). Semantics identical (langid oracle unchanged). */
case class StopwordVote(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"stopword_vote requires array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stopword_vote"

  @transient private lazy val langs: Array[String] =
    TextOps.stopwords.keys.toArray.sorted
  @transient private lazy val und: UTF8String = UTF8String.fromString("und")
  @transient private lazy val langUtf: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  /** token → indices of the languages whose profile contains it (shared
    * stopwords like 'la'/'de'/'e' vote for several). */
  @transient private lazy val table: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    langs.zipWithIndex.foreach { case (lang, i) =>
      TextOps.stopwords(lang).foreach { w =>
        val k = UTF8String.fromString(w)
        m.put(k, Option(m.get(k)).map(_ :+ i).getOrElse(Array(i)))
      }
    }
    m
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](langs.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val hit = table.get(t)
        if (hit != null) { var j = 0; while (j < hit.length) { counts(hit(j)) += 1; j += 1 } }
      }
      i += 1
    }
    // argmax with >=: langs are sorted ascending, so a tied later (larger)
    // code wins — greatest(struct(score, lang)) semantics
    var best = -1; var bestScore = 0
    var l = 0
    while (l < counts.length) {
      if (counts(l) > 0 && counts(l) >= bestScore) { best = l; bestScore = counts(l) }
      l += 1
    }
    if (best < 0) und else langUtf(best)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct 3-shingle set of whitespace-tokenized text in ONE pass.
  *
  * Replaces the higher-order-function formulation
  * (`transform(sequence(...), i -> concat_ws(element_at(split(text), i±k)))`):
  * Spark evaluates HOF lambdas interpreted with no common-subexpression
  * elimination, so the `split` re-tokenized the WHOLE document once per
  * shingle — O(tokens²) per document, measured as ~75% of the MinHash-LSH
  * wall clock at bench scale. Semantics are pinned by the dedup DuckDB
  * oracles: trim, split on `\s+`, space-joined trigrams in first-occurrence
  * order, documents under 3 tokens collapse to `[trim(text)]`. */
case class ShingleSet3(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_set3 requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_set3"

  override protected def nullSafeEval(v: Any): Any = {
    val t = v.asInstanceOf[UTF8String].toString.trim
    val toks = t.split("\\s+")
    if (toks.length < 3) {
      new GenericArrayData(Array[Any](UTF8String.fromString(t)))
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var j = 0
      while (j <= toks.length - 3) {
        seen.add(toks(j) + " " + toks(j + 1) + " " + toks(j + 2))
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet3 =
    copy(child = newChild)
}

/** Per-document character-trigram COUNTS in one pass:
  * `array<struct<gram:string, cnt:long>>` over the lowercased text, one
  * entry per DISTINCT trigram (first-occurrence order), duplicates
  * counted.
  *
  * The partial-aggregation front of [[LangModel]]: exploding this array
  * produces one row per distinct gram per document instead of one row per
  * CHARACTER, so the model-join probe count and the per-document
  * re-aggregate shrink by the corpus' mean gram duplication factor while
  * the downstream integer sums stay exactly `Σ cnt·logp`. Lowercasing and
  * slicing use the same UTF8String kernels as Spark's `lower`/`substr`
  * ([[LangModel.trigramArray]]'s pinned semantics — the DuckDB oracles
  * replay them). */
case class CharTrigramCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_trigram_counts requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("gram", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_trigram_counts"

  override protected def nullSafeEval(v: Any): Any = {
    val t = v.asInstanceOf[UTF8String].toLowerCase
    val n = t.numChars()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 1
    while (i <= n - 2) {
      val g = t.substringSQL(i, 3)
      counts.merge(g, 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharTrigramCounts =
    copy(child = newChild)
}

/** Per-document hashed word-bigram bucket counts: lowercase, trim,
  * whitespace-split, join adjacent token pairs with a single space, FNV-1a
  * the pair, and take the UNSIGNED remainder mod `buckets` — exactly
  * `fnv64(tok[i] || ' ' || tok[i+1]) % buckets` on DuckDB's HUGEINT side,
  * so an oracle replays the feature extraction verbatim.
  *
  * The DSIR feature front ([[Dsir]] — Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling", arXiv:2302.03169, which
  * uses hashed n-gram bucket counts exactly like this): one pass per
  * document, one output row per DISTINCT bucket (first-seen order), so the
  * downstream model join explodes per distinct bucket, not per token. */
case class BigramBucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression with CodegenFallback {
  require(buckets > 0, s"bigram_bucket_counts: buckets must be positive, got $buckets")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bigram_bucket_counts requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bigram_bucket_counts"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toLowerCase.trim().toString
      .split("\\s+")
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[java.lang.Long, Long]()
    var i = 0
    while (i < toks.length - 1) {
      val h = Fnv64.hashBytes((toks(i) + " " + toks(i + 1)).getBytes("UTF-8"))
      val b = java.lang.Long.remainderUnsigned(h, buckets.toLong)
      counts.merge(b, 1L, (a, c) => a + c)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BigramBucketCounts =
    copy(child = newChild)
}

/** Per-document word-substring piece counts — the seed-vocabulary front of
  * subword tokenizer training (SentencePiece's unigram init takes the most
  * frequent substrings, Kudo 2018 arXiv:1804.10959 §3.2; WordPiece marks
  * word-internal continuations with "##", which this reproduces). For each
  * lowercased whitespace token, every substring of length 1..maxLen is
  * counted, prefixed "##" unless word-initial. One pass, one output row
  * per DISTINCT piece per document (first-seen order), so the global
  * aggregate shuffles distinct-piece rows, not positions×lengths. */
case class WordPieceCounts(child: Expression, maxLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxLen > 0, s"word_piece_counts: maxLen must be positive, got $maxLen")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_piece_counts requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_piece_counts"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toLowerCase.trim().toString
      .split("\\s+")
    val counts = new java.util.LinkedHashMap[String, Long]()
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var i = 0
      while (i < w.length) {
        val maxL = math.min(maxLen, w.length - i)
        var l = 1
        while (l <= maxL) {
          val raw = w.substring(i, i + l)
          val piece = if (i == 0) raw else "##" + raw
          counts.merge(piece, 1L, (a, b) => a + b)
          l += 1
        }
        i += 1
      }
      t += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCounts =
    copy(child = newChild)
}

/** Unicode NFC normalization (UAX #15, java.text.Normalizer) — the
  * canonical-composition pass every text pipeline runs before hashing or
  * deduplicating: visually-identical strings with different codepoint
  * sequences ("e" + COMBINING ACUTE vs the precomposed "é") collapse to
  * one byte form, so downstream fingerprints, dedup keys, and tokenizers
  * see one document, not two. Both the JDK and DuckDB's utf8proc
  * implement the same published algorithm, so the oracle replays it with
  * `nfc_normalize` exactly. */
case class NfcNormalize(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // the common case (already-NFC ascii/CJK) short-circuits without
    // allocating a normalized copy
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
