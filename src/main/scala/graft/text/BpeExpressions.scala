package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE token count under a trained merge table, as ONE codegen'd kernel
  * call — the production-scale sibling of [[BpeTrainer.encodeExpr]]'s
  * replace chain. The chain form is perfect for model-sized demos and
  * for the SQL oracle that replays it, but it is one codegen'd `replace`
  * pass PER MERGE: a real 32k-merge vocabulary would blow past codegen
  * method limits and scan each word 32k times. This expression instead
  * visits only the merge ranks whose pair actually OCCURS in the word
  * (one symbol-array pass per such rank, in increasing rank order), with
  * the merge table riding the generated code as a reference object (the
  * [[graft.functions.NearestCentroid]] pattern).
  *
  * Equivalence (chain-faithful, property-pinned in BpeTrainerSpec incl.
  * repeat-pair words like "banana"/"aaaa"): the chain applies each merge
  * rank exactly ONCE as a `String.replace` pass, whose matches live in
  * the PRE-pass string and consume the shared boundary space — so after
  * merging symbols (i, i+1), the earliest next match in the same pass
  * starts at pre-merge symbol i+3 (the space before symbol i+2 was
  * consumed), and leftover/re-formed occurrences of an already-applied
  * rank are never revisited. The kernel replicates exactly that: each
  * pass merges with the i+3 resume rule, and the next pass is the
  * minimum PRESENT rank STRICTLY GREATER than the last applied one
  * (skipping absent ranks is a no-op in the chain too).
  *
  * Tokenization contract matches [[BpeTrainer]]: words are `[a-z]+` runs
  * of the LOWERCASED text (UTF8String lowering, identical to Spark's
  * `lower`), tokens sum over words. */
case class BpeTokenCount(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string argument, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  /** pair ("l r") → rank; compiled once, shared by eval and codegen. */
  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.countTokens(v.asInstanceOf[UTF8String], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.text.BpeKernel.countTokens($s, $ranksRef);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BPE token IDS under a trained merge table — the export form a
  * training pipeline actually ships to dataloaders. Same chain-faithful
  * kernel and tokenization contract as [[BpeTokenCount]]; the
  * vocabulary is DERIVED from the merge table (ids 0–25 = a–z, 26+i =
  * the output of merge index i), so the id space is reproducible by any
  * engine holding the same merges — the SQL oracle re-learns the merges
  * and re-derives the mapping. Duplicate merge outputs are refused at
  * construction: two merges producing one string would make ids
  * ambiguous. (Consumed-boundary training CAN in principle re-pick a
  * leftover pair at a later rank and emit such a duplicate — refusing
  * loudly here beats silently choosing one of two valid ids the oracle
  * might derive differently.) */
case class BpeTokenIds(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_ids requires a string argument, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_ids"

  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }

  private lazy val mergedIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val sym = merges(i).replace(" ", "")
      require(m.put(sym, Integer.valueOf(26 + i)) == null,
        s"graft: two merges output '$sym' — ambiguous vocabulary (not a train() table)")
      i += 1
    }
    m
  }

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BpeKernel.tokenIds(v.asInstanceOf[UTF8String], ranks, mergedIds))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    val idsRef = ctx.addReferenceObj("bpeMergedIds", mergedIds, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.text.BpeKernel.tokenIds($s, $ranksRef, $idsRef));"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BYTE-level BPE token count — [[BpeTokenCount]]'s sibling for merge
  * tables trained by [[BpeTrainer.trainBytes]]: pretokens come from the
  * GPT-2-style [[BpeTrainer.BytePretokenRegex]] (case preserved, every
  * character covered), symbols are UTF-8 bytes rendered as uppercase
  * hex pairs, and the same chain-faithful pass/resume contract applies
  * in hex-symbol space. */
case class BpeByteTokenCount(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_byte_token_count requires a string argument, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_byte_token_count"

  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.byteCountTokens(v.asInstanceOf[UTF8String], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeByteRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.text.BpeKernel.byteCountTokens($s, $ranksRef);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BYTE-level BPE token IDS — [[BpeTokenIds]]'s byte-mode sibling: ids
  * 0–255 are the raw bytes, 256 + i is the output of merge index i
  * (hex-pair symbols decode to their byte value). Duplicate merge
  * outputs refused, same as letter mode. */
case class BpeByteTokenIds(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_byte_token_ids requires a string argument, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_byte_token_ids"

  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }

  private lazy val mergedIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val sym = merges(i).replace(" ", "")
      require(m.put(sym, Integer.valueOf(256 + i)) == null,
        s"graft: two merges output '$sym' — ambiguous vocabulary")
      i += 1
    }
    m
  }

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BpeKernel.byteTokenIds(v.asInstanceOf[UTF8String], ranks, mergedIds))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeByteRanks", ranks, "java.util.HashMap")
    val idsRef = ctx.addReferenceObj("bpeByteMergedIds", mergedIds, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.text.BpeKernel.byteTokenIds($s, $ranksRef, $idsRef));"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeKernel {

  /** [[BpeTrainer.BytePretokenRegex]], compiled once per JVM; Pattern is
    * thread-safe (each call mints its own matcher). */
  private lazy val bytePretokenPattern =
    java.util.regex.Pattern.compile(BpeTrainer.BytePretokenRegex)

  /** Sum of per-pretoken BPE segment counts over the GPT-2-style
    * pretokens of the raw text (byte mode: case preserved). */
  def byteCountTokens(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Long = {
    val s = text.toString
    val m = bytePretokenPattern.matcher(s)
    var total = 0L
    while (m.find()) {
      val hx = toHex(s.substring(m.start, m.end))
      val (_, _, count) = encodeSpans(hx, 0, hx.length, 2, ranks)
      total += count
    }
    total
  }

  /** Byte-mode token IDS: pretokens in document order, each segmented in
    * hex-symbol space; a 2-char segment is its byte value (0–255), a
    * longer one is a merge output resolved through `mergedIds`. */
  def byteTokenIds(
      text: UTF8String,
      ranks: java.util.HashMap[String, Integer],
      mergedIds: java.util.HashMap[String, Integer]): Array[Int] = {
    val s = text.toString
    val m = bytePretokenPattern.matcher(s)
    val out = new scala.collection.mutable.ArrayBuffer[Int](64)
    while (m.find()) {
      val hx = toHex(s.substring(m.start, m.end))
      val (starts, ends, count) = encodeSpans(hx, 0, hx.length, 2, ranks)
      var k = 0
      while (k < count) {
        val len = ends(k) - starts(k)
        if (len == 2) out += hexVal(hx.charAt(starts(k))) * 16 + hexVal(hx.charAt(starts(k) + 1))
        else {
          val sym = hx.substring(starts(k), ends(k))
          val id = mergedIds.get(sym)
          if (id == null) throw new IllegalStateException(
            s"graft: BPE segment '$sym' is not any merge's output — " +
              "the merge table is not self-consistent")
          out += id.intValue()
        }
        k += 1
      }
    }
    out.toArray
  }

  /** UPPERCASE hex of a string's UTF-8 bytes ([[BpeTrainer.hexSpaced]]'s
    * alphabet without the spacing — spans carry the boundaries). */
  private def toHex(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xFF
      sb.append(BpeTrainer.HexDigits(v >> 4)).append(BpeTrainer.HexDigits(v & 0xF))
      i += 1
    }
    sb.toString
  }

  private def hexVal(c: Char): Int = if (c <= '9') c - '0' else c - 'A' + 10

  /** Sum of per-word BPE segment counts over the `[a-z]+` runs of the
    * lowercased text. */
  def countTokens(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Long = {
    // UTF8String lowering = Spark's lower(): the [a-z] runs extracted
    // below then match BpeTrainer's lower + regexp contract exactly
    val s = text.toLowerCase.toString
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var j = i + 1
        while (j < n && s.charAt(j) >= 'a' && s.charAt(j) <= 'z') j += 1
        total += encodeWordSegments(s, i, j, ranks)
        i = j
      } else i += 1
    }
    total
  }

  /** Token IDS over the `[a-z]+` runs of the lowercased text, words
    * concatenated in document order. Vocabulary contract: ids 0–25 are
    * the single characters a–z; 26 + r is the symbol created by the
    * merge of (1-based) rank r+1 — i.e. merge index r in learning
    * order. `mergedIds` maps each merge's OUTPUT string to its id. */
  def tokenIds(
      text: UTF8String,
      ranks: java.util.HashMap[String, Integer],
      mergedIds: java.util.HashMap[String, Integer]): Array[Int] = {
    val s = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var j = i + 1
        while (j < n && s.charAt(j) >= 'a' && s.charAt(j) <= 'z') j += 1
        val (starts, ends, count) = encodeWordSpans(s, i, j, ranks)
        var k = 0
        while (k < count) {
          val len = ends(k) - starts(k)
          if (len == 1) out += (s.charAt(starts(k)) - 'a')
          else {
            val sym = s.substring(starts(k), ends(k))
            val id = mergedIds.get(sym)
            if (id == null) throw new IllegalStateException(
              s"graft: BPE segment '$sym' is not any merge's output — " +
                "the merge table is not self-consistent (not produced by train())")
            out += id.intValue()
          }
          k += 1
        }
        i = j
      } else i += 1
    }
    out.toArray
  }

  /** Chain-faithful BPE segment count for word = s[from, until). */
  private[text] def encodeWordSegments(
      s: String, from: Int, until: Int,
      ranks: java.util.HashMap[String, Integer]): Int = {
    val (_, _, count) = encodeWordSpans(s, from, until, ranks)
    count
  }

  /** Chain-faithful BPE segmentation spans for word = s[from, until).
    * Replays [[BpeTrainer.encodeExpr]]'s replace chain in symbol space:
    * ranks are applied in strictly increasing order, each exactly once,
    * and within a pass a merge at (i, i+1) consumes the boundary space
    * after symbol i+1, so the next in-pass match cannot START before
    * pre-merge symbol i+3 (see the class doc; "banana" with merge "a n"
    * stays [b, an, a, n, a], never [b, an, an, a]). */
  private def encodeWordSpans(
      s: String, from: Int, until: Int,
      ranks: java.util.HashMap[String, Integer]): (Array[Int], Array[Int], Int) =
    encodeSpans(s, from, until, 1, ranks)

  /** The span encoder behind both alphabets: initial symbols are
    * `symWidth`-char slices of s[from, until) (1 = letter mode, 2 =
    * byte-mode hex pairs); the merge loop is width-agnostic (spans
    * concatenate, pair keys substring). */
  private def encodeSpans(
      s: String, from: Int, until: Int, symWidth: Int,
      ranks: java.util.HashMap[String, Integer]): (Array[Int], Array[Int], Int) = {
    val len = (until - from) / symWidth
    // symbols as (start, end) half-open spans over s — merging is span
    // concatenation, no string building until a rank lookup needs one
    val starts = new Array[Int](math.max(len, 1))
    val ends = new Array[Int](math.max(len, 1))
    if (len <= 1) {
      if (len == 1) { starts(0) = from; ends(0) = until }
      return (starts, ends, len)
    }
    var k = 0
    while (k < len) {
      starts(k) = from + k * symWidth; ends(k) = from + (k + 1) * symWidth
      k += 1
    }
    var count = len
    var lastRank = -1
    var continueLoop = true
    while (continueLoop && count > 1) {
      // minimum present rank the chain has not yet reached: the chain
      // applies every rank once in 1..V order, so ranks <= lastRank are
      // behind it (their leftovers are final), and absent ranks between
      // lastRank and `best` would have been no-op passes
      var best = Int.MaxValue
      var i = 0
      while (i < count - 1) {
        val r = ranks.get(pairKey(s, starts, ends, i))
        if (r != null && r.intValue() > lastRank && r.intValue() < best)
          best = r.intValue()
        i += 1
      }
      if (best == Int.MaxValue) continueLoop = false
      else {
        // ONE replace pass for rank `best` over the pre-pass symbols:
        // leftmost matches, and a merge at (r2, r2+1) consumes the
        // boundary space after r2+1, so symbol r2+2 is copied verbatim
        // (it cannot start the next match) and matching resumes at r2+3
        var w = 0 // write index
        var r2 = 0 // read index
        while (r2 < count) {
          if (r2 < count - 1 && rankOf(s, starts, ends, r2, ranks) == best) {
            starts(w) = starts(r2); ends(w) = ends(r2 + 1)
            w += 1
            if (r2 + 2 < count) {
              starts(w) = starts(r2 + 2); ends(w) = ends(r2 + 2)
              w += 1
            }
            r2 += 3
          } else {
            starts(w) = starts(r2); ends(w) = ends(r2)
            r2 += 1
            w += 1
          }
        }
        count = w
        lastRank = best
      }
    }
    (starts, ends, count)
  }

  private def rankOf(
      s: String, starts: Array[Int], ends: Array[Int], i: Int,
      ranks: java.util.HashMap[String, Integer]): Int = {
    val r = ranks.get(pairKey(s, starts, ends, i))
    if (r == null) Int.MaxValue else r.intValue()
  }

  private def pairKey(s: String, starts: Array[Int], ends: Array[Int], i: Int): String = {
    val sb = new java.lang.StringBuilder(
      (ends(i) - starts(i)) + (ends(i + 1) - starts(i + 1)) + 1)
    sb.append(s, starts(i), ends(i)).append(' ').append(s, starts(i + 1), ends(i + 1))
    sb.toString
  }
}
