package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * entirely from codegen'd `org.apache.spark.sql.functions` so they stay
  * inside whole-stage codegen (no UDFs in the hot path).
  *
  * These extend the reference's object/text layer (reference:
  * apis/python/src/tiledb/vector_search/object_readers/directory_reader.py
  * chunks text and the embeddings package vectorizes it) with the classic
  * corpus hygiene operators: tokenization, quality stats, language ID,
  * fingerprinting.
  */
object TextOps {

  /** Whitespace tokenization — `\s+` split of the trimmed text. Matches
    * DuckDB `regexp_split_to_array(trim(x), '\s+')` for oracle parity. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical text normalization — the pass a pipeline runs BEFORE any
    * hashing, dedup, or tokenization so byte-different spellings of the
    * same text collapse: Unicode NFC ([[NfcNormalize]]; "e"+combining
    * acute ≡ precomposed "é"), zero-width characters stripped
    * (ZWSP/ZWNJ/ZWJ/BOM — invisible dedup poison), C0 controls stripped
    * (tab/newline kept), line endings unified to \n, horizontal
    * whitespace runs collapsed to one space, ends trimmed. Every stage
    * is RE2-compatible regex or UAX#15, so DuckDB replays the whole
    * chain (`nfc_normalize` + `regexp_replace`) byte-for-byte. */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val nfc = toColumn(NfcNormalize(toExpression(text)))
    val noZw = regexp_replace(nfc, "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]", "")
    val noCtl = regexp_replace(noZw, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val unixNl = regexp_replace(noCtl, "\\r\\n?", "\n")
    val collapsed = regexp_replace(unixNl, "[ \\t]+", " ")
    // trim() strips spaces only in both engines; the ends may also hold
    // newlines after unification, so trim by regex over both classes
    regexp_replace(collapsed, "^[ \\n]+|[ \\n]+$", "")
  }

  /** GPT-2-style pretokenizer pattern: contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs, residual whitespace.
    * Deliberately the RE2-COMPATIBLE subset — the real GPT-2 pattern's
    * `\s+(?!\S)` lookahead doesn't exist in RE2, so the oracle (DuckDB =
    * RE2) could never replay it; dropping it folds trailing-space handling
    * into the plain `\s+` branch (the PII redaction made the same
    * trade, see [[redactPii]]). */
  val BpeTokenPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Subword-ish token count: matches of [[BpeTokenPattern]] — the
    * pretokenizer piece count a BPE vocabulary would start from, a much
    * closer LLM-token estimate than whitespace counting (digits split from
    * letters, punctuation runs counted, contractions split). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Token-budgeted mixture composition: within each `bucketCols` group
    * (source, language, quality band, ...), keep documents in `orderCol`
    * priority order while the RUNNING token total before the document is
    * under that bucket's `tokenBudget` — the standard way a training mix is
    * assembled ("N tokens of source A, M of source B"). Deterministic: a
    * priority order plus a budget IS the sample, re-runs agree, and the
    * DuckDB window-cumsum oracle checks it exactly.
    *
    * Output: the surviving rows plus (n_tokens, cum_tokens).
    *
    * Scale note: the window sorts each bucket — fine for realistic mixes
    * (buckets = sources/languages, orderCol = a quality score or hash). A
    * single colossal bucket inherits the usual window-skew remedy: split it
    * with a salted sub-bucket first, or pre-filter with an approximate
    * quantile cutoff on the priority before the exact pass. */
  def sampleByTokenBudget(
      docs: DataFrame,
      tokenBudget: Long,
      bucketCols: Seq[String],
      orderCol: Column,
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bucketCols.map(col): _*)
      .orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // a document is in while the budget was not already spent BEFORE it:
      // the boundary document that crosses the budget is kept (its prefix
      // was funded), everything after is out
      .where(col("cum_tokens") - col("n_tokens") < tokenBudget)
  }

  /** Temperature-flattened mixture allocation — the α-sampling of classic
    * LLM data mixes (GPT-3/PaLM style): each `groupCol` bucket (language,
    * source, domain) receives a share of `totalTokenBudget` proportional
    * to group_tokens^α instead of group_tokens, upsampling low-resource
    * groups. α is restricted to quarters {0.25, 0.5, 0.75, 1.0} — the
    * quarter powers compose from sqrt and multiply alone (x^¾ =
    * sqrt(x·sqrt(x))), and IEEE-754 sqrt/multiply are correctly rounded,
    * so every engine computes the same weight bit-for-bit; a general
    * pow() is NOT correctly rounded and would put the oracle one ulp off.
    * 0.75 is the word2vec/XLM unigram-flattening choice, 0.5 the GPT-3
    * style strong flatten, 1.0 proportional (no flattening). A group
    * whose target exceeds its stock is REPEATED: the output says how many
    * full epochs of the group to take and whether the document is in the
    * budget-truncated partial pass (same keep-while-funded convention as
    * [[sampleByTokenBudget]]); materializing the repeat is one explode.
    *
    * Integer-deterministic end to end, so the DuckDB oracle hash-matches:
    * weights are floor(tokens^α) via the sqrt compositions above, shares
    * are parts-per-million by long division, targets long math (budget ≤
    * ~9·10¹² stays overflow-free; at α = 1.0 the weights ARE raw token
    * counts, so a single group past ~9·10¹² tokens would overflow the ppm
    * numerator — every flattened α ≤ 0.75 keeps weights ≤ ~10¹⁰ at any
    * realistic corpus). Per doc: (id, group, n_tokens, share_ppm,
    * n_epochs, kept_partial).
    *
    * Scale: one hash agg over the corpus, a global window across the GROUP
    * frame (rows = distinct groups — dozens in a real mix, never corpus-
    * sized), and a per-group cumsum window identical to the mix-budget
    * pass (same skew remedy applies). */
  def mixTemperature(
      docs: DataFrame,
      totalTokenBudget: Long,
      groupCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 0.5): DataFrame = {
    require(totalTokenBudget > 0 && totalTokenBudget <= 8_000_000_000_000L,
      s"graft: totalTokenBudget must be in (0, 8e12], got $totalTokenBudget")
    // quarter powers only: see scaladoc (cross-engine determinism)
    val weightOf: Column => Column = alpha match {
      case 1.0 => identity
      case 0.5 => c => sqrt(c)
      case 0.25 => c => sqrt(sqrt(c))
      case 0.75 => c => sqrt(c * sqrt(c))
      case other => throw new IllegalArgumentException(
        s"graft: alpha must be one of 0.25, 0.5, 0.75, 1.0 " +
          s"(quarter powers stay engine-deterministic), got $other")
    }
    // NULL groups are excluded up front — from the allocation AND the
    // output. Counting them in the weights while the equi-join drops their
    // rows would silently strand their budget share; callers who want an
    // "unknown" bucket map nulls to a label first.
    val d = docs.select(col(idCol), col(groupCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .where(col(groupCol).isNotNull)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy() // the GROUP frame: rows = distinct groups, bounded
    // fail-loud overflow guard (runtime — group sizes are data): the ppm
    // numerator is weight × 10⁶, so any weight past Long.Max/10⁶ would
    // wrap negative and silently corrupt every share. Reachable only at
    // α = 1.0 with a ≥ ~9.2·10¹²-token group (realistic for a web-crawl
    // bucket); the flattened αs cannot get there.
    val maxW = Long.MaxValue / 1000000L
    val alloc = d.groupBy(col(groupCol))
      .agg(sum("n_tokens").as("group_tokens"))
      .withColumn("weight", floor(weightOf(col("group_tokens"))).cast("long"))
      .withColumn("weight",
        when(col("weight") > maxW, raise_error(concat(
          lit(s"graft: mixTemperature weight overflow (> $maxW) for group "),
          col(groupCol).cast("string"),
          lit(" — use a flattened alpha (<= 0.75) for corpora this large")))
          .cast("long"))
        .otherwise(col("weight")))
      .withColumn("total_w", sum(col("weight")).over(wAll))
      // integer DIV, not `/`: Spark's `/` on longs returns DOUBLE, which
      // stops being exact past 2^53 — budget × ppm reaches ~10¹⁸
      .withColumn("share_ppm",
        when(col("total_w") === 0L, lit(0L))
          .otherwise(expr("weight * 1000000L DIV total_w")).cast("long"))
      .withColumn("target",
        expr(s"${totalTokenBudget}L * share_ppm DIV 1000000L").cast("long"))
      .select(col(groupCol), col("group_tokens"), col("share_ppm"), col("target"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    d.join(alloc, groupCol)
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(wCum), lit(0L)))
      .select(col(idCol), col(groupCol), col("n_tokens"), col("share_ppm"),
        when(col("group_tokens") === 0L, lit(0L))
          .otherwise(expr("target DIV group_tokens")).cast("long").as("n_epochs"),
        when(col("group_tokens") === 0L, lit(0))
          .otherwise((col("cum_before") < col("target") % col("group_tokens"))
            .cast("int")).as("kept_partial"))
  }

  /** Seed vocabulary for subword-tokenizer training: the `topN` most
    * frequent word substrings (length ≤ `maxPieceLen`, WordPiece-style
    * "##" continuation marks) across the corpus — SentencePiece's unigram
    * initialization (Kudo 2018, arXiv:1804.10959 §3.2: "frequent
    * substrings" seed the EM vocabulary). Counting is the one-pass
    * [[WordPieceCounts]] expression (distinct-piece rows per doc), the
    * global aggregate map-side combines, and the final cut is a
    * distributed TakeOrdered of `topN` rows by (count desc, piece) — no
    * global sort materializes. Output `(rank, piece, cnt)`. */
  def vocabSeed(
      docs: DataFrame,
      topN: Int = 500,
      maxPieceLen: Int = 6,
      textCol: String = "text"): DataFrame = {
    require(topN > 0, s"vocabSeed: topN must be positive, got $topN")
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val pieces = docs
      .select(explode(toColumn(WordPieceCounts(
        toExpression(col(textCol)), maxPieceLen))).as("e"))
      .groupBy(col("e.piece").as("piece"))
      .agg(sum(col("e.cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topN)
    // rank over the already-bounded topN frame (tiny window, driver-safe)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("piece"))
    pieces.withColumn("rank", row_number().over(w))
      .select("rank", "piece", "cnt")
  }

  /** Per-group corpus profile — the "dataset card" numbers curation
    * decisions read: document count, token totals, min/max/median/mean
    * document length per (lang, source, …) bucket. Everything integer
    * (lower median at rank ⌊(n+1)/2⌋ in the unique (dl, id) order; mean
    * scaled ×100 under integer DIV) so any engine replays it exactly.
    *
    * Scale: one hash aggregate for the moments plus one for the per-group
    * LENGTH HISTOGRAM `(group, dl) → count` — the median of the rank-
    * (n+1)/2 contract depends only on the dl multiset, so the exact median
    * is read off the histogram's cumulative counts. The only window runs
    * over the histogram, whose per-group row count is the number of
    * DISTINCT document lengths (value-domain-bounded), not the group's
    * document count — a 60%-of-corpus language bucket contributes the same
    * handful of histogram rows as a small one, so no corpus-sized
    * partition ever funnels through one task. */
  def corpusProfile(
      docs: DataFrame,
      groupCols: Seq[String] = Seq("lang", "source"),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(groupCols.nonEmpty, "corpusProfile: need at least one group column")
    val g = groupCols.map(col)
    val d = docs.select(
      g :+ col(idCol).as("__id") :+
        tokenCount(col(textCol)).cast("long").as("__dl"): _*)
    val aggs = d.groupBy(g: _*).agg(
      count(lit(1)).as("n_docs"),
      sum("__dl").as("n_tokens"),
      min("__dl").as("min_tokens"),
      max("__dl").as("max_tokens"),
      expr("sum(__dl) * 100 DIV count(1)").as("mean_tokens_x100"))
    // exact median from the (group, dl) histogram: the row at per-group
    // rank (n+1) DIV 2 of the (dl, id) order carries the dl value whose
    // cumulative histogram count first reaches that rank — the id
    // tie-break picks WHICH row, never a different dl
    val hist = d.groupBy(g :+ col("__dl"): _*).agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__dl"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val med = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n",
        sum(col("__c")).over(org.apache.spark.sql.expressions.Window.partitionBy(g: _*)))
      .where(col("__cum") - col("__c") < expr("(__n + 1) DIV 2") &&
        expr("(__n + 1) DIV 2") <= col("__cum"))
      .select(groupCols.map(n => col(n).as(s"__m_$n")) :+
        col("__dl").as("median_tokens"): _*)
    // null-SAFE group equality: a null group key (e.g. lang = null) is a
    // real bucket and must appear in the profile, not vanish through an
    // inner equi-join that never matches nulls
    val cond = groupCols.map(n => aggs(n) <=> med(s"__m_$n")).reduce(_ && _)
    aggs.join(med, cond)
      .select(groupCols.map(aggs(_)) ++ Seq(col("n_docs"), col("n_tokens"),
        col("min_tokens"), col("max_tokens"), col("mean_tokens_x100"),
        col("median_tokens")): _*)
  }

  /** Materialize a [[mixTemperature]] allocation into the physical epoch
    * rows a training-shard writer consumes: each document appears
    * `n_epochs + kept_partial` times, tagged `epoch_idx` 0… (full epochs
    * first, the partial epoch last); zero-copy documents drop out. One
    * posexplode over an integer sequence — per-row work, no shuffle, and
    * output cardinality = the allocation's token budget, not the corpus. */
  def epochExpand(mixed: DataFrame, idCol: String = "doc_id"): DataFrame =
    mixed
      .withColumn("n_copies", (col("n_epochs") + col("kept_partial")).cast("int"))
      // sequence(0, -1) DESCENDS in Spark (the trigramArray guard) — filter
      // zero-copy docs before building the index range
      .where(col("n_copies") >= 1)
      .select(col(idCol),
        explode(sequence(lit(0), col("n_copies") - 1)).as("epoch_idx"),
        col("n_copies"))

  /** Distinct 3-token shingle set — the unit of n-gram Jaccard similarity
    * (documents with < 3 tokens degenerate to a single whole-text shingle
    * so every doc has at least one). A dedicated one-pass expression: the
    * previous HOF formulation re-split the text per shingle (no CSE inside
    * interpreted lambdas — O(tokens²) per document; see [[ShingleSet3]]). */
  def shingleSet(text: Column): Column = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    toColumn(ShingleSet3(toExpression(text)))
  }

  /** `n`-token shingles in position order (duplicates kept) — the unit of
    * exact substring-span matching; see [[PositionalShingles]]. */
  def positionalShingles(text: Column, n: Int = 5): Column = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    toColumn(PositionalShingles(toExpression(text), n))
  }

  /** Stable FNV-1a 64-bit hash of a string column (oracle-replayable;
    * see [[Fnv64Hash]]). */
  def fnv64(c: Column): Column = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    toColumn(Fnv64Hash(toExpression(c)))
  }

  /** Sliding token-window chunking — the RAG/embedding-pipeline splitter:
    * windows of `window` tokens starting every `stride` tokens
    * (overlap = window − stride), so every token is covered and window
    * boundaries never lose cross-chunk context. A new window starts only
    * while it would add tokens beyond the previous one's coverage (start
    * < n − overlap); documents shorter than one window yield exactly one
    * chunk. Output one row per chunk:
    * `(id, chunk_idx, start_tok, n_tokens, chunk_hash)` where
    * `chunk_hash = fnv64` of the single-space token re-join — a
    * whitespace-normalized content signature an engine can replay (and
    * the dedup layer can group on).
    *
    * The reference chunks objects the same way for embedding
    * (object_readers/directory_reader.py:200-240 splits text with a
    * chunk/overlap pair); this is the token-granular variant. Pure
    * projection + posexplode — per-row work, no shuffle, embarrassingly
    * parallel at any scale. */
  def chunkTokenWindows(
      docs: DataFrame,
      window: Int = 64,
      stride: Int = 48,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkTokenWindows: need 0 < stride <= window, got window=$window stride=$stride")
    val overlap = window - stride
    docs
      .select(col(idCol), tokens(col(textCol)).as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .select(col(idCol), col("__ts"), col("__n"),
        posexplode(sequence(lit(0),
          greatest(col("__n") - lit(overlap + 1), lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col(idCol),
        col("chunk_idx"),
        col("start_tok"),
        least(lit(window), col("__n") - col("start_tok")).as("n_tokens"),
        fnv64(array_join(slice(col("__ts"), col("start_tok") + 1, lit(window)), " "))
          .as("chunk_hash"))
  }

  /** UNSIGNED `fnv64(c) mod m` in [0, m): the deterministic bucket of a
    * hash-based split/sample assignment. The two-step form computes the
    * unsigned remainder from the signed long without 128-bit arithmetic
    * (u = 2q + b with q = h >>> 1: (2·(q mod m) + b) mod m, exact for
    * m ≤ 2^62), matching DuckDB's direct HUGEINT `% m` on the unsigned
    * replay. */
  def hashBucket(c: Column, m: Int, salt: String = ""): Column = {
    require(m > 0 && m <= (1L << 62), s"hashBucket: modulus $m out of range")
    val h = fnv64(if (salt.isEmpty) c else concat(c, lit(":" + salt)))
    (shiftrightunsigned(h, 1) % m * 2 + h.bitwiseAND(1)) % m
  }

  /** Deterministic train/val/test split assignment by content-independent
    * document-id hash — the standard reproducible holdout: membership
    * depends only on (id, salt), so re-runs, incremental appends, and
    * different engines agree row-by-row (no sampling state, no RNG).
    * `trainPermille`/`valPermille` are out of 1000. Pure per-row expression
    * — no shuffle, no state, embarrassingly parallel at any scale. */
  def hashSplit(idCol: Column, trainPermille: Int = 800, valPermille: Int = 100,
      salt: String = ""): Column = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000, "hashSplit: permille out of range")
    val b = hashBucket(idCol.cast("string"), 1000, salt)
    when(b < trainPermille, lit("train"))
      .when(b < trainPermille + valPermille, lit("val"))
      .otherwise(lit("test"))
  }

  /** Concat-and-split sequence packing (GPT-style pretraining layout):
    * documents are laid head-to-tail in a deterministic order and cut into
    * fixed `seqTokens`-token training sequences; each document reports the
    * sequence it starts in, its token offset inside that sequence, and how
    * many sequences it spans. A (shard, seq_id, seq_offset) triple fully
    * determines where every token of every document lands — re-runs and
    * engines agree exactly (no greedy bin-packing state).
    *
    * Scale shape: a single global layout would be one global sort, so
    * packing is sharded — documents are routed to `numShards` buckets by id
    * hash ([[hashBucket]]: content-independent, append-stable) and each
    * shard packs independently under a window cumsum, the same per-bucket
    * window posture as [[sampleByTokenBudget]]. Shards are independent
    * training streams; `numShards` ≈ writer parallelism at the target
    * scale. */
  def packSequences(
      docs: DataFrame,
      seqTokens: Int,
      numShards: Int,
      orderCol: Column,
      textCol: String = "text",
      idCol: String = "doc_id",
      salt: String = ""): DataFrame = {
    require(seqTokens > 0 && numShards > 0,
      s"packSequences: seqTokens ($seqTokens) and numShards ($numShards) must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", hashBucket(col(idCol).cast("string"), numShards, salt))
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      // tokens laid down in this shard BEFORE this document (empty frame on
      // the shard's first row -> 0)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // long/int divides in double then truncates — exact while a shard's
      // cumulative token count stays under 2^52 (~4.5e15; a 100 TB corpus
      // is ~2.5e13 tokens TOTAL, so the bound is ~160x past the design
      // point even with numShards=1)
      .withColumn("seq_id", (col("cum_before") / seqTokens).cast("long"))
      .withColumn("seq_offset", col("cum_before") % seqTokens)
      // last token's sequence minus first token's sequence + 1; every doc
      // has >= 1 token (the empty string tokenizes to [""])
      .withColumn("n_seqs",
        ((col("cum_before") + col("n_tokens") - 1) / seqTokens).cast("long")
          - col("seq_id") + 1)
      .drop("cum_before")
  }

  /** Deterministic per-stratum downsampling ("25% of English, 50% of
    * French, all the rest"): keep a row iff its id-hash bucket (out of
    * 10000) falls under the stratum's permyriad rate. Hash-based like
    * [[hashSplit]] (reproducible, append-stable, no RNG); composes with it
    * — the same id hashed with different salts gives independent draws. */
  def stratifiedKeep(idCol: Column, strataCol: Column,
      permyriadByStratum: Map[String, Int], defaultPermyriad: Int = 10000,
      salt: String = ""): Column = {
    (permyriadByStratum.values.toSeq :+ defaultPermyriad).foreach(r =>
      require(r >= 0 && r <= 10000, s"stratifiedKeep: permyriad $r out of range"))
    val b = hashBucket(idCol.cast("string"), 10000, salt)
    // foldLeft over a sorted view so the when-chain is deterministic
    val cutoff = permyriadByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermyriad)) { case (acc, (k, v)) =>
        when(strataCol === k, lit(v)).otherwise(acc)
      }
    b < cutoff
  }

  /** Per-group quality-quantile filter: keep each group's top share of
    * documents by `scoreCol` — "top 30% by quality per domain", the
    * standard curation cut. EXACT ranks via one window per group (no
    * approx_percentile drift between runs or engines): a document is kept
    * iff its 1-based rank by (score DESC, id ASC — the id breaks ties
    * deterministically, so re-runs and engines agree on boundary docs)
    * is ≤ ceil(group_size × permyriad / 10000). Integer arithmetic
    * throughout; the window sorts within groups only (domain-sized, the
    * usual skew remedy applies — see [[sampleByTokenBudget]]).
    *
    * Output: input columns + (grp_rank, grp_size, kept). */
  def topQuantileByGroup(
      docs: DataFrame,
      permyriad: Int,
      groupCol: String,
      scoreCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    require(permyriad >= 0 && permyriad <= 10000,
      s"graft: permyriad must be in [0, 10000], got $permyriad")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(scoreCol.desc, col(idCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    docs
      .withColumn("grp_rank", row_number().over(w).cast("long"))
      .withColumn("grp_size", count(lit(1)).over(wAll))
      // ceil-div in integers: (n*p + 9999) DIV 10000
      .withColumn("kept",
        (col("grp_rank") <= expr(s"(grp_size * $permyriad + 9999) DIV 10000"))
          .cast("int"))
  }

  /** Per-group document cap — the RefinedWeb/C4-style "at most `n`
    * documents per domain" curation rule: keeps each group's top `n`
    * documents by an integer quality score. Unlike [[topQuantileByGroup]]
    * (whose keep-share needs the group size, hence a per-group window),
    * a fixed cap needs no group total, so this runs WINDOWLESS on
    * [[graft.operators.MinTopKLong]] partial→final heaps: only `n` rows
    * per (group, input partition) cross the shuffle, and a dominant
    * domain (60% English web is realistic) costs its share of the scan —
    * never a single-task per-group sort. Tie-break (score desc, id asc),
    * the same deterministic contract as [[topQuantileByGroup]].
    *
    * Documents whose score or id evaluates to NULL are EXCLUDED (explicit
    * filter, not an aggregate-internal skip): a curation cap has no rank
    * for an unscorable document — coalesce the score upstream to keep
    * them. NULL group KEYS are real buckets (groupBy keeps them).
    *
    * Output: (groupCol, idCol, cap_rank) — cap_rank 1-based by
    * (score desc, id asc) within the group. */
  def capPerGroup(
      docs: DataFrame,
      n: Int,
      groupCol: String,
      scoreCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"graft: capPerGroup n must be positive, got $n")
    docs
      .select(col(groupCol),
        col(idCol).cast("long").as("__id"),
        scoreCol.cast("long").as("__s"))
      .where(col("__s").isNotNull && col("__id").isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.min_topk_long(-col("__s"), col("__id"), n).as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col(groupCol),
        col("__hit.id").as(idCol),
        (col("__pos") + 1).cast("int").as("cap_rank"))
  }

  /** A small multilingual stopword table for language ID and quality
    * scoring. Deliberately tiny: the point is the *operator shape*
    * (set-membership counting at scale), not lexicography. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "para"),
    "it" -> Seq("il", "la", "gli", "e", "è", "un", "una", "di", "per", "con"),
    "pt" -> Seq("o", "a", "os", "as", "e", "é", "um", "uma", "de", "para"))

  /** Count of tokens that belong to `words` (occurrences, not distinct). */
  def wordSetCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedlit(words), t)))

  def stopwordCount(text: Column, lang: String = "en"): Column =
    wordSetCount(text, stopwords(lang))

  /** Punctuation character count over an explicit class (kept identical to
    * the DuckDB oracle's regex). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Integer quality facets of a document; the scalar score is a weighted
    * blend downstream — facets stay integers for exact oracle compare. */
  def qualityFacets(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text),
    "n_tokens" -> tokenCount(text),
    "n_distinct_tokens" -> size(distinctTokens(text)),
    "n_stopwords" -> stopwordCount(text),
    "n_punct" -> punctCount(text))

  /** Scalar quality score in [0,1]: lexical diversity x stopword presence
    * damping, a simplified C4/Gopher-style heuristic. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val diversity = size(distinctTokens(text)).cast("double") / greatest(nTok, lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    round(diversity * (lit(1.0) - stopRatio), 6)
  }

  /** Gopher-style rule-bank words the quality filters require (Rae et al.
    * 2021, table A1): a document must contain at least two of these. */
  val gopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Integer facets feeding [[gopherRules]] — kept integer so every flag is
    * an exact integer comparison on both engines (no ratio doubles to
    * canonicalize at the hash layer). */
  def gopherFacets(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val lines = split(text, "\n")
    Seq(
      "n_words" -> size(toks).cast("long"),
      // sum of token lengths == non-whitespace char count (exact identity)
      "sum_word_len" -> length(regexp_replace(text, "\\s", "")).cast("long"),
      // Gopher's symbol counts: '#' occurrences + non-overlapping '...'
      "n_symbols" -> ((length(text) - length(regexp_replace(text, "#", ""))) +
        regexp_count(text, lit("\\.\\.\\."))).cast("long"),
      "n_lines" -> size(lines).cast("long"),
      "n_bullet_lines" -> size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long"),
      "n_ellipsis_lines" -> size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long"),
      "n_alpha_words" -> size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long"),
      "n_required_words" -> size(array_intersect(
        array_distinct(transform(toks, t => lower(t))),
        typedlit(gopherRequiredWords))).cast("long"))
  }

  /** The Gopher quality rule bank (Rae et al. 2021 §A1.1 — the same filter
    * family the reference-adjacent curation pipelines apply before
    * training): per-document boolean flags plus the conjunction `pass`.
    * Thresholds are the published defaults; ratio rules are evaluated by
    * integer cross-multiplication (`10·symbols ≤ words` instead of
    * `symbols/words ≤ 0.1`) so results hash-compare exactly across engines.
    * Pure codegen'd column expressions — one projection pass, no shuffle,
    * embarrassingly parallel at any corpus size. */
  def gopherRules(
      text: Column,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minRequiredWords: Long = 2L): Seq[(String, Column)] = {
    val f = gopherFacets(text).toMap
    val words = f("n_words")
    val flags = Seq(
      "ok_word_count" -> (words >= minWords && words <= maxWords),
      // mean word length in [3, 10]
      "ok_mean_word_len" -> (f("sum_word_len") >= lit(3L) * words &&
        f("sum_word_len") <= lit(10L) * words),
      // symbol-to-word ratio <= 0.1
      "ok_symbol_ratio" -> (lit(10L) * f("n_symbols") <= words),
      // <= 90% of lines start with a bullet
      "ok_bullet_lines" -> (lit(10L) * f("n_bullet_lines") <= lit(9L) * f("n_lines")),
      // <= 30% of lines end with an ellipsis
      "ok_ellipsis_lines" -> (lit(10L) * f("n_ellipsis_lines") <= lit(3L) * f("n_lines")),
      // >= 80% of words contain an alphabetic character
      "ok_alpha_words" -> (lit(5L) * f("n_alpha_words") >= lit(4L) * words),
      // >= minRequiredWords of the required stopwords appear
      "ok_required_words" -> (f("n_required_words") >= lit(minRequiredWords)))
    flags :+ ("pass" -> flags.map(_._2).reduce(_ && _))
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercased text
    * (exact-dup key). */
  def fingerprintMd5(text: Column): Column =
    md5(lower(concat_ws(" ", tokens(text))))

  /** Token-SET fingerprint: md5 over the sorted distinct token list —
    * catches reorderings/repetitions of the same vocabulary. */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(distinctTokens(text))))

  /** Within-document 3-gram repetition ratio — the Gopher/Dolma-style
    * repetitiveness quality signal: 1 − distinct/total 3-token shingles
    * (0 = no repeated 3-grams, → 1 for boilerplate loops). Documents with
    * < 3 tokens have one degenerate shingle and report 0. Rides on the same
    * one-pass [[ShingleSet3]] expression as dedup. */
  def repetitionRatio(text: Column): Column = {
    val total = greatest(tokenCount(text) - lit(2), lit(1)).cast("double")
    round(lit(1.0) - size(shingleSet(text)).cast("double") / greatest(total, lit(1.0)), 6)
  }

  /** PII redaction: emails, international-ish phone numbers, and IPv4
    * addresses replaced with type tokens — the standard scrubbing pass of a
    * training-data pipeline. Plain `regexp_replace` (codegen'd, no UDF);
    * patterns are deliberately RE2-compatible so the DuckDB oracle applies
    * the identical regexes. */
  val piiPatterns: Seq[(String, String)] = Seq(
    // local@domain.tld — no backtracking constructs
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    // IPv4 before phone: a dotted quad must not be half-eaten as digits
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "[IP]",
    // grouped numbers (+cc, (area), single-char separators between 2-4-digit
    // groups) OR bare 7-15 digit runs. Single-char separators mean a
    // sentence boundary (". ") or spaced range ("100 - 200") cannot join two
    // ordinary numbers into a "phone"; dotted dates (12.03.2026) still
    // match — the deliberate privacy-leaning trade.
    "\\+?[0-9]{0,3} ?\\(?[0-9]{2,4}\\)?([-. ][0-9]{2,4}){1,4}\\b|\\+?[0-9]{7,15}\\b" -> "[PHONE]")

  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, token)) =>
      regexp_replace(c, re, token)
    }

  /** TF-IDF-style distinctive terms: the `topK` tokens of each document
    * ranked by (term frequency DESC, document frequency ASC, term ASC) —
    * the terms frequent HERE and rare ELSEWHERE. The rank is kept
    * integer-lexicographic rather than the classical `tf·ln(N/df)` double:
    * it preserves the "frequent-and-rare wins" order at equal tf, and an
    * integer contract hash-compares exactly across engines (libm vs
    * java.lang.Math can differ in the last ulp of `ln`); callers wanting
    * the scalar score derive it downstream from the emitted (tf, df).
    *
    * Scale shape: tf is one hash aggregate on (doc, term); df reuses tf's
    * output (already distinct per doc) with a second aggregate on term —
    * no distinct-Expand anywhere; the tf↔df equi-join shuffles on term
    * (vocabulary-sized — broadcast would not survive a web corpus, and
    * stopword-grade hot terms are exactly what AQE skew-join splits); the
    * per-document top-k window partitions by doc_id, bounded by document
    * vocabulary. */
  def distinctiveTerms(docs: DataFrame, topK: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(topK > 0, s"distinctiveTerms: topK must be positive (got $topK)")
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
  }

  /** Language ID by stopword-profile voting: argmax over per-language
    * stopword hit counts (ties break toward the lexicographically larger
    * code; docs with zero hits report 'und'). One tokenization + one
    * hash-map probe per token ([[StopwordVote]]) — the greatest-of-structs
    * Column formulation re-split the document per language (HOF lambdas
    * don't CSE). */
  def langId(text: Column): Column = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    toColumn(StopwordVote(toExpression(tokens(text))))
  }
}
