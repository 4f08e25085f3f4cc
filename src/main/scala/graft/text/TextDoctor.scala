package graft.text

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IndexDoctor.Finding
import graft.index.Storage

/** Integrity checker for the PERSISTED text-serving artifacts — the
  * text-side sibling of [[graft.index.IndexDoctor]]'s vector fsck. The
  * BM25 postings/idf/meta tables, the trigram LM, and the DSIR importance
  * model are all load-bearing at serve time (every score derives from
  * them), so an operator needs the same "trust it before serving it"
  * check the vector layouts get.
  *
  * Every check is a bounded aggregate (mismatch COUNTS, min/max, table
  * cardinalities — never a collect of postings or model rows), so the
  * doctor is safe against a corpus-scale index. Each table checks inside
  * its own guard: a truncated footer or drifted schema becomes a finding
  * for that table, and the remaining tables still get checked.
  */
object TextDoctor {

  /** BM25 model at `uri` ([[Bm25.fit]] layout): postings/idf/meta
    * coherence.
    *
    *   - postings: per-document Σtf must equal the stored dl (a term
    *     can't occur more often than the document is long, and the
    *     tokenizer emits every token), and dl must be single-valued per id
    *   - idf: df must equal the term's posting-row count, and idf_micro
    *     must replay exactly from (n_docs, df) — a drifted idf silently
    *     re-weights every score
    *   - meta: n_docs can never be BELOW the distinct posting ids
    *     (ABOVE only warns: zero-posting documents are tokenizer-legal);
    *     total_dl must equal the per-document dl sum and avgdl the exact
    *     total_dl/n_docs division
    */
  def checkBm25(spark: SparkSession, uri: String): Seq[Finding] = {
    val out = mutable.Buffer.empty[Finding]
    guard(out, "bm25.postings") {
      val p = spark.read.parquet(s"$uri/postings")
      val need = Set("term", "id", "tf", "dl")
      val cols = p.columns.toSet
      if (!need.subsetOf(cols))
        out += Finding("error", "bm25.postings",
          s"schema $cols missing ${(need -- cols).mkString(", ")}")
      else {
        val perDoc = p.groupBy("id")
          .agg(sum("tf").as("tfsum"), min("dl").as("dlo"), max("dl").as("dhi"))
        val badDl = perDoc.where(col("dlo") =!= col("dhi")).count()
        if (badDl > 0)
          out += Finding("error", "bm25.postings",
            s"$badDl documents with more than one dl value")
        val badSum = perDoc.where(col("tfsum") =!= col("dlo")).count()
        if (badSum > 0)
          out += Finding("error", "bm25.postings",
            s"$badSum documents whose term frequencies do not sum to dl")
      }
    }
    guard(out, "bm25.idf") {
      val p = spark.read.parquet(s"$uri/postings")
      val idf = spark.read.parquet(s"$uri/idf")
      val dfActual = p.groupBy("term").agg(count(lit(1)).as("df_actual"))
      val joined = idf.join(dfActual, Seq("term"), "full_outer")
      val missing = joined.where(col("df").isNull).count()
      if (missing > 0)
        out += Finding("error", "bm25.idf",
          s"$missing posting terms absent from the idf table (their scores drop silently)")
      val ghost = joined.where(col("df_actual").isNull && col("df") > 0).count()
      if (ghost > 0)
        out += Finding("error", "bm25.idf",
          s"$ghost terms with recorded df > 0 but zero posting rows")
      val orphan = joined.where(col("df_actual").isNull && col("df") <= 0).count()
      if (orphan > 0)
        out += Finding("warn", "bm25.idf",
          s"$orphan zero-df idf terms with no postings (harmless weight bloat)")
      val badDf = joined
        .where(col("df").isNotNull && col("df_actual").isNotNull &&
          col("df") =!= col("df_actual")).count()
      if (badDf > 0)
        out += Finding("error", "bm25.idf",
          s"$badDf terms whose recorded df != posting-row count")
      val meta = spark.read.parquet(s"$uri/meta").head()
      val n = meta.getAs[Long]("n_docs")
      val expect = round(log(lit(1.0) +
        (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        lit(1000000.0)).cast("long")
      val badIdf = idf.where(col("idf_micro") =!= expect).count()
      if (badIdf > 0)
        out += Finding("error", "bm25.idf",
          s"$badIdf terms whose idf_micro does not replay from (n_docs=$n, df)")
    }
    guard(out, "bm25.meta") {
      val meta = spark.read.parquet(s"$uri/meta")
      // count BEFORE head(): an empty meta must produce the specific
      // single-row finding, not a generic head-of-nothing "unreadable"
      val nRows = meta.count()
      if (nRows != 1L)
        out += Finding("error", "bm25.meta",
          s"meta must be a single row, found $nRows")
      else {
        val m = meta.head()
        val n = m.getAs[Long]("n_docs")
        if (n <= 0L)
          out += Finding("error", "bm25.meta", s"non-positive n_docs $n")
        val docMoments = spark.read.parquet(s"$uri/postings")
          .select(col("id"), col("dl")).distinct()
          .agg(count(lit(1)).as("ids"), sum("dl").as("total")).head()
        val distinctIds = docMoments.getLong(0)
        if (n < distinctIds)
          out += Finding("error", "bm25.meta",
            s"n_docs $n < $distinctIds distinct posting ids — idf over-weights every term")
        else if (n > distinctIds)
          out += Finding("warn", "bm25.meta",
            s"n_docs $n > $distinctIds distinct posting ids (zero-posting documents)")
        if (meta.columns.contains("total_dl")) {
          val total = m.getAs[Long]("total_dl")
          // equality only when every doc has postings; otherwise the posting
          // total is a floor for the recorded one
          if (total < docMoments.getLong(1))
            out += Finding("error", "bm25.meta",
              s"total_dl $total < posting-table dl sum ${docMoments.getLong(1)}")
          val avgdl = m.getAs[Double]("avgdl")
          if (avgdl != total.toDouble / n.toDouble)
            out += Finding("error", "bm25.meta",
              s"avgdl $avgdl != total_dl/n_docs ${total.toDouble / n.toDouble} — " +
                "every saturation denominator shifts")
        }
      }
    }
    out.toSeq
  }

  /** Char-trigram LM at `uri` ([[LangModel.trainCharTrigram]] layout). */
  def checkLangModel(spark: SparkSession, uri: String): Seq[Finding] = {
    val out = mutable.Buffer.empty[Finding]
    guard(out, "lm.model3") {
      val m3 = spark.read.parquet(s"$uri/model3")
      val badShape = m3.where(length(col("gram")) =!= 3 ||
        col("ctx") =!= substring(col("gram"), 1, 2)).count()
      if (badShape > 0)
        out += Finding("error", "lm.model3",
          s"$badShape rows where gram is not 3 chars or ctx != gram[0:2]")
      val badSign = m3.where(col("logp_micro") >= 0).count()
      if (badSign > 0)
        out += Finding("error", "lm.model3",
          s"$badSign non-negative log-probs (p ≥ 1 is impossible under smoothing)")
      val dup = m3.count() - m3.select("gram").distinct().count()
      if (dup > 0)
        out += Finding("error", "lm.model3", s"$dup duplicate gram rows")
    }
    guard(out, "lm.model2") {
      val m3 = spark.read.parquet(s"$uri/model3")
      val m2 = spark.read.parquet(s"$uri/model2")
      val orphanCtx = m3.select("ctx").distinct()
        .join(m2.select("ctx"), Seq("ctx"), "left_anti").count()
      if (orphanCtx > 0)
        out += Finding("error", "lm.model2",
          s"$orphanCtx model3 contexts missing from model2 — unseen-char " +
            "scoring falls through to the wrong fallback")
      val dup = m2.count() - m2.select("ctx").distinct().count()
      if (dup > 0)
        out += Finding("error", "lm.model2", s"$dup duplicate ctx rows")
    }
    guard(out, "lm.meta") {
      val meta = spark.read.parquet(s"$uri/meta")
      val nRows = meta.count()
      if (nRows != 1L)
        out += Finding("error", "lm.meta",
          s"meta must be a single row, found $nRows")
      else {
      val v = meta.head().getAs[Long]("v")
      if (v <= 0)
        out += Finding("error", "lm.meta", s"non-positive vocabulary size $v")
      else {
        // replay with the SAME Spark expression training used (identical
        // rounding mode), not a JVM math.round reimplementation
        val bad = meta.where(col("logp0_micro") =!=
          round(log(lit(1.0) / col("v").cast("double")) * lit(1000000.0))
            .cast("long")).count()
        if (bad > 0)
          out += Finding("error", "lm.meta",
            s"logp0_micro does not replay from v=$v")
      }
      }
    }
    out.toSeq
  }

  /** DSIR importance model at `uri` ([[Dsir.fit]] layout): the model must
    * be DENSE over exactly [0, buckets) — scoring joins assume no miss. */
  def checkDsir(spark: SparkSession, uri: String): Seq[Finding] = {
    val out = mutable.Buffer.empty[Finding]
    guard(out, "dsir.meta") {
      val m = spark.read.parquet(s"$uri/meta").head()
      val (nt, nr, b) = (m.getAs[Long]("n_target"), m.getAs[Long]("n_raw"),
        m.getAs[Int]("buckets"))
      if (nt <= 0)
        out += Finding("error", "dsir.meta", s"non-positive n_target $nt")
      if (nr < nt)
        out += Finding("error", "dsir.meta",
          s"n_raw $nr < n_target $nt (the target is a subset of the raw corpus)")
      if (b <= 0)
        out += Finding("error", "dsir.meta", s"non-positive bucket count $b")
    }
    guard(out, "dsir.model") {
      val b = spark.read.parquet(s"$uri/meta").head().getAs[Int]("buckets")
      val model = spark.read.parquet(s"$uri/model")
      val stats = model.agg(count(lit(1)).as("n"),
        countDistinct("bucket").as("d"),
        min("bucket").as("lo"), max("bucket").as("hi")).head()
      if (stats.getLong(0) != b || stats.getLong(1) != b ||
          stats.getLong(2) != 0L || stats.getLong(3) != (b - 1).toLong)
        out += Finding("error", "dsir.model",
          s"model is not dense over [0, $b): ${stats.getLong(0)} rows, " +
            s"${stats.getLong(1)} distinct, range [${stats.getLong(2)}, " +
            s"${stats.getLong(3)}] — scoring joins would miss buckets")
    }
    out.toSeq
  }

  /** Run a table's checks, converting any read/schema failure into a
    * single finding so the remaining tables still get checked. A missing
    * directory is its own explicit finding. */
  private def guard(out: mutable.Buffer[Finding], check: String)(body: => Unit): Unit =
    try body
    catch {
      case e: Exception =>
        out += Finding("error", check,
          s"table unreadable: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** Convenience: true when the directory exists with content — callers
    * that treat a whole model as optional gate on this before checking. */
  def exists(uri: String, table: String): Boolean =
    Storage.nonEmptyDir(s"$uri/$table")
}
