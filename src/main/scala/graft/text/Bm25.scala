package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson/Spärck Jones; the Lucene-variant idf
  * `ln(1 + (N − df + ½)/(df + ½))`, k₁ = 1.2, b = 0.75) — the sparse
  * complement of the engine's dense ANN retrieval, and the usual first
  * stage of a hybrid (BM25 ∪ vector) search pipeline over a document
  * corpus.
  *
  * Numeric contract (the [[LangModel]]/[[Dsir]] pattern): idf is computed
  * ONCE at fit time and persisted quantized to integer micro-nats; `avgdl`
  * is persisted as the exact double. At query time each (query, doc, term)
  * contribution is ONE fixed-shape double expression over (persisted
  * idf_micro, integer tf, integer dl, persisted avgdl) — identical inputs
  * and operation order on any IEEE-754 engine — floored to an integer
  * micro-score, and per-doc totals are EXACT integer sums (each term
  * contribution is < ~2²⁵, so even million-term documents stay far inside
  * the 2⁵³ window where summed floors are exact in the oracle's DOUBLE
  * accumulation). No transcendentals at query time.
  *
  * Scale shape: postings = one explode + one (doc, term) hash aggregate
  * (map-side combined); the query side (a handful of query documents'
  * distinct terms) and the vocabulary-bounded idf table join broadcast
  * under the engine gate; the final top-k is a per-query window over only
  * the documents sharing ≥ 1 term with that query.
  */
object Bm25 {

  /** k₁ + 1 and the two b-terms, pinned as literals so the Spark and
    * oracle expressions agree symbol-for-symbol. */
  private val K1Plus1 = 2.2
  private val K1 = 1.2
  private val OneMinusB = 0.25
  private val B = 0.75

  private def toks(textCol: Column): Column = TextOps.tokens(lower(textCol))

  /** Fit document frequencies over `docs`: persists
    * `uri/idf (term, df, idf_micro)` and `uri/meta (n_docs, avgdl)`. */
  def fit(
      docs: DataFrame,
      uri: String,
      textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.count()
    require(n > 0, "graft: BM25 fit over an empty corpus")
    val avgdl = docs
      .select(sum(TextOps.tokenCount(col(textCol)).cast("long")))
      .head().getLong(0).toDouble / n.toDouble
    docs.select(col(idCol).as("id"), explode(toks(col(textCol))).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        microNats(log(lit(1.0) +
          (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
          .as("idf_micro"))
      .write.mode("overwrite").parquet(s"$uri/idf")
    Seq((n, avgdl)).toDF("n_docs", "avgdl")
      .repartition(1).write.mode("overwrite").parquet(s"$uri/meta")
  }

  /** Top-`k` documents per query document by BM25 score (integer
    * micro-score, ties to the lower doc id). Output:
    * `(qid, id, score_micro, rank)`. */
  def topk(
      docs: DataFrame,
      queryDocs: DataFrame,
      k: Int,
      uri: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      qidCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"graft: BM25 k must be positive, got $k")
    val spark = docs.sparkSession
    val avgdl = spark.read.parquet(s"$uri/meta").head().getAs[Double]("avgdl")
    val idf = spark.read.parquet(s"$uri/idf").select("term", "idf_micro")
    val postings = docs
      .select(col(idCol).cast("long").as("id"),
        TextOps.tokenCount(col(textCol)).cast("double").as("dl"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
    val qTerms = queryDocs
      .select(col(qidCol).cast("long").as("qid"),
        explode(array_distinct(toks(col(textCol)))).as("term"))
    val contrib = postings
      .join(graft.gatedSmallSide(qTerms), Seq("term"))
      .join(graft.gatedSmallSide(idf), Seq("term"))
      .select(col("qid"), col("id"),
        // the ONE pinned expression — mirrored token-for-token by the
        // DuckDB oracle; floor makes each contribution integral before the
        // exact integer total
        floor((((col("idf_micro").cast("double") / lit(1000000.0)) *
            (col("tf") * lit(K1Plus1))) /
          (col("tf") + (lit(K1) * (lit(OneMinusB) + (lit(B) * (col("dl") / lit(avgdl))))))) *
          lit(1000000.0)).as("c"))
    val scores = contrib.groupBy("qid", "id")
      .agg(sum(col("c")).as("score_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("id"))
    scores
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  private def microNats(lnCol: Column): Column =
    round(lnCol * lit(1000000.0)).cast("long")
}
