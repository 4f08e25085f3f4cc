package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DistanceMetric, Knn}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2, expressed as a
  * DataFrame plan over the driver's parquet tables in `dir`; `oracleSql` is
  * the DuckDB-equivalent SQL the driver validates against at sf0.01.
  */
object SparkEntry {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** First NQ embeddings double as the k-NN query batch (deterministic). */
  private val NQ = 10
  private val K = 10

  private def knnFlat(metric: DistanceMetric)(spark: SparkSession, dir: String): DataFrame = {
    val db = emb(spark, dir)
    val queries = db.where(col("vec_id") < NQ)
    Knn.bruteForce(db, queries, K, metric,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .select(col("qid"), col("id").as("neighbor_id"))
      .orderBy("qid", "neighbor_id")
  }

  /** Shared shape of the DuckDB k-NN oracles: top-K per query by the given
    * ORDER BY score expression, ids-only output (floats never compared). */
  private def knnOracle(orderBy: String): String =
    s"""SELECT q.vec_id AS qid, n.vec_id AS neighbor_id
       |FROM (SELECT * FROM embeddings WHERE vec_id < $NQ) q
       |CROSS JOIN embeddings n
       |QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY $orderBy, n.vec_id) <= $K
       |ORDER BY qid, neighbor_id""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnFlat(DistanceMetric.L2)(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_flat_l2" -> (knnFlat(DistanceMetric.L2) _),
    "knn_flat_sos" -> (knnFlat(DistanceMetric.SumOfSquares) _),
    "knn_flat_cosine" -> (knnFlat(DistanceMetric.Cosine) _),
    "knn_flat_ip" -> (knnFlat(DistanceMetric.InnerProduct) _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_flat_l2" -> knnOracle("list_distance(n.embedding, q.embedding)"),
    "knn_flat_sos" -> knnOracle("list_distance(n.embedding, q.embedding)"),
    "knn_flat_cosine" -> knnOracle("list_cosine_similarity(n.embedding, q.embedding) DESC"),
    "knn_flat_ip" -> knnOracle("list_inner_product(n.embedding, q.embedding) DESC"),
  )
}
