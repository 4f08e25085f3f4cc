package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared large-scale benchmark fixture ([[IvfSweepBench]] and
  * [[VamanaSweepBench]] measure the SAME corpus by construction): the sf
  * embeddings table replicated `reps` times — replica 0 bit-exact, the
  * rest with a deterministic per-(id, replica, lane) Murmur3 jitter
  * uniform on ±`jitter`/2 — written to a temp parquet so the sweeps scan
  * stable files instead of recomputing the expression. Also the shared
  * ground-truth/recall helpers (`.keys.toSeq`: a Set of recall VALUES
  * would deduplicate queries that share a recall). */
object SweepFixture {

  /** Returns (corpusPath, corpus DF, row count). Caller deletes the path. */
  def replicatedCorpus(spark: SparkSession, sfDir: String, reps: Int,
      jitter: Double): (String, DataFrame, Long) = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = base
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select(
        (col("vec_id") * reps + col("r")).as("external_id"),
        expr(s"""transform(embedding, (x, i) ->
             CASE WHEN r = 0 THEN x
             ELSE x + float((pmod(hash(vec_id, r, i), 1000) - 500) / 1000.0 * $jitter) END)""")
          .as("vector"))
    val path = java.nio.file.Files.createTempDirectory("graft_sweep_corpus").toString
    corpus.write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    (path, df, df.count())
  }

  def queries(spark: SparkSession, sfDir: String, nq: Int): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  def groundTruth(res: DataFrame): Map[Long, Set[Long]] =
    res.select("qid", "id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  def recall(exact: Map[Long, Set[Long]], got: Map[Long, Set[Long]], k: Int): Double =
    exact.keys.toSeq.map { q =>
      (got.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / k
    }.sum / exact.size
}
