package graft

import org.apache.spark.sql.functions._

import graft.operators.{DistanceMetric, Knn}

/** Manual micro-bench (not a test): where does a warm BM25 serve spend its
  * time at sf0.1? `sbt "Test/runMain graft.Bm25ProfileMain <sfDir>"`. */
object Bm25ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val uri = java.nio.file.Files.createTempDirectory("bm25_prof").toString
    graft.text.Bm25.fit(docs, uri)
    spark.range(100000L).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val q = docs.where(col("doc_id") < 5)
    time("topkIndexed") {
      graft.text.Bm25.topkIndexed(spark, q, 10, uri)
        .queryExecution.toRdd.count()
    }
    time("topkIndexed nomaxscore") {
      spark.conf.set(graft.text.Bm25.MaxScoreDfCapKey, "0")
      graft.text.Bm25.topkIndexed(spark, q, 10, uri)
        .queryExecution.toRdd.count()
      spark.conf.unset(graft.text.Bm25.MaxScoreDfCapKey)
    }
    val db = spark.read.parquet(s"$dir/embeddings.parquet")
    time("dense arm") {
      Knn.bruteForce(db, db.where(col("vec_id") < 5), 10,
          DistanceMetric.Cosine, idCol = "vec_id", vecCol = "embedding",
          qidCol = "vec_id", qvecCol = "embedding")
        .queryExecution.toRdd.count()
    }
    time("hybrid rrf") {
      val sparse = graft.text.Bm25.topkIndexed(spark, q, 10, uri)
        .select(col("qid"), col("id"), col("rank"))
      val dense = Knn.bruteForce(db, db.where(col("vec_id") < 5), 10,
          DistanceMetric.Cosine, idCol = "vec_id", vecCol = "embedding",
          qidCol = "vec_id", qvecCol = "embedding")
        .select(col("qid"), col("id"), col("rank"))
      graft.operators.RankFusion.rrf(dense, sparse, 10)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
