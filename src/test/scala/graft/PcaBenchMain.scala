package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingOps

/** Manual micro-bench (not a test): HOF-lambda vs CenteredDot-kernel PCA
  * projection. `sbt "Test/runMain graft.PcaBenchMain <sfDir>"`. */
object PcaBenchMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(args.headOption.getOrElse("/root/testdata/sf0.1") + "/embeddings.parquet").cache()
    println("rows=" + emb.count())
    val uri = java.nio.file.Files.createTempDirectory("pca_bench").toString
    EmbeddingOps.trainPca(emb, uri, 8)
    val comps = spark.read.parquet(s"$uri/components")
    val mean = spark.read.parquet(s"$uri/mean").head().getSeq[Double](0)
    val meanLit = typedlit(mean)
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.agg(sum("proj")).head()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val hof = emb.select(col("vec_id"),
        zip_with(col("embedding").cast("array<double>"), meanLit, (a, b) => a - b).as("__c"))
      .crossJoin(broadcast(comps))
      .select(col("vec_id"), col("comp_idx"),
        aggregate(zip_with(col("__c"), col("comp"), (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v).as("proj"))
    time("hof")(hof)
    time("kernel")(EmbeddingOps.projectPca(emb, uri))
    spark.stop()
  }
}
