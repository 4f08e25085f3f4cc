package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.index.{Ingest, VectorIndex}
import graft.operators.{DistanceMetric, Knn}

/** Prints physical plans of the load-bearing operators so the shapes can be
  * audited: partition pruning on IVF probes, broadcast joins, partial
  * (ObjectHashAggregate) top-k, parquet filter/column pushdown. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = SparkTestSession.sf0001
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    val q = emb.where(col("external_id") < 3)
      .select(col("external_id").as("qid"), col("vector").as("qvec"))

    println("===== brute-force knn =====")
    Knn.bruteForce(emb, q, 5, DistanceMetric.L2,
      idCol = "external_id", vecCol = "vector").explain("formatted")

    val uri = Files.createTempDirectory("graft_audit").toString
    val idx = Ingest.ingest(spark, uri, emb, "IVF_FLAT", DistanceMetric.L2,
      timestamp = 1000L, partitions = Some(16))
    println("===== ivf nprobe=2 query =====")
    idx.query(q, 5, nprobe = 2).explain("formatted")

    println("===== parquet scan with projection over lineitem =====")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_quantity"))
      .explain("formatted")
    spark.stop()
  }
}
