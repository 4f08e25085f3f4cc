package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.MaxSim

/** Recall audit for late-interaction MaxSim retrieval: sweeps the
  * per-query-vector shortlist budget and prints recall@10 of object sets
  * vs the exact MaxSim (full-shortlist) run — the table recorded in
  * PERF.md. `shortlistK = |vectors|` is exact by construction
  * (MaxSimSpec asserts it against a driver-side replay); the sweep shows
  * how fast the two-stage plan converges on this data.
  * Run: `sbt "Test/runMain graft.MaxSimRecallAudit [sfDir]"`. */
object MaxSimRecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("maxsim-recall-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(expr("vec_id DIV 4").as("obj"), col("vec_id").as("vid"),
        col("embedding").as("vector"))
      .cache()
    val nVecs = vecs.count().toInt
    val qs = vecs.where(col("obj") < 25)
      .select(col("obj").as("qid"), col("vid").as("qvid"), col("vector").as("qvec"))
    val k = 10
    def run(shortlistK: Int): (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = MaxSim.topK(vecs, qs, k, shortlistK)
        .select("qid", "obj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, exactSec) = run(nVecs)
    println(f"objects=${nVecs / 4}%d  vectors=$nVecs%d  queries=25x4  k=$k%d")
    println("shortlistK  recall@10  sec")
    for (f <- Seq(4, 8, 16, 32, 64, nVecs)) {
      val (got, sec) = run(f)
      val rec = (got & exact).size.toDouble / exact.size
      println(f"$f%10d  $rec%.4f  $sec%.2f")
    }
    println(f"(exact run: $exactSec%.2f s)")
    spark.stop()
  }
}
