package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extension-injected SQL functions work in a fresh session") {
    import spark.implicits._
    Seq((Array(0.0f, 3.0f), Array(4.0f, 3.0f))).toDF("a", "b")
      .createOrReplaceTempView("ve")
    val r = spark.sql("SELECT dist_l2(a, b) FROM ve").head().getFloat(0)
    assert(r === 4.0f)
  }

  test("radius predicates lose the per-row sqrt (dist_l2 <= r -> dist_sos <= r*r)") {
    import spark.implicits._
    // a real parquet scan: local relations fold away at optimize time
    val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
    (0 until 100).map(i => (i.toLong, Array(i.toFloat, 0.0f)))
      .toDF("id", "v").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("pts")
    val q = spark.sql(
      "SELECT id FROM pts WHERE dist_l2(v, array(0.0f, 0.0f)) <= 10.0f")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("dist_sos"), s"expected sqrt-free rewrite, got:\n$plan")
    assert(!plan.contains("dist_l2"))
    assert(q.count() === 11) // ids 0..10
    // negative radius folds to an empty result without scanning math
    val neg = spark.sql(
      "SELECT id FROM pts WHERE dist_l2(v, array(0.0f, 0.0f)) <= -1.0f")
    assert(neg.count() === 0)
  }
}
