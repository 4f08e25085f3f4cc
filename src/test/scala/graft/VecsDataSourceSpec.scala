package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.io.VecsIO

class VecsDataSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmpFile(suffix: String): String =
    Files.createTempDirectory("graft_dsv2").resolve(s"data$suffix").toString

  private val n = 40
  private val data = Array.tabulate(n)(i => Array(i.toFloat, i * 2.0f, i * 3.0f))

  private lazy val fvecsPath: String = {
    val p = tmpFile(".fvecs")
    VecsIO.writeFvecs(p, data.iterator)
    p
  }

  test("format(\"vecs\") reads fvecs identically to VecsIO.readFvecs") {
    import spark.implicits._
    val viaDsv2 = spark.read.format("vecs").load(fvecsPath)
      .orderBy("row_id").as[(Long, Array[Float])].collect()
    val viaFn = VecsIO.readFvecs(spark, fvecsPath)
      .orderBy("row_id").as[(Long, Array[Float])].collect()
    assert(viaDsv2.length === n)
    viaDsv2.zip(viaFn).foreach { case ((i1, v1), (i2, v2)) =>
      assert(i1 === i2); assert(v1.sameElements(v2))
    }
  }

  test("SQL surface: CREATE TEMPORARY VIEW ... USING vecs") {
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW vecs_view USING vecs OPTIONS (path '$fvecsPath')")
    assert(spark.sql("SELECT count(*) FROM vecs_view").head().getLong(0) === n.toLong)
    assert(spark.sql("SELECT vector[1] FROM vecs_view WHERE row_id = 7")
      .head().getFloat(0) === 14.0f)
  }

  test("per-read maxSplitBytes option overrides the session conf") {
    val df = spark.read.format("vecs").option("maxSplitBytes", "64").load(fvecsPath)
    assert(df.rdd.getNumPartitions === 10, "4 recs per 64-byte split over 40 rows")
    assert(df.count() === n.toLong)
  }

  test("row_id range pushdown prunes and trims input partitions") {
    spark.conf.set("spark.graft.vecs.maxSplitBytes", "64") // 4 recs/split -> 10 splits
    try {
      val df = spark.read.format("vecs").load(fvecsPath)
      assert(df.rdd.getNumPartitions === 10)
      val ranged = df.where("row_id >= 12 AND row_id < 18")
      // splits [12..16) and [16..20) survive; the rest are pruned at plan time
      assert(ranged.rdd.getNumPartitions === 2)
      import spark.implicits._
      assert(ranged.orderBy("row_id").as[(Long, Array[Float])].collect()
        .map(_._1).toSeq === (12L until 18L))
      val point = df.where("row_id = 33")
      assert(point.rdd.getNumPartitions === 1)
      assert(point.head().getLong(0) === 33L)
    } finally spark.conf.unset("spark.graft.vecs.maxSplitBytes")
  }

  test("column pruning: row_id-only projection scans without payload decode") {
    val ids = spark.read.format("vecs").load(fvecsPath).select("row_id")
    val scan = ids.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSeq === Seq("row_id"), scan.schema.treeString)
    import spark.implicits._
    assert(ids.as[Long].collect().sorted.toSeq === (0L until n.toLong))
  }

  test("DSv2 write: overwrite replaces, append concatenates after old shards") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col}
    val dir = Files.createTempDirectory("graft_dsv2_w").resolve("out.fvecs").toString
    def frame(from: Int, until: Int, parts: Int) =
      spark.range(from, until, 1, parts).select(
        array(col("id").cast("float"), (col("id") * 10).cast("float")).as("vector"))

    frame(0, 20, 4).orderBy("vector").write.format("vecs").mode("overwrite").save(dir)
    val first = spark.read.format("vecs").load(dir).orderBy("row_id")
      .as[(Long, Array[Float])].collect()
    assert(first.map(_._1).toSeq === (0L until 20L))
    assert(first.map(_._2(0).toLong).toSeq === (0L until 20L), "partition-order ids")

    frame(100, 110, 3).orderBy("vector").write.format("vecs").mode("append").save(dir)
    val appended = spark.read.format("vecs").load(dir).orderBy("row_id")
      .as[(Long, Array[Float])].collect()
    assert(appended.length === 30)
    assert(appended.map(_._2(0).toLong).toSeq === ((0L until 20L) ++ (100L until 110L)),
      "append keeps old shards first")

    frame(0, 6, 8).write.format("vecs").mode("overwrite").save(dir) // 8 parts, some empty
    val third = spark.read.format("vecs").load(dir)
    assert(third.count() === 6, "overwrite replaced everything; empty partitions skipped")
    assert(!Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_tmp")), "temp dirs cleaned up")
  }

  test("streaming micro-batch read picks up appended shards with consecutive ids") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col}
    val dir = Files.createTempDirectory("graft_dsv2_s").resolve("stream.fvecs").toString
    val ckpt = Files.createTempDirectory("graft_dsv2_ckpt").toString
    def frame(from: Int, until: Int) =
      spark.range(from, until, 1, 2).select(
        array(col("id").cast("float"), (col("id") * 5).cast("float")).as("vector"))

    frame(0, 10).orderBy("vector").write.format("vecs").mode("overwrite").save(dir)
    val q = spark.readStream.format("vecs").load(dir)
      .writeStream.format("memory").queryName("vecs_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("vecs_stream").count() === 10)
      frame(10, 16).orderBy("vector").write.format("vecs").mode("append").save(dir)
      q.processAllAvailable()
      val got = spark.table("vecs_stream").orderBy("row_id")
        .as[(Long, Array[Float])].collect()
      assert(got.map(_._1).toSeq === (0L until 16L), "ids consecutive across batches")
      assert(got.map(_._2(1).toLong).toSeq === (0L until 16L).map(_ * 5))
    } finally q.stop()
  }

  test("mixed-dim corruption fails loudly instead of decoding garbage") {
    // two records whose total length is still a multiple of the record
    // size, but the second record's dim prefix is wrong
    val p = tmpFile(".fvecs")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(p))
    val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(3).putFloat(1f).putFloat(2f).putFloat(3f)
    bb.putInt(2).putFloat(4f).putFloat(5f).putFloat(6f)
    out.write(bb.array()); out.close()
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("vecs").load(p).collect()
    }
    assert(e.getMessage.contains("record dim") ||
      Option(e.getCause).exists(_.getMessage.contains("record dim")), e.getMessage)
  }

  test("renamed user schemas are rejected at plan time") {
    val e = intercept[IllegalArgumentException] {
      spark.read.schema("id LONG, vec ARRAY<FLOAT>").format("vecs").load(fvecsPath).collect()
    }
    assert(e.getMessage.contains("columns must be among"), e.getMessage)
  }

  test("re-typed user schemas are rejected at plan time") {
    // canonical names, wrong types: would silently reinterpret float-backed
    // arrays as doubles without the type check
    val e = intercept[IllegalArgumentException] {
      spark.read.schema("row_id LONG, vector ARRAY<DOUBLE>")
        .format("vecs").load(fvecsPath).collect()
    }
    assert(e.getMessage.contains("user schema declares"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      spark.read.schema("row_id INT, vector ARRAY<FLOAT>")
        .format("vecs").load(fvecsPath).collect()
    }
    assert(e2.getMessage.contains("user schema declares"), e2.getMessage)
    // correctly-typed subsets still plan fine
    assert(spark.read.schema("row_id BIGINT").format("vecs").load(fvecsPath)
      .count() === n.toLong)
  }

  test("streaming fails loudly when the listing changes under the offset") {
    import org.apache.spark.sql.functions.{array, col}
    val dir = Files.createTempDirectory("graft_dsv2_g").resolve("guard.fvecs").toString
    val ckpt = Files.createTempDirectory("graft_dsv2_gckpt").toString
    def frame(from: Int, until: Int) =
      spark.range(from, until, 1, 1).select(
        array(col("id").cast("float"), col("id").cast("float")).as("vector"))
    frame(0, 4).write.format("vecs").mode("overwrite").save(dir)
    val q = spark.readStream.format("vecs").load(dir)
      .writeStream.format("memory").queryName("vecs_guard")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("vecs_guard").count() === 4)
      // a producer violating the contract: a new shard that sorts BEFORE
      // the committed ones shifts every file index
      VecsIO.writeFvecs(s"$dir/a-before.fvecs", Iterator(Array(9f, 9f)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(e.getMessage.contains("listing changed") ||
        Option(e.getCause).exists(_.getMessage.contains("listing changed")),
        e.getMessage)
    } finally q.stop()
  }

  test("streaming honors the per-read maxSplitBytes option") {
    import org.apache.spark.sql.functions.{array, col}
    val dir = Files.createTempDirectory("graft_dsv2_ms").resolve("ms.fvecs").toString
    val ckpt = Files.createTempDirectory("graft_dsv2_msckpt").toString
    // 40 rows, 12-byte records; 64-byte splits -> 5 recs/split -> 8 splits
    // (the session default of 128 MB would plan ONE split)
    spark.range(0, 40, 1, 1).select(
        array(col("id").cast("float"), col("id").cast("float")).as("vector"))
      .write.format("vecs").mode("overwrite").save(dir)
    @volatile var parts = -1
    val q = spark.readStream.format("vecs").option("maxSplitBytes", "64").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        parts = df.rdd.getNumPartitions
      }.start()
    try {
      q.processAllAvailable()
      assert(parts === 8, s"expected 8 record-aligned splits, got $parts")
    } finally q.stop()
  }

  test("u64bin and ivecs schemas through the DSv2") {
    import spark.implicits._
    val pu = tmpFile(".u64bin")
    VecsIO.writeU64bin(pu, (0 until 9).map(i => 1000L + i))
    val u = spark.read.format("vecs").load(pu)
    assert(u.columns.toSeq === Seq("row_id", "external_id"))
    assert(u.orderBy("row_id").as[(Long, Long)].collect().toSeq ===
      (0 until 9).map(i => (i.toLong, 1000L + i)))

    val pi = tmpFile(".ivecs")
    VecsIO.writeIvecs(pi, Iterator(Array(3, 1, 4), Array(1, 5, 9)))
    val iv = spark.read.format("vecs").load(pi)
    assert(iv.columns.toSeq === Seq("row_id", "values"))
    assert(iv.orderBy("row_id").as[(Long, Seq[Int])].collect().toSeq ===
      Seq((0L, Seq(3, 1, 4)), (1L, Seq(1, 5, 9))))
  }
}
