package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.VecsIO

class VecsIOSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmpFile(suffix: String): String =
    Files.createTempDirectory("graft_vecs").resolve(s"data$suffix").toString

  private val vecs: Array[Array[Float]] = Array(
    Array(1.0f, 2.0f, 3.0f),
    Array(-1.5f, 0.0f, 42.25f),
    Array(7.0f, -8.0f, 9.5f))

  test("fvecs roundtrip preserves values and order") {
    import spark.implicits._
    val p = tmpFile(".fvecs")
    VecsIO.writeFvecs(p, vecs.iterator)
    val got = VecsIO.readFvecs(spark, p).orderBy("row_id")
      .as[(Long, Array[Float])].collect()
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    got.zip(vecs).foreach { case ((_, g), e) => assert(g.sameElements(e)) }
  }

  test("ivecs roundtrip (ground-truth lists)") {
    import spark.implicits._
    val p = tmpFile(".ivecs")
    val recs = Array(Array(5, 4, 3), Array(10, 20, 30))
    VecsIO.writeIvecs(p, recs.iterator)
    val got = VecsIO.readIvecs(spark, p).orderBy("row_id")
      .as[(Long, Seq[Int])].collect()
    assert(got.map(_._2).toSeq === recs.map(_.toSeq).toSeq)
  }

  test("bvecs roundtrip applies unsigned widening (255 stays 255)") {
    import spark.implicits._
    val p = tmpFile(".bvecs")
    VecsIO.writeBvecs(p, Iterator(Array(0, 127, 128, 255)))
    val got = VecsIO.readBvecs(spark, p).as[(Long, Array[Float])].head()
    assert(got._2.toSeq === Seq(0.0f, 127.0f, 128.0f, 255.0f))
  }

  test("f32bin roundtrip with header") {
    import spark.implicits._
    val p = tmpFile(".f32bin")
    VecsIO.writeF32bin(p, vecs.length, 3, vecs.iterator)
    val got = VecsIO.readF32bin(spark, p).orderBy("row_id")
      .as[(Long, Array[Float])].collect()
    assert(got.length === 3)
    got.zip(vecs).foreach { case ((_, g), e) => assert(g.sameElements(e)) }
  }

  test("source autodetect dispatches on extension; metadata needs no payload scan") {
    assert(VecsIO.detectSourceType("/a/b/x.fvecs") === "FVECS")
    assert(VecsIO.detectSourceType("/a/b/x.bvecs") === "BVECS")
    assert(VecsIO.detectSourceType("s3://bkt/x.u8bin") === "U8BIN")
    assert(VecsIO.detectSourceType("/a/dir.fvecs/") === "FVECS")
    assert(VecsIO.detectSourceType("/a/b/table.parquet") === "PARQUET")
    assert(VecsIO.detectSourceType("/a/b/plaindir") === "PARQUET")
    val p = tmpFile(".fvecs")
    VecsIO.writeFvecs(p, vecs.iterator)
    assert(VecsIO.sourceMetadata(spark, p) === ((vecs.length.toLong, 3)))
    assert(VecsIO.readSource(spark, p).count() === vecs.length.toLong)
    val pb = tmpFile(".f32bin")
    VecsIO.writeF32bin(pb, vecs.length, 3, vecs.iterator)
    assert(VecsIO.sourceMetadata(spark, pb) === ((vecs.length.toLong, 3)))
    assert(VecsIO.readSource(spark, pb).count() === vecs.length.toLong)
  }

  test("u64bin ids roundtrip") {
    import spark.implicits._
    val p = tmpFile(".u64bin")
    VecsIO.writeU64bin(p, Seq(7L, 11L, 13L))
    val got = VecsIO.readU64bin(spark, p).orderBy("row_id")
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 7L), (1L, 11L), (2L, 13L)))
  }

  test("sharded distributed fvecs write roundtrips with global order preserved") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_vecs_shard").resolve("out.fvecs")
    import org.apache.spark.sql.functions.{array, col}
    val n = 100
    val df = spark.range(0, n, 1, 5).select(col("id"),
      array(col("id").cast("float"), (col("id") * 2).cast("float")).as("vector"))
    // orderBy = range-partitioned sort; shard file names then reproduce it
    VecsIO.writeFvecsSharded(df.orderBy("id"), dir.toString)
    val got = VecsIO.readFvecs(spark, dir.toString).orderBy("row_id")
      .as[(Long, Array[Float])].collect()
    assert(got.length === n)
    got.foreach { case (rid, v) =>
      assert(v.toSeq === Seq(rid.toFloat, rid * 2.0f), s"row $rid")
    }
  }

  test("range splitting: tiny maxSplitBytes yields many tasks, identical rows") {
    import spark.implicits._
    val n = 50
    val data = Array.tabulate(n)(i => Array(i.toFloat, i * 3.0f))
    val pf = tmpFile(".fvecs")
    VecsIO.writeFvecs(pf, data.iterator)
    val pb = tmpFile(".f32bin")
    VecsIO.writeF32bin(pb, n, 2, data.iterator)
    val pu = tmpFile(".u64bin")
    VecsIO.writeU64bin(pu, (0 until n).map(i => i * 7L))
    val whole = VecsIO.readFvecs(spark, pf).orderBy("row_id")
      .as[(Long, Array[Float])].collect().map { case (i, v) => (i, v.toSeq) }
    spark.conf.set("spark.graft.vecs.maxSplitBytes", "24") // 2 records/split
    try {
      val split = VecsIO.readFvecs(spark, pf)
      assert(split.rdd.getNumPartitions === n / 2, "fvecs split plan")
      assert(split.orderBy("row_id").as[(Long, Array[Float])].collect()
        .map { case (i, v) => (i, v.toSeq) }.toSeq === whole.toSeq)
      val splitBin = VecsIO.readF32bin(spark, pb)
      assert(splitBin.rdd.getNumPartitions > 1, "f32bin split plan")
      assert(splitBin.orderBy("row_id").as[(Long, Array[Float])].collect()
        .map { case (i, v) => (i, v.toSeq) }.toSeq === whole.toSeq)
      val splitIds = VecsIO.readU64bin(spark, pu)
      assert(splitIds.rdd.getNumPartitions > 1, "u64bin split plan")
      assert(splitIds.orderBy("row_id").as[(Long, Long)].collect().toSeq ===
        (0 until n).map(i => (i.toLong, i * 7L)))
    } finally spark.conf.unset("spark.graft.vecs.maxSplitBytes")
  }

  test("splits carry block-location scheduling hints when the FS reports them") {
    val p = tmpFile(".fvecs")
    VecsIO.writeFvecs(p, vecs.iterator)
    def root(r: org.apache.spark.rdd.RDD[_]): org.apache.spark.rdd.RDD[_] =
      if (r.dependencies.isEmpty) r else root(r.dependencies.head.rdd)
    val src = root(VecsIO.readFvecs(spark, p).rdd)
    val locs = src.preferredLocations(src.partitions(0))
    assert(locs.contains("localhost"), s"expected localhost hint, got $locs")
  }

  test("marker files (_SUCCESS, hidden) are ignored and do not shift row ids") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_vecs_marker")
    Files.createFile(dir.resolve("_SUCCESS")) // 0-byte marker sorts first
    Files.createFile(dir.resolve(".hidden"))
    VecsIO.writeFvecs(dir.resolve("a.fvecs").toString, vecs.iterator)
    val got = VecsIO.readFvecs(spark, dir.toString).orderBy("row_id")
      .as[(Long, Array[Float])].collect()
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))

    val udir = Files.createTempDirectory("graft_u64_marker")
    Files.createFile(udir.resolve("_SUCCESS"))
    VecsIO.writeU64bin(udir.resolve("ids.u64bin").toString, Seq(7L, 11L))
    assert(VecsIO.readU64bin(spark, udir.toString).orderBy("row_id")
      .as[(Long, Long)].collect().toSeq === Seq((0L, 7L), (1L, 11L)))
  }

  test("multi-file directory: row ids are consecutive in file order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_vecs_multi")
    VecsIO.writeFvecs(dir.resolve("a.fvecs").toString, Iterator(vecs(0)))
    VecsIO.writeFvecs(dir.resolve("b.fvecs").toString, Iterator(vecs(1), vecs(2)))
    val got = VecsIO.readFvecs(spark, dir.toString).orderBy("row_id")
      .as[(Long, Array[Float])].collect()
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got(0)._2.sameElements(vecs(0)))
    assert(got(2)._2.sameElements(vecs(2)))
  }
}
