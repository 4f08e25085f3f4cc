package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.objects.{ImageStatsEmbedding, ObjectIndex, OmeZarrReader}

class OmeZarrSpec extends AnyFunSuite {
  import SparkTestSession._

  // the test-card red-channel formula the other multimodal fixtures use
  private def pix(i: Int)(x: Int, y: Int): Int = (3 * x + 5 * y + 7 * i) % 256

  private def mintStore(codec: String, separator: String = "."): String = {
    val root = Files.createTempDirectory("graft_zarr")
    for (i <- 0 until 3) {
      OmeZarrReader.writeTestZarr(root.resolve(f"img_$i%02d.zarr"),
        width = 40, height = 24, levels = 3, chunkY = 8, chunkX = 16,
        pixel = pix(i), codec = codec, separator = separator)
    }
    root.toString
  }

  test("zarr chunks decode to exact formula pixels; edge chunks crop") {
    val dir = mintStore("raw")
    val reader = new OmeZarrReader(dir, "*.zarr", level = 0)
    val tiles = reader.readObjects(spark).orderBy("external_id").collect()
    // 40x24 at 8x16 chunks = 3 cols x 3 rows per image
    assert(tiles.length === 3 * 9)
    // a full interior chunk and the ragged right-edge column both decode
    val t = tiles.find(r => r.getLong(1) === 1L &&
      r.getInt(4) === 1 && r.getInt(5) === 1).get // tile_x=1, tile_y=1
    val img = Multimodal.decodeImage(t.getAs[Array[Byte]](10)).get
    assert(img.getWidth === 16 && img.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val (gx, gy) = (16 + x, 8 + y)
      assert((img.getRGB(x, y) & 0xff) === pix(1)(gx, gy),
        s"pixel ($gx,$gy) of image 1")
    }
    val edge = tiles.find(r => r.getLong(1) === 0L &&
      r.getInt(4) === 2 && r.getInt(5) === 0).get // last column: 40-32=8 wide
    assert(edge.getInt(8) === 8 && edge.getInt(9) === 8) // tile_width/height
    assert(Multimodal.decodeImage(edge.getAs[Array[Byte]](10)).get.getWidth === 8)
    // metadata pass agrees on the grid without touching chunk bytes
    val md = reader.readMetadata(spark).orderBy("external_id").collect()
    assert(md.map(_.getLong(0)).toSeq === tiles.map(_.getLong(0)).toSeq)
    assert(md.map(_.getInt(8)).toSeq === tiles.map(_.getInt(8)).toSeq)
  }

  test("multiscale levels halve geometry; zlib chunks and / separator decode identically") {
    val raw = new OmeZarrReader(mintStore("raw"), "*.zarr", level = 1)
      .readObjects(spark).orderBy("external_id").collect()
    // level 1 = 20x12 at 8x16 chunks = 2 cols x 2 rows per image
    assert(raw.length === 3 * 4)
    assert(raw.forall(r => r.getInt(6) === 20 && r.getInt(7) === 12))
    val zl = new OmeZarrReader(mintStore("zlib"), "*.zarr", level = 1)
      .readObjects(spark).orderBy("external_id").collect()
    assert(zl.map(_.getAs[Array[Byte]](10).toSeq) ===
      raw.map(_.getAs[Array[Byte]](10).toSeq),
      "zlib and raw stores must decode byte-identically")
    val nested = new OmeZarrReader(mintStore("raw", separator = "/"),
      "*.zarr", level = 1).readObjects(spark).orderBy("external_id").collect()
    assert(nested.map(_.getAs[Array[Byte]](10).toSeq) ===
      raw.map(_.getAs[Array[Byte]](10).toSeq),
      "nested / chunk layout must decode like the . layout")
  }

  test("zarr tiles index and self-retrieve through the object layer") {
    import spark.implicits._
    val reader = new OmeZarrReader(mintStore("zlib"), "*.zarr", level = 0)
    val idx = ObjectIndex.create(spark,
      Files.createTempDirectory("graft_zarr_idx").toString,
      reader, new ImageStatsEmbedding(48),
      indexType = "FLAT", metric = graft.operators.DistanceMetric.L2,
      timestamp = 1000L)
    val queries = reader.readObjects(spark).where(col("external_id") < 3)
      .select(col("external_id").as("qid"), col("payload"))
    val top1 = idx.query(queries, k = 2).where(col("rank") === 1)
      .select(col("qid"), col("external_id")).as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(q => assert(top1(q) === q, s"tile $q should retrieve itself"))
  }

  test("zstd and blosc stores decode byte-identically to raw") {
    val raw = new OmeZarrReader(mintStore("raw"), "*.zarr", level = 0)
      .readObjects(spark).orderBy("external_id").collect()
      .map(_.getAs[Array[Byte]](10).toSeq)
    // every codec the wild writes: plain zstd frames, plus blosc over each
    // JVM-available inner codec (lz4 = numcodecs' default), shuffle on/off
    for (codec <- Seq("zstd", "blosc-lz4", "blosc-zstd", "blosc-snappy",
        "blosc-zlib", "blosc-lz4-noshuffle")) {
      val got = new OmeZarrReader(mintStore(codec), "*.zarr", level = 0)
        .readObjects(spark).orderBy("external_id").collect()
        .map(_.getAs[Array[Byte]](10).toSeq)
      assert(got === raw, s"$codec store must decode byte-identically to raw")
    }
  }

  test("unsupported stores fail with named errors; empty dir is empty, not a crash") {
    val root = Files.createTempDirectory("graft_zarr_bad")
    OmeZarrReader.writeTestZarr(root.resolve("ok.zarr"), 16, 16, 1, 8, 8, pix(0))
    // blosclz inner codec: refused at discovery with the codec named
    val bloscDir = root.resolve("blosc.zarr")
    OmeZarrReader.writeTestZarr(bloscDir, 16, 16, 1, 8, 8, pix(0))
    val za = bloscDir.resolve("0/.zarray")
    Files.write(za, new String(Files.readAllBytes(za), "UTF-8")
      .replace("null", """{"id":"blosc","cname":"blosclz"}""").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      new OmeZarrReader(root.toString, "*.zarr").readObjects(spark).collect()
    }
    assert(e.getMessage.contains("blosclz"), e.getMessage)
    // a level past the pyramid is a named error
    val e2 = intercept[IllegalArgumentException] {
      new OmeZarrReader(root.toString, "ok.zarr", level = 5)
        .readObjects(spark).collect()
    }
    assert(e2.getMessage.contains("levels"), e2.getMessage)
    // a directory with no zarr groups reads as empty frames
    val empty = Files.createTempDirectory("graft_zarr_none").toString
    assert(new OmeZarrReader(empty, "*.zarr").readObjects(spark).count() === 0L)
    assert(new OmeZarrReader(empty, "*.zarr").readMetadata(spark).count() === 0L)
  }
}
