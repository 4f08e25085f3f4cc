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
        "blosc-zlib", "blosc-lz4-noshuffle", "blosc-lz4-bitshuffle",
        "blosc-zstd-bitshuffle")) {
      val got = new OmeZarrReader(mintStore(codec), "*.zarr", level = 0)
        .readObjects(spark).orderBy("external_id").collect()
        .map(_.getAs[Array[Byte]](10).toSeq)
      assert(got === raw, s"$codec store must decode byte-identically to raw")
    }
  }

  test("zarr v3 stores (NGFF 0.5) decode byte-identically to v2, all codec chains") {
    val raw = new OmeZarrReader(mintStore("raw"), "*.zarr", level = 0)
      .readObjects(spark).orderBy("external_id").collect()
      .map(_.getAs[Array[Byte]](10).toSeq)
    def mintV3(codec: String, crc: Boolean, keyEnc: String = "default"): String = {
      val root = Files.createTempDirectory("graft_zarr3")
      for (i <- 0 until 3) {
        OmeZarrReader.writeTestZarrV3(root.resolve(f"img_$i%02d.zarr"),
          width = 40, height = 24, levels = 3, chunkY = 8, chunkX = 16,
          pixel = pix(i), codec = codec, crc32c = crc, keyEncoding = keyEnc)
      }
      root.toString
    }
    for ((codec, crc) <- Seq(("raw", false), ("gzip", false), ("zstd", true),
        ("blosc-lz4", true), ("blosc-lz4-bitshuffle", true), ("raw", true))) {
      val got = new OmeZarrReader(mintV3(codec, crc), "*.zarr", level = 0)
        .readObjects(spark).orderBy("external_id").collect()
        .map(_.getAs[Array[Byte]](10).toSeq)
      assert(got === raw, s"v3 $codec crc32c=$crc must decode like v2 raw")
    }
    // the v3 "v2" chunk-key encoding (no c/ prefix, dot separator)
    val v2keys = new OmeZarrReader(mintV3("gzip", crc = false, keyEnc = "v2"),
        "*.zarr", level = 0).readObjects(spark).orderBy("external_id").collect()
      .map(_.getAs[Array[Byte]](10).toSeq)
    assert(v2keys === raw, "v3 with v2 chunk keys must decode like v2 raw")
    // level selection reads v3 pyramids too
    val l1 = new OmeZarrReader(mintV3("zstd", crc = false), "*.zarr", level = 1)
      .readObjects(spark).collect()
    assert(l1.length === 3 * 4 && l1.forall(_.getInt(6) === 20))
    // a MIXED root (v2 and v3 groups side by side) discovers both
    val mixed = Files.createTempDirectory("graft_zarr_mixed")
    OmeZarrReader.writeTestZarr(mixed.resolve("a.zarr"), 16, 16, 1, 8, 8, pix(0))
    OmeZarrReader.writeTestZarrV3(mixed.resolve("b.zarr"), 16, 16, 1, 8, 8, pix(1),
      codec = "zstd")
    val both = new OmeZarrReader(mixed.toString, "*.zarr", level = 0)
      .readObjects(spark).select("image_id").distinct().count()
    assert(both === 2L, "v2 and v3 groups under one root must both discover")
  }

  test("v3 transpose stores decode byte-identically via the stride remap") {
    val raw = new OmeZarrReader(mintStore("raw"), "*.zarr", level = 0)
      .readObjects(spark).orderBy("external_id").collect()
      .map(_.getAs[Array[Byte]](10).toSeq)
    // order [1,0]: chunks stored x-major — composed with a compressor
    // and a crc so the transpose sits in a REAL chain, not alone
    for (codec <- Seq("raw", "gzip", "blosc-lz4")) {
      val root = Files.createTempDirectory("graft_zarr_t")
      for (i <- 0 until 3) {
        OmeZarrReader.writeTestZarrV3(root.resolve(f"img_$i%02d.zarr"),
          width = 40, height = 24, levels = 3, chunkY = 8, chunkX = 16,
          pixel = pix(i), codec = codec, crc32c = codec != "raw",
          transpose = true)
      }
      val got = new OmeZarrReader(root.toString, "*.zarr", level = 0)
        .readObjects(spark).orderBy("external_id").collect()
        .map(_.getAs[Array[Byte]](10).toSeq)
      assert(got === raw, s"v3 transpose + $codec must decode like v2 raw")
    }
    // edge chunks crop identically under the remap (covered above: the
    // 40x24 grid's right/bottom tiles are ragged) — and the identity
    // permutation is accepted as a no-op
    val ident = Files.createTempDirectory("graft_zarr_ti")
    OmeZarrReader.writeTestZarrV3(ident.resolve("a.zarr"), 16, 16, 1, 8, 8,
      pix(0), codec = "raw")
    val aJson = ident.resolve("a.zarr/0/zarr.json")
    val patched = new String(Files.readAllBytes(aJson), "UTF-8").replace(
      """"codecs":[{"name":"bytes"""",
      """"codecs":[{"name":"transpose","configuration":{"order":[0,1]}},{"name":"bytes"""")
    Files.write(aJson, patched.getBytes("UTF-8"))
    val identGot = new OmeZarrReader(ident.toString, "*.zarr", level = 0)
      .readObjects(spark).count()
    assert(identGot === 4L, "identity transpose must read as a no-op")
  }

  test("v3 transpose un-permutes a RANK-3 chunk (leading axis at index 0)") {
    // order [2,0,1] over chunks [2,8,8]: stored shape [8,2,8], stored
    // flat index = x*16 + z*8 + y — exercises the general stride remap
    // beyond the 2-D swap (and the leading-axis-0 plane slice under it)
    val root = Files.createTempDirectory("graft_zarr_t3")
    val g = root.resolve("vol.zarr"); Files.createDirectories(g)
    Files.write(g.resolve("zarr.json"),
      ("""{"zarr_format":3,"node_type":"group","attributes":{"ome":{"version":"0.5",
         |"multiscales":[{"axes":[{"name":"z","type":"space"},{"name":"y","type":"space"},{"name":"x","type":"space"}],
         |"datasets":[{"path":"0","coordinateTransformations":[{"type":"scale","scale":[1,1,1]}]}]}]}}}"""
        ).stripMargin.replace("\n", "").getBytes("UTF-8"))
    val a = g.resolve("0"); Files.createDirectories(a)
    Files.write(a.resolve("zarr.json"),
      ("""{"zarr_format":3,"node_type":"array","shape":[2,16,16],"data_type":"uint8",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2,8,8]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":0,
         |"codecs":[{"name":"transpose","configuration":{"order":[2,0,1]}},{"name":"bytes","configuration":{"endian":"little"}}],
         |"dimension_names":["z","y","x"]}""").stripMargin.replace("\n", "").getBytes("UTF-8"))
    def vox(z: Int, py: Int, px: Int): Int = (11 * z + 3 * px + 5 * py) % 256
    for (gy <- 0 until 2; gx <- 0 until 2) {
      val buf = new Array[Byte](2 * 8 * 8)
      for (z <- 0 until 2; y <- 0 until 8; x <- 0 until 8)
        buf(x * 16 + z * 8 + y) = (vox(z, gy * 8 + y, gx * 8 + x) & 0xFF).toByte
      val target = a.resolve("c").resolve("0").resolve(gy.toString).resolve(gx.toString)
      Files.createDirectories(target.getParent)
      Files.write(target, buf)
    }
    val tiles = new OmeZarrReader(root.toString, "*.zarr", level = 0)
      .readObjects(spark).orderBy("external_id").collect()
    assert(tiles.length === 4, "2x2 (y,x) tiles at z=0")
    for (t <- tiles) {
      val (gy, gx) = (t.getInt(5), t.getInt(4)) // tile_y, tile_x
      val img = Multimodal.decodeImage(t.getAs[Array[Byte]](10)).get
      for (y <- 0 until 8; x <- 0 until 8)
        assert((img.getRGB(x, y) & 0xff) === vox(0, gy * 8 + y, gx * 8 + x),
          s"voxel z=0 (${gy * 8 + y},${gx * 8 + x})")
    }
  }

  test("v3 sharding_indexed stores decode byte-identically, tiling per INNER chunk") {
    val raw = new OmeZarrReader(mintStore("raw"), "*.zarr", level = 0)
      .readObjects(spark).orderBy("external_id").collect()
    val rawPngs = raw.map(_.getAs[Array[Byte]](10).toSeq)
    // shard files of 2x2 inner chunks: a 3x3 inner-tile grid packs into a
    // 2x2 shard grid whose edge shards carry MISSING index entries — the
    // full sharded read must still serve the same 9 tiles per image
    for ((codec, crc) <- Seq(("raw", false), ("gzip", true), ("blosc-lz4", false))) {
      val root = Files.createTempDirectory("graft_zarr3_shard")
      for (i <- 0 until 3) {
        OmeZarrReader.writeTestZarrV3(root.resolve(f"img_$i%02d.zarr"),
          width = 40, height = 24, levels = 3, chunkY = 8, chunkX = 16,
          pixel = pix(i), codec = codec, crc32c = crc,
          shardTiles = Some((2, 2)))
      }
      val reader = new OmeZarrReader(root.toString, "*.zarr", level = 0)
      val got = reader.readObjects(spark).orderBy("external_id").collect()
      assert(got.map(_.getAs[Array[Byte]](10).toSeq).toSeq === rawPngs.toSeq,
        s"sharded v3 ($codec, innerCrc=$crc) must decode like unsharded raw")
      assert(got.map(r => (r.getLong(0), r.getInt(4), r.getInt(5))).toSeq ===
        raw.map(r => (r.getLong(0), r.getInt(4), r.getInt(5))).toSeq,
        "tile ids and grid positions must be the INNER-chunk grid")
      // metadata (JSON-only) agrees with the decoded tile set
      assert(reader.readMetadata(spark).count() === got.length.toLong)
    }
    // a corrupted shard INDEX fails its crc32c loudly
    val root = Files.createTempDirectory("graft_zarr3_shardbad")
    OmeZarrReader.writeTestZarrV3(root.resolve("img.zarr"), 32, 16, 1, 8, 16,
      pix(0), shardTiles = Some((2, 2)))
    val shardFile = root.resolve("img.zarr/0/c/0/0")
    val bytes = Files.readAllBytes(shardFile)
    bytes(bytes.length - 6) = (bytes(bytes.length - 6) ^ 0x3).toByte // inside the index
    Files.write(shardFile, bytes)
    val e = intercept[Exception] {
      new OmeZarrReader(root.toString, "*.zarr").readObjects(spark).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("crc32c"), s"corrupt shard index must name the crc: $messages")
  }

  test("v3 transpose INSIDE a shard's inner chain decodes byte-identically") {
    val raw = new OmeZarrReader(mintStore("raw"), "*.zarr", level = 0)
      .readObjects(spark).orderBy("external_id").collect()
    val rawPngs = raw.map(_.getAs[Array[Byte]](10).toSeq)
    // the seventh dialect: sharding_indexed whose inner chain leads with
    // transpose [1,0] — each inner chunk stores the C-order of its
    // permuted inner shape, un-permuted by the same stride remap the
    // unsharded transpose path uses (per tile = per inner chunk)
    for ((codec, crc) <- Seq(("raw", false), ("gzip", true))) {
      val root = Files.createTempDirectory("graft_zarr3_shard_t")
      for (i <- 0 until 3) {
        OmeZarrReader.writeTestZarrV3(root.resolve(f"img_$i%02d.zarr"),
          width = 40, height = 24, levels = 3, chunkY = 8, chunkX = 16,
          pixel = pix(i), codec = codec, crc32c = crc,
          shardTiles = Some((2, 2)), transpose = true)
      }
      val got = new OmeZarrReader(root.toString, "*.zarr", level = 0)
        .readObjects(spark).orderBy("external_id").collect()
      assert(got.map(_.getAs[Array[Byte]](10).toSeq).toSeq === rawPngs.toSeq,
        s"sharded+inner-transpose v3 ($codec) must decode like unsharded raw")
      assert(got.map(r => (r.getLong(0), r.getInt(4), r.getInt(5))).toSeq ===
        raw.map(r => (r.getLong(0), r.getInt(4), r.getInt(5))).toSeq,
        "tile ids and grid positions must stay the INNER-chunk grid")
    }
    // a transpose in the INDEX chain stays refused, with the named error
    val bad = Files.createTempDirectory("graft_zarr3_shard_tb")
    OmeZarrReader.writeTestZarrV3(bad.resolve("img.zarr"), 32, 16, 1, 8, 16,
      pix(0), shardTiles = Some((2, 2)))
    val zj = bad.resolve("img.zarr/0/zarr.json")
    Files.write(zj, new String(Files.readAllBytes(zj), "UTF-8").replace(
      """"index_codecs":[{"name":"bytes","configuration":{"endian":"little"}}""",
      """"index_codecs":[{"name":"transpose","configuration":{"order":[1,0]}},{"name":"bytes","configuration":{"endian":"little"}}""")
      .getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] {
      new OmeZarrReader(bad.toString, "*.zarr").readObjects(spark).collect()
    }
    assert(err.getMessage.contains("transpose codec unsupported here"),
      s"index-chain transpose must name its position: ${err.getMessage}")
  }

  test("v3 refusals are named: corrupt crc32c, malformed codec chains") {
    val root = Files.createTempDirectory("graft_zarr3_bad")
    val g = root.resolve("img.zarr")
    OmeZarrReader.writeTestZarrV3(g, 16, 16, 1, 8, 8, pix(0), codec = "gzip", crc32c = true)
    // flip one byte inside a chunk: the crc must catch it loudly
    val chunk = g.resolve("0/c/0/0")
    val bytes = Files.readAllBytes(chunk)
    bytes(2) = (bytes(2) ^ 0x7).toByte
    Files.write(chunk, bytes)
    val e = intercept[Exception] {
      new OmeZarrReader(root.toString, "*.zarr").readObjects(spark).collect()
    }
    // Spark wraps task failures: search the cause chain for the named error
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("crc32c"), s"corrupt chunk must name the crc: $messages")
    // chain-shape validation: each malformed chain is refused at
    // discovery with a named error instead of decoding stages in the
    // wrong order (a [bytes, crc32c, gzip] chain would otherwise verify
    // the checksum over the wrong bytes)
    def mintWithChain(name: String, chain: String): String = {
      val d = root.resolve(name)
      OmeZarrReader.writeTestZarrV3(d, 16, 16, 1, 8, 8, pix(0))
      val zj = d.resolve("0/zarr.json")
      Files.write(zj, new String(Files.readAllBytes(zj), "UTF-8")
        .replace("""[{"name":"bytes","configuration":{"endian":"little"}}]""", chain)
        .getBytes("UTF-8"))
      name
    }
    val cases = Seq(
      (mintWithChain("crcmid.zarr",
        """[{"name":"bytes","configuration":{"endian":"little"}},{"name":"crc32c"},{"name":"gzip","configuration":{"level":5}}]"""),
        "follows crc32c"),
      (mintWithChain("twocomp.zarr",
        """[{"name":"bytes","configuration":{"endian":"little"}},{"name":"gzip","configuration":{"level":5}},{"name":"zstd","configuration":{"level":3}}]"""),
        "two compressors"),
      (mintWithChain("nobytes.zarr",
        """[{"name":"gzip","configuration":{"level":5}}]"""),
        "must start with the bytes codec"),
      (mintWithChain("twobytes.zarr",
        """[{"name":"bytes","configuration":{"endian":"little"}},{"name":"bytes","configuration":{"endian":"little"}}]"""),
        "second bytes codec"),
      (mintWithChain("transpose.zarr",
        """[{"name":"bytes","configuration":{"endian":"little"}},{"name":"transpose","configuration":{"order":[1,0]}}]"""),
        "transpose"),
      (mintWithChain("shardtail.zarr",
        """[{"name":"bytes","configuration":{"endian":"little"}},{"name":"sharding_indexed","configuration":{}}]"""),
        "sharding_indexed"),
      (mintWithChain("badorder.zarr",
        """[{"name":"transpose","configuration":{"order":[1,1]}},{"name":"bytes","configuration":{"endian":"little"}}]"""),
        "not a permutation"),
      (mintWithChain("transshard.zarr",
        """[{"name":"transpose","configuration":{"order":[1,0]}},{"name":"sharding_indexed","configuration":{}}]"""),
        "transpose over sharding_indexed"))
    for ((name, expect) <- cases) {
      val err = intercept[IllegalArgumentException] {
        new OmeZarrReader(root.toString, name).readObjects(spark).collect()
      }
      assert(err.getMessage.contains(expect), s"$name: ${err.getMessage}")
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
    // corrupt metadata JSON names the file, not a bare parser trace
    val badJson = root.resolve("badjson.zarr")
    OmeZarrReader.writeTestZarr(badJson, 16, 16, 1, 8, 8, pix(0))
    Files.write(badJson.resolve(".zattrs"), "{not json".getBytes("UTF-8"))
    val e3 = intercept[IllegalArgumentException] {
      new OmeZarrReader(root.toString, "badjson.zarr").readObjects(spark).collect()
    }
    assert(e3.getMessage.contains(".zattrs") && e3.getMessage.contains("JSON"),
      e3.getMessage)
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
