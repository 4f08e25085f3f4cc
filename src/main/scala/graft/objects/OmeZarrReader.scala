package graft.objects

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL OME-Zarr (OME-NGFF) pyramid reader — the storage format the
  * reference's bioimage reader serves through tiledb.bioimg
  * (reference: apis/python/src/tiledb/vector_search/object_readers/
  * bioimage_reader.py — level selection + per-tile crops over a
  * multiscale image; OME-NGFF is its zarr-backed on-disk layout).
  *
  * Zarr needs no native codec for the common cases: metadata is plain
  * JSON and chunks are C-order sample buffers. BOTH on-disk dialects
  * read here: '''v2''' (`.zattrs` multiscales + `.zarray`
  * shape/chunks/dtype/compressor — NGFF ≤0.4) and '''v3''' (`zarr.json`
  * group + array documents with named data_types, regular chunk grids,
  * `c/`-prefixed chunk keys, and codec CHAINS — NGFF 0.5). Supported:
  * uint8 / little-endian uint16 / float32 samples; v2 compressors null,
  * zlib, zstd (zstd-jni), blosc ([[BloscCodec]] — numcodecs' DEFAULT is
  * blosc/lz4/byte-shuffle, the path real-world NGFF stores take); v3
  * codec chains `[bytes(le)]` + optional gzip / zstd / blosc + optional
  * trailing crc32c (verified per chunk, java.util.zip.CRC32C), with the
  * chain SHAPE validated (one bytes codec first, one compressor, crc32c
  * trailing only); v3 `sharding_indexed` (shard files holding inner
  * chunks behind a fixed-size binary index — [[decodeShardPngs]]); both
  * blosc shuffle filters incl. BIT-shuffle ([[BloscCodec.bitShuffle]]);
  * both `.` and `/` separators and both v3 chunk-key encodings; the v3
  * `transpose` array→array codec (a pure stride remap at the plane
  * slice — see [[planeToPng]]), leading either the array's chain or a
  * shard's INNER chain (each inner chunk stores the C-order of its
  * permuted inner shape); ≥2-D arrays whose LAST TWO axes are
  * (y, x) — the NGFF axis convention; leading axes (t, c, z) read at
  * index 0. Only blosc's private blosclz codec (no JVM producer exists
  * to validate a from-scratch decoder against) and a transpose OUTSIDE
  * the sharding codec (permuting the shard grid itself) are refused
  * with named errors — everything else is a real pixel path.
  *
  * Spark shape: ONE `binaryFile` scan under the search root covers every
  * image's chunk files (Spark's hidden-file filter drops the `.z*` JSON
  * sidecars automatically); the tiny per-image array params ride the
  * closure, and each task decodes only its own chunk bytes. The natural
  * tile IS the zarr chunk — no re-tiling shuffle. Tiles surface as
  * grayscale PNGs of the chunk's (y, x) plane, so the downstream
  * embedding/index path is byte-compatible with [[TiffPyramidReader]]'s
  * (same id scheme `image_id · tileStride + tile`, same join columns). */
class OmeZarrReader(
    dir: String,
    glob: String = "*",
    level: Int = 0,
    tileStride: Long = 100000L) extends ObjectReader {
  require(level >= 0, s"graft: OmeZarrReader level must be >= 0, got $level")

  override def readObjects(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val images = OmeZarrReader.discover(spark, dir, glob, level)
    if (images.isEmpty) return emptyTiles(spark, withPayload = true)
    // keys normalized once here — chunkOf runs per scanned file
    val byArray = images.map(i => i.arrayPath.stripPrefix("file:") -> i).toMap
    val stride = tileStride
    images.foreach { i =>
      require(i.tilesX.toLong * i.tilesY < stride,
        s"graft: ${i.groupPath} yields ${i.tilesX * i.tilesY} chunks at " +
          s"level $level >= tileStride $stride — raise tileStride or read " +
          "a higher pyramid level")
    }
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        OmeZarrReader.chunkOf(path, byArray).iterator.flatMap { case (img, gy, gx) =>
          // sharded v3 arrays: the scanned file is a SHARD at grid
          // (gy, gx) holding many inner chunks — each becomes a tile at
          // its own global position; everything else is one chunk = one
          // tile
          val tiles = img.shard match {
            case Some(_) => OmeZarrReader.decodeShardPngs(img, gy, gx, content)
            case None =>
              OmeZarrReader.decodeChunkPng(img, gy, gx, content)
                .map { case (w, h, png) => (gy, gx, w, h, png) }.toSeq
          }
          tiles.map { case (ty, tx, w, h, png) =>
            val t = ty * img.tilesX + tx
            (img.imageId * stride + t, img.imageId, img.groupPath, level,
              tx, ty, img.width, img.height, w, h, png)
          }.iterator
        }
      }
      .toDF("external_id", "image_id", "path", "level", "tile_x", "tile_y",
        "level_width", "level_height", "tile_width", "tile_height", "payload")
  }

  /** Geometry pass: `.zarray` JSON only — the tile grid is fully
    * determined by (shape, chunks), so no chunk bytes are read. */
  override def readMetadata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val images = OmeZarrReader.discover(spark, dir, glob, level)
    if (images.isEmpty) return emptyTiles(spark, withPayload = false)
    val stride = tileStride
    val rows = images.flatMap { i =>
      require(i.tilesX.toLong * i.tilesY < stride,
        s"graft: ${i.groupPath} yields ${i.tilesX * i.tilesY} chunks at " +
          s"level $level >= tileStride $stride")
      for (gy <- 0 until i.tilesY; gx <- 0 until i.tilesX) yield {
        val t = gy * i.tilesX + gx
        (i.imageId * stride + t, i.imageId, i.groupPath, level, gx, gy,
          i.width, i.height,
          math.min(i.chunkX, i.width - gx * i.chunkX),
          math.min(i.chunkY, i.height - gy * i.chunkY))
      }
    }
    spark.createDataset(rows)
      .toDF("external_id", "image_id", "path", "level", "tile_x", "tile_y",
        "level_width", "level_height", "tile_width", "tile_height")
  }

  private def emptyTiles(spark: SparkSession, withPayload: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val base = Seq(
      StructField("external_id", LongType), StructField("image_id", LongType),
      StructField("path", StringType), StructField("level", IntegerType),
      StructField("tile_x", IntegerType), StructField("tile_y", IntegerType),
      StructField("level_width", IntegerType), StructField("level_height", IntegerType),
      StructField("tile_width", IntegerType), StructField("tile_height", IntegerType))
    val fields = if (withPayload) base :+ StructField("payload", BinaryType) else base
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
  }
}

object OmeZarrReader {

  /** v3 `sharding_indexed` parameters: a chunk FILE is a shard holding
    * `shardShape/chunks` inner chunks plus a binary index of
    * (offset, nbytes) uint64-le pairs, row-major over the shard's inner
    * grid (missing chunk = both fields 0xFF…FF), at the shard's start or
    * end, optionally crc32c-protected — a pure layout over the same
    * inner codec chains, no native library involved. */
  private[objects] case class ShardParams(
      shardShape: Seq[Int], // the chunk_grid shape = one shard FILE's extent
      innerCodec: String, // inner chunks' compressor, parseV3Chain domain
      innerCrc: Boolean, // inner chunks carry their own crc32c suffix
      indexCrc: Boolean, // the shard index carries a crc32c suffix
      indexAtEnd: Boolean) // index_location end (default) vs start

  /** Per-image array parameters, resolved once on the driver (the JSON
    * sidecars are a few hundred bytes each) and shipped in the closure.
    * For sharded v3 arrays, `chunks` is the INNER chunk shape (the tile
    * grid the reader serves) and `shard` carries the file-level layout. */
  private[objects] case class ZarrImage(
      imageId: Long,
      groupPath: String,
      arrayPath: String,
      dtype: String, // normalized to the v2 codes: |u1, <u2, <f4
      codec: String, // "raw" | "zlib" | "gzip" | "zstd" | "blosc"
      shape: Seq[Int],
      chunks: Seq[Int],
      crc32c: Boolean = false, // v3 crc32c codec: verify + strip 4-byte suffix
      keyPrefix: Boolean = false, // v3 default chunk-key encoding: "c/0/0"
      shard: Option[ShardParams] = None,
      // v3 `transpose` codec: the stored chunk buffer is the C-order of
      // the PERMUTED chunk shape (stored axis k = original axis order(k))
      transposeOrder: Option[Seq[Int]] = None) {
    def height: Int = shape(shape.length - 2)
    def width: Int = shape(shape.length - 1)
    def chunkY: Int = chunks(chunks.length - 2)
    def chunkX: Int = chunks(chunks.length - 1)
    def tilesY: Int = (height + chunkY - 1) / chunkY
    def tilesX: Int = (width + chunkX - 1) / chunkX
  }

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(spark: SparkSession, p: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val f = fs(spark, path)
    if (!f.exists(path)) None
    else {
      val in = f.open(path)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Find zarr groups under `dir` matching `glob` and resolve `level`'s
    * array parameters. A group = a directory whose metadata declares
    * `multiscales` (the OME-NGFF marker) — v2 stores keep it in
    * `.zattrs` (NGFF ≤0.4), v3 stores in `zarr.json` group attributes
    * (NGFF 0.5 nests it under an `ome` key). Mixed stores discover per
    * group; both metadata dialects resolve to the same [[ZarrImage]]. */
  private[objects] def discover(
      spark: SparkSession, dir: String, glob: String, level: Int): Seq[ZarrImage] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, root)
    if (!f.exists(root)) return Seq.empty
    // globStatus contract: null (not empty) when the PATTERN matches no
    // path on some filesystems — guard both shapes
    val groups = Option(f.globStatus(new org.apache.hadoop.fs.Path(root, glob)))
      .getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getPath).sortBy(_.toString)
    // malformed JSON metadata fails with the FILE named, not a bare
    // Jackson parse error from deep inside the discovery loop
    def parse(path: String, json: String): com.fasterxml.jackson.databind.JsonNode =
      try mapper.readTree(json)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"graft: $path is not valid JSON (${e.getMessage}) — corrupt zarr metadata")
      }
    groups.toSeq.flatMap { g =>
      val v2Attrs = readSmall(spark, s"$g/.zattrs").map(parse(s"$g/.zattrs", _))
      val v3Group = readSmall(spark, s"$g/zarr.json").map(parse(s"$g/zarr.json", _))
        .filter(n => n.path("node_type").asText() == "group")
      val ms = v2Attrs.map(_.path("multiscales"))
        .orElse(v3Group.map { n =>
          // NGFF 0.5 nests under attributes.ome; accept a bare
          // attributes.multiscales too (transitional stores write both)
          val a = n.path("attributes")
          val under = a.path("ome").path("multiscales")
          if (under.isArray) under else a.path("multiscales")
        })
        .filter(m => m.isArray && !m.isEmpty)
      ms.map { m =>
        val datasets = m.get(0).path("datasets")
        require(datasets.isArray && level < datasets.size,
          s"graft: $g has ${datasets.size} multiscale levels, level $level requested")
        val arrayDir = s"$g/${datasets.get(level).path("path").asText()}"
        readSmall(spark, s"$arrayDir/.zarray") match {
          case Some(za) => parseV2Array(parse(s"$arrayDir/.zarray", za), g.toString, arrayDir)
          case None =>
            val zj = readSmall(spark, s"$arrayDir/zarr.json").getOrElse(
              throw new IllegalArgumentException(
                s"graft: $arrayDir has neither .zarray (v2) nor zarr.json (v3)"))
            parseV3Array(parse(s"$arrayDir/zarr.json", zj), g.toString, arrayDir)
        }
      }
    }.zipWithIndex.map { case (img, i) => img.copy(imageId = i.toLong) }
  }

  private def parseV2Array(
      n: com.fasterxml.jackson.databind.JsonNode,
      group: String, arrayDir: String): ZarrImage = {
    require(n.path("zarr_format").asInt() == 2,
      s"graft: $arrayDir zarr_format ${n.path("zarr_format").asInt()} unsupported (2 or 3)")
    require(n.path("order").asText("C") == "C",
      s"graft: $arrayDir order '${n.path("order").asText()}' unsupported (C only)")
    val dtype = n.path("dtype").asText()
    require(Set("|u1", "<u2", "<f4").contains(dtype),
      s"graft: $arrayDir dtype '$dtype' unsupported (|u1, <u2, <f4)")
    val comp = n.path("compressor")
    val codec =
      if (comp.isNull || comp.isMissingNode) "raw"
      else comp.path("id").asText() match {
        case "zlib" => "zlib"
        case "zstd" => "zstd"
        case "blosc" =>
          // the frame self-describes its inner codec, but refusing a
          // blosclz store HERE names the array instead of failing
          // per-chunk inside the scan
          val cname = comp.path("cname").asText("lz4")
          require(BloscCodec.supportedCnames.contains(cname),
            s"graft: $arrayDir blosc cname '$cname' needs a codec this JVM " +
              s"does not ship — re-encode with ${BloscCodec.supportedCnames.mkString("/")}")
          "blosc"
        case other => throw new IllegalArgumentException(
          s"graft: $arrayDir compressor '$other' needs a codec this JVM " +
            "does not ship — re-encode raw, zlib, zstd, or blosc")
      }
    val shape = (0 until n.path("shape").size).map(i => n.path("shape").get(i).asInt())
    val chunks = (0 until n.path("chunks").size).map(i => n.path("chunks").get(i).asInt())
    require(shape.length >= 2 && shape.length == chunks.length,
      s"graft: $arrayDir needs >= 2 dims with matching chunk rank")
    ZarrImage(0L, group, arrayDir, dtype, codec, shape, chunks)
  }

  /** Zarr v3 array metadata (`zarr.json`): same geometry, different
    * spellings — named data_types, a regular chunk_grid, a chunk-key
    * encoding (the default one prefixes keys with `c/`), and a CODEC
    * CHAIN instead of one compressor: exactly one array→bytes codec
    * (`bytes`, little-endian), at most one bytes→bytes compressor
    * (gzip / zstd / blosc — all JVM-decodable here), and optionally a
    * trailing `crc32c` checksum (verified and stripped per chunk) — the
    * shape enforced by [[parseV3Chain]]. A chain led by
    * `sharding_indexed` nests an inner chain per inner chunk plus an
    * index chain; a LEADING `transpose` (array→array) is decoded via a
    * stride remap, but transpose over sharding is refused. */
  private def parseV3Array(
      n: com.fasterxml.jackson.databind.JsonNode,
      group: String, arrayDir: String): ZarrImage = {
    require(n.path("zarr_format").asInt() == 3,
      s"graft: $arrayDir zarr_format ${n.path("zarr_format").asInt()} unsupported (2 or 3)")
    require(n.path("node_type").asText() == "array",
      s"graft: $arrayDir zarr.json node_type '${n.path("node_type").asText()}' is not an array")
    val dtype = n.path("data_type").asText() match {
      case "uint8" => "|u1"
      case "uint16" => "<u2"
      case "float32" => "<f4"
      case other => throw new IllegalArgumentException(
        s"graft: $arrayDir data_type '$other' unsupported (uint8, uint16, float32)")
    }
    val grid = n.path("chunk_grid")
    require(grid.path("name").asText() == "regular",
      s"graft: $arrayDir chunk_grid '${grid.path("name").asText()}' unsupported (regular only)")
    val chunkShape = grid.path("configuration").path("chunk_shape")
    val shape = (0 until n.path("shape").size).map(i => n.path("shape").get(i).asInt())
    val chunks = (0 until chunkShape.size).map(i => chunkShape.get(i).asInt())
    require(shape.length >= 2 && shape.length == chunks.length,
      s"graft: $arrayDir needs >= 2 dims with matching chunk rank")
    val keyEnc = n.path("chunk_key_encoding")
    val keyPrefix = keyEnc.path("name").asText("default") match {
      case "default" => true // keys are c/0/0 (or c.0.0)
      case "v2" => false // keys are 0.0 (or 0/0), like zarr v2
      case other => throw new IllegalArgumentException(
        s"graft: $arrayDir chunk_key_encoding '$other' unsupported (default, v2)")
    }
    val codecs = n.path("codecs")
    require(codecs.isArray && codecs.size >= 1,
      s"graft: $arrayDir zarr.json needs a codecs chain")
    val nodes = (0 until codecs.size).map(codecs.get)
    // v3 `transpose` is an array->array codec, so the spec places it
    // BEFORE the bytes codec: the stored chunk buffer is the C-order of
    // the permuted chunk shape. Decode-side it costs only a stride
    // remap in the (y, x) plane slice — see planeToPng.
    val (transposeOrder, skip) = parseLeadingTranspose(nodes, chunks, arrayDir)
    if (skip == 1)
      require(nodes(1).path("name").asText() != "sharding_indexed",
        s"graft: $arrayDir transpose over sharding_indexed unsupported — " +
          "move the transpose inside the shard's codec chain (supported) " +
          "or re-encode unsharded")
    if (nodes(skip).path("name").asText() == "sharding_indexed") {
      // sharding is itself the (sole) array->bytes codec; its config
      // nests the inner chunks' chain and the index's chain
      require(nodes.size == 1,
        s"graft: $arrayDir codecs after sharding_indexed unsupported — " +
          "wrap per-shard codecs inside the sharding configuration")
      val cfg = nodes.head.path("configuration")
      val innerShape = cfg.path("chunk_shape")
      require(innerShape.isArray && innerShape.size == chunks.length,
        s"graft: $arrayDir sharding chunk_shape rank must match the chunk grid")
      val inner = (0 until innerShape.size).map(i => innerShape.get(i).asInt())
      inner.zip(chunks).zipWithIndex.foreach { case ((ic, sc), d) =>
        require(ic > 0 && sc % ic == 0,
          s"graft: $arrayDir shard dim $d ($sc) is not a multiple of its " +
            s"inner chunk ($ic) — malformed sharding_indexed configuration")
      }
      // the INNER chain may itself lead with a transpose (each inner
      // chunk's buffer is then the C-order of the permuted INNER shape) —
      // the same per-tile stride remap as the unsharded case, because the
      // reader's tile unit IS the inner chunk ([[decodeShardPngs]] feeds
      // each inner chunk through [[planeToPng]] with `chunks` = inner)
      val innerNodesJson = cfg.path("codecs")
      require(innerNodesJson.isArray && innerNodesJson.size >= 1,
        s"graft: $arrayDir sharding_indexed needs an inner codecs chain")
      val innerNodes = (0 until innerNodesJson.size).map(innerNodesJson.get)
      val (innerTranspose, innerSkip) =
        parseLeadingTranspose(innerNodes, inner, arrayDir)
      val (innerCodec, innerCrc) =
        parseV3Chain(innerNodesJson, arrayDir, dtype, innerSkip)
      // the index chain is bytes(le) + optional crc32c — never compressed
      // (the spec fixes its size so readers can locate it blind)
      val (idxCodec, idxCrc) = parseV3Chain(cfg.path("index_codecs"), arrayDir, dtype)
      require(idxCodec == "raw",
        s"graft: $arrayDir compressed shard indexes unsupported — " +
          "index_codecs must be bytes (+ crc32c)")
      val atEnd = cfg.path("index_location").asText("end") match {
        case "end" => true
        case "start" => false
        case other => throw new IllegalArgumentException(
          s"graft: $arrayDir index_location '$other' unsupported (start, end)")
      }
      // chunks = the INNER shape (tile geometry); the outer grid moves
      // into ShardParams (keys index shard files)
      ZarrImage(0L, group, arrayDir, dtype, innerCodec, shape, inner,
        crc32c = false, keyPrefix = keyPrefix,
        shard = Some(ShardParams(chunks, innerCodec, innerCrc, idxCrc, atEnd)),
        transposeOrder = innerTranspose)
    } else {
      val (codec, crc) = parseV3Chain(codecs, arrayDir, dtype, skip)
      ZarrImage(0L, group, arrayDir, dtype, codec, shape, chunks,
        crc32c = crc, keyPrefix = keyPrefix, transposeOrder = transposeOrder)
    }
  }

  /** Parse an optional LEADING `transpose` codec off a chain (the only
    * position the v3 spec allows an array→array codec): validates the
    * order is a full-rank permutation of `chunkShape`'s axes and that a
    * bytes codec follows, returning the order (None for the identity —
    * a no-op remap is skipped entirely) and how many nodes to skip.
    * Shared by the array's outer chain and a shard's inner chain. */
  private def parseLeadingTranspose(
      nodes: Seq[com.fasterxml.jackson.databind.JsonNode],
      chunkShape: Seq[Int], arrayDir: String): (Option[Seq[Int]], Int) =
    if (nodes.head.path("name").asText() == "transpose") {
      val ord = nodes.head.path("configuration").path("order")
      require(ord.isArray && ord.size == chunkShape.length,
        s"graft: $arrayDir transpose order rank ${ord.size} != " +
          s"chunk rank ${chunkShape.length}")
      val o = (0 until ord.size).map(i => ord.get(i).asInt())
      require(o.sorted == chunkShape.indices.toSeq,
        s"graft: $arrayDir transpose order ${o.mkString("[", ",", "]")} " +
          "is not a permutation of the axes")
      require(nodes.size >= 2,
        s"graft: $arrayDir codec chain ends after transpose — needs a bytes codec")
      // identity permutation is a no-op: skip the remap entirely
      (Some(o).filter(_ != chunkShape.indices.toSeq), 1)
    } else (None, 0)

  /** Validate + resolve a v3 codec chain: exactly one `bytes` codec
    * FIRST (little-endian unless samples are single-byte), at most one
    * bytes→bytes compressor (gzip / zstd / blosc) after it, and
    * optionally a `crc32c` in TRAILING position only. Any other shape —
    * duplicate bytes codecs, two compressors, a codec after crc32c —
    * is refused with a named error rather than silently decoding with
    * the wrong stage order (a chain like [bytes, crc32c, gzip] would
    * otherwise verify the checksum over the wrong bytes and report a
    * spurious corruption on a valid store). A transpose reaching this
    * head check sits somewhere transposes are not defined (the index
    * chain, or after the caller already consumed the leading slot) —
    * named rather than falling through to the generic bytes message. */
  private def parseV3Chain(
      codecs: com.fasterxml.jackson.databind.JsonNode,
      arrayDir: String, dtype: String, skip: Int = 0): (String, Boolean) = {
    require(codecs.isArray && codecs.size >= 1 + skip,
      s"graft: $arrayDir v3 codec chain is missing or empty")
    val head = codecs.get(skip)
    require(head.path("name").asText() != "transpose",
      s"graft: $arrayDir transpose codec unsupported here — it may only " +
        "LEAD the array's codec chain or a shard's inner chain")
    require(Set("bytes", "endian").contains(head.path("name").asText()),
      s"graft: $arrayDir v3 codec chain must start with the bytes codec, " +
        s"got '${head.path("name").asText()}'")
    val endian = head.path("configuration").path("endian").asText("little")
    require(endian == "little" || dtype == "|u1",
      s"graft: $arrayDir big-endian samples unsupported — re-encode little-endian")
    var codec = "raw"
    var crc = false
    (skip + 1 until codecs.size).foreach { i =>
      val c = codecs.get(i)
      val name = c.path("name").asText()
      require(!crc,
        s"graft: $arrayDir v3 codec '$name' follows crc32c — crc32c must " +
          "be the trailing codec")
      name match {
        case "bytes" | "endian" => throw new IllegalArgumentException(
          s"graft: $arrayDir v3 codec chain holds a second bytes codec")
        case "gzip" | "zstd" | "blosc" =>
          require(codec == "raw",
            s"graft: $arrayDir v3 codec chain stacks two compressors " +
              s"($codec then $name) — unsupported")
          if (name == "blosc") {
            val cname = c.path("configuration").path("cname").asText("lz4")
            require(BloscCodec.supportedCnames.contains(cname),
              s"graft: $arrayDir blosc cname '$cname' needs a codec this JVM " +
                s"does not ship — re-encode with ${BloscCodec.supportedCnames.mkString("/")}")
          }
          codec = name
        case "crc32c" => crc = true
        case other => throw new IllegalArgumentException(
          s"graft: $arrayDir v3 codec '$other' unsupported " +
            "(bytes, gzip, zstd, blosc, crc32c, sharding_indexed-first; " +
            "transpose only LEADING the array or shard-inner chain)")
      }
    }
    (codec, crc)
  }

  /** Map a scanned file path to its owning image + chunk grid position.
    * Non-chunk files (other levels, stray content) return None. Accepts
    * both `.`-separated chunk names (`0.1.2`) and nested `/` layouts
    * (`0/1/2`). Only chunks whose LEADING indices are all zero become
    * tiles (the t=c=z=0 plane — the same slice the TIFF reader serves). */
  private[objects] def chunkOf(
      path: String, byArray: Map[String, ZarrImage]): Option[(ZarrImage, Int, Int)] = {
    // binaryFile reports scheme-qualified URIs; discover() may have built
    // scheme-less local paths — compare both normalized. The owning array
    // dir is found by walking the file's ANCESTORS against the (tiny)
    // params map — O(path depth) per chunk file, not O(images), so a
    // many-image store scans without a per-file linear probe.
    val norm = path.stripPrefix("file:")
    def walk(d: String, rel: String): Option[(ZarrImage, String)] =
      byArray.get(d) match {
        case Some(img) => Some((img, rel))
        case None =>
          val cut = d.lastIndexOf('/')
          if (cut <= 0) None
          else walk(d.take(cut), d.drop(cut + 1) + "/" + rel)
      }
    val cut0 = norm.lastIndexOf('/')
    (if (cut0 <= 0) None else walk(norm.take(cut0), norm.drop(cut0 + 1)))
      .flatMap { case (img, rel) =>
      val all = rel.replace('/', '.').split('.')
      // v3 default chunk-key encoding prefixes every key with a "c"
      // segment (c/0/0 or c.0.0); v2 (and the v3 "v2" encoding) does not
      val parts =
        if (img.keyPrefix) { if (all.headOption.contains("c")) all.drop(1) else Array.empty[String] }
        else all
      if (parts.length != img.shape.length || parts.exists(p => !p.forall(_.isDigit)))
        None
      else {
        val idx = parts.map(_.toInt)
        if (idx.dropRight(2).exists(_ != 0)) None
        else Some((img, idx(idx.length - 2), idx(idx.length - 1)))
      }
    }
  }

  /** Decode one chunk's (y, x) plane to a grayscale PNG, cropped to the
    * array bounds (zarr pads edge chunks to full chunk shape). Returns
    * None for a chunk wholly outside the array (defensive; zarr does not
    * write those). */
  private[objects] def decodeChunkPng(
      img: ZarrImage, gy: Int, gx: Int, raw: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val body = if (img.crc32c) stripCrc32c(img, gy, gx, raw) else raw
    val bytes = decodeBody(img, gy, gx, body, img.codec)
    planeToPng(img, gy, gx, bytes)
  }

  /** Decode every in-bounds inner chunk of shard file (sy, sx) — the v3
    * `sharding_indexed` path: locate the fixed-size binary index, slice
    * each present inner chunk's byte range, run it through the inner
    * codec chain, and serve one tile per inner chunk at its GLOBAL grid
    * position. Missing inner chunks (index fields all-ones) emit no tile,
    * matching how an absent chunk FILE behaves in an unsharded store. */
  private[objects] def decodeShardPngs(
      img: ZarrImage, sy: Int, sx: Int,
      raw: Array[Byte]): Seq[(Int, Int, Int, Int, Array[Byte])] = {
    val sp = img.shard.get
    val subY = sp.shardShape(sp.shardShape.length - 2) / img.chunkY
    val subX = sp.shardShape.last / img.chunkX
    // the index is row-major over the FULL inner grid (leading dims
    // included); leading-zero inner chunks flatten to iy*subX + ix
    val nInner = sp.shardShape.zip(img.chunks).map { case (s, c) => (s / c).toLong }.product
    val indexSize = nInner * 16 + (if (sp.indexCrc) 4L else 0L)
    require(raw.length >= indexSize,
      s"graft: ${img.arrayPath} shard ($sy,$sx) holds ${raw.length} bytes — " +
        s"shorter than its $indexSize-byte index")
    val idxOff = if (sp.indexAtEnd) raw.length - indexSize.toInt else 0
    if (sp.indexCrc) {
      val stored = java.lang.Integer.toUnsignedLong(ByteBuffer
        .wrap(raw, idxOff + indexSize.toInt - 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt)
      val crc = new java.util.zip.CRC32C()
      crc.update(raw, idxOff, indexSize.toInt - 4)
      require(crc.getValue == stored,
        s"graft: ${img.arrayPath} shard ($sy,$sx) fails its index crc32c — corrupt store")
    }
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[(Int, Int, Int, Int, Array[Byte])]
    for (iy <- 0 until subY; ix <- 0 until subX) {
      val gy = sy * subY + iy
      val gx = sx * subX + ix
      if (gy < img.tilesY && gx < img.tilesX) {
        val e = idxOff + 16 * (iy * subX + ix)
        val offset = bb.getLong(e)
        val nbytes = bb.getLong(e + 8)
        if (offset != -1L || nbytes != -1L) { // all-ones = missing chunk
          require(offset >= 0 && nbytes >= 0 && offset + nbytes <= raw.length,
            s"graft: ${img.arrayPath} shard ($sy,$sx) inner chunk ($iy,$ix) " +
              s"claims [$offset, ${offset + nbytes}) outside the shard file")
          val slice = java.util.Arrays.copyOfRange(
            raw, offset.toInt, (offset + nbytes).toInt)
          val body = if (sp.innerCrc) stripCrc32c(img, gy, gx, slice) else slice
          planeToPng(img, gy, gx, decodeBody(img, gy, gx, body, sp.innerCodec))
            .foreach { case (w, h, png) => out += ((gy, gx, w, h, png)) }
        }
      }
    }
    out.result()
  }

  /** Verify and strip a chunk's trailing 4-byte little-endian crc32c. */
  private def stripCrc32c(
      img: ZarrImage, gy: Int, gx: Int, raw: Array[Byte]): Array[Byte] = {
    require(raw.length >= 4, s"graft: ${img.arrayPath} chunk ($gy,$gx) shorter than its crc32c")
    val stored = java.lang.Integer.toUnsignedLong(
      ByteBuffer.wrap(raw, raw.length - 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt)
    val crc = new java.util.zip.CRC32C()
    crc.update(raw, 0, raw.length - 4)
    require(crc.getValue == stored,
      s"graft: ${img.arrayPath} chunk ($gy,$gx) fails its crc32c — corrupt store")
    java.util.Arrays.copyOf(raw, raw.length - 4)
  }

  private def elemSizeOf(img: ZarrImage): Int = img.dtype match {
    case "|u1" => 1
    case "<u2" => 2
    case "<f4" => 4
  }

  /** Run one chunk's compressed body through `codec` and length-check
    * the plaintext against the chunk's element count. */
  private def decodeBody(
      img: ZarrImage, gy: Int, gx: Int, body: Array[Byte], codec: String): Array[Byte] = {
    val expected = img.chunks.map(_.toLong).product * elemSizeOf(img)
    val bytes = codec match {
      case "raw" => body
      case "zlib" => inflate(body)
      case "gzip" =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body))
        try org.apache.hadoop.io.IOUtils.readFullyToByteArray(
          new java.io.DataInputStream(in))
        finally in.close()
      case "zstd" => com.github.luben.zstd.Zstd.decompress(body, expected.toInt)
      case "blosc" => BloscCodec.decompress(body, expected.toInt)
    }
    require(bytes.length == expected,
      s"graft: ${img.arrayPath} chunk ($gy,$gx) holds ${bytes.length} bytes, " +
        s"expected $expected — corrupt store or codec mismatch")
    bytes
  }

  /** Crop chunk plaintext to the array bounds and encode the (y, x)
    * plane as a grayscale PNG. */
  private def planeToPng(
      img: ZarrImage, gy: Int, gx: Int,
      bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val w = math.min(img.chunkX, img.width - gx * img.chunkX)
    val h = math.min(img.chunkY, img.height - gy * img.chunkY)
    if (w <= 0 || h <= 0) return None
    // C-order with all leading intra-chunk indices 0: the (y, x) plane is
    // the buffer's first chunkY*chunkX elements. With a v3 transpose the
    // buffer is the C-order of the PERMUTED chunk shape; since every
    // leading original index is 0, the plane slice reduces to two stride
    // lookups — the stored strides of the original y and x axes.
    val rank = img.chunks.length
    val order = img.transposeOrder.getOrElse(img.chunks.indices.toSeq)
    val storedShape = order.map(img.chunks(_))
    val storedStrides = storedShape.scanRight(1)(_ * _).tail
    val yStride = storedStrides(order.indexOf(rank - 2))
    val xStride = storedStrides(order.indexOf(rank - 1))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // RGB with r=g=b=v, NOT TYPE_BYTE_GRAY: the gray color model is
    // linear-light, so a consumer's getRGB would gamma-map the stored
    // sample (95 → 164) — RGB keeps sample values exact end-to-end, and
    // matches the TiffPyramidReader payload convention
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h) {
      for (x <- 0 until w) {
        val flat = y * yStride + x * xStride
        val v = img.dtype match {
          case "|u1" => bytes(flat) & 0xFF
          case "<u2" => (bb.getShort(flat * 2) & 0xFFFF) >>> 8
          case "<f4" =>
            val fv = bb.getFloat(flat * 4)
            math.max(0, math.min(255, math.round(fv * 255f)))
        }
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", buf)
    Some((w, h, buf.toByteArray))
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished() || !inf.needsInput(),
        "graft: truncated zlib chunk")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Mint a minimal zarr V3 OME-NGFF 0.5 store for specs: `zarr.json`
    * group + array metadata, codec chains ([bytes] + optional
    * gzip/zstd/blosc + optional crc32c), default or v2 chunk-key
    * encoding, and — with `shardTiles = Some((sy, sx))` — a
    * `sharding_indexed` store whose chunk files each pack sy×sx inner
    * chunks behind an end-located, crc32c-protected binary index (the
    * spec's default index chain). Pixel formula and geometry match
    * [[writeTestZarr]], so v2 and v3 stores decode byte-identically. */
  def writeTestZarrV3(
      groupDir: java.nio.file.Path,
      width: Int,
      height: Int,
      levels: Int,
      chunkY: Int,
      chunkX: Int,
      pixel: (Int, Int) => Int,
      codec: String = "raw", // raw | gzip | zstd | blosc-<cname>[-noshuffle|-bitshuffle]
      crc32c: Boolean = false,
      keyEncoding: String = "default",
      shardTiles: Option[(Int, Int)] = None,
      transpose: Boolean = false): Unit = { // leading transpose codec, order [1,0]
    require(Set("default", "v2").contains(keyEncoding),
      s"graft: v3 keyEncoding '$keyEncoding' must be default or v2")
    // transpose + shardTiles composes: the transpose codec lands in the
    // shard's INNER chain (innerChain below feeds the sharding config)
    val bloscCname = if (codec.startsWith("blosc-"))
      Some(codec.stripPrefix("blosc-")
        .stripSuffix("-noshuffle").stripSuffix("-bitshuffle")) else None
    val bloscBitShuffle = codec.endsWith("-bitshuffle")
    val bloscShuffle = !codec.endsWith("-noshuffle") && !bloscBitShuffle
    java.nio.file.Files.createDirectories(groupDir)
    val datasets = (0 until levels)
      .map(l => s"""{"path":"$l","coordinateTransformations":[{"type":"scale","scale":[${1 << l},${1 << l}]}]}""")
      .mkString("[", ",", "]")
    java.nio.file.Files.write(groupDir.resolve("zarr.json"),
      s"""{"zarr_format":3,"node_type":"group","attributes":{"ome":{"version":"0.5",
         |"multiscales":[{"axes":[{"name":"y","type":"space"},{"name":"x","type":"space"}],
         |"datasets":$datasets}]}}}""".stripMargin.replace("\n", "").getBytes("UTF-8"))
    for (l <- 0 until levels) {
      val w = width >> l; val h = height >> l
      val aDir = groupDir.resolve(l.toString)
      java.nio.file.Files.createDirectories(aDir)
      val compCodec = codec match {
        case "raw" => ""
        case "gzip" => """,{"name":"gzip","configuration":{"level":5}}"""
        case "zstd" => """,{"name":"zstd","configuration":{"level":3,"checksum":false}}"""
        case _ =>
          val shuf = if (bloscBitShuffle) "bitshuffle"
            else if (bloscShuffle) "shuffle" else "noshuffle"
          s""",{"name":"blosc","configuration":{"cname":"${bloscCname.get}","clevel":5,"shuffle":"$shuf","typesize":1,"blocksize":0}}"""
      }
      val crcCodec = if (crc32c) """,{"name":"crc32c"}""" else ""
      val transCodec = if (transpose)
        """{"name":"transpose","configuration":{"order":[1,0]}},""" else ""
      val innerChain =
        s"""[$transCodec{"name":"bytes","configuration":{"endian":"little"}}$compCodec$crcCodec]"""
      val (gridY, gridX, codecsJson) = shardTiles match {
        case None => (chunkY, chunkX, innerChain)
        case Some((sy, sx)) =>
          (chunkY * sy, chunkX * sx,
            s"""[{"name":"sharding_indexed","configuration":{
               |"chunk_shape":[$chunkY,$chunkX],"codecs":$innerChain,
               |"index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},{"name":"crc32c"}],
               |"index_location":"end"}}]""".stripMargin.replace("\n", ""))
      }
      java.nio.file.Files.write(aDir.resolve("zarr.json"),
        s"""{"zarr_format":3,"node_type":"array","shape":[$h,$w],"data_type":"uint8",
           |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$gridY,$gridX]}},
           |"chunk_key_encoding":{"name":"$keyEncoding","configuration":{"separator":"${if (keyEncoding == "default") "/" else "."}"}},
           |"fill_value":0,
           |"codecs":$codecsJson,
           |"dimension_names":["y","x"]}""".stripMargin.replace("\n", "").getBytes("UTF-8"))
      // one INNER chunk's payload through the inner chain (+ inner crc)
      def innerPayload(gy: Int, gx: Int): Array[Byte] = {
        val buf = new Array[Byte](chunkY * chunkX)
        for (y <- 0 until chunkY; x <- 0 until chunkX) {
          val (py, px) = (gy * chunkY + y, gx * chunkX + x)
          // transpose order [1,0]: the stored buffer is x-major
          val flat = if (transpose) x * chunkY + y else y * chunkX + x
          if (py < h && px < w)
            buf(flat) = (pixel(px << l, py << l) & 0xFF).toByte
        }
        val comp = codec match {
          case "raw" => buf
          case "gzip" =>
            val bos = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(bos)
            gz.write(buf); gz.close(); bos.toByteArray
          case "zstd" => com.github.luben.zstd.Zstd.compress(buf, 3)
          case _ =>
            BloscCodec.compress(buf, typesize = 1, cname = bloscCname.get,
              doShuffle = bloscShuffle, blocksizeHint = 64,
              doBitShuffle = bloscBitShuffle)
        }
        if (crc32c) {
          val crc = new java.util.zip.CRC32C()
          crc.update(comp, 0, comp.length)
          val out = ByteBuffer.allocate(comp.length + 4).order(ByteOrder.LITTLE_ENDIAN)
          out.put(comp).putInt(crc.getValue.toInt)
          out.array()
        } else comp
      }
      def writeKey(ky: Int, kx: Int, payload: Array[Byte]): Unit = {
        val target =
          if (keyEncoding == "default") aDir.resolve("c").resolve(ky.toString).resolve(kx.toString)
          else aDir.resolve(s"$ky.$kx")
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.write(target, payload)
      }
      val tilesY = (h + chunkY - 1) / chunkY
      val tilesX = (w + chunkX - 1) / chunkX
      shardTiles match {
        case None =>
          for (gy <- 0 until tilesY; gx <- 0 until tilesX)
            writeKey(gy, gx, innerPayload(gy, gx))
        case Some((sy, sx)) =>
          val shY = (h + gridY - 1) / gridY
          val shX = (w + gridX - 1) / gridX
          for (ky <- 0 until shY; kx <- 0 until shX) {
            val body = new java.io.ByteArrayOutputStream()
            val index = ByteBuffer.allocate(sy * sx * 16 + 4)
              .order(ByteOrder.LITTLE_ENDIAN)
            for (iy <- 0 until sy; ix <- 0 until sx) {
              val (gy, gx) = (ky * sy + iy, kx * sx + ix)
              if (gy < tilesY && gx < tilesX) {
                val p = innerPayload(gy, gx)
                index.putLong(body.size().toLong).putLong(p.length.toLong)
                body.write(p)
              } else index.putLong(-1L).putLong(-1L) // missing inner chunk
            }
            val crc = new java.util.zip.CRC32C()
            crc.update(index.array(), 0, sy * sx * 16)
            index.putInt(crc.getValue.toInt)
            val shardFile = new java.io.ByteArrayOutputStream()
            body.writeTo(shardFile)
            shardFile.write(index.array())
            writeKey(ky, kx, shardFile.toByteArray)
          }
      }
    }
  }

  /** Mint a minimal OME-NGFF store for specs: `levels` grayscale planes
    * (level l downsampled by 2^l from `pixel(x, y)`), chunked
    * `chunkY`×`chunkX`, chunk payloads raw / zlib / zstd / blosc
    * (`blosc-<cname>`, e.g. `blosc-lz4`), `.`-separated chunk names. */
  def writeTestZarr(
      groupDir: java.nio.file.Path,
      width: Int,
      height: Int,
      levels: Int,
      chunkY: Int,
      chunkX: Int,
      pixel: (Int, Int) => Int,
      codec: String = "raw", // raw | zlib | zstd | blosc-<cname>[-noshuffle|-bitshuffle]
      separator: String = "."): Unit = {
    val bloscCname = codec match {
      case s if s.startsWith("blosc-") =>
        Some(s.stripPrefix("blosc-").stripSuffix("-noshuffle").stripSuffix("-bitshuffle"))
      case _ => None
    }
    val bloscBitShuffle = codec.endsWith("-bitshuffle")
    val bloscShuffle = !codec.endsWith("-noshuffle") && !bloscBitShuffle
    java.nio.file.Files.createDirectories(groupDir)
    val datasets = (0 until levels)
      .map(l => s"""{"path":"$l"}""").mkString("[", ",", "]")
    java.nio.file.Files.write(groupDir.resolve(".zgroup"),
      """{"zarr_format":2}""".getBytes("UTF-8"))
    java.nio.file.Files.write(groupDir.resolve(".zattrs"),
      s"""{"multiscales":[{"version":"0.4","axes":[{"name":"y"},{"name":"x"}],"datasets":$datasets}]}"""
        .getBytes("UTF-8"))
    for (l <- 0 until levels) {
      val w = width >> l; val h = height >> l
      val aDir = groupDir.resolve(l.toString)
      java.nio.file.Files.createDirectories(aDir)
      val comp = codec match {
        case "raw" => "null"
        case "zlib" => """{"id":"zlib","level":6}"""
        case "zstd" => """{"id":"zstd","level":3}"""
        case _ =>
          // numcodecs shuffle enum: 0 = none, 1 = byte, 2 = bit
          val shuf = if (bloscBitShuffle) 2 else if (bloscShuffle) 1 else 0
          s"""{"id":"blosc","cname":"${bloscCname.get}","clevel":5,"shuffle":$shuf,"blocksize":0}"""
      }
      java.nio.file.Files.write(aDir.resolve(".zarray"),
        s"""{"zarr_format":2,"shape":[$h,$w],"chunks":[$chunkY,$chunkX],
           |"dtype":"|u1","compressor":$comp,"fill_value":0,"order":"C",
           |"filters":null,"dimension_separator":"$separator"}"""
          .stripMargin.replace("\n", "").getBytes("UTF-8"))
      val tilesY = (h + chunkY - 1) / chunkY
      val tilesX = (w + chunkX - 1) / chunkX
      for (gy <- 0 until tilesY; gx <- 0 until tilesX) {
        val buf = new Array[Byte](chunkY * chunkX)
        for (y <- 0 until chunkY; x <- 0 until chunkX) {
          val (py, px) = (gy * chunkY + y, gx * chunkX + x)
          // level-l pixel = pixel formula at the downsampled coordinate
          if (py < h && px < w)
            buf(y * chunkX + x) = (pixel(px << l, py << l) & 0xFF).toByte
        }
        val payload = codec match {
          case "raw" => buf
          case "zlib" =>
            val d = new java.util.zip.Deflater()
            d.setInput(buf); d.finish()
            val out = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
            d.end(); out.toByteArray
          case "zstd" => com.github.luben.zstd.Zstd.compress(buf, 3)
          case _ =>
            // small blocksize so multi-block frames (bstarts table, split
            // streams) are exercised, not just the single-block case
            BloscCodec.compress(buf, typesize = 1, cname = bloscCname.get,
              doShuffle = bloscShuffle, blocksizeHint = 64,
              doBitShuffle = bloscBitShuffle)
        }
        val name = Seq(gy, gx).mkString(separator)
        val target = aDir.resolve(name)
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.write(target, payload)
      }
    }
  }
}
