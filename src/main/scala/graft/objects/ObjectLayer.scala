package graft.objects

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Object layer: user-defined partitioned sources and embedding functions
  * (reference: apis/python/src/tiledb/vector_search/object_readers/
  * object_reader.py:8-100 `ObjectReader`/`ObjectPartition` ABCs;
  * embeddings/object_embedding.py:8-60 `ObjectEmbedding` ABC).
  *
  * On the JVM the "ship source code to workers" machinery
  * (object_index.py:884-911) disappears — closures serialize natively — so
  * the traits are plain Scala interfaces.
  */
trait ObjectReader extends Serializable {
  /** Object rows: must include `external_id: Long` plus payload columns. */
  def readObjects(spark: SparkSession): DataFrame

  /** Metadata rows per object: `external_id` + user attributes
    * (reference: object_index.py:1009-1028 metadata array). */
  def readMetadata(spark: SparkSession): DataFrame

  /** Fetch the original objects for result materialization
    * (reference: object_reader.py:93-100 `read_objects_by_external_ids`). */
  def readObjectsByExternalIds(spark: SparkSession, ids: Seq[Long]): DataFrame =
    readObjects(spark).where(col("external_id").isin(ids: _*))
}

/** A reader restricted by a SQL predicate over the inner reader's columns —
  * the Spark-native form of the reference's partition subsetting
  * (object_reader.py `get_partitions`/`object_partitions` let ingestion
  * address a subset of the source; a Catalyst predicate is the declarative
  * equivalent and pushes into the inner scan). Useful for staged builds:
  * create on one slice, [[ObjectIndex.updateIndexFromReader]] with the full
  * reader picks up the rest. The predicate applies to BOTH readObjects and
  * readMetadata, so reference only columns present in both frames (ids and
  * shared metadata attrs — not the content column). */
class FilteredObjectReader(inner: ObjectReader, cond: String) extends ObjectReader {
  override def readObjects(spark: SparkSession): DataFrame =
    inner.readObjects(spark).where(expr(cond))
  override def readMetadata(spark: SparkSession): DataFrame =
    inner.readMetadata(spark).where(expr(cond))
}

/** Embedding function applied per partition with once-per-executor lazy
  * init (reference: object_embedding.py `load()` once per worker; our
  * `init()` is called lazily inside mapPartitions). May emit MULTIPLE
  * embeddings per object (multi-vector models like ColPali —
  * colpali_embedding.py:1-104); `embedding_seq` distinguishes them.
  *
  * Content comes from `contentColumn` of the reader's objects frame; the
  * object index dispatches on its Spark type — StringType → [[embed]]
  * (text models), BinaryType → [[embedBinary]] (image/audio models like the
  * reference's resnet/ColPali/soma embeddings under its embeddings/
  * package). An implementation overrides whichever variant matches its
  * modality. */
trait ObjectEmbedding extends Serializable {
  def dimensions: Int
  def init(): Unit = ()
  /** Column of `readObjects()` holding the embeddable content. */
  def contentColumn: String = "text"
  /** Declare true when the model emits SEVERAL vectors per object
    * (ColPali-style): recorded into the index metadata so the integrity
    * doctor treats external_id multiplicity as the layout, not
    * corruption. */
  def multiVector: Boolean = false
  /** (external_id, text) → embeddings; emit one or more per object. */
  def embed(objects: Iterator[(Long, String)]): Iterator[(Long, Int, Array[Float])] =
    throw new UnsupportedOperationException(
      s"$getClass does not embed text content")
  /** (external_id, payload) → embeddings for binary content. */
  def embedBinary(objects: Iterator[(Long, Array[Byte])]): Iterator[(Long, Int, Array[Float])] =
    throw new UnsupportedOperationException(
      s"$getClass does not embed binary content")
  /** (external_id, vector) → embeddings for numeric-vector content (e.g.
    * expression profiles from [[SparseMatrixTableReader]]). */
  def embedVector(objects: Iterator[(Long, Array[Float])]): Iterator[(Long, Int, Array[Float])] =
    throw new UnsupportedOperationException(
      s"$getClass does not embed vector content")
}

/** Pass-through embedding for sources whose content already IS a numeric
  * vector (the reference's SOMA embeddings run a model over expression
  * profiles, embeddings/soma_*.py; with no model in the container the
  * honest equivalent is identity — the plumbing, batching, and dispatch
  * are the real pipeline). */
class IdentityVectorEmbedding(val dimensions: Int) extends ObjectEmbedding {
  override def contentColumn: String = "payload"
  override def embedVector(objects: Iterator[(Long, Array[Float])])
      : Iterator[(Long, Int, Array[Float])] =
    objects.map { case (id, v) => (id, 0, v) }
}

/** Deterministic hash-based text embedding — the stand-in for model-backed
  * embeddings in this container (the reference itself ships a
  * RandomEmbedding for tests, embeddings/random_embedding.py). Tokens are
  * FNV-hashed into `dimensions` buckets with hash-sign weights, then
  * L2-normalized: deterministic, order-insensitive, similarity-preserving
  * for token overlap. */
class HashTextEmbedding(val dimensions: Int = 64) extends ObjectEmbedding {
  override def embed(objects: Iterator[(Long, String)]): Iterator[(Long, Int, Array[Float])] =
    objects.map { case (id, text) =>
      val v = new Array[Float](dimensions)
      text.trim.split("\\s+").foreach { tok =>
        val h = graft.text.Fnv64Public.hash(tok)
        val bucket = ((h % dimensions) + dimensions) % dimensions
        val sign = if (((h >>> 32) & 1L) == 0L) 1.0f else -1.0f
        v(bucket.toInt) += sign
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (norm > 0) { var i = 0; while (i < dimensions) { v(i) /= norm; i += 1 } }
      (id, 0, v)
    }
}

/** Multi-vector text embedding — the deterministic stand-in for the
  * reference's ColPali model (reference: apis/python/src/tiledb/
  * vector_search/embeddings/colpali_embedding.py:88-104, which emits one
  * vector per image patch / token under a shared external id): the two
  * halves of the text embed independently through [[HashTextEmbedding]],
  * so every object and query carries TWO unit vectors. Pair with
  * [[ObjectIndex.FusionMaxSim]] on an INNER_PRODUCT index for
  * late-interaction retrieval. */
class SplitHalvesEmbedding(dim: Int = 64) extends ObjectEmbedding {
  private val inner = new HashTextEmbedding(dim)
  override def dimensions: Int = dim
  override def multiVector: Boolean = true
  override def embed(objects: Iterator[(Long, String)]): Iterator[(Long, Int, Array[Float])] =
    objects.flatMap { case (id, text) =>
      val half = text.length / 2
      inner.embed(Iterator((id, text.take(half)))).map { case (i, _, v) => (i, 0, v) } ++
        inner.embed(Iterator((id, text.drop(half)))).map { case (i, _, v) => (i, 1, v) }
    }
}

/** Image embedding whose decode slot is [[graft.multimodal.Multimodal.stubDecode]]
  * — the container ships no codecs, so features are deterministic byte-level
  * statistics; a model-backed deployment (reference resnet/ColPali,
  * embeddings/image_resnetv2_embedding.py) replaces `decode` without
  * touching the pipeline. */
class StubImageEmbedding(
    val dimensions: Int = 64,
    decode: (Array[Byte], Int) => Array[Float] =
      graft.multimodal.Multimodal.stubDecode) extends ObjectEmbedding {
  override def contentColumn: String = "payload"
  override def embedBinary(objects: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Int, Array[Float])] =
    objects.map { case (id, payload) => (id, 0, decode(payload, dimensions)) }
}

/** REAL image embedding: payloads are decoded with the JDK's ImageIO
  * ([[graft.multimodal.Multimodal.decodeImage]] — PNG/JPEG, no external
  * codec) and pooled into per-grid-cell channel-mean features
  * ([[graft.multimodal.Multimodal.imageFeature]]), the pooled-activation
  * shape of the reference's model embeddings
  * (embeddings/image_resnetv2_embedding.py:1-104) computed from pixel
  * statistics. Payloads the sniffer rejects (non-image bytes, corrupt
  * files) fall back to the byte-level stub so a mixed directory degrades
  * instead of failing the build. */
class ImageStatsEmbedding(val dimensions: Int = 48) extends ObjectEmbedding {
  override def contentColumn: String = "payload"
  override def embedBinary(objects: Iterator[(Long, Array[Byte])])
      : Iterator[(Long, Int, Array[Float])] =
    objects.map { case (id, payload) =>
      val v = graft.multimodal.Multimodal.decodeImage(payload) match {
        case Some(img) => graft.multimodal.Multimodal.imageFeature(img, dimensions)
        case None      => graft.multimodal.Multimodal.stubDecode(payload, dimensions)
      }
      (id, 0, v)
    }
}

/** Image-directory reader (reference: object_readers/directory_reader.py:507
  * `DirectoryImageReader`): one object per file under `dir`, read through
  * Spark's built-in `binaryFile` source — the scan carries (path, length,
  * modificationTime, content) and prunes on the glob before reading
  * payloads, one task per file group. External ids are synthesized densely
  * in lexicographic path order (read_external_ids arange semantics). */
class DirectoryImageReader(
    dir: String,
    glob: String = "*") extends ObjectReader {

  override def readObjects(spark: SparkSession): DataFrame =
    graft.index.Ingest.withSyntheticIds(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(col("path"), col("length"), col("content").as("payload")),
      "path")
      .select(col("external_id"), col("path"), col("length"), col("payload"))

  override def readMetadata(spark: SparkSession): DataFrame =
    readObjects(spark).select(col("external_id"), col("path"), col("length"))
}

/** Bioimage pyramid reader — the Spark-shaped analogue of the reference's
  * BioImageDirectoryReader (object_readers/bioimage_reader.py: OME-TIFF/
  * zarr pyramids read at a chosen resolution `level`, sliced into per-
  * partition tile batches). One object row per TILE of each image at the
  * requested level; external ids encode (image, tile) so provenance
  * survives; the metadata table carries the pyramid geometry.
  *
  * The container ships no bioimage codecs, so the decode slot is an honest
  * stub: base dimensions derive deterministically from the payload length
  * (a square image of ⌈√len⌉ pixels) and a tile's payload is the
  * corresponding byte slice of the file. Everything AROUND the stub — the
  * binaryFile scan, level-halving geometry, tile-grid fan-out, id scheme,
  * and metadata — is the real pipeline; a codec-backed deployment replaces
  * `decodeDims`/`tileBytes` without touching the plan. */
class BioimageDirectoryReader(
    dir: String,
    glob: String = "*",
    level: Int = 0,
    tileSize: Int = 256,
    tileStride: Long = 100000L) extends ObjectReader {
  require(level >= 0 && tileSize > 0)

  /** Stub decode: deterministic square geometry from byte length. */
  private[objects] def decodeDims(payloadLen: Long): (Int, Int) = {
    val side = math.max(1, math.ceil(math.sqrt(payloadLen.toDouble)).toInt)
    (side, side)
  }

  /** Pyramid level l halves each axis l times (OME pyramid convention). */
  private[objects] def levelDims(w: Int, h: Int, l: Int): (Int, Int) =
    (math.max(1, w >> l), math.max(1, h >> l))

  private def tileBytes(content: Array[Byte], tileIdx: Int, nTiles: Int): Array[Byte] = {
    if (content.isEmpty) return Array.emptyByteArray // zero-byte file: 1 empty tile
    // stub tile payload: the tile's proportional byte slice
    val step = math.max(1, content.length / math.max(1, nTiles))
    val from = math.min(content.length - 1, tileIdx * step)
    java.util.Arrays.copyOfRange(content, from, math.min(content.length, from + step))
  }

  /** Tile grid of one image at `level`: (tilesX, tilesY, w, h). */
  private def grid(payloadLen: Long): (Int, Int, Int, Int) = {
    val (w0, h0) = decodeDims(payloadLen)
    val (w, h) = levelDims(w0, h0, level)
    ((w + tileSize - 1) / tileSize, (h + tileSize - 1) / tileSize, w, h)
  }

  override def readObjects(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val self = this; val l = level; val stride = tileStride
    val files = graft.index.Ingest.withSyntheticIds(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(col("path"), col("content")),
      "path")
      .select(col("external_id").as("image_id"), col("path"), col("content"))
    files.as[(Long, String, Array[Byte])].flatMap { case (imageId, path, content) =>
      val (tilesX, tilesY, w, h) = self.grid(content.length.toLong)
      val n = tilesX * tilesY
      // id scheme is (image, tile)-positional; a collision would silently
      // corrupt provenance, so an over-stride grid fails loudly instead
      require(n < stride,
        s"graft: $path yields $n tiles at level $l >= tileStride $stride — " +
          "raise tileStride or read a higher pyramid level")
      (0 until n).iterator.map { t =>
        val tx = t % tilesX; val ty = t / tilesX
        (imageId * stride + t, imageId, path, l, tx, ty, w, h,
          tileBytes(content, t, n))
      }
    }.toDF("external_id", "image_id", "path", "level", "tile_x", "tile_y",
      "level_width", "level_height", "payload")
  }

  /** Geometry-only pass: derives the tile grid from the file LENGTH column,
    * so the binaryFile scan prunes `content` and no image bytes are read or
    * sliced just to build the metadata table. */
  override def readMetadata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val self = this; val l = level; val stride = tileStride
    val files = graft.index.Ingest.withSyntheticIds(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(col("path"), col("length")),
      "path")
      .select(col("external_id").as("image_id"), col("path"), col("length"))
    files.as[(Long, String, Long)].flatMap { case (imageId, path, len) =>
      val (tilesX, tilesY, w, h) = self.grid(len)
      val n = tilesX * tilesY
      require(n < stride,
        s"graft: $path yields $n tiles at level $l >= tileStride $stride — " +
          "raise tileStride or read a higher pyramid level")
      (0 until n).iterator.map { t =>
        (imageId * stride + t, imageId, path, l, t % tilesX, t / tilesX, w, h)
      }
    }.toDF("external_id", "image_id", "path", "level", "tile_x", "tile_y",
      "level_width", "level_height")
  }
}

/** Generic 1-D table reader (reference: object_readers/
  * tiledb_1d_array_reader.py `TileDB1DArrayReader` — "first dimension is
  * the external_ids", attributes are the payload): any parquet table whose
  * `idCol` identifies objects becomes an object source; `contentCol` (text
  * or binary — the embedding dispatches on its type) is the embeddable
  * payload; a separate `metadataUri` table can override metadata, mirroring
  * the reference's `metadata_uri`. Partitioning rides on the parquet
  * layout — the reference's `partition_tile_size` maps to Spark's file
  * split sizing, not a reader knob. */
class ParquetTableReader(
    uri: String,
    idCol: String = "external_id",
    contentCol: String = "text",
    metadataUri: Option[String] = None) extends ObjectReader {

  override def readObjects(spark: SparkSession): DataFrame = {
    val df = spark.read.parquet(uri)
    // drop a pre-existing external_id column when aliasing a different id
    // column onto that name — two same-named columns would make every
    // downstream col("external_id") ambiguous
    df.select(col(idCol).cast("long").as("external_id") +:
      df.columns.filterNot(c => c == idCol || c == "external_id")
        .map(col).toIndexedSeq: _*)
  }

  override def readMetadata(spark: SparkSession): DataFrame =
    metadataUri match {
      case Some(m) => spark.read.parquet(m)
        .withColumn("external_id", col("external_id").cast("long"))
      case None => readObjects(spark).drop(contentCol)
    }
}

/** Sparse per-object matrix reader — the Spark-shaped analogue of the
  * reference's SomaReader (object_readers/soma_reader.py: a cells × genes
  * X matrix read obs-slice at a time, `cells_per_partition` partitions).
  * Input is a long-format parquet table (obsCol, varCol, valueCol) of
  * non-zero entries; one hash aggregate pivots each object's entries into
  * a dense `array<float>` payload (absent entries 0). Partition-at-a-time
  * execution replaces `cells_per_partition`; an optional `obsFilter`
  * mirrors `obs_value_filter` as a pushed-down predicate. */
class SparseMatrixTableReader(
    uri: String,
    dims: Int,
    obsCol: String = "obs_id",
    varCol: String = "var_idx",
    valueCol: String = "value",
    obsFilter: Option[String] = None) extends ObjectReader {

  override def readObjects(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val raw = spark.read.parquet(uri)
    val filtered = obsFilter.map(raw.where).getOrElse(raw)
    filtered
      .groupBy(col(obsCol).cast("long").as("external_id"))
      .agg(collect_list(col(varCol).cast("int")).as("__i"),
        collect_list(col(valueCol).cast("float")).as("__v"))
      .select(col("external_id"),
        toColumn(graft.functions.ScatterDense(
          toExpression(col("__i")), toExpression(col("__v")), dims)).as("payload"))
  }

  override def readMetadata(spark: SparkSession): DataFrame = {
    val raw = spark.read.parquet(uri)
    val filtered = obsFilter.map(raw.where).getOrElse(raw)
    filtered.groupBy(col(obsCol).cast("long").as("external_id"))
      .agg(count(lit(1)).as("nnz"))
  }
}

/** Text chunker mirroring the reference's DirectoryTextReader defaults
  * (chunk_size=1000, overlap=100 — directory_reader.py:246-643). Chunk ids
  * are `doc_id * chunkStride + chunk_idx` so provenance survives. */
class DocumentsTableReader(
    dir: String,
    chunkSize: Int = 1000,
    overlap: Int = 100,
    chunkStride: Long = 1000L) extends ObjectReader {

  // overlap >= chunkSize would make the chunk step non-positive (long
  // documents silently dropped or a runtime step-0 crash) — fail at
  // construction with the real cause
  require(overlap >= 0 && overlap < chunkSize,
    s"graft: overlap $overlap must be in [0, chunkSize=$chunkSize)")

  override def readObjects(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val step = chunkSize - overlap
    val stride = chunkStride
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val chunks = if (text.length <= chunkSize) Seq(text)
          else (0 until text.length by step).takeWhile(_ < text.length)
            .map(s => text.substring(s, math.min(s + chunkSize, text.length)))
        // chunk index bleeding past the stride would collide with the NEXT
        // document's id space (BioimageDirectoryReader guards the same way)
        require(chunks.length <= stride,
          s"graft: document $docId yields ${chunks.length} chunks >= " +
            s"chunkStride=$stride — raise chunkStride or chunkSize")
        chunks.zipWithIndex.map { case (c, i) =>
          (docId * stride + i, docId, c)
        }
      }
      .toDF("external_id", "doc_id", "text")
  }

  override def readMetadata(spark: SparkSession): DataFrame =
    readObjects(spark).select(col("external_id"), col("doc_id"))
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        Seq("doc_id"))
}

/** REAL bioimage pyramid reader: multi-page TIFF files decoded with the
  * JDK's ImageIO TIFF plugin (part of `javax.imageio` since Java 9 — no
  * external codec). Page `level` of each file is the pyramid level (the
  * OME-TIFF sub-resolution convention the reference's
  * object_readers/bioimage_reader.py reads via tifffile/zarr); each tile
  * is decoded through an ImageIO `sourceRegion` RECT read — only the
  * requested sub-raster decompresses, the JVM analogue of a zarr chunk
  * read — and re-encoded as a lossless PNG payload, so downstream
  * embeddings ([[ImageStatsEmbedding]]) run on real pixels.
  *
  * [[BioimageDirectoryReader]] remains the honest STUB for the formats
  * this container truly cannot decode (proprietary scanner formats;
  * OME-Zarr is REAL as of round 11 — [[OmeZarrReader]]); same id scheme
  * (`image_id · tileStride + tile`), same schema, so the readers are
  * drop-in interchangeable. */
class TiffPyramidReader(
    dir: String,
    glob: String = "*.tif*",
    level: Int = 0,
    tileSize: Int = 256,
    tileStride: Long = 100000L) extends ObjectReader {
  require(level >= 0 && tileSize > 0)

  override def readObjects(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val l = level; val ts = tileSize; val stride = tileStride
    val files = graft.index.Ingest.withSyntheticIds(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(col("path"), col("content")),
      "path")
      .select(col("external_id").as("image_id"), col("path"), col("content"))
    files.as[(Long, String, Array[Byte])].flatMap { case (imageId, path, content) =>
      TiffPyramidReader.withReader(content) { (reader, nPages) =>
        require(l < nPages,
          s"graft: $path has $nPages pyramid pages, level $l requested")
        val w = reader.getWidth(l); val h = reader.getHeight(l)
        val tilesX = (w + ts - 1) / ts; val tilesY = (h + ts - 1) / ts
        val n = tilesX * tilesY
        require(n < stride,
          s"graft: $path yields $n tiles at level $l >= tileStride $stride — " +
            "raise tileStride or read a higher pyramid level")
        (0 until n).map { t =>
          val tx = t % tilesX; val ty = t / tilesX
          val param = reader.getDefaultReadParam
          param.setSourceRegion(new java.awt.Rectangle(tx * ts, ty * ts,
            math.min(ts, w - tx * ts), math.min(ts, h - ty * ts)))
          val tile = reader.read(l, param)
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(tile, "png", buf)
          (imageId * stride + t, imageId, path, l, tx, ty, w, h, buf.toByteArray)
        }
      }.iterator
    }.toDF("external_id", "image_id", "path", "level", "tile_x", "tile_y",
      "level_width", "level_height", "payload")
  }

  /** Geometry pass: page headers only — `getWidth`/`getHeight` parse the
    * TIFF IFD without decompressing any raster strip. */
  override def readMetadata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val l = level; val ts = tileSize; val stride = tileStride
    val files = graft.index.Ingest.withSyntheticIds(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(col("path"), col("content")),
      "path")
      .select(col("external_id").as("image_id"), col("path"), col("content"))
    files.as[(Long, String, Array[Byte])].flatMap { case (imageId, path, content) =>
      TiffPyramidReader.withReader(content) { (reader, nPages) =>
        require(l < nPages,
          s"graft: $path has $nPages pyramid pages, level $l requested")
        val w = reader.getWidth(l); val h = reader.getHeight(l)
        val tilesX = (w + ts - 1) / ts; val tilesY = (h + ts - 1) / ts
        val n = tilesX * tilesY
        require(n < stride,
          s"graft: $path yields $n tiles at level $l >= tileStride $stride")
        (0 until n).map { t =>
          (imageId * stride + t, imageId, path, l, t % tilesX, t / tilesX, w, h)
        }
      }.iterator
    }.toDF("external_id", "image_id", "path", "level", "tile_x", "tile_y",
      "level_width", "level_height")
  }

  /** Image-level OME metadata, one row per FILE: the OME-XML block an
    * OME-TIFF carries in its first ImageDescription tag, parsed into the
    * axis extents / physical pixel sizes / channel names the reference's
    * bioimage reader plans with (bioimage_reader.py reads the same
    * geometry via tifffile). Plain TIFFs (no OME block) row out with
    * `is_ome = false` and the pyramid's own page-0 dimensions, so the
    * frame is total over the directory. IFD/metadata reads only — no
    * raster decompresses. Joins the tile tables on `image_id`. */
  def readOmeMetadata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val files = graft.index.Ingest.withSyntheticIds(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(col("path"), col("content")),
      "path")
      .select(col("external_id").as("image_id"), col("path"), col("content"))
    files.as[(Long, String, Array[Byte])].map { case (imageId, path, content) =>
      TiffPyramidReader.withReader(content) { (reader, _) =>
        val ome = TiffPyramidReader.imageDescription(reader)
          .flatMap(TiffPyramidReader.parseOmeXml)
        ome match {
          case Some(o) =>
            (imageId, path, true, o.sizeX, o.sizeY, o.sizeC, o.sizeZ, o.sizeT,
              o.physicalSizeX.getOrElse(Double.NaN),
              o.physicalSizeY.getOrElse(Double.NaN), o.channels)
          case None =>
            (imageId, path, false, reader.getWidth(0), reader.getHeight(0),
              1, 1, 1, Double.NaN, Double.NaN, Seq.empty[String])
        }
      }
    }.toDF("image_id", "path", "is_ome", "size_x", "size_y", "size_c",
      "size_z", "size_t", "physical_size_x", "physical_size_y", "channels")
  }
}

object TiffPyramidReader {

  /** Run `f` with an ImageIO reader over `content`, disposing afterwards. */
  def withReader[A](content: Array[Byte])(
      f: (javax.imageio.ImageReader, Int) => A): A = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "graft: no ImageIO reader accepts this payload")
      val reader = readers.next()
      try { reader.setInput(iis); f(reader, reader.getNumImages(true)) }
      finally reader.dispose()
    } finally iis.close()
  }

  /** Encode `pages` as one multi-page TIFF with the JDK TIFF writer —
    * the pyramid fixture generator for specs (page l = level l).
    * `imageDescription` lands in the FIRST page's ImageDescription tag
    * (TIFF 270) — where OME-TIFF stores its OME-XML block, so specs can
    * mint real OME-TIFFs. */
  def writePyramidTiff(
      pages: Seq[java.awt.image.BufferedImage],
      imageDescription: Option[String] = None): Array[Byte] = {
    require(pages.nonEmpty, "graft: pyramid needs at least one page")
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    require(writers.hasNext, "graft: JDK TIFF writer missing")
    val writer = writers.next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      pages.zipWithIndex.foreach { case (p, i) =>
        val meta = imageDescription.filter(_ => i == 0).map { desc =>
          val m = writer.getDefaultImageMetadata(
            javax.imageio.ImageTypeSpecifier.createFromRenderedImage(p),
            writer.getDefaultWriteParam)
          val fmt = "javax_imageio_tiff_image_1.0"
          val root = new javax.imageio.metadata.IIOMetadataNode(fmt)
          val ifd = new javax.imageio.metadata.IIOMetadataNode("TIFFIFD")
          val field = new javax.imageio.metadata.IIOMetadataNode("TIFFField")
          field.setAttribute("number", "270")
          field.setAttribute("name", "ImageDescription")
          val asciis = new javax.imageio.metadata.IIOMetadataNode("TIFFAsciis")
          val ascii = new javax.imageio.metadata.IIOMetadataNode("TIFFAscii")
          ascii.setAttribute("value", desc)
          asciis.appendChild(ascii); field.appendChild(asciis)
          ifd.appendChild(field); root.appendChild(ifd)
          m.mergeTree(fmt, root)
          m
        }.orNull
        writer.writeToSequence(new javax.imageio.IIOImage(p, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** The first page's ImageDescription tag (TIFF 270) — an IFD/metadata
    * read, no raster decompression. OME-TIFF keeps its OME-XML here. */
  def imageDescription(reader: javax.imageio.ImageReader): Option[String] = {
    val fmt = "javax_imageio_tiff_image_1.0"
    val meta = reader.getImageMetadata(0)
    if (meta == null || !meta.getMetadataFormatNames.contains(fmt)) return None
    val root = meta.getAsTree(fmt)
    def descendants(n: org.w3c.dom.Node): Iterator[org.w3c.dom.Node] = {
      val kids = n.getChildNodes
      (0 until kids.getLength).iterator.map(kids.item)
        .flatMap(k => Iterator(k) ++ descendants(k))
    }
    descendants(root)
      .find(n => n.getNodeName == "TIFFField" &&
        n.getAttributes != null &&
        Option(n.getAttributes.getNamedItem("number")).exists(_.getNodeValue == "270"))
      .flatMap(f => descendants(f).find(_.getNodeName == "TIFFAscii"))
      .flatMap(a => Option(a.getAttributes.getNamedItem("value")).map(_.getNodeValue))
  }

  /** Parsed OME-XML image geometry (the fields the reference's bioimage
    * reader consumes to plan its reads): pixel extents along all five OME
    * axes, optional physical pixel sizes, and channel names. */
  case class OmeInfo(
      sizeX: Int, sizeY: Int, sizeC: Int, sizeZ: Int, sizeT: Int,
      physicalSizeX: Option[Double], physicalSizeY: Option[Double],
      channels: Seq[String])

  /** Parse an OME-XML block (the ImageDescription payload of an
    * OME-TIFF). Returns None when the text isn't OME-XML. The parser is
    * hardened for untrusted payloads: DTDs are refused outright, so XXE /
    * entity-expansion content cannot execute — a hostile description is
    * just "not OME". */
  def parseOmeXml(xml: String): Option[OmeInfo] = {
    if (xml == null || !xml.contains("OME")) return None
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc =
      try dbf.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
      catch { case _: Exception => return None }
    val rootName = doc.getDocumentElement.getNodeName
    if (rootName != "OME" && !rootName.endsWith(":OME")) return None
    // tag lookup by LOCAL name so prefixed and default-namespace OME both
    // resolve (getElementsByTagName matches qualified names only)
    def byLocal(name: String): Seq[org.w3c.dom.Element] = {
      val all = doc.getElementsByTagName("*")
      (0 until all.getLength).map(all.item(_).asInstanceOf[org.w3c.dom.Element])
        .filter(e => e.getNodeName == name || e.getNodeName.endsWith(s":$name"))
    }
    byLocal("Pixels").headOption.map { px =>
      // toIntOption/toDoubleOption, not toInt/toDouble: attribute VALUES are
      // as untrusted as the XML structure, and SizeX="abc" must degrade to
      // the default like any other non-OME noise, not throw in the executor
      def intAttr(a: String, dflt: Int) =
        px.getAttribute(a).toIntOption.getOrElse(dflt)
      def dblAttr(a: String) = px.getAttribute(a).toDoubleOption
      OmeInfo(
        intAttr("SizeX", 0), intAttr("SizeY", 0), intAttr("SizeC", 1),
        intAttr("SizeZ", 1), intAttr("SizeT", 1),
        dblAttr("PhysicalSizeX"), dblAttr("PhysicalSizeY"),
        byLocal("Channel").map(c =>
          Option(c.getAttribute("Name")).filter(_.nonEmpty).getOrElse("")))
    }
  }
}
