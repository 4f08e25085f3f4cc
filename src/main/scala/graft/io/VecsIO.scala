package graft.io

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers/writers for the classic TexMex binary vector formats
  * (reference: apis/python/src/tiledb/vector_search/utils.py:53-111
  * `load_fvecs/ivecs/bvecs`, `write_fvecs/ivecs`; big-ann `.u8bin/.f32bin`
  * headers ingestion.py:451-462; U64BIN ids ingestion.py:864-877).
  *
  * Layouts (little-endian):
  *   - `.fvecs` per record: int32 d, then d float32
  *   - `.ivecs` per record: int32 d, then d int32
  *   - `.bvecs` per record: int32 d, then d uint8
  *   - `.f32bin`/`.u8bin`: header uint32 n, uint32 d, then n x d row-major
  *   - `.u64bin` ids: 8-byte header (n), then n uint64
  *
  * Scale posture: the driver touches only per-file METADATA (size + first
  * header, to derive record counts and global row offsets); payload decoding
  * runs on executors via `binaryFiles`, one task per file — the natural
  * parallelism unit since 100 TB datasets arrive sharded into many files.
  * Row ids are globally consecutive in lexicographic file order, matching
  * the reference's concatenation semantics (ingestion.py:925-1075).
  */
object VecsIO {

  /** (normalized file path, byte length) sorted lexicographically. */
  private def listFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val statuses =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Seq(fs.getFileStatus(p))
    statuses.filter(_.isFile).map(s => (s.getPath.toString, s.getLen)).sortBy(_._1)
  }

  /** Read the first little-endian int32 of a file (the record dimension). */
  private def firstInt(spark: SparkSession, file: String): Int = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](4)
      in.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  /** Generic record-per-record reader: derive per-file counts from sizes,
    * then decode on executors with globally consecutive row ids. */
  private def readRecordFormat(
      spark: SparkSession,
      path: String,
      elemBytes: Int,
      toFloats: (ByteBuffer, Int) => Seq[Float]): DataFrame = {
    import spark.implicits._
    val files = listFiles(spark, path)
    require(files.nonEmpty, s"graft: no files at $path")
    val d = firstInt(spark, files.head._1)
    val recBytes = 4L + elemBytes.toLong * d
    val offsets: Map[String, Long] = {
      var acc = 0L
      files.map { case (f, len) =>
        require(len % recBytes == 0,
          s"graft: $f size $len not a multiple of record size $recBytes (d=$d)")
        val e = (f, acc); acc += len / recBytes; e
      }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val base = bcOffsets.value(new Path(file).toString)
        val bb = ByteBuffer.wrap(pds.toArray()).order(ByteOrder.LITTLE_ENDIAN)
        Iterator.continually {
          if (bb.remaining() >= 4) {
            val dd = bb.getInt
            Some(toFloats(bb, dd))
          } else None
        }.takeWhile(_.isDefined).map(_.get).zipWithIndex
          .map { case (v, i) => (base + i, v) }
      }
      .toDF("row_id", "vector")
      .select(col("row_id"), col("vector").cast("array<float>").as("vector"))
  }

  /** Autodetect a source format from its URI extension (works for a single
    * file or a directory of same-format shards, e.g. `out.fvecs/part-*`)
    * — reference: ingestion.py:400-421 source-type dispatch. Anything
    * without a recognized binary extension is treated as parquet. */
  def detectSourceType(uri: String): String = {
    val l = uri.stripSuffix("/").toLowerCase
    if (l.endsWith(".fvecs")) "FVECS"
    else if (l.endsWith(".bvecs")) "BVECS"
    else if (l.endsWith(".ivecs")) "IVECS"
    else if (l.endsWith(".f32bin")) "F32BIN"
    else if (l.endsWith(".u8bin")) "U8BIN"
    else if (l.endsWith(".u64bin")) "U64BIN"
    else "PARQUET"
  }

  /** (size, dimensions) of a vector source from per-file METADATA only
    * (file lengths + first header — no payload scan), the Spark analogue of
    * the reference's `read_source_metadata` (ingestion.py:423-493). Parquet
    * falls back to a count + one-row peek (footer-driven, still cheap). */
  def sourceMetadata(spark: SparkSession, uri: String): (Long, Int) =
    detectSourceType(uri) match {
      case "FVECS" => recordFormatMeta(spark, uri, 4)
      case "BVECS" => recordFormatMeta(spark, uri, 1)
      case "IVECS" => recordFormatMeta(spark, uri, 4)
      case "F32BIN" | "U8BIN" =>
        val files = listFiles(spark, uri)
        val counts = files.map { case (f, _) => firstInt(spark, f).toLong }
        val d = headerDim(spark, files.head._1)
        (counts.sum, d)
      case "U64BIN" =>
        val files = listFiles(spark, uri)
        (files.map { case (_, len) => (len - 8) / 8 }.sum, 1)
      case "PARQUET" =>
        val df = readParquetSource(spark, uri)
        val d = df.select(size(col("vector"))).head().getInt(0)
        (df.count(), d)
    }

  private def recordFormatMeta(spark: SparkSession, path: String, elemBytes: Int): (Long, Int) = {
    val files = listFiles(spark, path)
    require(files.nonEmpty, s"graft: no files at $path")
    val d = firstInt(spark, files.head._1)
    val recBytes = 4L + elemBytes.toLong * d
    (files.map(_._2 / recBytes).sum, d)
  }

  private def headerDim(spark: SparkSession, file: String): Int = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](8); in.readFully(b)
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      bb.getInt; bb.getInt
    } finally in.close()
  }

  /** Parquet vector source normalized to (row_id, vector): accepts any of
    * row_id/external_id/vec_id for the id and vector/embedding for the
    * payload (covers both graft-written bases and raw embedding tables). */
  private def readParquetSource(spark: SparkSession, uri: String): DataFrame = {
    val df = spark.read.parquet(uri)
    val idCol = Seq("row_id", "external_id", "vec_id").find(df.columns.contains)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: parquet source $uri has no row_id/external_id/vec_id column"))
    val vecCol = Seq("vector", "embedding").find(df.columns.contains)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: parquet source $uri has no vector/embedding column"))
    df.select(col(idCol).cast("long").as("row_id"),
      col(vecCol).cast("array<float>").as("vector"))
  }

  /** Read any supported vector source by URI → (row_id, vector)
    * (reference: ingestion.py:400-421 + the per-format readers). */
  def readSource(spark: SparkSession, uri: String): DataFrame =
    detectSourceType(uri) match {
      case "FVECS" => readFvecs(spark, uri)
      case "BVECS" => readBvecs(spark, uri)
      case "F32BIN" => readF32bin(spark, uri)
      case "U8BIN" => readU8bin(spark, uri)
      case "PARQUET" => readParquetSource(spark, uri)
      case other => throw new IllegalArgumentException(
        s"graft: $other is not a vector source (ids/ground-truth format)")
    }

  /** `.fvecs` → (row_id: Long, vector: Array[Float]). */
  def readFvecs(spark: SparkSession, path: String): DataFrame =
    readRecordFormat(spark, path, 4, (bb, d) => {
      val a = new Array[Float](d); var i = 0
      while (i < d) { a(i) = bb.getFloat; i += 1 }
      a.toSeq
    })

  /** `.bvecs` (uint8) → (row_id, vector) with unsigned widening `(b & 0xFF)`. */
  def readBvecs(spark: SparkSession, path: String): DataFrame =
    readRecordFormat(spark, path, 1, (bb, d) => {
      val a = new Array[Float](d); var i = 0
      while (i < d) { a(i) = (bb.get() & 0xFF).toFloat; i += 1 }
      a.toSeq
    })

  /** `.ivecs` → (row_id: Long, values: Array[Int]) — ground-truth id lists. */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = listFiles(spark, path)
    require(files.nonEmpty, s"graft: no files at $path")
    val d = firstInt(spark, files.head._1)
    val recBytes = 4L + 4L * d
    val offsets: Map[String, Long] = {
      var acc = 0L
      files.map { case (f, len) =>
        val e = (f, acc); acc += len / recBytes; e
      }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val base = bcOffsets.value(new Path(file).toString)
        val bb = ByteBuffer.wrap(pds.toArray()).order(ByteOrder.LITTLE_ENDIAN)
        Iterator.continually {
          if (bb.remaining() >= 4) {
            val dd = bb.getInt
            val a = new Array[Int](dd); var i = 0
            while (i < dd) { a(i) = bb.getInt; i += 1 }
            Some(a.toSeq)
          } else None
        }.takeWhile(_.isDefined).map(_.get).zipWithIndex
          .map { case (v, i) => (base + i, v) }
      }
      .toDF("row_id", "values")
  }

  /** Header-based formats: decode each file on an executor with row offsets
    * derived from the uint32 headers read driver-side (8 bytes per file). */
  private def readBinWithHeader(
      spark: SparkSession,
      path: String,
      u8: Boolean): DataFrame = {
    import spark.implicits._
    val files = listFiles(spark, path)
    require(files.nonEmpty, s"graft: no files at $path")
    val counts: Seq[(String, Long)] = files.map { case (f, _) =>
      val p = new Path(f)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try {
        val b = new Array[Byte](8)
        in.readFully(b)
        val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        (f, bb.getInt.toLong)
      } finally in.close()
    }
    val offsets: Map[String, Long] = {
      var acc = 0L
      counts.map { case (f, n) => val e = (f, acc); acc += n; e }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val base = bcOffsets.value(new Path(file).toString)
        val bb = ByteBuffer.wrap(pds.toArray()).order(ByteOrder.LITTLE_ENDIAN)
        val n = bb.getInt; val d = bb.getInt
        (0 until n).iterator.map { i =>
          val a = new Array[Float](d); var j = 0
          if (u8) { while (j < d) { a(j) = (bb.get() & 0xFF).toFloat; j += 1 } }
          else { while (j < d) { a(j) = bb.getFloat; j += 1 } }
          (base + i, a.toSeq)
        }
      }
      .toDF("row_id", "vector")
      .select(col("row_id"), col("vector").cast("array<float>").as("vector"))
  }

  /** `.f32bin` (uint32 n, uint32 d header) → (row_id, vector). */
  def readF32bin(spark: SparkSession, path: String): DataFrame =
    readBinWithHeader(spark, path, u8 = false)

  /** `.u8bin` → (row_id, vector) with unsigned widening to float. */
  def readU8bin(spark: SparkSession, path: String): DataFrame =
    readBinWithHeader(spark, path, u8 = true)

  /** U64BIN external ids: 8-byte header then uint64s → (row_id, external_id).
    * uint64 ids keep their bit pattern in signed Longs (SURVEY §7.3). */
  def readU64bin(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = listFiles(spark, path)
    val offsets: Map[String, Long] = {
      var acc = 0L
      files.map { case (f, len) => val e = (f, acc); acc += (len - 8) / 8; e }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val base = bcOffsets.value(new Path(file).toString)
        val bb = ByteBuffer.wrap(pds.toArray()).order(ByteOrder.LITTLE_ENDIAN)
        bb.getLong // header
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var i = 0L
        while (bb.remaining() >= 8) { out += ((base + i, bb.getLong)); i += 1 }
        out
      }
      .toDF("row_id", "external_id")
  }

  // ----- writers (test fixtures / export) -----

  /** Distributed `.fvecs` export: every input partition writes one shard
    * file into `dir` from its executor — no driver collect, so the export
    * scales with the cluster. Shards are named `part-%05d.fvecs`; the
    * directory readers list files lexicographically, so row ids on re-read
    * follow the frame's (partition, row) order — sort the frame first
    * (e.g. `orderBy(id)`, a range-partitioned sort) when the global order
    * matters. */
  def writeFvecsSharded(df: DataFrame, dir: String, vecCol: String = "vector"): Unit = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    fs.mkdirs(dirPath)
    // Hadoop Configuration isn't serializable; ship the session's settings
    // as entries so executors see spark.hadoop.* (fs credentials, defaultFS)
    // instead of bare classpath defaults.
    val confEntries: Array[(String, String)] = {
      val it = hconf.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    df.select(col(vecCol).cast("array<float>")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val file = new Path(dir, f"part-$pid%05d.fvecs")
          val econf = new org.apache.hadoop.conf.Configuration(false)
          confEntries.foreach { case (k, v) => econf.set(k, v) }
          val efs = file.getFileSystem(econf)
          val out = new DataOutputStream(efs.create(file, true))
          try it.foreach { r =>
            val v = r.getSeq[Float](0)
            val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(v.length)
            v.foreach(bb.putFloat)
            out.write(bb.array())
          } finally out.close()
        }
    }
  }

  def writeFvecs(path: String, vectors: Iterator[Array[Float]]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try vectors.foreach { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putFloat)
      out.write(bb.array())
    } finally out.close()
  }

  def writeIvecs(path: String, records: Iterator[Array[Int]]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try records.foreach { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putInt)
      out.write(bb.array())
    } finally out.close()
  }

  def writeBvecs(path: String, records: Iterator[Array[Int]]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try records.foreach { v =>
      val bb = ByteBuffer.allocate(4 + v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(x => bb.put((x & 0xFF).toByte))
      out.write(bb.array())
    } finally out.close()
  }

  def writeU64bin(path: String, ids: Seq[Long]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val bb = ByteBuffer.allocate(8 + 8 * ids.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(ids.length.toLong)
      ids.foreach(bb.putLong)
      out.write(bb.array())
    } finally out.close()
  }

  def writeF32bin(path: String, n: Int, d: Int, vectors: Iterator[Array[Float]]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      head.putInt(n); head.putInt(d)
      out.write(head.array())
      vectors.foreach { v =>
        val bb = ByteBuffer.allocate(4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }
}
