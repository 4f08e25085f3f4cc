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
  * header, to derive record counts and global row offsets); payloads are
  * decoded on executors from RANGE splits — every format here is
  * fixed-record-size once the dimension is known, so each file is chopped
  * into `spark.graft.vecs.maxSplitBytes` (128 MB default) record-aligned
  * ranges and each task seeks + reads only its range, exactly the recipe
  * Parquet scans use (`maxPartitionBytes`). A single 1 TB fvecs file thus
  * becomes ~8000 parallel tasks instead of one 2 GB-capped `binaryFiles`
  * task, and peak per-task memory is the split size, not the file size.
  * Splits carry the file's HDFS block locations as preferred hosts (empty
  * on object stores, where reads are remote either way).
  * Row ids are globally consecutive in lexicographic file order, matching
  * the reference's concatenation semantics (ingestion.py:925-1075).
  */
object VecsIO {

  /** Record-aligned byte-range split of one source file. `hosts` carries
    * the HDFS block locations overlapping the range (empty on object
    * stores, where reads are remote either way). */
  private[io] case class VecSplit(
      file: String,
      startByte: Long,
      numRecs: Long,
      baseRowId: Long,
      hosts: Seq[String] = Nil)

  /** Hadoop Configuration isn't serializable; ship the session's settings
    * as entries so executor-side FileSystem lookups see spark.hadoop.*
    * (fs credentials, defaultFS) instead of bare classpath defaults. */
  private[io] def hadoopConfEntries(spark: SparkSession): Array[(String, String)] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  /** Upper bound on a plausible vector dimension — headers past it are
    * treated as corruption rather than planned into nonsense record sizes. */
  private[io] val MaxDims: Int = 1 << 20

  private[io] def maxSplitBytes(spark: SparkSession, override0: Option[Long] = None): Long =
    math.min(
      override0.getOrElse(
        graft.Conf.long(spark, "spark.graft.vecs.maxSplitBytes", 128L << 20)),
      Int.MaxValue.toLong - 8)

  /** Chop `(file, numRecs)` sources into record-aligned ranges of at most
    * `maxSplit` bytes, assigning globally consecutive base row ids. */
  private def planSplits(
      files: Seq[(String, Long)],
      headerBytes: Long,
      recBytes: Long,
      maxSplit: Long): Seq[VecSplit] = {
    val recsPerSplit = math.max(1L, maxSplit / recBytes)
    val out = Seq.newBuilder[VecSplit]
    var rowBase = 0L
    files.foreach { case (f, n) =>
      var start = 0L
      while (start < n) {
        val cnt = math.min(recsPerSplit, n - start)
        out += VecSplit(f, headerBytes + start * recBytes, cnt, rowBase + start)
        start += cnt
      }
      rowBase += n
    }
    out.result()
  }

  /** Attach preferred hosts to each split from the file's block locations
    * (one `getFileBlockLocations` per file, driver-side; best-effort — an
    * object store typically reports nothing useful and we keep Nil). */
  private def withHosts(spark: SparkSession, splits: Seq[VecSplit], recBytes: Long): Seq[VecSplit] =
    try {
      val hconf = spark.sparkContext.hadoopConfiguration
      val blocksByFile = splits.map(_.file).distinct.map { f =>
        val p = new Path(f)
        val fs = p.getFileSystem(hconf)
        val st = fs.getFileStatus(p)
        f -> fs.getFileBlockLocations(st, 0, st.getLen)
      }.toMap
      splits.map { s =>
        val end = s.startByte + s.numRecs * recBytes
        val hosts = blocksByFile(s.file).iterator
          .filter(b => b.getOffset < end && b.getOffset + b.getLength > s.startByte)
          .flatMap(_.getHosts)
          .toSeq.distinct
        s.copy(hosts = hosts)
      }
    } catch { case _: Exception => splits }

  /** Run the split plan: one task per range scheduled at the range's block
    * hosts when known; seek, read the range, decode records with ids
    * `baseRowId + i`. `decodeRec` sees a ByteBuffer positioned at a record
    * boundary and must consume exactly one record. */
  private def readSplits[T: scala.reflect.ClassTag](
      spark: SparkSession,
      splits: Seq[VecSplit],
      recBytes: Long,
      decodeRec: ByteBuffer => T): org.apache.spark.rdd.RDD[(Long, T)] = {
    val entries = hadoopConfEntries(spark)
    spark.sparkContext
      .makeRDD(splits.map(s => (s, s.hosts)))
      .flatMap { s =>
      val p = new Path(s.file)
      val econf = new org.apache.hadoop.conf.Configuration(false)
      entries.foreach { case (k, v) => econf.set(k, v) }
      val fs = p.getFileSystem(econf)
      val in = fs.open(p)
      try {
        in.seek(s.startByte)
        val buf = new Array[Byte]((s.numRecs * recBytes).toInt)
        in.readFully(buf)
        val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, T)](s.numRecs.toInt)
        var i = 0L
        while (i < s.numRecs) { out += ((s.baseRowId + i, decodeRec(bb))); i += 1 }
        out
      } finally in.close()
    }
  }

  /** Full split plan for one source: dimension, record size, range splits.
    * Shared by the function readers below and the "vecs" DataSource V2. */
  private[io] case class VecsPlan(d: Int, recBytes: Long, splits: Seq[VecSplit])

  /** Decode exactly ONE record's payload from a buffer positioned at a
    * record boundary — the single source of truth for both the function
    * readers and the DSv2 PartitionReader (two independent decoders would
    * inevitably drift). Returns Array[Float] for the float formats,
    * Array[Int] for IVECS, java.lang.Long for U64BIN; the dim-prefixed
    * formats validate their prefix against the planned dimension so a
    * mixed-dim or corrupt file fails loudly instead of desyncing the
    * buffer and decoding garbage. */
  private[io] def decodeRecord(format: String, d: Int, bb: ByteBuffer): AnyRef = {
    def checkDim(dd: Int): Unit =
      require(dd == d, s"graft: record dim $dd != expected $d (mixed-dim or corrupt file)")
    format match {
      case "FVECS" =>
        val dd = bb.getInt
        checkDim(dd)
        val a = new Array[Float](dd); var j = 0
        while (j < dd) { a(j) = bb.getFloat; j += 1 }
        a
      case "BVECS" =>
        val dd = bb.getInt
        checkDim(dd)
        val a = new Array[Float](dd); var j = 0
        while (j < dd) { a(j) = (bb.get() & 0xFF).toFloat; j += 1 }
        a
      case "IVECS" =>
        val dd = bb.getInt
        checkDim(dd)
        val a = new Array[Int](dd); var j = 0
        while (j < dd) { a(j) = bb.getInt; j += 1 }
        a
      case "F32BIN" =>
        val a = new Array[Float](d); var j = 0
        while (j < d) { a(j) = bb.getFloat; j += 1 }
        a
      case "U8BIN" =>
        val a = new Array[Float](d); var j = 0
        while (j < d) { a(j) = (bb.get() & 0xFF).toFloat; j += 1 }
        a
      case "U64BIN" =>
        java.lang.Long.valueOf(bb.getLong)
      case other =>
        throw new IllegalArgumentException(s"graft: no record decoder for $other")
    }
  }

  /** Plan record-aligned splits for a source path in the given format
    * (driver-side metadata only: file listing + first header per file).
    * `locality = false` skips the per-file block-location lookups — the
    * streaming source plans over a growing listing every trigger, where
    * O(files) locality RPCs per trigger would dominate. */
  private[io] def planFor(
      spark: SparkSession,
      path: String,
      format: String,
      locality: Boolean = true,
      maxSplit: Option[Long] = None): VecsPlan = {
    val files = listFiles(spark, path)
    require(files.nonEmpty, s"graft: no files at $path")
    val plan = planForListed(spark, files, format, maxSplit)
    if (locality) plan.copy(splits = withHosts(spark, plan.splits, plan.recBytes)) else plan
  }

  /** As [[planFor]] but over an already-obtained `(path, length)` listing —
    * the streaming source lists once per trigger and plans from that. */
  private[io] def planForListed(
      spark: SparkSession,
      files: Seq[(String, Long)],
      format: String,
      maxSplit: Option[Long] = None): VecsPlan = {
    require(files.nonEmpty, "graft: empty file listing")
    // A corrupt / non-vecs file can present any bytes as the dimension; a
    // huge d makes every file "0 records" and the read SILENTLY empty, a
    // negative one produces nonsense record sizes — fail with the cause.
    def checkDim(d: Int, f: String): Int = {
      require(d > 0 && d <= VecsIO.MaxDims,
        s"graft: $f declares dimension $d (valid: 1..${VecsIO.MaxDims}) — " +
          "corrupt header or not a vecs file?")
      d
    }
    format match {
      case "FVECS" | "BVECS" | "IVECS" =>
        val elemBytes = if (format == "BVECS") 1L else 4L
        val d = checkDim(firstInt(spark, files.head._1), files.head._1)
        val recBytes = 4L + elemBytes * d
        val counted = files.map { case (f, len) =>
          require(len % recBytes == 0,
            s"graft: $f size $len not a multiple of record size $recBytes (d=$d)")
          (f, len / recBytes)
        }
        VecsPlan(d, recBytes, planSplits(counted, 0L, recBytes, maxSplitBytes(spark, maxSplit)))
      case "F32BIN" | "U8BIN" =>
        val headers: Seq[(String, Long, Int)] = files.map { case (f, _) =>
          val p = new Path(f)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val in = fs.open(p)
          try {
            val b = new Array[Byte](8)
            in.readFully(b)
            val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
            // the count is uint32 (big-ann-benchmarks headers): a signed
            // read would go negative past 2^31 records and plan zero splits
            (f, bb.getInt.toLong & 0xFFFFFFFFL, checkDim(bb.getInt, f))
          } finally in.close()
        }
        val d = headers.head._3
        headers.foreach { case (f, _, dd) =>
          require(dd == d, s"graft: $f has dim $dd but ${headers.head._1} has dim $d")
        }
        val recBytes = (if (format == "U8BIN") 1L else 4L) * d
        VecsPlan(d, recBytes,
          planSplits(headers.map { case (f, n, _) => (f, n) }, 8L, recBytes, maxSplitBytes(spark, maxSplit)))
      case "U64BIN" =>
        val counted = files.map { case (f, len) => (f, math.max(0L, (len - 8) / 8)) }
        VecsPlan(1, 8L, planSplits(counted, 8L, 8L, maxSplitBytes(spark, maxSplit)))
      case other =>
        throw new IllegalArgumentException(s"graft: $other is not a splittable vecs format")
    }
  }

  /** (normalized file path, byte length) sorted lexicographically. Hidden
    * and marker files (`_SUCCESS`, `.staging-*`, …) are ignored, same as
    * Spark's file sources — a 0-byte marker would otherwise shift every
    * subsequent file's base row id. */
  private[io] def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  private def listFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val statuses =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Seq(fs.getFileStatus(p))
    statuses.filter(s => s.isFile && isDataFile(s.getPath.getName))
      .map(s => (s.getPath.toString, s.getLen)).sortBy(_._1)
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

  /** Generic float-vector reader over the shared plan + record codec. */
  private def readFloatFormat(spark: SparkSession, path: String, fmt: String): DataFrame = {
    import spark.implicits._
    val plan = planFor(spark, path, fmt)
    readSplits(spark, plan.splits, plan.recBytes,
      bb => decodeRecord(fmt, plan.d, bb).asInstanceOf[Array[Float]].toSeq)
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
        (files.map { case (_, len) => math.max(0L, (len - 8) / 8) }.sum, 1)
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
    readFloatFormat(spark, path, "FVECS")

  /** `.bvecs` (uint8) → (row_id, vector) with unsigned widening `(b & 0xFF)`. */
  def readBvecs(spark: SparkSession, path: String): DataFrame =
    readFloatFormat(spark, path, "BVECS")

  /** `.ivecs` → (row_id: Long, values: Array[Int]) — ground-truth id lists. */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val plan = planFor(spark, path, "IVECS")
    readSplits(spark, plan.splits, plan.recBytes,
      bb => decodeRecord("IVECS", plan.d, bb).asInstanceOf[Array[Int]].toSeq)
      .toDF("row_id", "values")
  }

  /** `.f32bin` (uint32 n, uint32 d header) → (row_id, vector). */
  def readF32bin(spark: SparkSession, path: String): DataFrame =
    readFloatFormat(spark, path, "F32BIN")

  /** `.u8bin` → (row_id, vector) with unsigned widening to float. */
  def readU8bin(spark: SparkSession, path: String): DataFrame =
    readFloatFormat(spark, path, "U8BIN")

  /** U64BIN external ids: 8-byte header then uint64s → (row_id, external_id).
    * uint64 ids keep their bit pattern in signed Longs (SURVEY §7.3). */
  def readU64bin(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val plan = planFor(spark, path, "U64BIN")
    readSplits(spark, plan.splits, plan.recBytes,
      bb => decodeRecord("U64BIN", plan.d, bb).asInstanceOf[java.lang.Long].longValue)
      .toDF("row_id", "external_id")
  }

  // ----- writers (test fixtures / export) -----

  /** Distributed `.fvecs` export: every input partition writes one shard
    * file into `dir` from its executor — no driver collect, so the export
    * scales with the cluster. Shards are named `part-%09d.fvecs`; the
    * directory readers list files lexicographically, so row ids on re-read
    * follow the frame's (partition, row) order — sort the frame first
    * (e.g. `orderBy(id)`, a range-partitioned sort) when the global order
    * matters. */
  def writeFvecsSharded(df: DataFrame, dir: String, vecCol: String = "vector"): Unit =
    // Delegates to the DSv2 writer for its task-commit protocol: the old
    // foreachPartition implementation created final shard files directly
    // from tasks, so a retried or speculative attempt could interleave or
    // truncate a shard mid-write with no detection. The connector stages
    // per-task temp files and the driver commit publishes exactly one
    // attempt per partition (Spark's commit coordinator), with the same
    // part-NNNNNNNNN.fvecs naming and (partition, row) order contract.
    df.select(col(vecCol).cast("array<float>").as("vector"))
      .write.format("vecs").mode("overwrite").save(dir)

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
