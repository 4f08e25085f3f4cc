package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.catalog.SupportsWrite
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => rstream}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for the TexMex/big-ann binary vector formats:
  * `spark.read.format("vecs").load(path)` (format autodetected from the
  * extension, or forced with `.option("format", "FVECS")`), and the SQL
  * surface `CREATE TEMPORARY VIEW v USING vecs OPTIONS (path '...')` —
  * the Spark-native face of the reference's `read_input_vectors` /
  * `read_external_ids` (ingestion.py:400-493).
  *
  * Scale behavior (all planning shared with [[VecsIO]] via `planFor`):
  *   - input partitions = record-aligned byte ranges
  *     (`spark.graft.vecs.maxSplitBytes`, 128 MB default), so one huge
  *     file parallelizes and per-task memory is bounded by split size;
  *   - `row_id` range predicates (=, <, <=, >, >=) prune whole splits at
  *     plan time and trim the surviving splits to exact record ranges —
  *     the reference's range read (`read_input_vectors(start_pos, end_pos)`)
  *     becomes an ordinary pushed filter;
  *   - column pruning is honored: a `row_id`-only projection (e.g.
  *     `count(*)`, id scans) synthesizes ids from split metadata and reads
  *     ZERO payload bytes.
  */
class VecsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "vecs"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("vecs source requires a path"))
    p
  }

  private def formatOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("format")).map(_.toUpperCase)
      .getOrElse(VecsIO.detectSourceType(pathOf(options)))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VecsDataSource.schemaFor(formatOf(options))

  /** Writes carry the frame's own schema (e.g. a bare `vector` column
    * without row_id — ids are positional in the format); reads without a
    * user schema still resolve through `inferSchema`. */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val fmt = formatOf(options)
    val s =
      if (schema == null || schema.isEmpty) VecsDataSource.schemaFor(fmt)
      else {
        // The formats have fixed column meanings AND fixed physical types; a
        // renamed user schema would silently read as nulls, and a re-typed
        // one (e.g. `vector ARRAY<DOUBLE>`) would make Catalyst reinterpret
        // the reader's float-backed arrays as garbage — reject both at plan
        // time.
        val canonical = VecsDataSource.schemaFor(fmt)
        val canonicalByName = canonical.fields.map(f => f.name -> f.dataType).toMap
        schema.fields.foreach { f =>
          val expected = canonicalByName.getOrElse(f.name,
            throw new IllegalArgumentException(
              s"graft: vecs $fmt columns must be among " +
                s"${canonical.fieldNames.mkString("/")}, got ${f.name}"))
          // catalogString comparison: nullability differences are fine (the
          // write path passes the frame's own schema), element/field TYPE
          // differences are not
          require(f.dataType.catalogString == expected.catalogString,
            s"graft: vecs $fmt column ${f.name} is ${expected.catalogString}; " +
              s"user schema declares ${f.dataType.catalogString}")
        }
        schema
      }
    new VecsTable(pathOf(options), fmt, s)
  }
}

object VecsDataSource {
  private[io] def schemaFor(format: String): StructType = format match {
    case "IVECS" =>
      StructType(Seq(
        StructField("row_id", LongType, nullable = false),
        StructField("values", ArrayType(IntegerType, containsNull = false), nullable = false)))
    case "U64BIN" =>
      StructType(Seq(
        StructField("row_id", LongType, nullable = false),
        StructField("external_id", LongType, nullable = false)))
    case "FVECS" | "BVECS" | "F32BIN" | "U8BIN" =>
      StructType(Seq(
        StructField("row_id", LongType, nullable = false),
        StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false)))
    case other =>
      throw new IllegalArgumentException(s"graft: unsupported vecs format $other")
  }
}

private[io] class VecsTable(path: String, format: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"vecs:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VecsScanBuilder(path, format,
      Option(options.get("maxSplitBytes"))
        .map(graft.Conf.parseLong("option maxSplitBytes", _)))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new VecsWriteBuilder(path, format, info)
}

/** `maxSplit`: per-read `.option("maxSplitBytes", ...)` override of the
  * session-level `spark.graft.vecs.maxSplitBytes`. */
private[io] class VecsScanBuilder(path: String, format: String, maxSplit: Option[Long])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = Long.MinValue // inclusive row_id lower bound
  private var hi: Long = Long.MaxValue // inclusive row_id upper bound
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = VecsDataSource.schemaFor(format)

  /** Absorb row_id range predicates into [lo, hi]. All filters are ALSO
    * returned as residual: split pruning/trimming makes the pushed ones
    * exact, but re-evaluation is free and keeps unsupported shapes safe. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val taken = filters.filter {
      case EqualTo("row_id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue); true
      case GreaterThan("row_id", v: Number) => lo = math.max(lo, v.longValue + 1); true
      case GreaterThanOrEqual("row_id", v: Number) => lo = math.max(lo, v.longValue); true
      case LessThan("row_id", v: Number) => hi = math.min(hi, v.longValue - 1); true
      case LessThanOrEqual("row_id", v: Number) => hi = math.min(hi, v.longValue); true
      case _ => false
    }
    pushed = taken
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new VecsScan(path, format, lo, hi, required, maxSplit)
}

private[io] class VecsScan(
    path: String,
    format: String,
    lo: Long,
    hi: Long,
    required: StructType,
    maxSplit: Option[Long] = None) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"vecs $format $path" +
      (if (lo != Long.MinValue || hi != Long.MaxValue) s" row_id in [$lo,$hi]" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val plan = VecsIO.planFor(spark, path, format, maxSplit = maxSplit)
    plan.splits.iterator.flatMap { s =>
      // Trim each split to the pushed row_id range (record-exact).
      val from = math.max(s.baseRowId, lo)
      val until = math.min(s.baseRowId + s.numRecs, if (hi == Long.MaxValue) hi else hi + 1)
      if (until <= from) None
      else Some(VecsInputPartition(
        s.file,
        s.startByte + (from - s.baseRowId) * plan.recBytes,
        until - from,
        from,
        plan.recBytes,
        plan.d,
        format,
        s.hosts.toArray): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VecsReaderFactory(required.fieldNames,
      VecsIO.hadoopConfEntries(SparkSession.active))

  override def toMicroBatchStream(checkpointLocation: String): rstream.MicroBatchStream =
    new VecsMicroBatchStream(path, format, required, maxSplit)
}

/** Streaming micro-batch source over a vecs shard directory:
  * `spark.readStream.format("vecs").load(dir)`. Each micro-batch picks up
  * files beyond the last committed offset; the offset is the count of the
  * lexicographically-sorted listing, so producers must append shards that
  * sort AFTER existing ones — exactly what the DSv2 batch writer's append
  * mode produces (and what part-NNNNN naming gives any producer). Files
  * must appear atomically (write-temp-then-rename, as our writer does).
  * Row ids stay globally consecutive across batches because splits are
  * planned over the full listing and filtered to the batch's file window.
  * Feeds `VectorIndex.streamUpdatesIntoIndex` for continuous ingestion of
  * arriving embedding shards. */
private[io] class VecsMicroBatchStream(
    path: String,
    format: String,
    required: StructType,
    maxSplit: Option[Long] = None)
    extends rstream.MicroBatchStream {

  private def spark = SparkSession.active

  /** One listing per call — same data-file filter and sort as planFor's
    * listing, or the offset's file window and the split plan would
    * disagree. */
  private def sortedListing: Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(s => s.isFile && VecsIO.isDataFile(s.getPath.getName))
        .map(s => (s.getPath.toString, s.getLen)).sortBy(_._1).toSeq
    else Seq((p.toString, fs.getFileStatus(p).getLen))
  }

  override def initialOffset(): rstream.Offset = VecsStreamOffset(0)
  override def latestOffset(): rstream.Offset = {
    val l = sortedListing
    VecsStreamOffset(l.size, l.lastOption.map(_._1).getOrElse(""))
  }
  override def deserializeOffset(json: String): rstream.Offset = {
    val files = "\"files\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: malformed vecs stream offset $json"))
    // "last" absent in offsets written before the listing-digest guard:
    // empty string disables the check for that boundary (upgrade path).
    val last = "\"last\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(json)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse("")
    VecsStreamOffset(files, last)
  }
  override def commit(end: rstream.Offset): Unit = ()
  override def stop(): Unit = ()

  /** The offset contract (append-only, lexicographically increasing names)
    * is the producer's to keep — but verify it anyway: the offset records
    * the LAST FILE NAME at its boundary, and planning fails loudly if the
    * current listing disagrees (a producer that overwrote the directory or
    * inserted an earlier-sorting file would otherwise silently reprocess or
    * permute row ids). */
  private def verifyBoundary(off: VecsStreamOffset, listing: Seq[(String, Long)]): Unit =
    if (off.files > 0 && off.last.nonEmpty) {
      require(listing.size >= off.files,
        s"graft: vecs stream at $path lost files: committed offset covers " +
          s"${off.files} files but the directory now lists ${listing.size}")
      val now = listing(off.files - 1)._1
      require(now == off.last,
        s"graft: vecs stream at $path listing changed under the committed " +
          s"offset: file #${off.files} was ${off.last}, is now $now " +
          "(directory overwritten, or a file was added that sorts before " +
          "existing ones)")
    }

  override def planInputPartitions(
      start: rstream.Offset,
      end: rstream.Offset): Array[InputPartition] = {
    val startOff = start.asInstanceOf[VecsStreamOffset]
    val endOff = end.asInstanceOf[VecsStreamOffset]
    val from = startOff.files
    val until = endOff.files
    if (until <= from) return Array.empty
    // One listing serves both the file window and the split plan (no
    // per-file locality RPCs here; micro-batches are small and fresh).
    // planForListed plans over the FULL listing so base row ids stay
    // globally consecutive, then only the batch window's splits ship.
    val listing = sortedListing
    verifyBoundary(startOff, listing)
    verifyBoundary(endOff, listing)
    val batchFiles = listing.slice(from, until).map(_._1).toSet
    val plan = VecsIO.planForListed(spark, listing, format, maxSplit)
    plan.splits.iterator
      .filter(s => batchFiles.contains(s.file))
      .map(s => VecsInputPartition(s.file, s.startByte, s.numRecs, s.baseRowId,
        plan.recBytes, plan.d, format, s.hosts.toArray): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VecsReaderFactory(required.fieldNames,
      VecsIO.hadoopConfEntries(SparkSession.active))
}

private[io] case class VecsStreamOffset(files: Int, last: String = "")
    extends rstream.Offset {
  override def json(): String = {
    val l = last.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"files":$files,"last":"$l"}"""
  }
}

private[io] case class VecsInputPartition(
    file: String,
    startByte: Long,
    numRecs: Long,
    baseRowId: Long,
    recBytes: Long,
    d: Int,
    format: String,
    hosts: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = hosts
}

/** Carries the field projection and the Hadoop conf entries — serialized
  * ONCE per scan with the task binary, not once per split (a 1 TB file is
  * ~8000 splits; per-partition conf copies would dominate task size). */
private[io] class VecsReaderFactory(
    fieldNames: Array[String],
    confEntries: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VecsPartitionReader(partition.asInstanceOf[VecsInputPartition], fieldNames, confEntries)
}

/** Decodes one record-aligned range. The payload bytes are read only if a
  * payload column is in the projection; a `row_id`-only scan is pure
  * metadata arithmetic. `next()` decodes the upcoming record; `get()` is a
  * stable read of the current one (per the PartitionReader contract it may
  * be called any number of times between `next()` calls). */
private[io] class VecsPartitionReader(
    p: VecsInputPartition,
    fieldNames: Array[String],
    confEntries: Array[(String, String)]) extends PartitionReader[InternalRow] {

  private val needsPayload =
    fieldNames.exists(f => f == "vector" || f == "values" || f == "external_id")
  private var i: Long = 0L
  private var bb: ByteBuffer = _
  private val row = new GenericInternalRow(fieldNames.length)

  private def buffer(): ByteBuffer = {
    if (bb == null) {
      val path = new Path(p.file)
      val econf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => econf.set(k, v) }
      val fs = path.getFileSystem(econf)
      val in = fs.open(path)
      try {
        in.seek(p.startByte)
        val buf = new Array[Byte]((p.numRecs * p.recBytes).toInt)
        in.readFully(buf)
        bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      } finally in.close()
    }
    bb
  }

  override def next(): Boolean = {
    if (i >= p.numRecs) return false
    val rowId = p.baseRowId + i
    var payload: Any = null
    if (needsPayload) {
      // shared per-format codec (VecsIO.decodeRecord) — the function
      // readers and this path must never drift
      payload = VecsIO.decodeRecord(p.format, p.d, buffer()) match {
        case a: Array[Float] => UnsafeArrayData.fromPrimitiveArray(a)
        case a: Array[Int] => UnsafeArrayData.fromPrimitiveArray(a)
        case other => other
      }
    }
    var f = 0
    while (f < fieldNames.length) {
      row.update(f, if (fieldNames(f) == "row_id") rowId else payload)
      f += 1
    }
    i += 1
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit = { bb = null }
}

/** Batch write: `df.write.format("vecs").mode("append"|"overwrite").save(dir)`.
  * FVECS only (the reference's export format, utils.py:90-111). Each task
  * streams its partition into a temp file under `dir/_tmp-<queryId>/`; the
  * driver commit renames the files to `part-<partitionId>.fvecs` (so shard
  * order = partition order and re-read row ids follow the frame's
  * (partition, row) order, same contract as `VecsIO.writeFvecsSharded`) and
  * truncate/abort clean up — task-commit semantics the plain function writer
  * doesn't have. Spark's commit coordinator ensures one committed attempt
  * per partition, so speculative retries can't double-write a shard. */
private[io] class VecsWriteBuilder(path: String, format: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    require(format == "FVECS",
      s"graft: vecs write supports FVECS, not $format (write parquet for tables)")
    new VecsWrite(path, info.schema(), info.queryId(), doTruncate)
  }
}

private[io] class VecsWrite(path: String, schema: StructType, queryId: String, truncate: Boolean)
    extends Write with BatchWrite {

  private val vecIdx: Int = {
    val i = schema.fieldIndex(
      schema.fields.find(f => f.name == "vector" && f.dataType.isInstanceOf[ArrayType])
        .orElse(schema.fields.find(_.dataType.isInstanceOf[ArrayType]))
        .getOrElse(throw new IllegalArgumentException(
          s"graft: vecs write needs an array<float> column, got ${schema.simpleString}"))
        .name)
    require(schema.fields(i).dataType.asInstanceOf[ArrayType].elementType == FloatType,
      s"graft: vecs write needs array<float>, got ${schema.fields(i).dataType.simpleString}")
    i
  }

  private def tmpDir = new Path(path, s"_tmp-$queryId")

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(tmpDir)
    new VecsWriterFactory(tmpDir.toString, vecIdx, VecsIO.hadoopConfEntries(spark))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    // Phase 1 — stage every shard into the destination dir under hidden
    // names (readers skip dot-files). A failure here aborts with the old
    // data fully intact.
    val staged = messages.collect {
      case VecsCommitMessage(pid, Some(tmpName)) =>
        val hidden = new Path(dir, f".staging-$queryId-$pid%09d")
        require(fs.rename(new Path(tmpDir, tmpName), hidden),
          s"graft: vecs commit failed to stage $tmpName")
        (pid, hidden)
    }
    // Phase 2 — the visible switch. PUBLISH-FIRST ordering: new shards are
    // unhidden before any old shard is deleted, so a driver failure at any
    // point leaves the directory with at least one complete copy of the
    // data (worst case for truncate: a brief mixed old+new view that the
    // retried overwrite cleans up) — never empty. Shard numbers offset past
    // the highest existing one, so the lexicographic read order is
    // old-batch-then-new (concatenation semantics for append; for truncate
    // the numbering gap is harmless — row ids derive from the listing
    // order of the surviving files) and nothing collides even when empty
    // partitions left gaps.
    val preExisting =
      Option(fs.listStatus(dir)).getOrElse(Array.empty)
        .filter(s => s.isFile && VecsIO.isDataFile(s.getPath.getName))
        .map(_.getPath)
    val existingNums = preExisting
      .flatMap(p => "part-(\\d+)\\.fvecs".r.findFirstMatchIn(p.getName).map(_.group(1)))
    // Shard numbers are zero-padded to 9 digits so lexicographic file order
    // equals numeric order up to 10^9 shards (the 100 TB posture is ~10^6);
    // mixed widths would silently permute row ids, so refuse them — except
    // under truncate, where the old layout is being superseded anyway.
    require(truncate || existingNums.forall(_.length == 9),
      s"graft: $dir holds shards with non-9-digit numbering " +
        "(older layout?); rewrite with mode(\"overwrite\") before appending")
    val offset = existingNums
      .filter(_.length <= 9)
      .foldLeft(0)((acc, n) => math.max(acc, n.toInt + 1))
    staged.foreach { case (pid, hidden) =>
      val dest = new Path(dir, f"part-${offset + pid}%09d.fvecs")
      require(fs.rename(hidden, dest),
        s"graft: vecs commit failed to publish $dest")
    }
    // superseded old shards go LAST, only after every new shard is visible
    if (truncate) preExisting.foreach(p => fs.delete(p, false))
    fs.delete(tmpDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    // reclaim both the temp dir and any phase-1 staged (hidden) shards a
    // mid-commit failure left in the destination
    Option(fs.globStatus(new Path(dir, s".staging-$queryId-*"))).getOrElse(Array.empty)
      .foreach(s => fs.delete(s.getPath, false))
    fs.delete(tmpDir, true)
  }
}

private[io] case class VecsCommitMessage(partitionId: Int, tmpName: Option[String])
    extends WriterCommitMessage

private[io] class VecsWriterFactory(
    tmpDir: String,
    vecIdx: Int,
    confEntries: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new VecsDataWriter(tmpDir, vecIdx, partitionId, taskId, confEntries)
}

private[io] class VecsDataWriter(
    tmpDir: String,
    vecIdx: Int,
    partitionId: Int,
    taskId: Long,
    confEntries: Array[(String, String)]) extends DataWriter[InternalRow] {

  private val tmpName = f"part-$partitionId%09d-t$taskId"
  private var out: java.io.DataOutputStream = _

  private def stream(): java.io.DataOutputStream = {
    if (out == null) {
      val p = new Path(tmpDir, tmpName)
      val econf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => econf.set(k, v) }
      out = new java.io.DataOutputStream(p.getFileSystem(econf).create(p, true))
    }
    out
  }

  override def write(row: InternalRow): Unit = {
    val v = row.getArray(vecIdx).toFloatArray()
    val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(v.length)
    v.foreach(bb.putFloat)
    stream().write(bb.array())
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    VecsCommitMessage(partitionId, Option.when(out != null)(tmpName))
  }

  override def abort(): Unit = {
    if (out != null) {
      out.close()
      val p = new Path(tmpDir, tmpName)
      val econf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => econf.set(k, v) }
      p.getFileSystem(econf).delete(p, false)
    }
  }

  override def close(): Unit = if (out != null) out.close()
}
