package graft.index

import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

import graft.operators.DistanceMetric

/** Index-group metadata, the Spark-side analogue of the reference's TileDB
  * group metadata (reference:
  * apis/python/src/tiledb/vector_search/index.py:900-919 `create_metadata`,
  * ingestion.py:3405-3415 commit path). Stored as `index.json` in the index
  * root directory.
  *
  * `ingestionTimestamps(i)` / `baseSizes(i)` / `partitionHistory(i)` describe
  * the i-th ingestion (base version); time travel picks the latest entry
  * ≤ the read timestamp (reference: index.py:94-177).
  */
case class IndexMeta(
    indexType: String, // FLAT | BINARY | IVF_FLAT | IVF_PQ | VAMANA
    dtype: String, // float32 | uint8 | int8
    dimensions: Int,
    distanceMetric: Int,
    storageVersion: String,
    ingestionTimestamps: List[Long],
    baseSizes: List[Long],
    partitionHistory: List[Int],
    hasUpdates: Boolean,
    numSubspaces: Int = 0,
    // VAMANA build parameters, persisted so consolidation re-ingests with
    // the same graph shape (0 = not a VAMANA index / defaults)
    lBuild: Int = 0,
    rMaxDegree: Int = 0,
    // VAMANA boundary replication: each vector is built into its
    // `shardReplicas` nearest shards (SPANN-style closure assignment), so
    // shard-routed queries keep recall across shard boundaries. 1 = disjoint
    // shards (also the value for non-VAMANA indexes).
    shardReplicas: Int = 1,
    // true when the build ran the cross-shard neighbor exchange
    // (VamanaIndex.exchangeBoundaryEdges): replicated graphs WITHOUT it
    // have the weaker round-5 routed recall, so autoNprobeShards must not
    // apply the post-exchange sweep to a legacy persisted index — the
    // flag is what distinguishes them (absent in old index.json → false).
    boundaryExchanged: Boolean = false,
    // true when the ingested source legitimately carries SEVERAL vectors
    // per external_id (multi-vector object models like ColPali — the
    // reference stacks per-patch embeddings under one id,
    // colpali_embedding.py:88-104). Recorded so IndexDoctor treats id
    // multiplicity as the layout, not corruption; baseSizes stay ROW
    // counts either way. Absent in old index.json → false.
    multiVector: Boolean = false,
    // Calibrated exact-re-rank candidate inflation for lossy-code queries
    // (IVF_PQ's `k_factor`, ivf_pq_index.py:40-45; also Vamana PQ
    // traversal): written by [[KFactorCalibration]] as the measured knee
    // of the recall-vs-pool-size curve at THIS corpus's density — the 10M
    // sweeps showed the right value is density-dependent (PQ needed 32
    // where 1M needed 4), so a fixed constant cannot serve both. 0 =
    // uncalibrated → the type's compiled default; an explicit query-time
    // kFactor always wins. Absent in old index.json → 0.
    pqKFactor: Float = 0f) {

  def metric: DistanceMetric = DistanceMetric.fromId(distanceMetric)

  /** Index of the base version active at `ts` (reference: index.py:139-171
    * `history_index`): latest ingestion with timestamp ≤ ts, or -1 when the
    * read predates the first ingestion (empty-index semantics). */
  def historyIndex(ts: Long): Int = {
    var i = -1
    var j = 0
    while (j < ingestionTimestamps.length) {
      if (ingestionTimestamps(j) <= ts) i = j
      j += 1
    }
    i
  }

  def latestTimestamp: Long =
    if (ingestionTimestamps.isEmpty) 0L else ingestionTimestamps.max
}

object IndexMeta {
  implicit private val formats: Formats = DefaultFormats

  // 0.3 mirrored the reference's storage version; 0.4 adds the BINARY
  // index type's sketch/v=<ts> layout (round 9). Purely informational on
  // read — every committed fixture version stays openable (CompatSpec).
  val StorageVersion = "0.4"
  // (reference: src/include/index/index_defs.h:75, storage_formats.py:48)

  /** index.json IO runs through the Hadoop FileSystem API so index roots on
    * any Spark-readable scheme (hdfs://, s3a://, ...) work, not just local
    * paths. */
  private def hconf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def metaPath(rootDir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(rootDir, "index.json")

  def write(rootDir: String, meta: IndexMeta): Unit = {
    val p = metaPath(rootDir)
    val fs = p.getFileSystem(hconf())
    fs.mkdirs(p.getParent)
    val json = Serialization.writePretty(Map(
      "dataset_type" -> "vector_search",
      "index_type" -> meta.indexType,
      "dtype" -> meta.dtype,
      "dimensions" -> meta.dimensions,
      "distance_metric" -> meta.distanceMetric,
      "storage_version" -> meta.storageVersion,
      "ingestion_timestamps" -> meta.ingestionTimestamps,
      "base_sizes" -> meta.baseSizes,
      "partition_history" -> meta.partitionHistory,
      "has_updates" -> meta.hasUpdates,
      "num_subspaces" -> meta.numSubspaces,
      "l_build" -> meta.lBuild,
      "r_max_degree" -> meta.rMaxDegree,
      "shard_replicas" -> meta.shardReplicas,
      "boundary_exchanged" -> meta.boundaryExchanged,
      "multi_vector" -> meta.multiVector,
      "pq_k_factor" -> meta.pqKFactor))
    val out = fs.create(p, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  val SupportedVersions = Set("0.1", "0.2", "0.3", "0.4")

  def read(rootDir: String): IndexMeta = {
    val p = metaPath(rootDir)
    val fs = p.getFileSystem(hconf())
    val in = fs.open(p)
    val raw =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
    val j = JsonMethods.parse(raw)
    val sv = (j \ "storage_version").extract[String]
    require(SupportedVersions.contains(sv),
      s"graft: unsupported storage_version $sv (supported: $SupportedVersions)")
    IndexMeta(
      indexType = (j \ "index_type").extract[String],
      dtype = (j \ "dtype").extract[String],
      dimensions = (j \ "dimensions").extract[Int],
      distanceMetric = (j \ "distance_metric").extract[Int],
      storageVersion = (j \ "storage_version").extract[String],
      ingestionTimestamps = (j \ "ingestion_timestamps").extract[List[Long]],
      baseSizes = (j \ "base_sizes").extract[List[Long]],
      partitionHistory = (j \ "partition_history").extract[List[Int]],
      hasUpdates = (j \ "has_updates").extract[Boolean],
      numSubspaces = (j \ "num_subspaces").extractOrElse[Int](0),
      lBuild = (j \ "l_build").extractOrElse[Int](0),
      rMaxDegree = (j \ "r_max_degree").extractOrElse[Int](0),
      shardReplicas = (j \ "shard_replicas").extractOrElse[Int](1),
      boundaryExchanged = (j \ "boundary_exchanged").extractOrElse[Boolean](false),
      multiVector = (j \ "multi_vector").extractOrElse[Boolean](false),
      pqKFactor = (j \ "pq_k_factor").extractOrElse[Double](0.0).toFloat)
  }

  def exists(rootDir: String): Boolean = {
    val p = metaPath(rootDir)
    p.getFileSystem(hconf()).exists(p)
  }
}
