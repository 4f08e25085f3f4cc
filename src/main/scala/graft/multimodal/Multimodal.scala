package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * payloads with typed metadata, processed in batch via mapPartitions
  * (the JVM analogue of the reference's per-partition object pipelines —
  * object_readers/bioimage_reader.py, directory_reader.py
  * DirectoryImageReader — and of `mapInPandas` batch UDFs in PySpark).
  *
  * The DECODE step is a clearly-marked deterministic STUB: the container
  * has no image/audio codecs, so `stubDecode` derives per-record features
  * from the payload bytes alone. Everything around it — schema, batching,
  * partitioning, null/short-payload handling, the feature column contract —
  * is the real pipeline a codec would drop into.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("obj_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic FNV byte stream for media fixtures: payload `seed`'s
    * byte j is bits 24..31 of the running fold
    * `h ← (h xor (j mod 256)) * FNV_PRIME` seeded by
    * `FNV_OFFSET xor seed` (seed < 256 so only the low byte differs).
    * Pure integer arithmetic, so a DuckDB recursive CTE regenerates the
    * exact payload — which is what lets [[stubDecode]]'s signature over a
    * generated fixture be replayed as an oracle, byte for byte, with no
    * files shipped to the oracle side. */
  def fnvBytes(seed: Int, len: Int): Array[Byte] = {
    require(seed >= 0 && seed < 256, s"graft: fnvBytes seed must be a byte, got $seed")
    val out = new Array[Byte](len)
    var h = 0xcbf29ce484222325L ^ seed.toLong
    var j = 0
    while (j < len) {
      h ^= (j & 0xff).toLong
      h *= 0x100000001b3L
      out(j) = ((h >>> 24) & 0xffL).toByte
      j += 1
    }
    out
  }

  /** STUB decoder: a real implementation would decode the payload with an
    * image/audio library and pool activations; this derives `dim` float
    * features from byte n-gram statistics so the pipeline stays
    * deterministic and testable without codecs. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return v
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= (payload(i) & 0xffL); h *= 0x100000001b3L
      val b = (((h % dim) + dim) % dim).toInt
      v(b) += (if (((h >>> 32) & 1L) == 0L) 1.0f else -1.0f)
      i += 1
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
    v
  }

  /** Batch feature extraction: (obj_id, modality, payload, meta) →
    * (obj_id, modality, feature: array<float>). Null payloads yield null
    * features (kept, so joins stay total). Runs one partition at a time —
    * at 100 TB this is the unit a codec/model would be loaded per-executor
    * for, exactly like ObjectEmbedding.init(). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("obj_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-executor init hook would go here (codec/model load)
        it.map { case (id, mod, payload) =>
          (id, mod, if (payload == null) null else stubDecode(payload, dim).toSeq)
        }
      }
      .toDF("obj_id", "modality", "feature")
      .select(col("obj_id"), col("modality"),
        col("feature").cast("array<float>").as("feature"))
  }

  /** Frame sampling for video payloads: emits every `everyN`-th frame as
    * its own row with a frame index. Frame extraction itself is stubbed as
    * fixed-size byte windows over the payload (a codec would replace
    * `frameBytes`). */
  def sampleFrames(media: DataFrame, everyN: Int, frameBytes: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.where(col("modality") === "video")
      .select(col("obj_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null) Iterator.empty
        else payload.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % everyN == 0 }
          .map { case (frame, i) => (id, i, frame) }
      }
      .toDF("obj_id", "frame_idx", "frame_payload")
  }

  /** Resize stub for images: records intent in metadata (a codec would
    * rewrite the payload); demonstrates the metadata-rewrite contract. */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      when(col("modality") === "image",
        struct(lit(w).as("width"), lit(h).as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_frames").as("n_frames")))
        .otherwise(col("meta")))
}
