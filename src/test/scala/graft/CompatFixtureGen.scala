package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.Ingest
import graft.operators.DistanceMetric

/** One-shot generator for the frozen-layout backwards-compatibility
  * fixtures (reference: backwards-compatibility-data/ +
  * test_backwards_compatibility.py:1-74 — the reference keeps indexes
  * written by 25 prior releases and opens them all in CI).
  *
  * Writes tiny deterministic indexes of every type/dtype combination under
  * `src/test/resources/graft-compat/<storage-version>/`; the committed
  * output is FROZEN — CompatSpec opens and queries it forever after. When a
  * layout change breaks CompatSpec, the correct response is a conscious
  * [[graft.index.IndexMeta.StorageVersion]] bump plus a NEW fixture
  * directory for the new version, keeping the old one readable (or an
  * explicit migration note) — never regenerating the old fixtures in place.
  *
  * Run: `sbt "Test/runMain graft.CompatFixtureGen"`.
  */
object CompatFixtureGen {

  /** 60 deterministic dim-8 vectors: enough for 4 IVF partitions / 2 Vamana
    * shards while keeping the committed fixture tiny. StrictMath, not Math:
    * Math.sin/cos may differ by an ulp across JVM architectures, and the
    * CompatSpec expectations are recomputed from this corpus at verify time
    * against bit-frozen fixtures — the inputs must be bit-stable too. */
  def corpus(spark: SparkSession) = {
    import spark.implicits._
    (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (StrictMath.sin(i * 0.7 + d * 1.3) + StrictMath.cos(i * 0.13 * (d + 1))).toFloat))
    }.toDF("external_id", "vector")
  }

  /** u8-quantized view of the same corpus (values in [0, 255]). */
  def corpusU8(spark: SparkSession) = corpus(spark).select(col("external_id"),
    expr("transform(vector, x -> float(least(255.0, floor((x + 2.0) * 63.75))))")
      .as("vector"))

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      "src/test/resources/graft-compat/" + graft.index.IndexMeta.StorageVersion)
    require(!Files.exists(Paths.get(root)),
      s"graft: $root exists — compat fixtures are FROZEN; bump StorageVersion " +
        "and generate a new directory instead of regenerating in place")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-compat-gen")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val f32 = corpus(spark).coalesce(1)
    val u8 = corpusU8(spark).coalesce(1)

    Ingest.ingest(spark, s"$root/flat_f32", f32, "FLAT",
      DistanceMetric.L2, timestamp = 1000L)
    Ingest.ingest(spark, s"$root/flat_u8", u8, "FLAT",
      DistanceMetric.L2, dtype = "uint8", timestamp = 1000L)
    Ingest.ingest(spark, s"$root/ivf_flat_f32", f32, "IVF_FLAT",
      DistanceMetric.L2, timestamp = 1000L, partitions = Some(4))
    Ingest.ingest(spark, s"$root/ivf_flat_u8", u8, "IVF_FLAT",
      DistanceMetric.L2, dtype = "uint8", timestamp = 1000L, partitions = Some(4))
    Ingest.ingest(spark, s"$root/ivf_pq_f32", f32, "IVF_PQ",
      DistanceMetric.L2, timestamp = 1000L, partitions = Some(4),
      numSubspaces = Some(4))
    Ingest.ingest(spark, s"$root/vamana_f32", f32, "VAMANA",
      DistanceMetric.L2, timestamp = 1000L, partitions = Some(2),
      lBuild = Some(30), rMaxDegree = Some(8))
    // BINARY joined the format family in round 9 (base + sketch/v=ts);
    // frozen from the first fixture generation after its introduction —
    // CompatSpec tests it conditionally so pre-existing version dirs
    // (written before the type existed) stay green
    Ingest.ingest(spark, s"$root/binary_f32", f32, "BINARY",
      DistanceMetric.L2, timestamp = 1000L)
    // an updates log on one fixture: the log layout is part of the format
    val flat = graft.index.VectorIndex.open(spark, s"$root/flat_f32")
    flat.deleteBatch(f32.where(col("external_id") === 59L), ts = 1100L)
    flat.updateBatch(f32.where(col("external_id") === 58L)
      .select(col("external_id"), reverse(col("vector")).as("vector")), ts = 1100L)

    // drop Spark bookkeeping files — they aren't part of the layout and
    // would churn the committed fixture (.crc files embed block checksums)
    Files.walk(Paths.get(root)).forEach { p =>
      val n = p.getFileName.toString
      if (n == "_SUCCESS" || n.endsWith(".crc")) Files.delete(p)
    }
    println(s"compat fixtures written under $root")
    spark.stop()
  }
}
