package graft.index

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index integrity checker — the `fsck` an operator runs before trusting
  * (or after repairing) a multi-TB index: verifies the metadata document's
  * internal invariants and that every version's on-disk artifacts agree
  * with it. The reference leans on TileDB's fragment consistency for this;
  * the parquet layout gets an explicit doctor instead.
  *
  * Every check is a bounded driver aggregate (counts, min/max dims — never
  * a collect of vectors), one small Spark job per version table, so the
  * doctor is safe to run against an index of any size.
  */
object IndexDoctor {

  /** severity: "error" = the index will misbehave; "warn" = inconsistent
    * bookkeeping that degrades (extra scans, stale flags) but serves. */
  case class Finding(severity: String, check: String, detail: String)

  def check(spark: SparkSession, uri: String): Seq[Finding] = {
    val out = mutable.Buffer.empty[Finding]
    val meta =
      try IndexMeta.read(uri)
      catch {
        case e: Exception =>
          return Seq(Finding("error", "meta", s"metadata unreadable: ${e.getMessage}"))
      }

    // ---- metadata invariants ----
    val ts = meta.ingestionTimestamps
    if (ts.sorted != ts || ts.distinct != ts)
      out += Finding("error", "meta.timestamps",
        s"ingestion timestamps must be strictly increasing, got $ts")
    if (meta.baseSizes.length != ts.length || meta.partitionHistory.length != ts.length)
      out += Finding("error", "meta.lengths",
        s"baseSizes(${meta.baseSizes.length}) / partitionHistory(${meta.partitionHistory.length}) " +
          s"must match ${ts.length} ingestions")
    if (meta.dimensions <= 0)
      out += Finding("error", "meta.dimensions", s"non-positive dimensions ${meta.dimensions}")

    // ---- per-version artifacts ----
    ts.zipWithIndex.foreach { case (t, i) =>
      val basePath = s"$uri/base/v=$t"
      if (!Storage.nonEmptyDir(basePath)) {
        out += Finding("error", s"base.v=$t", "base version directory missing or empty")
      } else {
        val base = spark.read.parquet(basePath)
        // float32 stores array<float> (size = dims); byte dtypes store
        // packed binary (length = dims bytes) — one element/byte per dim
        // either way
        val lenOf =
          if (meta.dtype == "float32") size(col("vector")) else length(col("vector"))
        val stats = base.agg(count(lit(1)).as("n"),
          min(lenOf).as("lo"), max(lenOf).as("hi")).head()
        val n = stats.getLong(0)
        if (meta.baseSizes.lift(i).exists(_ != n))
          out += Finding("error", s"base.v=$t",
            s"row count $n != recorded baseSize ${meta.baseSizes(i)}")
        // dims: float32 stores array<float> (length = dims); byte dtypes
        // store packed binary (length = dims bytes)
        val expectLen = meta.dimensions
        if (!stats.isNullAt(1) &&
            (stats.getInt(1) != expectLen || stats.getInt(2) != expectLen))
          out += Finding("error", s"base.v=$t",
            s"vector length range [${stats.getInt(1)}, ${stats.getInt(2)}] " +
              s"!= dimensions $expectLen")
        meta.indexType match {
          case "IVF_FLAT" | "IVF_PQ" =>
            val cPath = s"$uri/centroids/v=$t"
            if (!Storage.nonEmptyDir(cPath))
              out += Finding("error", s"centroids.v=$t", "centroid table missing")
            else {
              val c = spark.read.parquet(cPath).count()
              if (meta.partitionHistory.lift(i).exists(_ != c))
                out += Finding("error", s"centroids.v=$t",
                  s"$c centroids != recorded partition count ${meta.partitionHistory(i)}")
            }
            if (meta.indexType == "IVF_PQ" && !Storage.nonEmptyDir(s"$uri/pq_codebooks/v=$t"))
              out += Finding("error", s"pq_codebooks.v=$t", "codebook table missing")
          case "VAMANA" =>
            if (!Storage.nonEmptyDir(s"$uri/graph/v=$t"))
              out += Finding("error", s"graph.v=$t", "adjacency table missing")
          case "BINARY" =>
            val sPath = s"$uri/sketch/v=$t"
            if (!Storage.nonEmptyDir(sPath))
              out += Finding("error", s"sketch.v=$t", "sign-sketch table missing")
            else {
              val s = spark.read.parquet(sPath)
              val sn = s.count()
              if (sn != n)
                out += Finding("error", s"sketch.v=$t",
                  s"sketch rows $sn != base rows $n")
              val words = (meta.dimensions + 63) / 64
              val bad = s.where(size(col("bits")) =!= words).count()
              if (bad > 0)
                out += Finding("error", s"sketch.v=$t",
                  s"$bad sketch rows with word count != $words")
            }
          case _ => // FLAT: base only
        }
      }
    }

    // ---- updates log bookkeeping ----
    val logDir = s"$uri/updates"
    val logExists = Storage.nonEmptyDir(logDir)
    if (meta.hasUpdates && !logExists)
      out += Finding("warn", "updates",
        "hasUpdates is set but the log directory is missing/empty " +
          "(queries pay the merge branch for nothing)")
    if (!meta.hasUpdates && logExists)
      out += Finding("error", "updates",
        "updates log present but hasUpdates is false — logged writes are invisible")
    if (logExists) {
      val cols = spark.read.parquet(logDir).columns.toSet
      val need = Set("external_id", "vector", "ts")
      if (!need.subsetOf(cols))
        out += Finding("error", "updates",
          s"log schema $cols missing ${(need -- cols).mkString(", ")}")
    }
    out.toSeq
  }
}
