package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Ingest, VectorIndex}
import graft.io.VecsIO
import graft.operators.DistanceMetric

/** Codec + retrieval compatibility against the REFERENCE REPOSITORY'S OWN
  * BYTES — not a synthetic fixture: `siftmicro_base.fvecs` (the 100 real
  * SIFT vectors the reference's backwards-compatibility suite queries,
  * backwards-compatibility-data/) and the siftsmall `queries.fvecs` /
  * `groundtruth.ivecs` pair (external/test_data/files/siftsmall/). The
  * retrieval contract is ported from
  * test_backwards_compatibility.py:1-74: query a fixed index subset of the
  * base at k=1 — every query must retrieve ITSELF at distance 0 (the
  * reference asserts exactly this id list and an all-zero distance list).
  *
  * The suite cancels (does not fail) when the reference checkout is not
  * present, so it is environment-portable; everything it reads is
  * read-only. */
class ReferenceBytesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val refRoot = "/root/reference"
  private val siftmicro = s"$refRoot/backwards-compatibility-data/siftmicro_base.fvecs"
  private val siftsmallQ = s"$refRoot/external/test_data/files/siftsmall/queries.fvecs"
  private val siftsmallGt = s"$refRoot/external/test_data/files/siftsmall/groundtruth.ivecs"

  private def need(p: String): Unit =
    assume(Files.isReadable(Paths.get(p)), s"reference bytes not present: $p")

  /** The exact query subset the reference's compat test uses
    * (test_backwards_compatibility.py:23-48). */
  private val QueryIndices = Seq(0, 3, 4, 8, 10, 19, 28, 31, 39, 40, 41, 47,
    49, 50, 56, 64, 68, 70, 71, 79, 82, 89, 90, 94).map(_.toLong)

  test("siftmicro_base.fvecs decodes through the vecs connector byte-for-byte") {
    need(siftmicro)
    import spark.implicits._
    val df = VecsIO.readFvecs(spark, siftmicro)
    val rows = df.orderBy("row_id").as[(Long, Array[Float])].collect()
    // 51600 bytes = 100 records x (4-byte dim header + 128 floats)
    assert(rows.length === 100)
    assert(rows.forall(_._2.length === 128))
    assert(rows.map(_._1).toSeq === (0L until 100L))
    // independent little-endian parse of the first record straight from the
    // file bytes — the connector must agree with the on-disk layout, not
    // just with its own writer
    val bytes = Files.readAllBytes(Paths.get(siftmicro))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() === 128, "leading dim header")
    val first = Array.fill(128)(bb.getFloat())
    assert(rows.head._2.toSeq === first.toSeq)
    // SIFT descriptors are non-negative histograms — a byte-order or
    // offset slip would show up as garbage values here
    assert(rows.forall(_._2.forall(v => v >= 0f && v <= 255f)))
  }

  test("reference compat contract: every index type self-retrieves the query subset exactly") {
    need(siftmicro)
    import spark.implicits._
    val base = VecsIO.readFvecs(spark, siftmicro)
      .select(col("row_id").as("external_id"), col("vector"))
    val queries = base.where(col("external_id").isin(QueryIndices: _*))
      .select(col("external_id").as("qid"), col("vector").as("qvec"))
    // the reference's compat suite runs flat / ivf_flat / vamana / ivf_pq
    // (test_backwards_compatibility.py:60-69); BINARY is the port's own
    // extra type on the same lifecycle contract
    for (indexType <- Seq("FLAT", "IVF_FLAT", "VAMANA", "IVF_PQ", "BINARY")) {
      val uri = Files.createTempDirectory(s"graft_refbytes_$indexType").toString
      Ingest.ingest(spark, uri, base, indexType, DistanceMetric.L2,
        timestamp = 1000L)
      val hits = VectorIndex.open(spark, uri)
        .query(queries, k = 1, nprobe = 1 << 30)
        .select(col("qid"), col("id"), col("distance"))
        .as[(Long, Long, Float)].collect().sortBy(_._1)
      // test_backwards_compatibility.py:72-74: ids == the query subset,
      // distances all zero (accuracy 1.0 on the reference's own bytes)
      assert(hits.map(_._2).toSeq === QueryIndices.sorted,
        s"$indexType self-retrieval ids: ${hits.map(_._2).toSeq}")
      assert(hits.forall(_._3 === 0.0f), s"$indexType self-distances must be 0")
    }
  }

  test("siftsmall queries.fvecs + groundtruth.ivecs read with the reference's shapes") {
    need(siftsmallQ); need(siftsmallGt)
    import spark.implicits._
    val q = VecsIO.readFvecs(spark, siftsmallQ)
    assert(q.count() === 100)
    assert(q.select(size(col("vector"))).distinct().as[Int].collect().toSeq === Seq(128))
    // autodetect + metadata on a real non-synthetic file
    assert(VecsIO.detectSourceType(siftsmallQ) === "FVECS")
    assert(VecsIO.sourceMetadata(spark, siftsmallQ) === ((100L, 128)))
    val gt = VecsIO.readIvecs(spark, siftsmallGt)
    val gtRows = gt.orderBy("row_id").as[(Long, Array[Int])].collect()
    assert(gtRows.length === 100)
    assert(gtRows.forall(_._2.length === 100))
    // ground-truth ids index the (absent here) 10k-vector siftsmall base
    assert(gtRows.forall(_._2.forall(id => id >= 0 && id < 10000)))
  }
}
