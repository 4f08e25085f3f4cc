package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{hamming_dist, min_topk, sign_pack}

/** Binary-quantized ANN: 1-bit/dim sign sketch + Hamming candidate
  * generation + exact re-rank.
  *
  * Complements the engine's PQ path (reference:
  * apis/python/src/tiledb/vector_search/ivf_pq_index.py trains codebooks;
  * here the "codebook" is the coordinate sign, training-free like
  * [[LshKnn]]). Two-stage plan, the standard scale shape:
  *
  *   1. '''Candidate scan''' reads ONLY the persisted `(id, bits)` sketch
  *      table — 8 bytes per 64 dims, a 32× smaller scan than the float
  *      vectors — broadcasts the (small, size-gated) query sketches, and
  *      keeps the `fetchK` lowest Hamming distances per query via the
  *      [[MinTopK]] partial→final aggregate (per input partition only
  *      fetchK rows cross the shuffle; XOR+POPCNT inner loop, whole-stage
  *      codegen'd).
  *   2. '''Re-rank''' joins the tiny candidate list back to the float
  *      vectors (only candidate rows are ever materialized on the scoring
  *      side) and runs the exact metric for the final top-k.
  *
  * Recall is governed by `fetchK`: at `fetchK >= |db|` the result equals
  * brute force (spec-asserted); the driver query uses `fetchK = 16k`
  * (`SparkEntry.BinFetchK` — the budget the recall audit and the
  * knn_binary_hamming oracle replay assume), and
  * the DuckDB oracle replays both stages exactly (signs recomputed from
  * the raw floats — which also audits the persisted sketch, since a
  * corrupted pack would change the candidate sets).
  */
object BinaryKnn {

  /** Write the sign-sketch table for `db` under `uri/sketch`:
    * `(id: long, bits: array<long>)`. One projection pass, no shuffle. */
  def buildSketch(
      db: DataFrame,
      uri: String,
      idCol: String = "id",
      vecCol: String = "vector"): Unit =
    db.select(col(idCol).cast("long").as("id"), sign_pack(col(vecCol)).as("bits"))
      .write.mode("overwrite").parquet(s"$uri/sketch")

  /** Two-stage query against a [[buildSketch]] table. `db` supplies the
    * float vectors for the re-rank stage (joined by id — only candidate
    * rows are scored exactly). */
  def search(
      spark: SparkSession,
      uri: String,
      db: DataFrame,
      queries: DataFrame,
      k: Int,
      fetchK: Int,
      metric: DistanceMetric = DistanceMetric.L2,
      idCol: String = "id",
      vecCol: String = "vector",
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame =
    searchFrames(spark.read.parquet(s"$uri/sketch"),
      db.select(col(idCol).cast("long").as("id"), col(vecCol).as("vector")),
      queries.select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("qvec")),
      k, fetchK, metric)

  /** Frame-level two-stage query: `sketch (id, bits)` drives the Hamming
    * shortlist, `db (id, vector)` the exact re-rank, `queries (qid, qvec)`
    * both — the entry point [[graft.index.BinaryIndex]] serves VERSIONED
    * sketch tables through. */
  def searchFrames(
      sketch: DataFrame,
      db: DataFrame,
      queries: DataFrame,
      k: Int,
      fetchK: Int,
      metric: DistanceMetric = DistanceMetric.L2): DataFrame = {
    require(k > 0 && fetchK >= k, s"graft: need fetchK >= k > 0, got k=$k fetchK=$fetchK")
    val q = queries.select(col("qid").cast("long").as("__qid"), col("qvec").as("__qvec"))
    val qBits = q.select(col("__qid"), sign_pack(col("__qvec")).as("__qbits"))

    // stage 1: Hamming shortlist over the bits-only scan. Ties resolve to
    // the lower id (MinTopK's contract), so the shortlist is deterministic
    // and the oracle's (ham, id) ordering replays it.
    val shortlist = sketch
      .crossJoin(Knn.sizedQuerySide(qBits, "__qbits"))
      .select(col("__qid"), col("id").cast("long").as("__id"),
        hamming_dist(col("bits"), col("__qbits")).cast("float").as("__score"))
      .groupBy(col("__qid"))
      .agg(min_topk(col("__score"), col("__id"), fetchK).as("__topk"))
      .select(col("__qid"), explode(col("__topk")).as("__hit"))
      .select(col("__qid"), col("__hit.id").as("__id"))

    // stage 2: exact re-rank of the shortlist only.
    val d = db.select(col("id").cast("long").as("__id"), col("vector").as("__vec"))
    val rescored = graft.gatedSmallSide(shortlist)
      .join(d, Seq("__id"))
      .join(Knn.sizedQuerySide(q, "__qvec"), Seq("__qid"))
      .select(col("__qid"), col("__id"),
        DistanceMetric.score(metric)(col("__vec"), col("__qvec")).as("__score"))
    Knn.topKFromScores(rescored, k, metric)
  }

}
