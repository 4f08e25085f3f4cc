package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpression}

import graft.functions.LshBandKeys

/** LSH-bucketed approximate k-NN over an embedding column — the brief's
  * "LSH-bucketed variant" beside the IVF scale path: candidates are pairs
  * sharing at least one sign-random-projection band key
  * ([[graft.functions.LshBandKeys]]), verified by exact re-ranking. Output
  * precision is exact over the candidate set; only recall is approximate
  * (a neighbor is missed iff it disagrees with the query in every band).
  *
  * Versus IVF ([[graft.index.IvfFlatIndex]]): no training pass and no
  * centroid state — the hyperplanes are data-independent, so the same
  * bucketing serves a stream whose distribution drifts, at the cost of
  * data-oblivious buckets (IVF's trained cells adapt to density).
  *
  * Scale shape: each side explodes to `bands` rows (band, key) and the
  * candidate join is a shuffle hash join on that composite key — shuffle
  * volume is bands × (|db| + |q|) rows of (id, key), never all-pairs; the
  * re-rank joins vectors back by id. Hot buckets (many vectors sharing one
  * key) inflate only their own join partition — AQE's skew split applies,
  * and a caller can raise `bands`/width to thin them. No driver-side state
  * of any kind; the planes array (bands × width × dims floats) rides in the
  * expression like IVF's centroids.
  */
object LshKnn {

  /** Deterministic Gaussian hyperplanes: seeded java.util.Random
    * nextGaussian stream, float32-cast, row-major (nbits × dims). Persist
    * these next to an index (parquet) to make runs replayable — the
    * sketching is a pure function of (planes, vector). */
  def planes(seed: Long, nbits: Int, dims: Int): Array[Array[Float]] = {
    require(nbits > 0 && dims > 0, s"graft: nbits=$nbits dims=$dims must be positive")
    val rnd = new java.util.Random(seed)
    Array.fill(nbits)(Array.fill(dims)(rnd.nextGaussian().toFloat))
  }

  /** @param db      (idCol: Long, vecCol: Array[Float])
    * @param queries (qidCol: Long, qvecCol: Array[Float])
    * @param planes  [[planes]] output (or any row-major float matrix)
    * @param bands   OR-construction band count; planes.length / bands bits each
    * @return (qid, rank, id, distance) — exact `metric` top-k over the
    *         bucketed candidate set */
  def search(
      db: DataFrame,
      queries: DataFrame,
      k: Int,
      planes: Array[Array[Float]],
      bands: Int,
      metric: DistanceMetric = DistanceMetric.Cosine,
      idCol: String = "id",
      vecCol: String = "vector",
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val d = db.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__vec"))
    val q = queries.select(col(qidCol).cast("long").as("__qid"), col(qvecCol).as("__qvec"))

    def banded(df: DataFrame, vecC: String, outPrefix: String): DataFrame =
      df.select(col("*"),
          posexplode(toColumn(LshBandKeys(toExpression(col(vecC)), planes, bands)))
            .as(Seq(s"${outPrefix}band", s"${outPrefix}key")))

    val dB = banded(d, "__vec", "__d")
    val qB = banded(q, "__qvec", "__q")
    // distinct BEFORE the vector re-join: a (q, id) pair sharing several
    // bands must score once, and the dedup shuffles only (qid, id) longs
    val cand = qB.join(dB,
        qB("__qband") === dB("__dband") && qB("__qkey") === dB("__dkey"))
      .select(col("__qid"), col("__id")).distinct()
    val scored = cand
      .join(d, Seq("__id"))
      .join(q, Seq("__qid"))
      .select(col("__qid"), col("__id"),
        DistanceMetric.score(metric)(col("__vec"), col("__qvec")).as("__score"))
    Knn.topKFromScores(scored, k, metric)
  }
}
