package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Maximal Marginal Relevance (MMR) diversified top-k — the standard
  * redundancy-aware re-rank for retrieval-augmented training-data
  * selection and RAG serving (Carbonell & Goldstein 1998): after a
  * relevance shortlist, results are picked greedily by
  *
  * {{{ argmax_d  λ·rel(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s) }}}
  *
  * so each new hit is relevant to the query AND far from what is
  * already selected (λ=1 is plain top-k; λ→0 maximizes diversity).
  *
  * Spark-first decomposition:
  *
  *   1. '''Shortlist''' — exact top-`candidates` by inner product
  *      ([[Knn.bruteForce]]: broadcast-gated cross join, codegen'd dot,
  *      [[graft.functions.MinTopK]] partial→final heaps). At 100 TB this
  *      stage swaps for an IVF probe; the greedy stage is unchanged.
  *   2. '''Greedy MMR''' — per query, over its ≤`candidates` rows only.
  *      Relevance and pairwise similarities use the STRICT double-fold
  *      dot ([[graft.functions.DotProductStrict]] semantics) pinned to
  *      integer micros (floor(x·10⁶)), and the λ trade-off is integer
  *      ppm arithmetic — the greedy argmax chain is exact integer math,
  *      deterministic under any row arrival order and bit-replayable by
  *      a SQL oracle (the [[MaxSim]] contract). The O(k·candidates)
  *      loop runs inside ONE task per query via `flatMapGroups`: the
  *      group is bounded by `candidates` by construction, so this is
  *      per-partition imperative logic over batch-sized state, not a
  *      corpus-sized window.
  *
  * Scale shape: the corpus is touched only by the stage-1 scan (or an
  * index probe) and the candidate vector fetch (broadcast-pruned join);
  * the groupByKey shuffle carries nq × candidates rows. No windows.
  *
  * @param lambdaPpm λ in parts-per-million (700000 = the common 0.7)
  * @return (qid, rank, id, mmr_micro) — rank 1-based in selection
  *         order; mmr_micro is the pinned objective at pick time
  *         (rank 1 = λ·rel_micro, later ranks include the diversity
  *         penalty)
  */
object MmrDiversify {

  def rerank(
      db: DataFrame,
      queries: DataFrame,
      k: Int,
      candidates: Int,
      lambdaPpm: Long = 700000L,
      idCol: String = "id",
      vecCol: String = "vector",
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame = {
    require(k >= 1, s"graft: MMR k must be >= 1, got $k")
    require(candidates >= k,
      s"graft: MMR candidate pool $candidates must be >= k $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"graft: MMR lambdaPpm must sit in [0, 1000000], got $lambdaPpm")
    val spark = db.sparkSession
    import spark.implicits._
    val q = queries.select(col(qidCol).cast("long").as("__qid"), col(qvecCol).as("__qvec"))
    val d = db.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__vec"))
    val cand = Knn.bruteForce(d, q, candidates, DistanceMetric.InnerProduct,
        idCol = "__id", vecCol = "__vec", qidCol = "__qid", qvecCol = "__qvec")
      .select(col("qid"), col("id"))
    rerankCandidates(cand, db, queries, k, lambdaPpm,
      idCol, vecCol, qidCol, qvecCol)
  }

  /** The greedy stage alone, over an EXTERNAL candidate list — the
    * production seam: at 100 TB the shortlist comes from an index probe
    * ([[graft.index.VectorIndex]] IP query → (qid, id) pairs), not an
    * exact scan. Candidates must carry (qid, id); at probe-all the
    * result is bit-identical to [[rerank]] (spec-pinned), because the
    * greedy chain depends only on the candidate SET — relevance and
    * pairwise scores are recomputed here from the raw vectors. */
  def rerankCandidates(
      candidates: DataFrame,
      db: DataFrame,
      queries: DataFrame,
      k: Int,
      lambdaPpm: Long = 700000L,
      idCol: String = "id",
      vecCol: String = "vector",
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame = {
    require(k >= 1, s"graft: MMR k must be >= 1, got $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"graft: MMR lambdaPpm must sit in [0, 1000000], got $lambdaPpm")
    val spark = db.sparkSession
    import spark.implicits._
    val q = queries.select(col(qidCol).cast("long").as("__qid"), col(qvecCol).as("__qvec"))
    val d = db.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__vec"))
    // distinct: a duplicated (qid, id) candidate row would enter the
    // greedy twice and surface the same id at two ranks — candidate
    // frames are bounded, so the dedup is batch-sized
    val cand = candidates.select(
      col("qid").cast("long").as("__qid"), col("id").cast("long").as("__id")).distinct()
    val lam = lambdaPpm
    val kk = k
    d.join(broadcast(cand), Seq("__id"))
      .join(Knn.sizedQuerySide(q, "__qvec"), Seq("__qid"))
      .select(col("__qid"), col("__id"),
        floor(dot_product_strict(col("__vec"), col("__qvec")) * lit(1000000.0))
          .cast("long").as("__rel"),
        col("__vec"))
      .as[(Long, Long, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Array[Float])]) =>
        // candidate-bounded group; id-sorted so the integer greedy chain
        // is independent of shuffle arrival order
        val cs = it.toArray.sortBy(_._2)
        val n = cs.length
        val picked = new Array[Boolean](n)
        // running max_{s in selected} sim(c, s), pinned to micros.
        // Long.MinValue sentinel: the FIRST computed similarity must
        // replace it even when negative (unnormalized inner products go
        // negative routinely) — a zero init would clamp the true max and
        // diverge from the oracle's plain max()
        val maxSim = Array.fill(n)(Long.MinValue)
        val out = Seq.newBuilder[(Long, Int, Long, Long)]
        var rank = 1
        var last = -1
        while (rank <= math.min(kk, n)) {
          var best = -1
          var bestScore = Long.MinValue
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              if (last >= 0) {
                val s = simMicro(cs(i)._4, cs(last)._4)
                if (s > maxSim(i)) maxSim(i) = s
              }
              val score =
                if (rank == 1) lam * cs(i)._3
                else lam * cs(i)._3 - (1000000L - lam) * maxSim(i)
              // ties break toward the smaller id; cs is id-ascending, so
              // strict > keeps the first (smallest-id) maximum
              if (score > bestScore) { bestScore = score; best = i }
            }
            i += 1
          }
          picked(best) = true
          out += ((qid, rank, cs(best)._2, bestScore))
          last = best
          rank += 1
        }
        out.result().iterator
      }
      .toDF("qid", "rank", "id", "mmr_micro")
  }

  /** floor-micro strict dot: the same left-to-right double fold as
    * [[graft.functions.DotProductStrict]] / VecKernels.dotStrict, on
    * plain arrays (the pairwise sims live inside the greedy task). */
  private[graft] def simMicro(a: Array[Float], b: Array[Float]): Long = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    math.floor(s * 1000000.0).toLong
  }
}
