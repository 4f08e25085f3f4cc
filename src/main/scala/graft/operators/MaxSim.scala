package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Late-interaction (MaxSim) retrieval over multi-vector objects.
  *
  * The reference's ColPali integration emits SEVERAL vectors per object —
  * one per image patch / query token, all sharing one external_id
  * (reference: apis/python/src/tiledb/vector_search/embeddings/
  * colpali_embedding.py:88-104 stacks per-patch embeddings under
  * `external_id * ones(n_patches)`; the object layer then collapses hits
  * back to unique external ids, object_index.py:480,524). The scoring model
  * those embeddings are trained for is ColBERT-style late interaction:
  *
  * {{{ score(q, d) = Σ_{i ∈ q.vectors} max_{j ∈ d.vectors} ⟨q_i, d_j⟩ }}}
  *
  * Spark-first reshaping (the PLAID/ColBERT serving decomposition):
  *
  *   1. '''Shortlist''' — for EACH query vector independently, exact
  *      top-`shortlistK` doc VECTORS by raw dot ([[Knn.bruteForce]]:
  *      broadcast-gated cross join, codegen'd dot, [[MinTopK]]
  *      partial→final heaps — only `shortlistK` rows per (query vector,
  *      input partition) cross the shuffle). At 100 TB this stage swaps
  *      for an IVF probe over the flat vector index ([[graft.index
  *      .VectorIndex]]) — the re-rank below is unchanged; here it stays
  *      the exact scan so the oracle can replay it verbatim.
  *   2. '''Candidates''' — hit vector ids map back to their owning
  *      objects (one broadcast-tiny join against the corpus projection)
  *      and dedup to (qid, obj) pairs: ≤ |q.vectors|·shortlistK per query.
  *   3. '''Exact MaxSim re-rank''' — ONLY candidate objects' vectors are
  *      fetched (semi-join prunes the corpus scan), every (query vector ×
  *      candidate vector) dot is scored in one codegen'd stage with the
  *      STRICT double-fold kernel ([[graft.functions.DotProductStrict]]:
  *      left-to-right double accumulation, no SIMD reassociation — the
  *      bit-replayable contract), reduced max-per-query-vector then
  *      summed per object. Per-pair maxima are pinned to integer micro
  *      units (floor(max·10⁶)) before the sum, so the cross-object
  *      ranking is integer arithmetic on cross-engine-exact values —
  *      deterministic under any shuffle arrival order AND bit-replayable
  *      in the SQL oracle.
  *   4. Top-`k` objects per query via [[MinTopKLong]] on
  *      (−score_micro, obj) — ascending heap = (score desc, obj asc).
  *
  * Scale shape: the corpus is touched by three column-pruned scans — the
  * shortlist dot scan (or an index probe), the hit-id → owning-object
  * mapping (two int64 columns, no vectors), and the candidate semi-join
  * vector fetch; everything query-sided is bounded by the batch and
  * rides the engine-wide broadcast gate. No windows anywhere.
  *
  * @param docVecs   (objCol: Long, vidCol: Long, vecCol: Array[Float]) —
  *                  one row per doc vector; vidCol globally unique
  * @param queryVecs (qidCol: Long, qvidCol: Long, qvecCol: Array[Float]) —
  *                  one row per query vector; qvidCol globally unique
  * @param k         objects returned per query
  * @param shortlistK doc vectors kept per query VECTOR in stage 1;
  *                  `shortlistK >= |docVecs|` makes the result exact
  *                  MaxSim by construction (every object surfaces)
  * @return (qid, rank, obj, score_micro) — rank 1-based by
  *         (score_micro desc, obj asc)
  */
object MaxSim {

  def topK(
      docVecs: DataFrame,
      queryVecs: DataFrame,
      k: Int,
      shortlistK: Int,
      objCol: String = "obj",
      vidCol: String = "vid",
      vecCol: String = "vector",
      qidCol: String = "qid",
      qvidCol: String = "qvid",
      qvecCol: String = "qvec"): DataFrame = {
    require(k > 0, s"graft: MaxSim k must be positive, got $k")
    require(shortlistK > 0, s"graft: MaxSim shortlistK must be positive, got $shortlistK")

    val docs = docVecs.select(
      col(objCol).cast("long").as("__obj"),
      col(vidCol).cast("long").as("__vid"),
      col(vecCol).as("__vec"))
    val qs = queryVecs.select(
      col(qidCol).cast("long").as("__qid"),
      col(qvidCol).cast("long").as("__qvid"),
      col(qvecCol).as("__qvec"))

    // stage 1: per query VECTOR, exact top-shortlistK doc vectors by dot
    // (InnerProduct heap = min on -dot, id — the FLAT knn kernel verbatim)
    val hits = Knn.bruteForce(
      docs, qs, shortlistK, DistanceMetric.InnerProduct,
      idCol = "__vid", vecCol = "__vec", qidCol = "__qvid", qvecCol = "__qvec")
      .select(col("qid").as("qvid"), col("id").as("vid"))

    rerank(docVecs, queryVecs, hits, k,
      objCol, vidCol, vecCol, qidCol, qvidCol, qvecCol)
  }

  /** Stages 2–4 on an externally-produced shortlist — the seam the 100 TB
    * deployment swaps through: `hits` can come from [[topK]]'s exact scan
    * (above) or from an index probe (e.g. [[graft.index.VectorIndex]]
    * IVF over the flat vector table serving per-query-vector candidates),
    * and the exact MaxSim re-rank is identical either way.
    *
    * @param hits (qvid: Long, vid: Long) — candidate doc vectors per
    *             query vector; ≤ shortlist-sized per query vector
    */
  def rerank(
      docVecs: DataFrame,
      queryVecs: DataFrame,
      hits: DataFrame,
      k: Int,
      objCol: String = "obj",
      vidCol: String = "vid",
      vecCol: String = "vector",
      qidCol: String = "qid",
      qvidCol: String = "qvid",
      qvecCol: String = "qvec"): DataFrame = {
    require(k > 0, s"graft: MaxSim k must be positive, got $k")

    val docs = docVecs.select(
      col(objCol).cast("long").as("__obj"),
      col(vidCol).cast("long").as("__vid"),
      col(vecCol).as("__vec"))
    val qs = queryVecs.select(
      col(qidCol).cast("long").as("__qid"),
      col(qvidCol).cast("long").as("__qvid"),
      col(qvecCol).as("__qvec"))
    val hitPairs = hits.select(
      col("qvid").cast("long").as("__qvid"),
      col("vid").cast("long").as("__vid"))

    // stage 2: hit vector -> owning object (tiny side broadcast against the
    // corpus projection), then (query object, doc object) candidate pairs
    val candPairs = docs.select(col("__vid"), col("__obj"))
      .join(graft.gatedSmallSide(hitPairs), Seq("__vid"))
      .join(graft.gatedSmallSide(qs.select(col("__qvid"), col("__qid"))), Seq("__qvid"))
      .select(col("__qid"), col("__obj"))
      .distinct()

    // stage 3: fetch ONLY candidate objects' vectors, score every
    // (query vector x candidate vector) dot, reduce max per query vector
    val candVecs = docs.join(
      graft.gatedSmallSide(candPairs.select(col("__obj")).distinct()),
      Seq("__obj"), "left_semi")
    // strict double-fold dot: the score is VALUE-pinned by the oracle
    // (floor-micro), so it must be bit-equal across engines — the SIMD
    // float kernel is ordering-safe but not value-replayable
    val pairDots = candVecs
      .join(graft.gatedSmallSide(candPairs), Seq("__obj"))
      .join(graft.gatedSmallSide(qs), Seq("__qid"))
      .select(col("__qid"), col("__obj"), col("__qvid"),
        dot_product_strict(col("__vec"), col("__qvec")).as("__dot"))
    val maxes = pairDots
      .groupBy(col("__qid"), col("__obj"), col("__qvid"))
      .agg(max(col("__dot")).as("__m"))

    // integer micro pin BEFORE the sum: exact double max -> x1e6 -> floor,
    // so the per-object score is a sum of longs
    val scores = maxes
      .groupBy(col("__qid"), col("__obj"))
      .agg(sum(floor(col("__m") * lit(1000000.0)).cast("long"))
        .as("__score_micro"))

    // stage 4: top-k objects per query, (score desc, obj asc)
    scores
      .groupBy(col("__qid"))
      .agg(min_topk_long(-col("__score_micro"), col("__obj"), k).as("__topk"))
      .select(col("__qid"), posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(
        col("__qid").as("qid"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hit.id").as("obj"),
        (-col("__hit.score")).as("score_micro"))
  }
}
