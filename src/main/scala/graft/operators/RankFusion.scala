package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of two ranked retrieval lists (Cormack, Clarke &
  * Büttcher, SIGIR 2009): `score(d) = Σ_lists 1/(k₀ + rank_list(d))` — the
  * standard way a hybrid search stacks a dense (vector) and a sparse
  * (BM25) retriever without score calibration, since only RANKS enter the
  * fusion.
  *
  * Replayability contract: each contribution `1/(k₀ + rank)` is one double
  * division over exact integers (identical on any IEEE-754 engine), and
  * the fused score is the FIXED-ORDER two-term sum `dense + sparse`
  * (floating addition of two values is order-insensitive anyway; the
  * written order is pinned for clarity). Output carries ranks and
  * membership flags, never raw doubles.
  *
  * Scale shape: both inputs are already top-k lists — |Q|·k rows — so the
  * full-outer join and the per-query window operate on candidate-sized
  * frames, not the corpus.
  */
object RankFusion {

  /** Fuse two `(qid, id, rank)` lists into the top `k` per query by RRF
    * score (ties to the lower id). Output:
    * `(qid, id, fused_rank, in_a, in_b)`. */
  def rrf(
      listA: DataFrame,
      listB: DataFrame,
      k: Int,
      k0: Int = 60): DataFrame = {
    require(k > 0 && k0 >= 0, s"graft: rrf needs k > 0, k0 >= 0, got k=$k k0=$k0")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"),
        col("rank").cast("double").as(s"__r$tag"))
    val fused = side(listA, "a")
      .join(side(listB, "b"), Seq("qid", "id"), "full_outer")
      .select(col("qid"), col("id"),
        (when(col("__ra").isNotNull, lit(1.0) / (lit(k0.toDouble) + col("__ra")))
            .otherwise(lit(0.0)) +
          when(col("__rb").isNotNull, lit(1.0) / (lit(k0.toDouble) + col("__rb")))
            .otherwise(lit(0.0))).as("__rrf"),
        col("__ra").isNotNull.as("in_a"),
        col("__rb").isNotNull.as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("__rrf").desc, col("id"))
    fused
      .withColumn("fused_rank", row_number().over(w))
      .where(col("fused_rank") <= k)
      .select("qid", "id", "fused_rank", "in_a", "in_b")
  }
}
