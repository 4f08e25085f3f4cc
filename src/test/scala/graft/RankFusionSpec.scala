package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankFusion

/** Reciprocal-rank fusion ([[graft.operators.RankFusion]]). */
class RankFusionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rrf fuses overlapping and one-sided candidates with exact arithmetic") {
    import spark.implicits._
    // query 0: doc 1 ranks 1st in both lists; doc 2 only dense (2nd);
    // doc 3 only sparse (2nd). doc 1 must win (two contributions), docs
    // 2 and 3 tie on score -> id tie-break.
    val dense = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("qid", "id", "rank")
    val sparse = Seq((0L, 1L, 1), (0L, 3L, 2)).toDF("qid", "id", "rank")
    val out = RankFusion.rrf(dense, sparse, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3), r.getBoolean(4))).sortBy(_._3).toSeq
    assert(out === Seq(
      (0L, 1L, 1, true, true),
      (0L, 2L, 2, true, false),
      (0L, 3L, 3, false, true)))
  }

  test("a lone low rank in one list beats split mediocre ranks when k0 shrinks") {
    import spark.implicits._
    // with k0 = 0: doc 9 at rank 1 in one list scores 1.0; doc 5 at rank
    // 3 in both scores 2/3 — rank-1 dominance survives fusion
    val dense = Seq((0L, 9L, 1), (0L, 5L, 3)).toDF("qid", "id", "rank")
    val sparse = Seq((0L, 5L, 3), (0L, 7L, 2)).toDF("qid", "id", "rank")
    val top = RankFusion.rrf(dense, sparse, k = 1, k0 = 0)
      .select("id").head().getLong(0)
    assert(top == 9L)
  }
}
