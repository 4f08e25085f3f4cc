package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the composed curation funnel (the oracle proves exact
  * values; this pins the logical structure against refactors). */
class PipelineFunnelSpec extends AnyFunSuite {
  import SparkTestSession._

  test("funnel flags are monotone and final_keep is their conjunction") {
    val rows = SparkEntry.queries("pipeline_curation_funnel")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, gopher, dedup, clf, dsir, fin) =>
      assert(!dedup || gopher, s"doc $id kept by dedup but not gopher")
      assert(!dsir || (dedup && clf), s"doc $id DSIR-selected outside the survivor set")
      assert(fin == (dedup && clf && dsir), s"doc $id final flag inconsistent")
    }
    val (g, d, c, s, f) = (rows.count(_._2), rows.count(_._3),
      rows.count(r => r._4 && r._3), rows.count(_._5), rows.count(_._6))
    assert(g >= d && d >= c && c >= s && s == f,
      s"funnel counts must narrow: $g -> $d -> $c -> $s -> $f")
    assert(f > 0, "the calibrated funnel must keep something")
  }
}
