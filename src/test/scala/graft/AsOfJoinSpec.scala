package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  // left: (id, key, ts); right: (rid, key, ts, v)
  private lazy val left = {
    import spark.implicits._
    Seq((1L, "a", 100L), (2L, "a", 205L), (3L, "a", 300L), (4L, "b", 50L))
      .toDF("id", "key", "ts")
  }
  private lazy val right = {
    import spark.implicits._
    Seq(
      (10L, "a", 90L, 1.0), (11L, "a", 100L, 2.0), (12L, "a", 100L, 3.0),
      (13L, "a", 210L, 4.0), (14L, "c", 40L, 5.0)
    ).toDF("rid", "key", "ts", "v")
  }

  private def run(forward: Boolean, tol: Option[Long] = None) =
    AsOfJoin.asOf(left, right, Seq("key"), "ts", "ts",
        rightCols = Seq("rid", "v"), tieBreaker = "rid",
        tolerance = tol.map(lit(_)), forward = forward)
      .select("id", "right_rid", "right_ts", "right_v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2), r.getDouble(3)))))
      .toMap

  test("backward as-of: inclusive boundary, (ts, tie) max wins, left-outer nulls") {
    val m = run(forward = false)
    // id=1 at ts=100: rids 10(90), 11(100), 12(100) all eligible; ties at
    // ts=100 resolve to the larger rid=12
    assert(m(1L) === Some((12L, 100L, 3.0)))
    assert(m(2L) === Some((12L, 100L, 3.0))) // 205 < 210: still ts=100
    assert(m(3L) === Some((13L, 210L, 4.0)))
    assert(m(4L) === None) // key b has no right rows at all
  }

  test("forward as-of: earliest right at-or-after, smaller tie wins") {
    val m = run(forward = true)
    assert(m(1L) === Some((11L, 100L, 2.0))) // equal-ts inclusive; min rid
    assert(m(2L) === Some((13L, 210L, 4.0)))
    assert(m(3L) === None) // nothing at or after 300
    assert(m(4L) === None)
  }

  test("tolerance nulls matches farther than the bound without dropping rows") {
    val m = run(forward = false, tol = Some(10L))
    assert(m(1L) === Some((12L, 100L, 3.0))) // gap 0 <= 10
    assert(m(2L) === None) // gap 105 > 10 -> nulled, row kept
    assert(m(3L) === None) // gap 90 > 10
    assert(m.size === 4)
  }

  test("band join equals the naive inequality product filter") {
    import spark.implicits._
    val l = left.withColumnRenamed("id", "lid")
    val r = right.withColumnRenamed("ts", "rts")
    val got = AsOfJoin.timeBandJoin(l, right, Seq("key"), "ts", "ts", band = 15L)
      .select("l_lid", "r_rid").as[(Long, Long)].collect().toSet
    val naive = l.join(r, Seq("key"))
      .where(col("rts") >= col("ts") && col("rts") <= col("ts") + 15L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(naive.nonEmpty)
    // boundary: right at exactly ts+band is included (rid 13 at 210 for
    // left ts=195 would be; here left 205+15=220 >= 210)
    assert(got.contains((2L, 13L)))
  }

  test("band join emits each qualifying pair exactly once (no bucket dup)") {
    val out = AsOfJoin.timeBandJoin(left, right, Seq("key"), "ts", "ts", band = 200L)
    assert(out.count() === out.distinct().count())
  }

  test("salted band join: identical result on a skewed key, hot cell split ~salt-ways") {
    import spark.implicits._
    // one pathological key: 20k right rows piled into a single (key,
    // bucket) cell — many at the SAME timestamp, the case time
    // subdivision can't split
    val hotR = (0 until 20000).map(i => (7L, 100L + i % 3, i.toLong)).toDF("key", "ts", "rid")
    val coldR = (0 until 50).map(i => (8L, 100L + i, 100000L + i)).toDF("key", "ts", "rid")
    val skewR = hotR.union(coldR)
    val skewL = Seq((7L, 101L, 1L), (7L, 40L, 2L), (8L, 120L, 3L))
      .toDF("key", "ts", "lid")
    val flat = AsOfJoin.timeBandJoin(skewL, skewR, Seq("key"), "ts", "ts", band = 50L)
      .select("l_lid", "r_rid").as[(Long, Long)].collect().toSet
    val salted = AsOfJoin.timeBandJoin(skewL, skewR, Seq("key"), "ts", "ts",
        band = 50L, salt = 8)
      .select("l_lid", "r_rid").as[(Long, Long)].collect().toSet
    assert(salted === flat)
    assert(flat.size > 13000) // lid 1 matches the ts∈{101,102} hot pile
    // task-size proxy: the max (key, bucket[, salt]) cell on the right
    // side shrinks ~salt-fold, so no single task owns the pile
    def maxCell(groupCols: Seq[org.apache.spark.sql.Column]): Long = {
      val start = col("ts") - pmod(col("ts"), lit(50L))
      skewR.withColumn("__bucket", start)
        .withColumn("__salt", pmod(hash(struct(col("ts"), col("rid"))), lit(8)))
        .groupBy(groupCols: _*).count().agg(max("count")).head().getLong(0)
    }
    val unsaltedMax = maxCell(Seq(col("key"), col("__bucket")))
    val saltedMax = maxCell(Seq(col("key"), col("__bucket"), col("__salt")))
    assert(unsaltedMax >= 6000, s"fixture should be skewed, got $unsaltedMax")
    assert(saltedMax * 4 <= unsaltedMax,
      s"salting should split the hot cell: $unsaltedMax -> $saltedMax")
  }

  test("as-of rejects a non-integral tie-breaker instead of nulling it") {
    import spark.implicits._
    val rStr = Seq((1L, 10L, "a")).toDF("key", "ts", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, rStr, Seq("key"), "ts", "ts",
        rightCols = Seq("rid"), tieBreaker = "rid")
    }
    assert(e.getMessage.contains("integral"))
    // ...but every integral width passes — IntegerType especially
    // (typeName is "integer", which a name-list guard once mismatched)
    val rInt = Seq(("a", 10L, 7)).toDF("key", "ts", "rid")
    assert(AsOfJoin.asOf(left, rInt, Seq("key"), "ts", "ts",
      rightCols = Seq("rid"), tieBreaker = "rid").count() >= 0)
  }

  test("as-of plan is one shuffle + running window, no cartesian/NLJ") {
    val plan = AsOfJoin.asOf(left, right, Seq("key"), "ts", "ts",
      rightCols = Seq("rid"), tieBreaker = "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }
}
