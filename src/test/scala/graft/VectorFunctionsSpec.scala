package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.operators.{DistanceMetric, Knn, TopKHeap}

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}

class VectorFunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val sampled = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(4.0f, 5.0f, 6.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
  }

  test("dist_sos / dist_l2 / dot / cosine match scalar reference") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f); val b = Array(4.0f, 5.0f, 6.0f)
    val df = Seq((a, b)).toDF("a", "b")
    val row = df.select(
      dist_sos($"a", $"b"), dist_l2($"a", $"b"),
      dot_product($"a", $"b"), dist_cosine($"a", $"b")).head()
    assert(row.getFloat(0) === 27.0f)
    assert(math.abs(row.getFloat(1) - math.sqrt(27.0).toFloat) < 1e-6)
    assert(row.getFloat(2) === 32.0f)
    val cos = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(row.getFloat(3) - (1.0 - cos)) < 1e-6)
  }

  test("dot_product_strict: codegen'd column bit-equals the sequential double fold") {
    import spark.implicits._
    // real 64-dim fixture rows through the EXPRESSION (whole-stage codegen
    // path), checked bit-for-bit against a plain Scala fold — the
    // value-replay contract MaxSim's floor-micro oracle pins
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(8).collect().map(_.getSeq[Float](1).toArray)
    val df = rows.sliding(2, 2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val got = df.select(dot_product_strict($"a", $"b")).collect().map(_.getDouble(0))
    val want = rows.sliding(2, 2).map { p =>
      var s = 0.0; var i = 0
      while (i < p(0).length) { s += p(0)(i).toDouble * p(1)(i).toDouble; i += 1 }
      s
    }.toArray
    got.zip(want).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(w), s"$g != $w")
    }
    // type gate names the expression
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .select(dot_product_strict($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("dot_product_strict"), e.getMessage)
  }

  test("normalize yields unit norm; zero vector passes through") {
    import spark.implicits._
    val norms = sampled.select($"id", vector_norm(vector_normalize($"vec")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(math.abs(norms(1L) - 1.0f) < 1e-6)
    assert(math.abs(norms(2L) - 1.0f) < 1e-6)
    assert(norms(3L) === 0.0f)
  }

  test("dimension mismatch throws") {
    import spark.implicits._
    val df = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] { df.select(dist_l2($"a", $"b")).head() }
    assert(e.getMessage.contains("dimension mismatch")
      || e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("TopKHeap keeps k smallest with (score,id) tie-break, merge works") {
    val h = new TopKHeap(3)
    Seq((5.0f, 50L), (1.0f, 10L), (3.0f, 30L), (2.0f, 20L), (4.0f, 40L))
      .foreach { case (s, i) => h.insert(s, i) }
    assert(h.sorted.toSeq === Seq((1.0f, 10L), (2.0f, 20L), (3.0f, 30L)))
    val h2 = new TopKHeap(3)
    h2.insert(0.5f, 5L); h2.insert(2.0f, 19L) // tie on score=2.0 → smaller id wins
    h.merge(h2)
    assert(h.sorted.toSeq === Seq((0.5f, 5L), (1.0f, 10L), (2.0f, 19L)))
  }

  test("brute-force knn recovers exact neighbors on a tiny fixture") {
    import spark.implicits._
    // db on a line: distance from query q=(0) is |x|
    val db = (0 until 100).map(i => (i.toLong, Array(i.toFloat))).toDF("id", "vector")
    val q = Seq((0L, Array(0.0f))).toDF("qid", "qvec")
    val got = Knn.bruteForce(db, q, 5, DistanceMetric.L2)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(got === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("knn flat matches a collect-side exact scan on sf0.001 embeddings") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val data = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val queries = data.filter(_._1 < 3)
    val expected = queries.map { case (qid, qv) =>
      val top = data.map { case (id, v) =>
        var s = 0.0f; var i = 0
        while (i < v.length) { val d = v(i) - qv(i); s += d * d; i += 1 }
        (s, id)
      }.sortBy(t => (t._1, t._2)).take(7).map(_._2).toSeq
      qid -> top
    }.toMap
    val got = Knn.bruteForce(
        emb, emb.where($"vec_id" < 3), 7, DistanceMetric.SumOfSquares,
        idCol = "vec_id", vecCol = "embedding", qidCol = "vec_id", qvecCol = "embedding")
      .orderBy("qid", "rank").select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, hits) => q -> hits.map(_._2).toSeq }
    assert(got === expected)
  }

  test("SIMD distance kernels track a double-precision reference across dims (lane tails included)") {
    // covers the SPECIES_PREFERRED main loop + scalar tail at every
    // alignment: dims straddling multiples of the lane count, the
    // below-threshold scalar path, and dims 1. Tolerance is relative to
    // the accumulated magnitude — float32 sums of n terms.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(1234)
    for (d <- Seq(1, 7, 15, 16, 17, 31, 33, 64, 100, 128, 257)) {
      val a = Array.fill(d)(rnd.nextFloat() * 4 - 2)
      val b = Array.fill(d)(rnd.nextFloat() * 4 - 2)
      val ad = new GenericArrayData(a.map(x => x: Any))
      val bd = new GenericArrayData(b.map(x => x: Any))
      val sosRef = a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      val dotRef = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val tol = 1e-4 * (1.0 + math.abs(sosRef) + math.abs(dotRef))
      assert(math.abs(graft.functions.VecKernels.sos(ad, bd) - sosRef) < tol, s"sos d=$d")
      assert(math.abs(graft.functions.VecKernels.dot(ad, bd) - dotRef) < tol, s"dot d=$d")
      val naRef = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nbRef = math.sqrt(b.map(x => x.toDouble * x).sum)
      val cosRef = 1.0 - dotRef / (naRef * nbRef)
      assert(math.abs(graft.functions.VecKernels.cosineDistance(ad, bd) - cosRef) < 1e-4,
        s"cosine d=$d")
      // u8 variants agree with the float kernels on byte-ranged data
      val qb = Array.fill(d)((rnd.nextInt(256)).toFloat)
      val vb = Array.fill(d)(rnd.nextInt(256))
      val qbd = new GenericArrayData(qb.map(x => x: Any))
      val vbytes = vb.map(x => (x & 0xFF).toByte)
      val vfd = new GenericArrayData(vb.map(x => x.toFloat: Any))
      assert(graft.functions.VecKernels.sosU8(qbd, vbytes, false) ===
        graft.functions.VecKernels.sos(qbd, vfd), s"sosU8 d=$d")
      assert(graft.functions.VecKernels.dotU8(qbd, vbytes, false) ===
        graft.functions.VecKernels.dot(qbd, vfd), s"dotU8 d=$d")
      assert(graft.functions.VecKernels.cosineDistanceU8(qbd, vbytes, false) ===
        graft.functions.VecKernels.cosineDistance(qbd, vfd), s"cosU8 d=$d")
    }
  }

  test("brute-force query-batch broadcast is size-gated (degrades to partitioned cross join)") {
    import spark.implicits._
    val db = (0L until 200L).map(i => (i, Array(i.toFloat, (i % 7).toFloat))).toDF("id", "vector")
    val q = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(50.0f, 3.0f))).toDF("qid", "qvec")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rank").select("qid", "rank", "id")
        .as[(Long, Int, Long)].collect().toSeq

    // under the gate (default 128 MB): the hinted broadcast NLJ stage
    val fast = Knn.bruteForce(db, q, 3)
    assert(fast.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val expected = run(fast)

    // past the gate the hint is withheld; with Spark's own auto-broadcast
    // also off (a 10⁶-row batch would exceed it anyway) the plan must be a
    // partitioned CartesianProduct — a completable shape for a query batch
    // no driver could broadcast — with identical results
    spark.conf.set(graft.Conf.MaxBroadcastBytesKey, "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = Knn.bruteForce(db, q, 3)
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("CartesianProduct"), plan)
      assert(run(gated) === expected)
    } finally {
      spark.conf.unset(graft.Conf.MaxBroadcastBytesKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
