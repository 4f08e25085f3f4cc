package graft.index

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

/** Driver-local k-means over a bounded, already-sampled training set.
  *
  * The reference trains k-means CENTRALLY over an in-memory sample whenever
  * the sample fits (ingestion.py:1343-1365 `centralised_kmeans`, sklearn on
  * the driver) and falls back to hand-distributed Lloyd iterations past that
  * (ingestion.py:1447-1580). This is the Spark re-expression of the same
  * dispatch: [[Ingest.trainCentroidsOnSample]] collects the (size-capped,
  * seeded) sample and runs this trainer when the sample is under
  * `spark.graft.maxLocalTrainBytes`, and keeps MLlib's distributed
  * k-means for samples past the gate. On a single node the two do the same
  * floating-point work — but an MLlib fit schedules dozens of tiny jobs
  * (k-means|| init rounds + one per Lloyd iteration), pure overhead when the
  * sample is thousands of rows; index builds at bench scale were dominated
  * by it.
  *
  * Determinism: seeded k-means++ init, fixed chunk boundaries, and per-chunk
  * partial sums combined in chunk order — identical centroids for identical
  * input order, matching the build-reproducibility the seeded distributed
  * sample already provides.
  *
  * Empty clusters are re-seeded from the points farthest from their assigned
  * centroids — one DISTINCT point per empty slot, distance-descending with
  * index tie-break — the reference's `train_no_init` reassignment
  * (index/kmeans.h:229-360). Inputs with fewer than k distinct points can
  * still yield duplicate centers; callers needing a hard exactly-k-distinct
  * invariant run [[Ingest]]'s fixup pass on the result.
  */
object LocalKMeans {

  /** Best-of-`nInit` restarts (lowest inertia wins — the sklearn
    * `n_init` behavior of the reference's centralised path), each a seeded
    * k-means++ init + Lloyd loop with early convergence stop. `nInit <= 0`
    * picks restarts adaptively from a flop budget, so small samples get the
    * full quality treatment and gate-sized ones stay at one restart.
    *
    * @return exactly min(k, n) centroids (k when n >= k) */
  def fit(points: Array[Array[Float]], k: Int, maxIter: Int = 15,
      seed: Long = 42L, nInit: Int = 0): Array[Array[Float]] = {
    val n = points.length
    if (n == 0) return Array.empty
    val kEff = math.min(k, n)
    val dims = math.max(1, if (n > 0) points(0).length else 1)
    val restarts =
      if (nInit > 0) nInit
      else {
        val flopsPerRun = n.toDouble * kEff * dims * maxIter
        math.max(1, math.min(3, (2e10 / math.max(1.0, flopsPerRun)).toInt))
      }
    var best: Array[Array[Float]] = null
    var bestInertia = Double.MaxValue
    var r = 0
    while (r < restarts) {
      val (centers, inertia) = fitOnce(points, kEff, maxIter, seed + 1000L * r)
      // `best == null` guard: NaN/Inf input coordinates make every restart's
      // inertia NaN and every comparison false — the first restart must
      // still be kept so callers get centroids (whose NaN coordinates the
      // fixup pass then rejects loudly) instead of a null
      if (best == null || inertia < bestInertia) { bestInertia = inertia; best = centers }
      r += 1
    }
    best
  }

  private def fitOnce(points: Array[Array[Float]], kEff: Int, maxIter: Int,
      seed: Long): (Array[Array[Float]], Double) = {
    val n = points.length
    val dims = points(0).length
    val centers = initPlusPlus(points, kEff, seed)
    val assign = new Array[Int](n)
    java.util.Arrays.fill(assign, -1)

    val chunks = chunkRanges(n)
    var iter = 0
    var inertia = 0.0
    var converged = false
    while (iter < maxIter && !converged) {
      // assignment: parallel over fixed chunks; per-chunk (moved, inertia)
      val stats = awaitAll(chunks.map { case (lo, hi) => Future {
        var moved = 0L
        var localInertia = 0.0
        var i = lo
        while (i < hi) {
          val c = nearest(points(i), centers)
          localInertia += sqDist(points(i), centers(c))
          if (c != assign(i)) { moved += 1; assign(i) = c }
          i += 1
        }
        (moved, localInertia)
      }})
      inertia = stats.map(_._2).sum
      converged = stats.map(_._1).sum == 0L
      // update (skipped once assignments stop moving — the means are
      // already fixed-point): per-chunk partial (sum, count), combined in
      // chunk order so float accumulation order is deterministic
      val partials = if (converged) Seq.empty else awaitAll(chunks.map { case (lo, hi) => Future {
        val sums = Array.ofDim[Double](kEff, dims)
        val cnts = new Array[Long](kEff)
        var i = lo
        while (i < hi) {
          val c = assign(i); val p = points(i)
          val s = sums(c)
          var d = 0
          while (d < dims) { s(d) += p(d); d += 1 }
          cnts(c) += 1
          i += 1
        }
        (sums, cnts)
      }})
      val sums = Array.ofDim[Double](kEff, dims)
      val cnts = new Array[Long](kEff)
      partials.foreach { case (ps, pc) =>
        var c = 0
        while (c < kEff) {
          val s = sums(c); val p = ps(c)
          var d = 0
          while (d < dims) { s(d) += p(d); d += 1 }
          cnts(c) += pc(c)
          c += 1
        }
      }
      val empties = scala.collection.mutable.ArrayBuffer[Int]()
      var c = 0
      while (c < kEff && !converged) {
        if (cnts(c) > 0) {
          var d = 0
          while (d < dims) { centers(c)(d) = (sums(c)(d) / cnts(c)).toFloat; d += 1 }
        } else empties += c
        c += 1
      }
      // empty clusters: reseed from the globally-farthest points, each empty
      // slot taking a DISTINCT point (reference kmeans.h:229-360 reassigns
      // from its high_scores heap the same way) — reseeding them all at one
      // argmax would leave duplicate centers when several empty at once
      if (empties.nonEmpty && !converged) {
        val far = farthestPoints(points, centers, assign, empties.length)
        var e = 0
        while (e < empties.length && e < far.length) {
          centers(empties(e)) = points(far(e)).clone()
          e += 1
        }
      }
      iter += 1
    }
    // The loop can exit at maxIter right after an update step, leaving
    // `inertia` measured against the PRE-update centers; re-measure against
    // the final ones so best-of-n restart selection compares like-for-like.
    if (!converged) {
      inertia = awaitAll(chunks.map { case (lo, hi) => Future {
        var s = 0.0
        var i = lo
        while (i < hi) { s += sqDist(points(i), centers(nearest(points(i), centers))); i += 1 }
        s
      }}).sum
    }
    (centers, inertia)
  }

  /** Seeded k-means++: first center = seeded pick, each next sampled with
    * probability proportional to D²(x) (Arthur & Vassilvitskii 2007). minDist
    * is maintained incrementally, so init is O(n·k·dims) with the distance
    * updates parallel over chunks. */
  private def initPlusPlus(points: Array[Array[Float]], k: Int, seed: Long)
      : Array[Array[Float]] = {
    val n = points.length
    val rnd = new java.util.Random(seed)
    val centers = new Array[Array[Float]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val minD = new Array[Double](n)
    java.util.Arrays.fill(minD, Double.MaxValue)
    val chunks = chunkRanges(n)
    var c = 0
    while (c < k - 1) {
      val added = centers(c)
      awaitAll(chunks.map { case (lo, hi) => Future {
        var i = lo
        while (i < hi) {
          val d = sqDist(points(i), added)
          if (d < minD(i)) minD(i) = d
          i += 1
        }
      }})
      var total = 0.0
      var i = 0
      while (i < n) { total += minD(i); i += 1 }
      val next =
        if (total <= 0.0) rnd.nextInt(n) // all points identical to centers
        else {
          val target = rnd.nextDouble() * total
          var acc = 0.0; var j = 0
          while (j < n - 1 && acc + minD(j) < target) { acc += minD(j); j += 1 }
          j
        }
      centers(c + 1) = points(next).clone()
      c += 1
    }
    centers
  }

  /** Indices of the `m` points farthest from their assigned centers,
    * distance descending with index tie-break (deterministic). */
  private def farthestPoints(points: Array[Array[Float]],
      centers: Array[Array[Float]], assign: Array[Int], m: Int): Array[Int] = {
    val scored = new Array[Double](points.length)
    var i = 0
    while (i < points.length) {
      scored(i) = sqDist(points(i), centers(assign(i)))
      i += 1
    }
    points.indices.sortBy(i => (-scored(i), i)).take(m).toArray
  }

  private def nearest(p: Array[Float], centers: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val d = sqDist(p, centers(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var d = 0
    while (d < a.length) { val x = a(d) - b(d); s += x * x; d += 1 }
    s
  }

  /** FIXED chunk size, not core-count-derived: the chunk boundaries decide
    * the float-accumulation groupings, so tying them to
    * availableProcessors would make "identical centroids for identical
    * input" hold only between machines with the same core count (a
    * consolidation run on a different driver would rebuild with subtly
    * different centroids). 2048-row chunks keep every realistic sample
    * wide enough to saturate the thread pool. */
  private val ChunkRows = 2048

  private def chunkRanges(n: Int): Seq[(Int, Int)] =
    (0 until n by ChunkRows).map(lo => (lo, math.min(n, lo + ChunkRows)))

  private def awaitAll[T](fs: Seq[Future[T]]): Seq[T] =
    fs.map(f => Await.result(f, Duration.Inf))
}
