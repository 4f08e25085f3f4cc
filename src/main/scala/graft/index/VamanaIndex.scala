package graft.index

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DistanceMetric, Knn}

/** Vamana / DiskANN-style graph kernels (reference:
  * src/include/index/vamana_index.h:321-410 build;
  * detail/graph/greedy_search.h:59-330 search;
  * robust_prune in vamana_index.h).
  *
  * Pure-Scala kernels operating on positional arrays; each SHARD's build
  * runs inside one executor task (the reference builds the whole index in
  * one DAG node — `ingest_vamana`, ingestion.py:2572-2595 — because
  * per-point inserts mutate the shared graph; sharding is our scale path:
  * k-means shards → independent per-shard builds → merged search).
  */
object VamanaKernels {

  @inline private def sos(a: Array[Float], b: Array[Float]): Float = {
    var s = 0.0f; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  def medoid(points: Array[Array[Float]]): Int = {
    val d = points(0).length
    val mean = new Array[Float](d)
    points.foreach { p => var i = 0; while (i < d) { mean(i) += p(i); i += 1 } }
    var i = 0
    while (i < d) { mean(i) /= points.length; i += 1 }
    var best = 0; var bestD = Float.MaxValue
    var j = 0
    while (j < points.length) {
      val dd = sos(points(j), mean)
      if (dd < bestD) { bestD = dd; best = j }
      j += 1
    }
    best
  }

  /** Best-first beam search with beam width L (reference:
    * greedy_search.h:59-330). Returns (topL sorted candidates, visited). */
  def greedySearch(
      points: Array[Array[Float]],
      adj: Array[Array[Int]],
      start: Int,
      q: Array[Float],
      L: Int): (Array[(Float, Int)], Array[Int]) =
    greedySearchF(points, i => adj(i), start, q, L)

  /** Accessor-based variant so the build can search over its mutable
    * adjacency without copying it per insert (the copy made builds
    * O(n^2 * R) and dominated bench time). */
  def greedySearchF(
      points: Array[Array[Float]],
      adj: Int => Iterable[Int],
      start: Int,
      q: Array[Float],
      L: Int): (Array[(Float, Int)], Array[Int]) = {
    val seen = new java.util.HashSet[Integer]()
    val visited = mutable.ArrayBuffer.empty[Int]
    // candidate frontier ordered by (dist, id)
    val frontier = new java.util.TreeSet[(Float, Int)](
      new java.util.Comparator[(Float, Int)] {
        override def compare(a: (Float, Int), b: (Float, Int)): Int = {
          val c = java.lang.Float.compare(a._1, b._1)
          if (c != 0) c else Integer.compare(a._2, b._2)
        }
      })
    val expanded = new java.util.HashSet[Integer]()
    frontier.add((sos(points(start), q), start))
    seen.add(start)
    var done = false
    while (!done) {
      // nearest unexpanded within the top-L frontier
      var next: (Float, Int) = null
      val it = frontier.iterator()
      var rank = 0
      while (next == null && it.hasNext && rank < L) {
        val c = it.next()
        if (!expanded.contains(c._2)) next = c
        rank += 1
      }
      if (next == null) done = true
      else {
        expanded.add(next._2)
        visited += next._2
        val it2 = adj(next._2).iterator
        while (it2.hasNext) {
          val nb = it2.next()
          if (!seen.contains(nb)) {
            seen.add(nb)
            frontier.add((sos(points(nb), q), nb))
            if (frontier.size() > 2 * L) frontier.pollLast()
          }
        }
        while (frontier.size() > 2 * L) frontier.pollLast()
      }
    }
    val top = frontier.iterator()
    val out = mutable.ArrayBuffer.empty[(Float, Int)]
    while (top.hasNext && out.size < L) out += top.next()
    (out.toArray, visited.toArray)
  }

  /** RobustPrune (reference: vamana_index.h robust_prune): greedily keep
    * nearest candidates, dropping any candidate occluded by a kept one
    * (alpha-slack triangle test). */
  def robustPrune(
      points: Array[Array[Float]],
      p: Int,
      candidates: Iterable[Int],
      alpha: Float,
      r: Int): Array[Int] = {
    val pool = candidates.filter(_ != p).toArray.distinct
      .map(c => (sos(points(c), points(p)), c)).sortBy(t => (t._1, t._2))
    val kept = mutable.ArrayBuffer.empty[Int]
    val alive = mutable.ArrayBuffer.empty[(Float, Int)] ++ pool
    while (alive.nonEmpty && kept.size < r) {
      val (dC, c) = alive.remove(0)
      kept += c
      // drop occluded: alpha * d(c, c') <= d(p, c')
      var i = alive.length - 1
      while (i >= 0) {
        val (dP, cp) = alive(i)
        if (alpha * sos(points(c), points(cp)) <= dP) alive.remove(i)
        i -= 1
      }
    }
    kept.toArray
  }

  /** Sequential Vamana build (reference: vamana_index.h:321-410): two
    * alpha passes of insert (greedy search from medoid → robust prune →
    * reverse edges with degree-capped re-prune). */
  def build(
      points: Array[Array[Float]],
      lBuild: Int,
      rMaxDegree: Int,
      alpha: Float = 1.2f): (Int, Array[Array[Int]]) = {
    val n = points.length
    val med = medoid(points)
    val adj = Array.fill(n)(mutable.LinkedHashSet.empty[Int])
    // initial ring so the graph is connected before the first pass
    var i = 0
    while (i < n) { if (i != med) adj(i) += med; i += 1 }

    for (pass <- 0 until 2) {
      val a = if (pass == 0) 1.0f else alpha
      var p = 0
      while (p < n) {
        if (p != med) {
          val (_, visited) = greedySearchF(points, i => adj(i), med, points(p), lBuild)
          val pruned = robustPrune(points, p, visited ++ adj(p), a, rMaxDegree)
          adj(p).clear(); adj(p) ++= pruned
          pruned.foreach { j =>
            adj(j) += p
            if (adj(j).size > rMaxDegree) {
              val rp = robustPrune(points, j, adj(j), a, rMaxDegree)
              adj(j).clear(); adj(j) ++= rp
            }
          }
        }
        p += 1
      }
    }
    (med, adj.map(_.toArray))
  }

  /** Per-shard beam search over (ids, points, adj) built from grouped rows:
    * returns (qid, external_id, sosScore) for the shard's top candidates. */
  def searchShard(
      rows: Array[(Long, Array[Float], Array[Long], Boolean)],
      queries: Array[(Long, Array[Float])],
      lSearch: Int,
      k: Int): Iterator[(Long, Long, Float)] = {
    if (rows.isEmpty) return Iterator.empty
    val ids = rows.map(_._1)
    val pos = ids.zipWithIndex.toMap
    val points = rows.map(_._2)
    val adj = rows.map(_._3.flatMap(l => pos.get(l)))
    val med = rows.indexWhere(_._4) match { case -1 => 0; case m => m }
    queries.iterator.flatMap { case (qid, qv) =>
      val (top, _) = greedySearchF(points, i => adj(i), med, qv, lSearch)
      top.take(k).map { case (score, p) => (qid, ids(p), score) }
    }
  }
}

/** VAMANA index (reference:
  * apis/python/src/tiledb/vector_search/vamana_index.py; C++
  * src/include/index/vamana_index.h). Defaults l_build=100,
  * r_max_degree=64, l_search=100 (vamana_index.py:30-32).
  *
  * Storage: `base/v=<ts>` partitioned by shard_id (external_id, vector),
  * `graph/v=<ts>` adjacency rows (shard_id, external_id, neighbors,
  * is_medoid), `shard_centroids/v=<ts>` when sharded. One shard = the
  * reference's single-node build; multiple shards = the 100 TB scale path
  * (independent per-shard builds, per-shard search tasks, global top-k
  * merge — each task holds one shard's graph only; queries broadcast).
  */
class VamanaIndex(spark: SparkSession, uri: String, meta: IndexMeta, ts: Long)
    extends VectorIndex(spark, uri, meta, ts) {

  override def baseVectors(): DataFrame =
    if (historyIdx < 0) new FlatIndex(spark, uri, meta, ts).baseVectors()
    else spark.read.parquet(s"$uri/base/v=$baseTimestamp")
      .select("external_id", "vector")

  /** Labeled alias for the reference's `l_search` query parameter
    * (vamana_index.py:30-32): the generic `query(..., nprobe)` third
    * argument doubles as l_search for graph indexes. */
  def queryLSearch(queries: DataFrame, k: Int, lSearch: Int): DataFrame =
    query(queries, k, nprobe = lSearch)

  override protected def queryBase(queries: DataFrame, k: Int, lSearch0: Int): DataFrame = {
    if (historyIdx < 0) {
      return Knn.bruteForce(baseVectors(), queries, k, metric,
        idCol = "external_id", vecCol = "vector")
    }
    val lSearch = math.max(if (lSearch0 <= 0) VamanaIndex.DefaultLSearch else lSearch0, k)

    import spark.implicits._
    val qn0 = queries.select(col("qid").cast("long").as("qid"),
      col("qvec").cast("array<float>").as("qvec"))
    val qn = metric match {
      case DistanceMetric.Cosine => qn0.select(col("qid"),
        graft.functions.vector_normalize(col("qvec")).as("qvec"))
      case _ => qn0
    }

    // per-shard search: one task per shard holds only that shard's graph.
    // Byte dtypes widen the packed base back to float for the in-task
    // kernels (distances on widened values = the asymmetric byte metric).
    val baseRaw = spark.read.parquet(s"$uri/base/v=$baseTimestamp")
    val baseFloat =
      if (meta.dtype == "uint8" || meta.dtype == "int8") {
        import org.apache.spark.sql.graftshim.{toColumn, toExpression}
        baseRaw.withColumn("vector",
          toColumn(graft.functions.UnpackBytes(toExpression(col("vector")),
            signed = meta.dtype == "int8")))
      } else baseRaw
    val graph = baseFloat
      .join(spark.read.parquet(s"$uri/graph/v=$baseTimestamp"),
        Seq("shard_id", "external_id"))
      .select(col("shard_id"), col("external_id"), col("vector"),
        col("neighbors"), col("is_medoid"))
      .as[(Int, Long, Array[Float], Array[Long], Boolean)]

    // Collect-free query path: replicate the query DataFrame once per shard
    // (the unavoidable fan-out of searching every shard) and cogroup with
    // the shard's graph — arbitrarily large query batches never touch the
    // driver. Only the shard-id list (one int per shard) is collected.
    val shardIds = spark.read.parquet(s"$uri/graph/v=$baseTimestamp")
      .select("shard_id").distinct().as[Int].collect().sorted.toSeq
    val qRep = qn.withColumn("shard_id", explode(typedlit(shardIds)))
      .select(col("shard_id"), col("qid"), col("qvec"))
      .as[(Int, Long, Array[Float])]

    val kLocal = k
    val lLocal = lSearch
    val perShard = graph
      .groupByKey(_._1)
      .cogroup(qRep.groupByKey(_._1)) { (_, git, qit) =>
        val qs = qit.map { case (_, qid, qv) => (qid, qv) }.toArray
        if (qs.isEmpty) Iterator.empty
        else {
          val rows = git.map { case (_, id, v, nbs, med) => (id, v, nbs, med) }.toArray
          VamanaKernels.searchShard(rows, qs, lLocal, kLocal)
        }
      }
      .toDF("qid", "id", "__sos")

    val m = metric
    val scored = perShard.select(col("qid").as("__qid"), col("id").as("__id"),
      col("__sos").as("__score"))
    val merged = Knn.topKFromScores(scored, k, DistanceMetric.SumOfSquares)
    merged.select(col("qid"), col("rank"), col("id"),
      VamanaIndex.reportDistance(m, col("distance")).as("distance"))
  }
}

object VamanaIndex {
  val DefaultLBuild = 100 // reference: vamana_index.py:30-32
  val DefaultRMaxDegree = 64
  val DefaultLSearch = 100

  /** Target vectors per shard for the default (auto) shard count. The
    * reference builds ONE global graph on one node (ingestion.py:2572-2595);
    * a sequential build of a large corpus inside a single executor task is
    * the scale-killer, so past this size the build defaults to the sharded
    * path (independent per-shard builds, merged search — recall gate
    * spec-tested). */
  val DefaultShardTarget = 25000

  /** Below this size a shard buys no build-time win but still costs query
    * fan-out (merged search visits every shard), so auto-sharding never
    * shrinks shards past it; sub-[[MinShardSize]] corpora build single-shard
    * (= exact reference behavior). */
  val MinShardSize = 500

  def autoShards(n: Long): Int = autoShards(n, 1)

  /** Shard count for an `n`-vector build on a cluster offering `parallelism`
    * task slots: enough shards to cap each at [[DefaultShardTarget]] (the
    * build is sequential WITHIN a shard — the scale constraint), and, when
    * slots are idle, enough to use them (the per-shard graph build is the
    * only single-threaded stage in an index build; leaving 31 of 32 slots
    * idle dominated bench build time). The recall audit in PERF.md shows
    * merged all-shard search holds recall 1.0 across every swept shard
    * count, so extra shards trade only query fan-out. */
  def autoShards(n: Long, parallelism: Int): Int = {
    val byTarget = math.ceil(n.toDouble / DefaultShardTarget).toInt
    val byParallel = math.min(parallelism.toLong, n / MinShardSize).toInt
    math.max(1, math.max(byTarget, byParallel))
  }

  /** Graph search scores in SOS over (possibly normalized) vectors; map to
    * the reported metric distance. */
  def reportDistance(m: DistanceMetric, sos: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = m match {
    case DistanceMetric.L2 => sqrt(sos.cast("double")).cast("float")
    case DistanceMetric.Cosine => (sos / 2.0f).cast("float") // normalized vectors
    case _ => sos.cast("float")
  }
}
