package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap of (score, id) pairs, keeping the k SMALLEST scores.
  *
  * This is the Spark-native equivalent of the reference's
  * `fixed_min_pair_heap` (reference: src/include/detail/flat/qv.h:213 usage;
  * exported at apis/python/src/tiledb/vector_search/module.cc:544) plus its
  * partial/final merge `consolidate_scores` (reference:
  * src/include/scoring.h:553-573): as a `TypedImperativeAggregate` it
  * participates in Spark's two-phase (partial → final) aggregation, so each
  * map task keeps one k-bounded heap per group and only k entries per
  * (group, partition) cross the shuffle — no global sort, no O(n) rows
  * shuffled. Ties break on smaller id for determinism.
  *
  * Internal layout: a binary MAX-heap over the kept entries, so the worst
  * kept entry is at the root and insertion is O(log k) with O(1) rejection.
  */
final class TopKHeap(val k: Int) extends Serializable {
  var size: Int = 0
  // Grow lazily toward k: large k (e.g. rerank candidate sets) must not
  // preallocate k slots per group up front.
  var scores: Array[Float] = new Array[Float](math.min(k, 16))
  var ids: Array[Long] = new Array[Long](math.min(k, 16))

  private def ensureCapacity(): Unit =
    if (size == scores.length && size < k) {
      val cap = math.min(k.toLong, scores.length * 2L).toInt
      scores = java.util.Arrays.copyOf(scores, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

  // (s1,id1) "worse than" (s2,id2): larger score, or equal score and larger id.
  @inline private def worse(s1: Float, id1: Long, s2: Float, id2: Long): Boolean =
    s1 > s2 || (s1 == s2 && id1 > id2)

  def insert(score: Float, id: Long): Unit = {
    if (size < k) {
      ensureCapacity()
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      // sift up
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); scores(i) = scores(p); scores(p) = ts
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        } else i = 0
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val ts = scores(i); scores(i) = scores(m); scores(m) = ts
          val ti = ids(i); ids(i) = ids(m); ids(m) = ti
          i = m
        }
      }
    }
  }

  def merge(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries sorted ascending by (score, id). */
  def sorted: Array[(Float, Long)] = {
    val out = new Array[(Float, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[(Float, Long)] {
      override def compare(a: (Float, Long), b: (Float, Long)): Int = {
        val c = java.lang.Float.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    out
  }
}

/** Aggregate: `min_topk(score, id, k)` → array<struct<id:long, score:float>>
  * sorted ascending by (score, id). See [[TopKHeap]]. */
case class MinTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"min_topk: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType == FloatType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_topk requires (float, bigint) arguments, got " +
        s"${score.dataType.catalogString} and ${id.dataType.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = MinTopK.resultType
  override def prettyName: String = "min_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Float], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = { buf.merge(other); buf }

  override def eval(buf: TopKHeap): Any = {
    val entries = buf.sorted
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = InternalRow(entries(i)._2, entries(i)._1)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 12)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putFloat(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt(); val n = bb.getInt()
    val h = new TopKHeap(kk)
    if (n > h.scores.length) {
      h.scores = new Array[Float](n)
      h.ids = new Array[Long](n)
    }
    var i = 0
    while (i < n) {
      val s = bb.getFloat(); val id = bb.getLong()
      h.scores(i) = s; h.ids(i) = id; i += 1
    }
    h.size = n
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinTopK =
    copy(score = newChildren(0), id = newChildren(1))
}

object MinTopK {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", FloatType, nullable = false))),
    containsNull = false)
}

/** [[TopKHeap]] with exact LONG scores, for integer-contract rankings
  * (BM25 micro-scores exceed float's 24-bit mantissa, where a float heap
  * would collapse distinct scores into ties and diverge from an oracle
  * that sums exact integers). Same max-heap layout and (score, id)
  * tie-break. */
final class LongTopKHeap(val k: Int) extends Serializable {
  var size: Int = 0
  var scores: Array[Long] = new Array[Long](math.min(k, 16))
  var ids: Array[Long] = new Array[Long](math.min(k, 16))

  private def ensureCapacity(): Unit =
    if (size == scores.length && size < k) {
      val cap = math.min(k.toLong, scores.length * 2L).toInt
      scores = java.util.Arrays.copyOf(scores, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

  @inline private def worse(s1: Long, id1: Long, s2: Long, id2: Long): Boolean =
    s1 > s2 || (s1 == s2 && id1 > id2)

  def insert(score: Long, id: Long): Unit = {
    if (size < k) {
      ensureCapacity()
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); scores(i) = scores(p); scores(p) = ts
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        } else i = 0
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val ts = scores(i); scores(i) = scores(m); scores(m) = ts
          val ti = ids(i); ids(i) = ids(m); ids(m) = ti
          i = m
        }
      }
    }
  }

  def merge(other: LongTopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries sorted ascending by (score, id). */
  def sorted: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    out
  }
}

/** Aggregate: `min_topk_long(score, id, k)` →
  * array<struct<id:long, score:long>> sorted ascending by (score, id).
  * The exact-integer sibling of [[MinTopK]] — same partial→final merge
  * shape, so only k rows per (group, input partition) cross the shuffle. */
case class MinTopKLong(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongTopKHeap] {

  require(k > 0, s"min_topk_long: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType == LongType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_topk_long requires (bigint, bigint) arguments, got " +
        s"${score.dataType.catalogString} and ${id.dataType.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = MinTopKLong.resultType
  override def prettyName: String = "min_topk_long"

  override def createAggregationBuffer(): LongTopKHeap = new LongTopKHeap(k)

  override def update(buf: LongTopKHeap, input: InternalRow): LongTopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: LongTopKHeap, other: LongTopKHeap): LongTopKHeap = {
    buf.merge(other); buf
  }

  override def eval(buf: LongTopKHeap): Any = {
    val entries = buf.sorted
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = InternalRow(entries(i)._2, entries(i)._1)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: LongTopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongTopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt(); val n = bb.getInt()
    val h = new LongTopKHeap(kk)
    if (n > h.scores.length) {
      h.scores = new Array[Long](n)
      h.ids = new Array[Long](n)
    }
    var i = 0
    while (i < n) {
      val s = bb.getLong(); val id = bb.getLong()
      h.scores(i) = s; h.ids(i) = id; i += 1
    }
    h.size = n
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinTopKLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinTopKLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinTopKLong =
    copy(score = newChildren(0), id = newChildren(1))
}

object MinTopKLong {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", LongType, nullable = false))),
    containsNull = false)
}
