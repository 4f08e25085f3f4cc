package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.TopKHeap
import graft.text.{SimHash64, WinnowFingerprint}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants of the driver-side kernels (pure JVM — no
  * SparkSession needed, so these run in milliseconds). */
object KernelProperties extends Properties("graft.kernels") {

  private val entryGen: Gen[(Float, Long)] = for {
    s <- Gen.chooseNum(-1e6f, 1e6f)
    id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
  } yield (s, id)

  property("TopKHeap == sorted.take(k) under (score,id) order") =
    forAll(Gen.listOf(entryGen), Gen.chooseNum(1, 50)) { (xs, k) =>
      val h = new TopKHeap(k)
      xs.foreach { case (s, id) => h.insert(s, id) }
      val expected = xs.sortBy(t => (t._1, t._2)).take(k)
      h.sorted.toSeq == expected
    }

  property("TopKHeap merge == concatenated insert") =
    forAll(Gen.listOf(entryGen), Gen.listOf(entryGen), Gen.chooseNum(1, 20)) {
      (xs, ys, k) =>
        val a = new TopKHeap(k); xs.foreach { case (s, i) => a.insert(s, i) }
        val b = new TopKHeap(k); ys.foreach { case (s, i) => b.insert(s, i) }
        a.merge(b)
        val c = new TopKHeap(k); (xs ++ ys).foreach { case (s, i) => c.insert(s, i) }
        a.sorted.toSeq == c.sorted.toSeq
    }

  private def tokensArray(tokens: List[String]): ArrayData =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any])

  private val tokenGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  property("SimHash is token-order invariant") =
    forAll(Gen.nonEmptyListOf(tokenGen), Gen.long) { (tokens, seed) =>
      // permutation derives from a GENERATED seed so a failing case
      // replays exactly under ScalaCheck's reported seed (the global
      // Random would shuffle differently on every re-run)
      val e = SimHash64(BoundReference(0, ArrayType(StringType), nullable = false))
      val h1 = e.eval(InternalRow(tokensArray(tokens)))
      val h2 = e.eval(InternalRow(tokensArray(
        new scala.util.Random(seed).shuffle(tokens))))
      h1 == h2
    }

  property("Winnow fingerprints are deterministic and non-empty") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      val e = WinnowFingerprint(BoundReference(0, StringType, nullable = false))
      val f1 = e.eval(InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[GenericArrayData].array.toSeq
      val f2 = e.eval(InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[GenericArrayData].array.toSeq
      f1 == f2 && f1.nonEmpty
    }

  property("Winnow survives a suffix append (prefix windows unchanged)") =
    forAll(Gen.listOfN(40, Gen.alphaLowerChar).map(_.mkString),
      Gen.listOfN(10, Gen.alphaLowerChar).map(_.mkString)) { (base, suffix) =>
      val e = WinnowFingerprint(BoundReference(0, StringType, nullable = false))
      val f1 = e.eval(InternalRow(UTF8String.fromString(base)))
        .asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[Long]).toSet
      val f2 = e.eval(InternalRow(UTF8String.fromString(base + suffix)))
        .asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[Long]).toSet
      // appended text can only add fingerprints near the boundary; the vast
      // majority of the original set must survive
      f1.intersect(f2).size.toDouble >= f1.size * 0.6
    }

  property("ShingleSet3 equals the straightforward sliding-window reference") =
    forAll(Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")))) { toks =>
      val text = "  " + toks.mkString("  ") + " " // messy whitespace
      val e = graft.text.ShingleSet3(BoundReference(0, StringType, nullable = false))
      val got = e.eval(InternalRow(UTF8String.fromString(text)))
        .asInstanceOf[GenericArrayData].array.map(_.toString).toSeq
      val trimmed = text.trim
      val ref =
        if (trimmed.split("\\s+").length < 3) Seq(trimmed)
        else trimmed.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSeq.distinct
      got == ref
    }

  property("sos radius bounds are float-exact for every comparison shape") =
    forAll(Gen.chooseNum(0.0f, 2000.0f), Gen.chooseNum(0.0f, 4.0e6f)) { (r, sos) =>
      import graft.functions.SosBounds.{lowerBound, upperBound}
      val l2 = math.sqrt(sos.toDouble).toFloat // = EuclideanDistance's rounding
      // two INDEPENDENT claims (the > / >= forms are contrapositives of
      // these and can never fail separately)
      ((l2 <= r) == (sos <= upperBound(r))) &&
        ((l2 < r) == (sos < lowerBound(r)))
    }

  property("NearestCentroids.topN equals the naive (dist, idx) sort") =
    forAll(
      Gen.chooseNum(1, 4),
      Gen.chooseNum(1, 12),
      Gen.chooseNum(1, 14)) { (dims, nCentroids, n) =>
      val rnd = new scala.util.Random(dims * 1000 + nCentroids * 37 + n)
      val centroids = Array.fill(nCentroids)(Array.fill(dims)(rnd.nextFloat() * 4 - 2))
      val v = Array.fill(dims)(rnd.nextFloat() * 4 - 2)
      val flat = centroids.flatten
      val got = graft.functions.NearestCentroids
        .topN(new GenericArrayData(v.map(_.asInstanceOf[Any])),
          flat, nCentroids, dims, n).toSeq
      val naive = centroids.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (a, b) => val d = a - b; d * d }.sum, i)
      }.sortBy { case (d, i) => (d, i) }.take(math.min(n, nCentroids)).map(_._2).toSeq
      got == naive
    }

  property("PackBytes/UnpackBytes round-trip in-range values (both dtypes)") =
    forAll(Gen.oneOf(true, false),
      Gen.nonEmptyListOf(Gen.chooseNum(0, 255))) { (signed, raw) =>
      val vals = raw.map(x => (if (signed) x - 128 else x).toFloat)
      val pack = graft.functions.PackBytes(
        BoundReference(0, ArrayType(org.apache.spark.sql.types.FloatType),
          nullable = false), signed)
      val packed = pack.eval(InternalRow(
        new GenericArrayData(vals.map(_.asInstanceOf[Any]).toArray)))
      val unpack = graft.functions.UnpackBytes(
        BoundReference(0, org.apache.spark.sql.types.BinaryType,
          nullable = false), signed)
      val back = unpack.eval(InternalRow(packed))
        .asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[Float]).toSeq
      back == vals
    }

  property("ScatterDense places non-zeros and zero-fills the rest") =
    forAll(Gen.chooseNum(1, 16), Gen.listOf(Gen.zip(
      Gen.chooseNum(-2, 20), Gen.chooseNum(-5.0f, 5.0f)))) { (dims, entries) =>
      val e = graft.functions.ScatterDense(
        BoundReference(0, ArrayType(org.apache.spark.sql.types.IntegerType), nullable = false),
        BoundReference(1, ArrayType(org.apache.spark.sql.types.FloatType), nullable = false),
        dims)
      val got = e.eval(InternalRow(
          new GenericArrayData(entries.map(_._1.asInstanceOf[Any]).toArray),
          new GenericArrayData(entries.map(_._2.asInstanceOf[Any]).toArray)))
        .asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[Float]).toSeq
      val ref = {
        val a = Array.fill(dims)(0.0f)
        entries.foreach { case (i, v) => if (i >= 0 && i < dims) a(i) = v }
        a.toSeq
      }
      got == ref
    }

  // unicode-heavy text gen: ascii, umlauts, CJK, and astral-plane emoji
  // (surrogate pairs — the case where byte/char/codepoint indexing diverge)
  private val uniCharGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\n", "ä", "Ö", "ß", "é", "日", "本", "語"),
    1 -> Gen.oneOf("😀", "🤖", "𐀀"))
  private val uniStrGen: Gen[String] = Gen.listOf(uniCharGen).map(_.mkString)

  property("CharTrigramCounts == sliding-trigram multiset on unicode text") =
    forAll(uniStrGen) { s =>
      val e = graft.text.CharTrigramCounts(
        BoundReference(0, StringType, nullable = false))
      val got = e.eval(InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[ArrayData]
      val gotMap = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2)
        r.getUTF8String(0).toString -> r.getLong(1)
      }.toMap
      // reference: the same lower/substringSQL kernels trigramArray pins,
      // counted naively
      val t = UTF8String.fromString(s).toLowerCase
      val n = t.numChars()
      val expected = (1 to math.max(0, n - 2))
        .map(i => t.substringSQL(i, 3).toString)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      gotMap == expected &&
        (0 until got.numElements()).map(i => got.getStruct(i, 2).getLong(1)).sum ==
          math.max(0, n - 2)
    }

  property("fnvBytes == independent BigInt mod-2^64 reference") =
    forAll(Gen.chooseNum(0, 255), Gen.chooseNum(0, 300)) { (seed, len) =>
      val M = BigInt(1) << 64
      val P = BigInt("100000001b3", 16)
      var h = (BigInt("cbf29ce484222325", 16) ^ BigInt(seed)).mod(M)
      val expected = (0 until len).map { j =>
        h = ((h ^ BigInt(j & 0xff)) * P).mod(M)
        ((h >> 24) & 0xff).toByte
      }
      graft.multimodal.Multimodal.fnvBytes(seed, len).toSeq == expected
    }

  property("CenteredDot eval == strict left-fold double reference") =
    forAll(Gen.chooseNum(0, 64).flatMap { n =>
      Gen.zip(
        Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3)),
        Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3)),
        Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3)))
    }) { case (x, m, c) =>
      val e = graft.functions.CenteredDot(
        BoundReference(0, ArrayType(org.apache.spark.sql.types.DoubleType), nullable = false),
        BoundReference(1, ArrayType(org.apache.spark.sql.types.DoubleType), nullable = false),
        BoundReference(2, ArrayType(org.apache.spark.sql.types.DoubleType), nullable = false))
      val got = e.eval(InternalRow(
        new GenericArrayData(x.map(_.asInstanceOf[Any]).toArray),
        new GenericArrayData(m.map(_.asInstanceOf[Any]).toArray),
        new GenericArrayData(c.map(_.asInstanceOf[Any]).toArray))).asInstanceOf[Double]
      var s = 0.0
      var i = 0
      while (i < x.length) { s += (x(i) - m(i)) * c(i); i += 1 }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(s)
    }

  private val floatVecGen: Gen[List[Float]] =
    Gen.chooseNum(0, 130).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-1e3f, 1e3f), Gen.oneOf(0.0f, -0.0f))))

  property("signPack sets bit (i%64) of word (i/64) iff v(i) >= 0") =
    forAll(floatVecGen) { v =>
      val packed = graft.functions.VecKernels.signPack(
        new GenericArrayData(v.map(_.asInstanceOf[Any]).toArray))
      val words = packed.toLongArray()
      words.length == (v.length + 63) / 64 &&
        v.indices.forall { i =>
          (((words(i >>> 6) >>> (i & 63)) & 1L) == 1L) == (v(i) >= 0.0f)
        }
    }

  property("hamming == naive sign-mismatch count, symmetric, zero on self") =
    forAll(Gen.chooseNum(0, 130).flatMap(n =>
      Gen.zip(Gen.listOfN(n, Gen.chooseNum(-1e3f, 1e3f)),
        Gen.listOfN(n, Gen.chooseNum(-1e3f, 1e3f))))) { case (a, b) =>
      def pack(v: List[Float]) = graft.functions.VecKernels.signPack(
        new GenericArrayData(v.map(_.asInstanceOf[Any]).toArray))
      val (pa, pb) = (pack(a), pack(b))
      val got = graft.functions.VecKernels.hamming(pa, pb)
      val naive = a.zip(b).count { case (x, y) => (x >= 0) != (y >= 0) }
      got == naive &&
        graft.functions.VecKernels.hamming(pb, pa) == got &&
        graft.functions.VecKernels.hamming(pa, pa) == 0
    }

  private val asciiTextGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const(' '), Gen.alphaUpperChar))
      .map(_.mkString)

  property("BigramBucketCounts sums to max(tokens-1, 0) with buckets in range") =
    forAll(asciiTextGen, Gen.oneOf(16, 64, 4096)) { (text, m) =>
      val e = graft.text.BigramBucketCounts(
        BoundReference(0, StringType, nullable = false), m)
      val out = e.eval(InternalRow(UTF8String.fromString(text)))
        .asInstanceOf[ArrayData]
      val rows = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val expectTotal = math.max(toks.length - 1, 0)
      rows.map(_._2).sum == expectTotal &&
        rows.forall { case (b, c) => b >= 0 && b < m && c > 0 } &&
        rows.map(_._1).distinct.length == rows.length
    }

  private val pairedFloatVecsGen: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(0, 200)
    a <- Gen.containerOfN[Array, Float](n, Gen.chooseNum(-100.0f, 100.0f))
    b <- Gen.containerOfN[Array, Float](n, Gen.chooseNum(-100.0f, 100.0f))
  } yield (a, b)

  property("dotStrict == independent left-to-right double fold, and is symmetric") =
    forAll(pairedFloatVecsGen) { case (a, b) =>
      def ad(x: Array[Float]) = new GenericArrayData(x.map(_.asInstanceOf[Any]))
      val got = graft.functions.VecKernels.dotStrict(ad(a), ad(b))
      var want = 0.0
      var i = 0
      while (i < a.length) { want += a(i).toDouble * b(i).toDouble; i += 1 }
      // bit equality on BOTH checks: the sequential double fold IS the
      // value-pinned oracle contract (MaxSim floor-micro scores), and
      // per-element commutativity makes the fold exactly symmetric
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want) &&
        java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(
          graft.functions.VecKernels.dotStrict(ad(b), ad(a)))
    }

  property("WordPieceCounts covers every substring <= maxLen exactly once per occurrence") =
    forAll(asciiTextGen, Gen.chooseNum(1, 6)) { (text, maxLen) =>
      val e = graft.text.WordPieceCounts(
        BoundReference(0, StringType, nullable = false), maxLen)
      val out = e.eval(InternalRow(UTF8String.fromString(text)))
        .asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getUTF8String(0).toString, r.getLong(1))
      }.toMap
      val naive = scala.collection.mutable.Map.empty[String, Long]
      for {
        w <- text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        i <- 0 until w.length
        l <- 1 to math.min(maxLen, w.length - i)
      } {
        val p = (if (i == 0) "" else "##") + w.substring(i, i + l)
        naive(p) = naive.getOrElse(p, 0L) + 1L
      }
      got == naive.toMap
    }

  property("PqDistanceTable plain-array twin is bit-identical to the ArrayData form") =
    forAll(
      Gen.chooseNum(1, 4),  // subspaces
      Gen.chooseNum(1, 5),  // subDim
      Gen.chooseNum(1, 6)   // codes per subspace
    ) { (m, subDim, codes) =>
      val rnd = new scala.util.Random(m * 611 + subDim * 31 + codes)
      val q = Array.fill(m * subDim)(rnd.nextFloat() * 4 - 2)
      val cb = Array.fill(m * codes * subDim)(rnd.nextFloat() * 4 - 2)
      val viaArrayData = graft.functions.PqDistanceTable
        .table(new GenericArrayData(q.map(_.asInstanceOf[Any])), cb, m, codes, subDim)
      val viaPlain = graft.functions.PqDistanceTable.table(q, cb, m, codes, subDim)
      // bit-identical, not approximately equal: the VAMANA PQ walk builds
      // tables with the plain twin and must score like the expression path
      viaArrayData.toSeq.map(java.lang.Float.floatToRawIntBits) ==
        viaPlain.toSeq.map(java.lang.Float.floatToRawIntBits)
    }
}
