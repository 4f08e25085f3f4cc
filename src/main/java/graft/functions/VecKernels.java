package graft.functions;

import org.apache.spark.sql.catalyst.util.ArrayData;

/**
 * Module-free dispatcher for the float-vector distance kernels: uses the
 * Panama Vector API ({@link VecSimd}) when the JVM was started with
 * {@code --add-modules jdk.incubator.vector} (build.sbt adds it to every
 * forked run; on a cluster put it in spark.executor.extraJavaOptions), and
 * the plain scalar loops otherwise. {@code -Dgraft.simd=false} forces the
 * scalar path. Both the interpreted eval and the generated code of the
 * distance Expressions call these entry points, so the two execution modes
 * of one plan agree bit-for-bit WITHIN a JVM. Detection is per-JVM; to pin
 * ONE mode across a heterogeneous cluster set the {@code spark.graft.simd}
 * session conf (graft.functions.Simd.sync pushes it to every executor and
 * warns when driver/executor detection disagrees) — a SIMD driver beside
 * scalar executors computes near-tie distances with different rounding,
 * which can reorder tie-boundary results between the local-serving and
 * distributed paths.
 *
 * SIMD engages above a dimension floor: below it the float[] copy out of
 * ArrayData costs more than the lanes save.
 */
public final class VecKernels {
  private VecKernels() {}

  /** Minimum vector length for the SIMD path. */
  static final int SIMD_MIN_DIMS = 16;

  /** Whether this JVM CAN run the Panama kernels (module present and the
   * probe multiply checked out). Immutable per-JVM detection. */
  public static final boolean SIMD_SUPPORTED;

  /** Whether the Panama kernels are IN USE. Starts at {@link #SIMD_SUPPORTED}
   * (minus the {@code -Dgraft.simd=false} property override) and is
   * re-settable at runtime via {@link #setSimdEnabled} so the
   * {@code spark.graft.simd} session conf can force one mode across a
   * cluster (see graft.functions.Simd.sync) — volatile so a force applied by a
   * sync task is visible to every later task thread in the executor. */
  private static volatile boolean simdEnabled;

  static {
    boolean ok = false;
    try {
      // force-link VecSimd (and through it the incubator module); throws
      // NoClassDefFoundError when the module is absent
      float probe = VecSimd.sos(new float[] {1f, 2f}, new float[] {0f, 0f});
      ok = probe == 5f;
    } catch (Throwable t) {
      ok = false;
    }
    SIMD_SUPPORTED = ok;
    simdEnabled =
        ok && !"false".equalsIgnoreCase(System.getProperty("graft.simd", "true"));
  }

  public static boolean simdEnabled() {
    return simdEnabled;
  }

  /** Force the kernel mode for this JVM; enabling on a JVM without the
   * incubator module is a named error, not a silent scalar fallback (the
   * caller asked for cross-cluster bit-agreement and cannot have it). */
  public static void setSimdEnabled(boolean on) {
    if (on && !SIMD_SUPPORTED) {
      throw new IllegalStateException(
          "graft: spark.graft.simd=true but jdk.incubator.vector is not usable in"
              + " this JVM (start it with --add-modules jdk.incubator.vector)");
    }
    simdEnabled = on;
  }

  private static void checkDims(int an, int bn) {
    if (an != bn) {
      throw new IllegalArgumentException(
          "graft: vector dimension mismatch: " + an + " vs " + bn);
    }
  }

  public static float sos(ArrayData a, ArrayData b) {
    int n = a.numElements();
    checkDims(n, b.numElements());
    if (simdEnabled && n >= SIMD_MIN_DIMS) {
      return VecSimd.sos(a.toFloatArray(), b.toFloatArray());
    }
    float s = 0.0f;
    for (int i = 0; i < n; i++) {
      float d = a.getFloat(i) - b.getFloat(i);
      s += d * d;
    }
    return s;
  }

  public static float l2(ArrayData a, ArrayData b) {
    return (float) Math.sqrt((double) sos(a, b));
  }

  /**
   * Strict dot product over float vectors: each element widened exactly to
   * double, accumulated left-to-right in double. NO SIMD variant on
   * purpose — the sequential double fold is the bit-replayable contract
   * (same discipline as {@link #centeredDot}), so a value-pinned oracle
   * (e.g. MaxSim's floor-micro scores) reproduces it in any engine that
   * folds doubles in list order. Use {@link #dot} where only ORDERING is
   * compared.
   */
  public static double dotStrict(ArrayData a, ArrayData b) {
    int n = a.numElements();
    checkDims(n, b.numElements());
    double s = 0.0;
    for (int i = 0; i < n; i++) {
      s += (double) a.getFloat(i) * (double) b.getFloat(i);
    }
    return s;
  }

  public static float dot(ArrayData a, ArrayData b) {
    int n = a.numElements();
    checkDims(n, b.numElements());
    if (simdEnabled && n >= SIMD_MIN_DIMS) {
      return VecSimd.dot(a.toFloatArray(), b.toFloatArray());
    }
    float s = 0.0f;
    for (int i = 0; i < n; i++) {
      s += a.getFloat(i) * b.getFloat(i);
    }
    return s;
  }

  // ----- asymmetric float-query × byte-packed kernels (uint8/int8 dtypes;
  // reference detail/scoring has the same u8 AVX family). The byte side is
  // widened once into a float[] (one memory-bound pass) and the multiply-
  // add runs in the float lanes — the widen is not worth lane gymnastics
  // across byte/float species shapes. -----

  private static float[] widen(byte[] v, boolean signed) {
    float[] out = new float[v.length];
    if (signed) {
      for (int i = 0; i < v.length; i++) {
        out[i] = v[i];
      }
    } else {
      for (int i = 0; i < v.length; i++) {
        out[i] = v[i] & 0xFF;
      }
    }
    return out;
  }

  public static float sosU8(ArrayData q, byte[] v, boolean signed) {
    int n = q.numElements();
    checkDims(n, v.length);
    if (simdEnabled && n >= SIMD_MIN_DIMS) {
      return VecSimd.sos(q.toFloatArray(), widen(v, signed));
    }
    float s = 0.0f;
    for (int i = 0; i < n; i++) {
      float d = q.getFloat(i) - (signed ? v[i] : (v[i] & 0xFF));
      s += d * d;
    }
    return s;
  }

  public static float dotU8(ArrayData q, byte[] v, boolean signed) {
    int n = q.numElements();
    checkDims(n, v.length);
    if (simdEnabled && n >= SIMD_MIN_DIMS) {
      return VecSimd.dot(q.toFloatArray(), widen(v, signed));
    }
    float s = 0.0f;
    for (int i = 0; i < n; i++) {
      s += q.getFloat(i) * (signed ? v[i] : (v[i] & 0xFF));
    }
    return s;
  }

  public static float cosineDistanceU8(ArrayData q, byte[] v, boolean signed) {
    int n = q.numElements();
    checkDims(n, v.length);
    float dot;
    float nq;
    float nv;
    if (simdEnabled && n >= SIMD_MIN_DIMS) {
      float[] parts = new float[3];
      VecSimd.cosineParts(q.toFloatArray(), widen(v, signed), parts);
      dot = parts[0];
      nq = parts[1];
      nv = parts[2];
    } else {
      dot = 0.0f;
      nq = 0.0f;
      nv = 0.0f;
      for (int i = 0; i < n; i++) {
        float x = q.getFloat(i);
        float y = signed ? v[i] : (v[i] & 0xFF);
        dot += x * y;
        nq += x * x;
        nv += y * y;
      }
    }
    float den = (float) Math.sqrt((double) nq) * (float) Math.sqrt((double) nv);
    return den == 0.0f ? 1.0f : 1.0f - dot / den;
  }

  public static float cosineDistance(ArrayData a, ArrayData b) {
    int n = a.numElements();
    checkDims(n, b.numElements());
    float dot;
    float na;
    float nb;
    if (simdEnabled && n >= SIMD_MIN_DIMS) {
      float[] parts = new float[3];
      VecSimd.cosineParts(a.toFloatArray(), b.toFloatArray(), parts);
      dot = parts[0];
      na = parts[1];
      nb = parts[2];
    } else {
      dot = 0.0f;
      na = 0.0f;
      nb = 0.0f;
      for (int i = 0; i < n; i++) {
        float x = a.getFloat(i);
        float y = b.getFloat(i);
        dot += x * y;
        na += x * x;
        nb += y * y;
      }
    }
    float den = (float) Math.sqrt((double) na) * (float) Math.sqrt((double) nb);
    return den == 0.0f ? 1.0f : 1.0f - dot / den;
  }

  /**
   * Centered dot product in DOUBLE precision: sum_i (x[i] - m[i]) * c[i],
   * accumulated strictly left-to-right. The PCA projection kernel — the
   * sequential double fold IS the replayable contract (an oracle fold in
   * another engine must reproduce the doubles bit-for-bit), so this stays
   * a scalar loop on purpose: double-lane SIMD would reassociate the sum
   * and break bit-equality. Still codegen'd — one virtual-free static call
   * inside the whole-stage loop instead of three interpreted HOF lambdas
   * per row.
   */
  public static double centeredDot(ArrayData x, ArrayData m, ArrayData c) {
    int n = x.numElements();
    checkDims(n, m.numElements());
    checkDims(n, c.numElements());
    double s = 0.0;
    for (int i = 0; i < n; i++) {
      s += (x.getDouble(i) - m.getDouble(i)) * c.getDouble(i);
    }
    return s;
  }

  /**
   * Sign-bit sketch of a float vector: bit (i mod 64) of word (i / 64) is
   * set iff v[i] &gt;= 0 (IEEE compare, so -0.0f packs as non-negative —
   * matching SQL's {@code x >= 0} for oracle replay). 1 bit/dim = a 32x
   * smaller candidate-scan payload than float32.
   */
  public static ArrayData signPack(ArrayData v) {
    int n = v.numElements();
    long[] out = new long[(n + 63) >>> 6];
    for (int i = 0; i < n; i++) {
      if (v.getFloat(i) >= 0.0f) {
        out[i >>> 6] |= 1L << (i & 63);
      }
    }
    return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out);
  }

  /**
   * Hamming distance between two packed sign sketches (XOR + popcount per
   * word; HotSpot intrinsifies {@link Long#bitCount} to POPCNT). The
   * binary-quantization candidate metric.
   */
  public static int hamming(ArrayData a, ArrayData b) {
    int n = a.numElements();
    checkDims(n, b.numElements());
    int s = 0;
    for (int j = 0; j < n; j++) {
      s += Long.bitCount(a.getLong(j) ^ b.getLong(j));
    }
    return s;
  }
}
