package graft.functions;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * Panama Vector API distance kernels — the JVM analogue of the reference's
 * AVX scoring paths (reference: src/include/detail/scoring/l2_distance_avx.h,
 * inner_product_avx.h). This class is the ONLY one that touches
 * jdk.incubator.vector; {@link VecKernels} links it lazily inside a
 * Throwable-catching static probe, so a JVM started without
 * {@code --add-modules jdk.incubator.vector} falls back to the scalar
 * loops (the NoClassDefFoundError from this class's linkage is the
 * detection signal — keep every VecSimd reference behind that probe).
 *
 * Accumulation is float32 in SPECIES_PREFERRED lanes reduced once at the
 * end — a different rounding order than the scalar loop, exactly like the
 * reference's AVX path vs its scalar path. Interpreted eval and codegen
 * dispatch through the same {@link VecKernels} entry points, so any one
 * query plan is self-consistent.
 */
public final class VecSimd {
  private VecSimd() {}

  private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

  public static float sos(float[] a, float[] b) {
    int i = 0;
    int upper = S.loopBound(a.length);
    FloatVector acc = FloatVector.zero(S);
    for (; i < upper; i += S.length()) {
      FloatVector d = FloatVector.fromArray(S, a, i).sub(FloatVector.fromArray(S, b, i));
      acc = d.fma(d, acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) {
      float d = a[i] - b[i];
      s += d * d;
    }
    return s;
  }

  public static float dot(float[] a, float[] b) {
    int i = 0;
    int upper = S.loopBound(a.length);
    FloatVector acc = FloatVector.zero(S);
    for (; i < upper; i += S.length()) {
      acc = FloatVector.fromArray(S, a, i).fma(FloatVector.fromArray(S, b, i), acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) {
      s += a[i] * b[i];
    }
    return s;
  }

  /** dot, |a|², |b|² in one pass (cosine needs all three). */
  public static void cosineParts(float[] a, float[] b, float[] out3) {
    int i = 0;
    int upper = S.loopBound(a.length);
    FloatVector accDot = FloatVector.zero(S);
    FloatVector accA = FloatVector.zero(S);
    FloatVector accB = FloatVector.zero(S);
    for (; i < upper; i += S.length()) {
      FloatVector x = FloatVector.fromArray(S, a, i);
      FloatVector y = FloatVector.fromArray(S, b, i);
      accDot = x.fma(y, accDot);
      accA = x.fma(x, accA);
      accB = y.fma(y, accB);
    }
    float dot = accDot.reduceLanes(VectorOperators.ADD);
    float na = accA.reduceLanes(VectorOperators.ADD);
    float nb = accB.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) {
      float x = a[i];
      float y = b[i];
      dot += x * y;
      na += x * x;
      nb += y * y;
    }
    out3[0] = dot;
    out3[1] = na;
    out3[2] = nb;
  }
}
