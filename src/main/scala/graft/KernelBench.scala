package graft
import graft.index.VamanaKernels
object KernelBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val n = 375; val d = 64
    val pts = Array.fill(n)(Array.fill(d)(rnd.nextFloat()))
    // warm
    VamanaKernels.build(pts, 100, 64)
    var best = Double.MaxValue
    for (_ <- 0 until 5) {
      val t0 = System.nanoTime()
      VamanaKernels.build(pts, 100, 64)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"build(375x64, L=100, R=64) min: $best%.3f s")
  }
}
