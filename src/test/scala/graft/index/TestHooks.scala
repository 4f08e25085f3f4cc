package graft.index

/** Test-only bridge to package-private storage helpers. */
object TestHooks {
  def copyDir(src: String, dst: String): Unit = Storage.copyRecursively(src, dst)
}
