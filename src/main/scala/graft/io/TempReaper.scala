package graft.io

/** ONE JVM-exit sweep for driver-lifetime temp trees — the shared form of
  * the per-call shutdown hooks the streaming/index runners used to
  * register (a long Bench run creates dozens of temp trees; one hook per
  * tree accumulates unbounded `Thread` objects in the shutdown registry).
  * Results that read their parquet lazily must outlive the call that made
  * them, so exit-time reaping — not eager deletion — is the correct scope.
  */
object TempReaper {

  private val roots =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[java.nio.file.Path, java.lang.Boolean]())

  // registered on first use, never again
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      roots.forEach(p => rm(p.toFile))
    }, "graft-temp-reaper"))
  }

  /** Register a tree for exit-time deletion (idempotent per path). */
  def register(root: java.nio.file.Path): Unit = {
    hook
    roots.add(root)
    ()
  }

  /** Create a temp directory that is reaped at JVM exit. */
  def tempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    register(p)
    p
  }
}
