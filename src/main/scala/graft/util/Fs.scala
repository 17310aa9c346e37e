package graft.util

/** THE recursive scratch-dir delete — one definition for every cleanup
  * site (streaming staging dirs, rolling-ingest posting logs, scratch
  * shutdown hooks, diagnostic tools). Best-effort by contract: scratch
  * cleanup must never fail a query or a JVM shutdown, so per-path
  * errors are swallowed (children first, then the dir itself); a
  * missing root is a no-op. Call sites that NEED loud failures (none
  * today — scratch is always disposable) should not use this. */
object Fs {
  def deleteRecursively(root: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(root)) {
        val s = java.nio.file.Files.walk(root)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach { p =>
            try java.nio.file.Files.deleteIfExists(p): Unit
            catch { case scala.util.control.NonFatal(_) => () }
          }
        finally s.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  def deleteRecursively(root: java.io.File): Unit =
    deleteRecursively(root.toPath)

  def deleteRecursively(path: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(path))
}
