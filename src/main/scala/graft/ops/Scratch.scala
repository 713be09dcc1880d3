package graft.ops

import java.nio.file.{Files, Path}

/** Self-cleaning scratch directories for round-trip queries and benches.
  * Every dir handed out is recursively deleted on JVM exit, so repeated
  * graded runs don't accumulate temp trees (a 50k-file bench tree per run
  * would otherwise exhaust /tmp inodes eventually). */
object Scratch {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach(p => deleteRecursively(p))))
    true
  }

  def dir(prefix: String): String = {
    val _ = hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  private def deleteRecursively(root: Path): Unit =
    try {
      val stream = Files.walk(root)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { val _ = Files.deleteIfExists(p) })
      finally stream.close()
    } catch { case _: Throwable => () } // shutdown best-effort
}
