package graft.tools

import java.nio.file.{Files, Path}

/** Session-scoped temp directories for the write-path queries.
  *
  * Every dir is created under ONE per-JVM root that is deleted recursively on
  * shutdown, so repeated Verify/Bench runs leave no stray /tmp litter (the
  * round-1 queries each leaked a fresh createTempDirectory per invocation).
  */
object Tmp {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_session_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r.toFile)))
    r
  }

  /** A fresh directory under the session root; cleaned up at JVM exit. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).toSeq.flatten.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
