package graft

/** Scratch directories for sink / stream-source queries, rooted under ONE
  * per-JVM temp dir that a shutdown hook deletes recursively — repeated
  * Bench passes and Verify rounds previously accumulated unbounded /tmp
  * debris (full lineitem-width parquet copies in the worst case). Dirs
  * stay alive for the whole JVM (sink queries read their output back
  * within the run); cleanup is strictly at exit.
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete()
    ()
  }

  /** A fresh scratch dir as a String path (Spark write target). */
  def dir(prefix: String): String = path(prefix).toString

  /** A fresh scratch dir as a Path. */
  def path(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)
}
