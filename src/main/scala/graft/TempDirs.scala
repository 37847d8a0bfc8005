package graft

/** Session-scoped temp directories for declared queries that materialize
  * intermediate state (streaming dedup indexes, survivor dirs,
  * checkpoints, persisted ANN indexes).
  *
  * Each call creates a fresh directory — reusing one per query name would
  * break replay semantics (a second invocation would append to the first
  * invocation's index and double its survivors) — and ONE JVM shutdown
  * hook deletes everything recursively, so repeated bench/verify
  * invocations no longer leak disk past the session. Within a session the
  * footprint is bounded by the invocation count; returned frames are lazy
  * over these dirs, which is why cleanup waits for JVM exit instead of
  * racing the caller's reads.
  */
object TempDirs {

  private val created = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  // Initialized on first use; Scala lazy vals are thread-safe, so exactly
  // one hook is ever registered.
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.synchronized { created.foreach(deleteRecursively) }
    }, "graft-tempdir-cleanup"))
  }

  /** A fresh temp directory, registered for recursive deletion at JVM
    * exit. */
  def scoped(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.synchronized { created += p }
    p.toString
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: java.io.IOException => () })
      } finally stream.close()
    }
  }
}
