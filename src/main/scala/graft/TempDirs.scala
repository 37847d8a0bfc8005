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
  * footprint is bounded by min(invocation count, [[TempDirs.MaxDirs]]):
  * returned frames are lazy over these dirs, which is why cleanup waits
  * for JVM exit, with oldest-first eviction as a resident-service backstop
  * once the cap is crossed.
  */
private[graft] class TempDirRegistry(cap: Int) {

  private val created = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  /** A fresh temp directory, registered for recursive deletion at JVM
    * exit (or eager oldest-first eviction once `cap` older dirs have
    * accumulated). */
  def scoped(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.synchronized {
      created += p
      while (created.size > cap) {
        val oldest = created.remove(0)
        demoted -= oldest
        try deleteRecursively(oldest) catch { case _: Exception => () }
      }
    }
    p.toString
  }

  /** Live registered dirs (eviction test hook). */
  private[graft] def liveCount: Int = created.synchronized { created.size }

  private val pinnedDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  /** A fresh temp directory EXCLUDED from the oldest-first eviction loop —
    * still deleted at JVM exit. For session-lifetime state the eviction
    * backstop must never touch: [[StateCache]] pins built state dirs here,
    * because an evicted-but-still-cached state dir would make manifest and
    * serve queries return silently EMPTY results (listSlices of a missing
    * path is empty, not an error) — the r15 ADVICE medium finding. Pins
    * are bounded by the number of distinct (corpus, lifecycle) states in a
    * session; callers that drop their cache must [[unpin]] so the dirs
    * rejoin the evictable pool. */
  def pinned(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    pinnedDirs.synchronized { pinnedDirs += p }
    p.toString
  }

  /** Dirs that entered the evictable registry via [[unpin]]: nothing
    * references them once their cache entry is gone, so they are always
    * safe to delete — unlike live SCOPED dirs, which may back lazy
    * frames and streaming checkpoints. */
  private val demoted = scala.collection.mutable.HashSet.empty[java.nio.file.Path]

  /** Demote a pinned dir into the evictable registry (oldest-first slot):
    * its contents stay readable until the cap crosses it or JVM exit.
    * Eviction here is restricted to DEMOTED dirs: a bulk demotion
    * (StateCache.clear() dropping many state dirs at once) running the
    * unrestricted oldest-first loop could push still-in-use SCOPED dirs —
    * live streaming checkpoints among them — over the cap and delete
    * them mid-query, but a demoted dir at the head is unreferenced by
    * definition and deleting it immediately keeps a clear()-heavy
    * session's disk bounded WITHOUT waiting for the next [[scoped]]
    * call. A live scoped dir at the head stops the loop and keeps its
    * seniority, exactly as before. */
  def unpin(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    val was = pinnedDirs.synchronized {
      val i = pinnedDirs.indexOf(p)
      if (i >= 0) { pinnedDirs.remove(i); true } else false
    }
    if (was) created.synchronized {
      created.insert(0, p)
      demoted += p
      while (created.size > cap && demoted.contains(created.head)) {
        val oldest = created.remove(0)
        demoted -= oldest
        try deleteRecursively(oldest) catch { case _: Exception => () }
      }
    }
  }

  /** Live pinned dirs (test hook). */
  private[graft] def pinnedCount: Int = pinnedDirs.synchronized { pinnedDirs.size }

  protected def deleteAll(): Unit = {
    // per-dir isolation: one undeletable dir (permissions, live handles)
    // must not abort cleanup of the rest
    created.synchronized {
      created.foreach(p => try deleteRecursively(p) catch {
        case _: Exception => ()
      })
    }
    pinnedDirs.synchronized {
      pinnedDirs.foreach(p => try deleteRecursively(p) catch {
        case _: Exception => ()
      })
    }
  }

  /** Recursive delete for owners retiring their own state dirs (the
    * index-retirement verb) — the same best-effort walker the cleanup
    * hook uses. */
  private[graft] def deleteTree(dir: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(dir))

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try {
        // Files.walk streams surface I/O failures as UncheckedIOException
        // (a RuntimeException) — catching IOException alone would let one
        // bad entry propagate out of forEach, kill the cleanup thread, and
        // skip deletion of everything after it.
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch {
            case _: java.io.IOException => ()
            case _: java.io.UncheckedIOException => ()
          })
      } finally stream.close()
    }
  }
}

object TempDirs extends TempDirRegistry(512) {

  /** Resident-service backstop: beyond this many live registered dirs the
    * OLDEST are evicted eagerly instead of waiting for JVM exit, bounding
    * a long-lived session's disk footprint at ~MaxDirs query states. Far
    * above any bench/verify invocation count (~3 dirs per streaming query,
    * ~100 queries, 2 passes), so eviction never fires during the harness —
    * the oldest dirs there may still back lazy frames, which is why the
    * cap is a backstop, not an aggressive GC. Keep in sync with the
    * extends clause above (a literal there — referencing this val in the
    * object's own superclass constructor is an init-order trap). */
  private[graft] final val MaxDirs = 512

  // One hook for the whole session; Scala object init is thread-safe, so
  // exactly one is ever registered.
  Runtime.getRuntime.addShutdownHook(
    new Thread(() => deleteAll(), "graft-tempdir-cleanup"))
}
