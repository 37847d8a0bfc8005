package graft

/** Session-scoped build-once-read-many memo for trained artifacts and
  * persisted lifecycle state (VERDICT r14 #2).
  *
  * The declared lifecycle queries replay a full build/train/serve
  * lifecycle per invocation by convention — honest as a correctness
  * demonstration, but it bills every serve for a rebuild the production
  * deployment performs once. The indexes themselves argue the
  * build-once-read-many shape (IvfIndex's "built once over 100 TB, then
  * answers query streams"); this cache gives the declared queries that
  * shape INSIDE one JVM: the first query needing a (corpus, lifecycle)
  * state builds it, every later query — including the same query's
  * second bench pass — serves from the built state read-only.
  *
  * Keys are (corpus dir, lifecycle key): two corpora in one JVM (the
  * BenchScale scaled replicas) can never share state, and two lifecycles
  * over one corpus share exactly when their mutation history is
  * identical (e.g. the 2-append + delete-every-7th state behind
  * `sim_clusters_deleted`, `sim_clusters_stats` and the re-bucket
  * verb's source index).
  *
  * Contract for builders:
  *   - the builder performs EVERY mutation of the state it returns;
  *     callers treat the cached value/dir as read-only (a later verb
  *     that extends the state builds its own key, not an append onto a
  *     shared dir — the TempDirs "reusing one per query name" hazard).
  *   - trained-artifact builders may [[OracleLiterals.put]]; the puts
  *     are captured and RE-RECORDED on every cache hit, so oracle dumps
  *     see the literals regardless of which query (or pass) trained,
  *     and a [[OracleLiterals.scopeTo]] reset between corpora cannot
  *     strand a hit without its literals. Puts made on OTHER threads
  *     (e.g. inside a foreachBatch callback) escape the capture — keep
  *     training on the calling thread, the existing convention.
  *   - a builder that THROWS is retried on the next access (the lazy
  *     holder stays uninitialized), with a fresh temp dir per attempt,
  *     so a half-written state can never be served.
  */
object StateCache {

  private final class Holder(mk: () => (AnyRef, Map[String, String])) {
    lazy val value: (AnyRef, Map[String, String]) = mk()
  }

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Holder]()

  /** Build `value` once per (corpusDir, key) in this JVM; replay the
    * OracleLiterals the build recorded on every hit. Thread-safe: the
    * holder's lazy val gives per-key mutual exclusion, so concurrent
    * spec suites wanting one state build it exactly once. */
  private def entryKey(corpusDir: String, key: String): String =
    corpusDir + "\u0000" + key

  def cached[T <: AnyRef](corpusDir: String, key: String)(build: => T): T = {
    val h = entries.computeIfAbsent(entryKey(corpusDir, key),
      _ => new Holder(() => OracleLiterals.capturing(build)))
    val (v, puts) = h.value
    puts.foreach { case (lk, lit) => OracleLiterals.put(lk, lit) }
    v.asInstanceOf[T]
  }

  private val ownedDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Completion marker written as the builder's LAST step. The hit-path
    * probe verifies the marker, not just the root: a partially deleted
    * state dir (root present, slice files gone) has no marker and
    * rebuilds, instead of serving silently-empty reads. Underscore-
    * prefixed so Hadoop/Spark directory listings ignore it (the _SUCCESS
    * convention) even if a reader ever globs the state root itself. */
  private val CompleteMarker = "_GRAFT_STATE_COMPLETE"

  /** State-dir form: the builder populates a fresh PINNED temp dir (a new
    * dir per attempt — see the throw-retry contract above); hits return
    * the built dir for read-only serving. Pinned, not scoped: the
    * TempDirs eviction backstop deleting a still-cached state dir would
    * make manifest/serve queries return silently EMPTY results
    * (listSlices of a missing path is empty, not an error) — the r15
    * ADVICE medium finding. Belt-and-braces, every hit re-verifies the
    * [[CompleteMarker]] still exists on disk and rebuilds if something
    * external removed the dir OR any of its contents (the marker is
    * written after the builder's final write, so its presence witnesses
    * a build that ran to completion), so a stale cache can never serve
    * from a void or a gutted dir. */
  def stateDir(corpusDir: String, key: String, prefix: String)(
      build: String => Unit): String = {
    var attempt = 0
    while (true) {
      val d = cached(corpusDir, key) {
        val dd = TempDirs.pinned(prefix)
        try {
          build(dd)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(dd, CompleteMarker))
          ownedDirs.add(dd); dd
        }
        catch {
          // failed attempt: hand the half-written dir back to the
          // evictable pool instead of pinning garbage for the session
          case e: Throwable => TempDirs.unpin(dd); throw e
        }
      }
      if (java.nio.file.Files.isRegularFile(
          java.nio.file.Paths.get(d, CompleteMarker))) return d
      // Externally deleted: drop the stale entry and rebuild (bounded —
      // a builder that cannot produce a directory is a hard bug).
      entries.remove(entryKey(corpusDir, key))
      ownedDirs.remove(d)
      // the vanished dir's Path must not stay pinned for the session —
      // each vanish/rebuild cycle would otherwise grow the pinned set
      // with entries clear() can no longer demote
      TempDirs.unpin(d)
      attempt += 1
      if (attempt >= 3) throw new IllegalStateException(
        s"StateCache: state dir for ($corpusDir, $key) vanished (or lost its " +
          s"completion marker) $attempt times — something is deleting live " +
          "state out from under the cache")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Test hook: drop every cached entry (forces cold builds). Pinned state
    * dirs are demoted back into the evictable TempDirs pool — nothing
    * references them once the entries are gone, and BenchScale clears
    * before every timed cold pass, so leaving them pinned would grow the
    * disk footprint without bound. */
  private[graft] def clear(): Unit = {
    entries.clear()
    val it = ownedDirs.iterator()
    while (it.hasNext) { TempDirs.unpin(it.next()); it.remove() }
  }
}
