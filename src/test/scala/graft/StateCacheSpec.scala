package graft

import org.scalatest.funsuite.AnyFunSuite

/** StateCache contracts that exist purely at the JVM level (no Spark):
  * build-once memoization, pinning against the TempDirs eviction backstop,
  * the vanished-dir rebuild path, and clear()'s demotion of owned dirs —
  * the r15 ADVICE medium finding was exactly a long session evicting a
  * still-cached state dir and serving silently empty manifests from it.
  */
class StateCacheSpec extends AnyFunSuite {

  private def exists(d: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))

  test("stateDir builds once and serves the same pinned dir on hits") {
    var builds = 0
    def get() = StateCache.stateDir("/corpusX", "spec-build-once", "graft_sc_spec") { d =>
      builds += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "marker.txt"), "built".getBytes)
    }
    val d1 = get()
    val d2 = get()
    assert(d1 == d2)
    assert(builds == 1)
    assert(exists(d1))
    StateCache.clear()
  }

  test("a state dir deleted out from under the cache is rebuilt, not served empty") {
    var builds = 0
    def get() = StateCache.stateDir("/corpusX", "spec-vanish", "graft_sc_spec") { d =>
      builds += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "slice-0.parquet"), "data".getBytes)
    }
    val d1 = get()
    // simulate the eviction/external-deletion hazard
    val root = java.nio.file.Paths.get(d1)
    java.nio.file.Files.walk(root)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    assert(!exists(d1))
    val d2 = get()
    assert(builds == 2)
    assert(exists(d2))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(d2, "slice-0.parquet")))
    StateCache.clear()
  }

  test("a PARTIALLY deleted state dir (root kept, contents gone) is rebuilt") {
    // the r16 ADVICE finding: a root-only existence probe still serves a
    // gutted dir — the completion marker closes exactly that hole
    var builds = 0
    def get() = StateCache.stateDir("/corpusX", "spec-gutted", "graft_sc_spec") { d =>
      builds += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "slice-0.parquet"), "data".getBytes)
    }
    val d1 = get()
    // delete the CONTENTS (marker included) but keep the root dir
    java.nio.file.Files.list(java.nio.file.Paths.get(d1))
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    assert(exists(d1))
    val d2 = get()
    assert(builds == 2)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(d2, "slice-0.parquet")))
    StateCache.clear()
  }

  test("clear() demotes owned pinned dirs back to the evictable pool") {
    val before = TempDirs.pinnedCount
    val d = StateCache.stateDir("/corpusX", "spec-demote", "graft_sc_spec") { dd =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dd, "m.txt"), "x".getBytes)
    }
    assert(TempDirs.pinnedCount == before + 1)
    StateCache.clear()
    // demoted: no longer pinned, but contents still readable (deletion
    // waits for cap pressure or JVM exit)
    assert(TempDirs.pinnedCount == before)
    assert(exists(d))
  }

  test("a builder that throws does not leave a pinned dir behind") {
    val before = TempDirs.pinnedCount
    intercept[RuntimeException] {
      StateCache.stateDir("/corpusX", "spec-throw", "graft_sc_spec") { _ =>
        sys.error("boom")
      }
    }
    assert(TempDirs.pinnedCount == before)
    StateCache.clear()
  }

  test("dirFingerprint tracks in-place rewrites (the pack-offset cache key)") {
    val d = TempDirs.scoped("graft_sc_fp")
    val f = java.nio.file.Paths.get(d, "part-0.parquet")
    java.nio.file.Files.write(f, "aaaa".getBytes)
    val fp1 = StateCache.dirFingerprint(d)
    // stable across reads of unchanged content
    assert(StateCache.dirFingerprint(d) == fp1)
    // an in-place rewrite (same file name, different bytes) MUST miss:
    // the ADVICE r19 hazard was exactly a rewritten corpus dir serving
    // session-cached offsets computed from the old bytes
    java.nio.file.Files.write(f, "bbbbbbbb".getBytes)
    assert(StateCache.dirFingerprint(d) != fp1)
    // adding a file changes it too; a missing dir is the sentinel
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "part-1.parquet"), "cc".getBytes)
    assert(StateCache.dirFingerprint(d) != fp1)
    assert(StateCache.dirFingerprint(d + "/nope") == "absent")
  }

  test("dirFingerprint: per-entry terminator prevents digit-absorption collisions") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    def mk(files: Seq[(String, Int, Long)]): String = {
      val d = TempDirs.scoped("graft_sc_fpcol")
      files.foreach { case (n, size, mt) =>
        val p = Paths.get(d, n)
        Files.write(p, Array.fill[Byte](size)('a'))
        Files.setLastModifiedTime(p, FileTime.fromMillis(mt))
      }
      StateCache.dirFingerprint(d)
    }
    // Without a terminator after each (path, size, mtime) entry, the
    // first entry's trailing mtime digits absorb the second entry's
    // leading path digit and these two DIFFERENT states concatenate to
    // the identical digest input ("1x·1·2" + "3y·4·5" == "1x·1·23" +
    // "y·4·5" in sorted order) — a false cache hit on exactly the
    // in-place rewrite the fingerprint exists to catch.
    val a = mk(Seq(("1x", 1, 2L), ("3y", 4, 5L)))
    val b = mk(Seq(("1x", 1, 23L), ("y", 4, 5L)))
    assert(a != b,
      "digit-absorption collision: two different dir states fingerprint equal")
  }

  test("OracleLiterals are corpus-scoped: a scope switch hides, not destroys") {
    OracleLiterals.scopeTo("/scopeA")
    OracleLiterals.put("spec-key", "[1.0]")
    assert(OracleLiterals.get("spec-key") == "[1.0]")
    OracleLiterals.scopeTo("/scopeB")
    // corpus B must never see corpus A's trained literal
    intercept[RuntimeException] { OracleLiterals.get("spec-key") }
    OracleLiterals.put("spec-key", "[2.0]")
    assert(OracleLiterals.get("spec-key") == "[2.0]")
    // returning to A restores A's literal — interleaving corpora is safe
    OracleLiterals.scopeTo("/scopeA")
    assert(OracleLiterals.get("spec-key") == "[1.0]")
    // restore the default scope for every other suite in this JVM
    OracleLiterals.scopeTo("")
  }
}
