package graft

import org.scalatest.funsuite.AnyFunSuite

class TempDirsSpec extends AnyFunSuite {

  test("registry evicts oldest dirs beyond the cap, newest survive") {
    val reg = new TempDirRegistry(cap = 3)
    val dirs = (1 to 5).map(_ => reg.scoped("graft_tempdirs_test"))
    assert(reg.liveCount == 3)
    // oldest two evicted from disk, newest three still present
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dirs(0))))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dirs(1))))
    dirs.drop(2).foreach { d =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
    }
  }

  test("eviction deletes non-empty dirs recursively") {
    val reg = new TempDirRegistry(cap = 1)
    val d1 = reg.scoped("graft_tempdirs_deep")
    val nested = java.nio.file.Paths.get(d1, "a", "b")
    java.nio.file.Files.createDirectories(nested)
    java.nio.file.Files.write(nested.resolve("f.txt"), "x".getBytes)
    reg.scoped("graft_tempdirs_next") // pushes d1 past the cap
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)))
    assert(reg.liveCount == 1)
  }

  test("session registry cap leaves harness invocation counts untouched") {
    // The backstop must never fire during bench/verify (~3 dirs per
    // streaming query, ~15 such queries, 2 passes ≈ 90 dirs) — eviction
    // there could delete dirs still backing lazy frames.
    assert(TempDirs.MaxDirs >= 256)
  }

  test("pinned dirs survive eviction pressure; unpin demotes them") {
    val reg = new TempDirRegistry(cap = 2)
    val pinned = reg.pinned("graft_tempdirs_pin")
    (1 to 6).foreach(_ => reg.scoped("graft_tempdirs_churn"))
    // six scoped allocations crossed the cap twice over — the pinned dir
    // must be untouched (the r15 ADVICE StateCache-eviction hazard)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(pinned)))
    assert(reg.pinnedCount == 1)
    // demotion re-enters the evictable pool: enough churn deletes it
    reg.unpin(pinned)
    assert(reg.pinnedCount == 0)
    (1 to 3).foreach(_ => reg.scoped("graft_tempdirs_churn2"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(pinned)))
  }

  test("bulk unpin never evicts live scoped dirs; demoted dirs evict first") {
    // the r16 ADVICE finding: unpin running the eviction loop let a bulk
    // StateCache.clear() push still-in-use scoped dirs (live streaming
    // checkpoints) over the cap mid-query
    val reg = new TempDirRegistry(cap = 4)
    val live1 = reg.scoped("graft_tempdirs_live")
    val live2 = reg.scoped("graft_tempdirs_live")
    val pins = (1 to 4).map(_ => reg.pinned("graft_tempdirs_bulk"))
    pins.foreach(reg.unpin) // bulk demotion (the clear() shape)
    // eviction at unpin time touches ONLY demoted dirs: the registry
    // holds 6 entries against a cap of 4, so the two oldest DEMOTED
    // dirs are deleted immediately (a clear()-heavy session's disk
    // stays bounded without waiting for the next scoped() call) while
    // both live scoped dirs survive untouched
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(live1)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(live2)))
    assert(pins.count(d =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(d))) == 2)
    // the next scoped() call evicts down to cap — still taking a
    // DEMOTED dir first, so the live scoped dirs keep their seniority
    reg.scoped("graft_tempdirs_after")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(live1)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(live2)))
    assert(pins.count(d =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(d))) == 1)
  }

  test("unpin of an unknown dir is a no-op (no phantom registration)") {
    val reg = new TempDirRegistry(cap = 2)
    val before = reg.liveCount
    reg.unpin("/nonexistent/never-registered")
    assert(reg.liveCount == before)
  }
}
