package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Scratch
import graft.queries.Q

/** The stale-scratch sweep must never delete a directory whose owning
  * JVM is still alive — mtime is written once at creation and reads
  * never refresh it, so age alone would pull live session layouts out
  * from under a long-running sibling (server, >30-min bench).
  */
final class ScratchSweepSpec extends AnyFunSuite {

  test("tag embeds a live pid; ownerAlive distinguishes live from dead") {
    val t = Scratch.tag(this)
    assert(t.matches("p\\d+h\\d+"), t)
    assert(Scratch.ownerAlive(s"graft-backup_sf0.1_${t}_3"))
    // a pid no Linux host hands out (beyond pid_max) reads as dead
    assert(!Scratch.ownerAlive("graft-backup_sf0.1_p999999999h123_3"))
    // old-format names (no tag) fall back to the age guard
    assert(!Scratch.ownerAlive("graft-backup_sf0.1_123456_3"))
  }

  test("sweep removes old dead-owner dirs, keeps live-owner dirs of any age") {
    val target = new java.io.File("target")
    target.mkdirs()
    val old = System.currentTimeMillis() - 2 * 60 * 60 * 1000L
    def mk(name: String): java.io.File = {
      val f = new java.io.File(target, name)
      f.mkdirs()
      new java.io.File(f, "data").createNewFile()
      f.setLastModified(old)
      f
    }
    val live = mk(s"graft-sweepspec_${Scratch.tag(this)}_1")
    val dead = mk("graft-sweepspec_p999999999h42_1")
    val legacy = mk("graft-sweepspec_424242_1")
    try {
      Q.sweepStaleScratch(maxAgeMs = 30 * 60 * 1000L)
      assert(live.isDirectory, "live-owner dir must survive the sweep")
      assert(!dead.exists, "dead-owner dir past the age cutoff is removed")
      assert(!legacy.exists, "untagged dir past the age cutoff is removed")
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
      }
      Seq(live, dead, legacy).foreach(rm)
    }
  }
}
