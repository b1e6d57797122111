package graft

import graft.tools.CheckpointClean
import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** [[graft.tools.CheckpointClean]] over a synthetic checkpoint tree shaped
  * like a real HDFS-backed Structured Streaming checkpoint (commits/ and
  * offsets/ metadata logs with `.crc` siblings, `state/<op>/<part>/
  * <batch>.delta|.snapshot`, `_metadata`): the retained tail must match the
  * reference's `latest - keep` cutoff and nothing else may be touched. */
class CheckpointCleanSpec extends AnyFunSuite {

  private def touch(p: Path): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, "x")
  }

  private def names(p: Path): Set[String] =
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).toSet finally s.close()
    } else Set.empty

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("graft-ckpt-")
    (0L to 14L).foreach { b =>
      touch(root.resolve(s"commits/$b"))
      touch(root.resolve(s"commits/.$b.crc"))
      touch(root.resolve(s"offsets/$b"))
      touch(root.resolve(s"offsets/.$b.crc"))
    }
    // one extra offset (offsets always lead commits by one in-flight batch)
    touch(root.resolve("offsets/15"))
    touch(root.resolve("offsets/.15.crc"))
    for (part <- 0 to 1; b <- 1L to 15L) {
      touch(root.resolve(s"state/0/$part/$b.delta"))
      touch(root.resolve(s"state/0/$part/.$b.delta.crc"))
    }
    touch(root.resolve("state/0/0/10.snapshot"))
    touch(root.resolve("state/0/0/.10.snapshot.crc"))
    touch(root.resolve("state/0/_metadata/schema"))
    touch(root.resolve("metadata")) // query id file at the root — untouched
    root
  }

  test("keeps the last N commits/offsets/state batches, removes crc siblings") {
    val root = mkTree()
    val s = CheckpointClean.clean(root, keepCommits = 10, keepOffsets = 10, keepStateBatches = 5)

    // commits: latest 14, cutoff 4 → 0..4 deleted (5 files + 5 crc)
    assert(names(root.resolve("commits")) === ((5L to 14L).map(_.toString) ++
      (5L to 14L).map(b => s".$b.crc")).toSet)
    assert(s.commitFiles === 10)
    // offsets: latest 15, cutoff 5 → 0..5 deleted
    assert(names(root.resolve("offsets")) === ((6L to 15L).map(_.toString) ++
      (6L to 15L).map(b => s".$b.crc")).toSet)
    assert(s.offsetFiles === 12)
    // state: latest batch 15, cutoff 10 → deltas 1..10 deleted in BOTH
    // partitions, 10.snapshot deleted, 11..15 retained
    (0 to 1).foreach { part =>
      val kept = names(root.resolve(s"state/0/$part"))
      assert(kept.filter(_.endsWith(".delta")) === (11L to 15L).map(b => s"$b.delta").toSet,
        s"partition $part")
      assert(!kept.exists(_.contains("snapshot")))
    }
    // 2×10 deltas + 2×10 crc + snapshot + its crc
    assert(s.stateFiles === 42)
    // untouched: _metadata, root metadata file
    assert(Files.exists(root.resolve("state/0/_metadata/schema")))
    assert(Files.exists(root.resolve("metadata")))
  }

  test("idempotent and safe on re-run, empty dirs, and missing sections") {
    val root = mkTree()
    CheckpointClean.clean(root, 10, 10, 5)
    val again = CheckpointClean.clean(root, 10, 10, 5)
    assert(again.total === 0, "second run must delete nothing")
    // a checkpoint with no state/ (stateless query) cleans without error
    val stateless = Files.createTempDirectory("graft-ckpt2-")
    touch(stateless.resolve("commits/0"))
    touch(stateless.resolve("offsets/0"))
    val s2 = CheckpointClean.clean(stateless, 10, 10, 5)
    assert(s2.total === 0, "nothing beyond the retained tail")
    assert(Files.exists(stateless.resolve("commits/0")))
  }
}
