package graft

import java.nio.file.Files
import graft.io.IceLite
import graft.rules.FileRules
import graft.synth.FilesTable
import graft.validate.{CheckpointedValidation, Verdicts}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot/checkpoint/lineage + resume semantics (north-star
  * "resumable from Iceberg snapshot checkpoints with per-partition
  * lineage", kill-between-partitions simulation from SURVEY.md §7).
  */
class IceLiteSpec extends AnyFunSuite {
  import TestSpark._

  lazy val files = FilesTable.files(spark, sf).cache()

  private def freshRoot(): String =
    Files.createTempDirectory("icelite").toString

  test("clean run commits one snapshot with all partitions and lineage") {
    val root = freshRoot()
    val snap = CheckpointedValidation.run(spark, files, FileRules.rowRules, root)
    val ice = new IceLite(root)
    assert(snap === 1L)
    assert(ice.currentSnapshotId === Some(1L))
    val orgs = files.select(Verdicts.org(col("repo"))).distinct().count()
    assert(ice.snapshotParts(1).size === orgs)
    assert(ice.completedParts(1).size === orgs)
    val lin = ice.lineage(spark)
    assert(lin.count() === orgs)
    assert(lin.agg(sum("rows")).collect()(0).getLong(0) === files.count())
  }

  test("hostile partition names survive the manifest round-trip") {
    import spark.implicits._
    val root = freshRoot()
    val ice = new IceLite(root)
    val nasty = Seq("""org"x""", "a,b", "c]d[e", "sl/ash", "sp ace")
    val snap = ice.nextSnapshotId
    nasty.foreach { part =>
      ice.commitPartition(snap, part, 1L,
        Map("t" -> Seq((part, 1L)).toDF("part", "n")))
    }
    ice.commitSnapshot(snap, nasty)
    assert(ice.snapshotParts(snap).sorted === nasty.sorted)
    assert(ice.completedParts(snap) === nasty.toSet)
    val back = ice.readTable(spark, snap, "t")
    assert(back.select("part").collect().map(_.getString(0)).sorted === nasty.sorted.toArray)
  }

  test("kill between partitions -> resume skips completed, verdicts identical") {
    val root = freshRoot()
    intercept[CheckpointedValidation.SimulatedCrash] {
      CheckpointedValidation.run(spark, files, FileRules.rowRules, root,
        crashAfter = Some(3))
    }
    val ice = new IceLite(root)
    assert(ice.currentSnapshotId === None) // nothing committed as a snapshot
    assert(ice.completedParts(1).size === 3)
    val before = ice.lineageDir(1).resolve(
      ice.completedParts(1).toSeq.sorted.head + ".json")
    val mtime = Files.getLastModifiedTime(before)

    val snap = CheckpointedValidation.run(spark, files, FileRules.rowRules, root)
    assert(snap === 1L)
    // the 3 completed partitions were not redone (lineage untouched)
    assert(Files.getLastModifiedTime(before) === mtime)

    // resumed verdicts == direct single-pass verdicts, row for row
    val resumed = CheckpointedValidation.verdicts(spark, root, snap)
      .select("part", "rule_id", "violation_count", "pass")
    val direct = Verdicts.compute(spark, files, FileRules.rowRules)
    assert(resumed.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(resumed).count() === 0)
  }

  test("second snapshot builds on the first; both readable") {
    val root = freshRoot()
    val s1 = CheckpointedValidation.run(spark, files, FileRules.rowRules, root)
    val s2 = CheckpointedValidation.run(spark, files, FileRules.rowRules, root)
    assert((s1, s2) === (1L, 2L))
    val ice = new IceLite(root)
    assert(ice.currentSnapshotId === Some(2L))
    assert(ice.readTable(spark, 1, "violations").count() ===
      ice.readTable(spark, 2, "violations").count())
  }
}
