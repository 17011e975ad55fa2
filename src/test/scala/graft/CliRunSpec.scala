package graft

import java.nio.file.Files
import graft.synth.FilesTable
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end through the CLI entry point (sifter run analog). */
class CliRunSpec extends AnyFunSuite {
  import TestSpark._

  test("cli run: parquet in -> committed snapshot + summary out") {
    val in = Files.createTempDirectory("cli_in").toString + "/files.parquet"
    val outRoot = Files.createTempDirectory("cli_out").toString
    FilesTable.files(spark, sf).write.parquet(in)

    val stdout = new java.io.ByteArrayOutputStream()
    Console.withOut(stdout) { graft.cli.Main.run(in, outRoot) }
    val msg = stdout.toString
    assert(msg.contains("snapshot 1 committed"), msg)

    val ice = new graft.io.IceLite(outRoot)
    assert(ice.currentSnapshotId === Some(1L))
    val verdicts = graft.validate.CheckpointedValidation.verdicts(spark, outRoot, 1L)
    assert(verdicts.count() > 0)
  }
}
