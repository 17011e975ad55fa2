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

  test("cli run-yaml: sifter-style playbook + param override end-to-end") {
    val dir = Files.createTempDirectory("cli_yaml")
    Files.writeString(dir.resolve("rows.json"),
      """{"id": "a", "v": "1"}
        |{"id": "b", "v": "2"}
        |{"id": "c", "v": ""}
        |""".stripMargin)
    Files.writeString(dir.resolve("pb.yaml"),
      """name: cli-pb
        |outdir: out
        |params:
        |  rows:
        |    type: File
        |    default: missing.json
        |inputs:
        |  rows:
        |    json:
        |      path: "{{params.rows}}"
        |pipelines:
        |  keep:
        |    - from: rows
        |    - filter:
        |        field: v
        |        check: hasValue
        |outputs:
        |  kept:
        |    json:
        |      path: kept.json
        |      from: keep
        |""".stripMargin)
    val stdout = new java.io.ByteArrayOutputStream()
    Console.withOut(stdout) {
      graft.cli.Main.runYaml(dir.resolve("pb.yaml").toString, Seq("rows=rows.json"))
    }
    assert(stdout.toString.contains("output 'kept': 2 rows"), stdout.toString)
    assert(spark.read.json(s"$dir/out/kept.json").count() === 2)
  }

  test("run-yaml prints the reference's Close()-time counter summary to stderr") {
    val dir = Files.createTempDirectory("cli_counters")
    Files.writeString(dir.resolve("rows.json"),
      """{"id": "a", "dept": "d1"}
        |{"id": "b", "dept": "dX"}
        |""".stripMargin)
    Files.writeString(dir.resolve("codes.json"),
      """{"code": "d1", "full": "Engineering"}
        |""".stripMargin)
    Files.writeString(dir.resolve("pb.yaml"),
      """name: cli-counters
        |outdir: out
        |inputs:
        |  rows:
        |    json:
        |      path: rows.json
        |pipelines:
        |  enrich:
        |    - from: rows
        |    - lookup:
        |        lookup: "{{row.dept}}"
        |        json:
        |          input: codes.json
        |          key: code
        |        copy:
        |          deptFull: full
        |outputs:
        |  enriched:
        |    json:
        |      path: enriched.json
        |      from: enrich
        |""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val err = new java.io.ByteArrayOutputStream()
    Console.withOut(out) { Console.withErr(err) {
      graft.cli.Main.runYaml(dir.resolve("pb.yaml").toString, Seq())
    } }
    // summary on stderr (lookup.go:118-120 logs at Close); stdout stays
    // the machine-readable output lines
    assert(err.toString.contains("[counters] lookup:enrich[1]: hit=1 miss=1"),
      err.toString)
    assert(!out.toString.contains("[counters]"), out.toString)
  }
}
