package graft

import java.nio.file.Files
import graft.graph.GraphEmit
import graft.sinks.Sinks
import graft.synth.FilesTable
import org.scalatest.funsuite.AnyFunSuite

/** Output writers (SURVEY.md §2.6). */
class SinksSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("sink").toString

  test("ndjson sink roundtrips, gz included (output_json.go)") {
    val d = tmp()
    val df = spark.read.parquet(s"$sf/nation.parquet")
    Sinks.ndjson(df, s"$d/out", gzip = true)
    assert(Files.list(java.nio.file.Paths.get(s"$d/out")).toArray
      .exists(_.toString.endsWith(".json.gz")))
    val back = spark.read.json(s"$d/out")
    assert(back.count() === df.count())
  }

  test("table sink: chosen columns, tsv, non-strings stringified (output_table.go)") {
    val d = tmp()
    val df = spark.read.parquet(s"$sf/nation.parquet")
    Sinks.table(df, s"$d/out", Seq("n_name", "n_regionkey"))
    val back = spark.read.option("sep", "\t").option("header", "true").csv(s"$d/out")
    assert(back.columns.toSeq === Seq("n_name", "n_regionkey"))
    assert(back.count() === df.count())
  }

  test("table sink writes RAW cells: JSON-encoded structs appear unquoted, " +
    "matching the reference's raw emission (output_table.go LazyQuotes)") {
    import spark.implicits._
    val d = tmp()
    val df = Seq(("r1", Map("a" -> 1L))).toDF("id", "m")
    Sinks.table(df, s"$d/raw", Seq("id", "m"))
    val lines = spark.read.text(s"$d/raw").collect().map(_.getString(0)).sorted
    // data line must carry the bare JSON object, not "{\"a\":1}"
    assert(lines.exists(_ == "id\tm"))
    assert(lines.exists(_ == "r1\t{\"a\":1}"), lines.mkString("|"))
  }

  test("stdout sink streams (no whole-frame collect), keeps the name\\tjson " +
    "format, and honors rowCap with a stderr-only truncation note") {
    // 50 partitions: toLocalIterator fetches ONE partition per job, so
    // the driver never holds more than 10k/50 rows at once — the shape
    // that survives a misdirected large table (loader/stdout.go mirror,
    // VERDICT r5 residual #1)
    val df = spark.range(0, 10000, 1, 50).toDF("v")
    var capped = Vector.empty[String]
    Sinks.stdout(df, "t", rowCap = Some(7), out = l => capped :+= l)
    assert(capped.size === 7)
    assert(capped.forall(_.matches("t\\t\\{\"v\":\\d+\\}")))
    var n = 0
    Sinks.stdout(df, "t", out = _ => n += 1)
    assert(n === 10000)
  }

  test("graph sink writes vertex + edge ndjson.gz (output_graph.go)") {
    val d = tmp()
    val files = FilesTable.files(spark, sf)
    Sinks.graph(GraphEmit.vertices(files, FilesTable.repoManifest(spark, sf)),
      GraphEmit.edges(files), d)
    assert(spark.read.json(s"$d/vertex.json").count() > 0)
    val e = spark.read.json(s"$d/edge.json")
    assert(e.columns.toSet === Set("_id", "_from", "_to", "_label"))
    assert(e.count() === GraphEmit.edges(files).count())
  }
}
