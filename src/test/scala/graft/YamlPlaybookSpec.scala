package graft

import java.nio.file.Files
import graft.pipeline.YamlPlaybook
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end run of a reference-shaped YAML playbook
  * (playbook/load.go:26-75; mirrors the test/examples harness shape):
  * params + json input + project → lookup(tsv) → filter pipeline +
  * json/table/graph outputs, exact row counts and values asserted. */
class YamlPlaybookSpec extends AnyFunSuite {
  import TestSpark._

  private def writeFixture(): java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft_yamlpb")
    Files.writeString(dir.resolve("people.json"),
      """{"id": "p1", "name": "ann", "dept": "d1", "active": "true"}
        |{"id": "p2", "name": "bob", "dept": "d2", "active": "true"}
        |{"id": "p3", "name": "cyd", "dept": "d1", "active": "false"}
        |{"id": "p4", "name": "dee", "dept": "dX", "active": "true"}
        |""".stripMargin)
    Files.writeString(dir.resolve("depts.tsv"),
      "d1\tEngineering\nd2\tSales\n")
    Files.createDirectories(dir.resolve("schemas"))
    Files.writeString(dir.resolve("schemas/person.yaml"),
      """$id: person
        |title: person
        |required:
        |  - id
        |properties:
        |  id:
        |    type: string
        |  dept:
        |    type: string
        |links:
        |  - rel: works_in
        |    href: dept/{dept}
        |    targetSchema:
        |      $ref: dept.yaml
        |    templateRequired:
        |      - dept
        |""".stripMargin)
    Files.writeString(dir.resolve("pb.yaml"),
      """name: test-pb
        |outdir: out
        |params:
        |  people:
        |    type: File
        |    default: people.json
        |  deptTSV:
        |    type: File
        |    default: depts.tsv
        |inputs:
        |  people:
        |    json:
        |      path: "{{params.people}}"
        |outputs:
        |  result:
        |    json:
        |      path: people.out.json
        |      from: transform
        |  tab:
        |    table:
        |      from: transform
        |      path: people.tsv
        |      columns:
        |        - id
        |        - dept
        |        - label
        |  g:
        |    graph:
        |      from: transform
        |      schema: schemas
        |      title: person
        |      path: person-graph
        |pipelines:
        |  transform:
        |    - from: people
        |    - project:
        |        mapping:
        |          label: "person:{{name}}"
        |    - lookup:
        |        replace: dept
        |        tsv:
        |          input: "{{params.deptTSV}}"
        |          header:
        |            - code
        |            - dept_name
        |          key: code
        |          value: dept_name
        |    - filter:
        |        field: active
        |        match: "true"
        |""".stripMargin)
    dir
  }

  test("reference-shaped playbook runs end-to-end: project -> lookup -> filter -> 3 outputs") {
    val dir = writeFixture()
    val loaded = YamlPlaybook.loadFile(dir.resolve("pb.yaml").toString)
    assert(loaded.name === "test-pb")
    val results = loaded.playbook.run(spark)

    // pipeline semantics: p3 filtered out (active=false); dept replaced
    // through the TSV (d1 -> Engineering, d2 -> Sales, dX miss -> kept)
    val rows = results("result")
      .select("id", "dept", "label", "active").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      ("p1", "Engineering", "person:ann"),
      ("p2", "Sales", "person:bob"),
      ("p4", "dX", "person:dee")))

    // json output written and re-readable with identical rows
    val back = spark.read.json(s"${loaded.outdir}/people.out.json")
    assert(back.count() === 3)
    assert(back.filter(col("id") === "p1").select("dept")
      .collect()(0).getString(0) === "Engineering")

    // table output: header + 3 data rows, chosen columns only
    val tab = spark.read.option("sep", "\t").option("header", "true")
      .csv(s"${loaded.outdir}/people.tsv")
    assert(tab.columns.toSeq === Seq("id", "dept", "label"))
    assert(tab.count() === 3)

    // graph output: schema-driven vertices + edges with href targets
    val verts = spark.read.json(s"${loaded.outdir}/person-graph/vertex.json")
    assert(verts.count() === 3)
    assert(verts.filter(col("_id") === "person/p1").count() === 1)
    val edges = spark.read.json(s"${loaded.outdir}/person-graph/edge.json")
    val tos = edges.select("_to").collect().map(_.getString(0)).sorted
    assert(tos.toSeq === Seq("dept/Engineering", "dept/Sales", "dept/dX"))
    assert(edges.select("_label").distinct().collect()(0).getString(0) === "works_in")
  }

  test("lookup/validate counters surface as a metrics table and commit " +
    "through IceLite") {
    val dir = writeFixture()
    Files.writeString(dir.resolve("codes.json"),
      """{"code": "d1", "full": "Engineering"}
        |{"code": "d2", "full": "Sales"}
        |""".stripMargin)
    // copy path — the one the reference's hit/miss counters cover
    // (lookup.go:199-208): 3 of 4 rows match (d1,d2,d1), one copy field
    // each -> hit=3; p4's dX has no record -> miss=1
    val yaml =
      """inputs:
        |  people:
        |    json:
        |      path: people.json
        |  codes:
        |    json:
        |      path: codes.json
        |pipelines:
        |  xform:
        |    - from: people
        |    - lookup:
        |        lookup: "{{row.dept}}"
        |        json:
        |          input: codes.json
        |          key: code
        |        copy:
        |          deptFull: full
        |    - lookup:
        |        lookup: "{{row.dept}}"
        |        json:
        |          input: codes.json
        |          key: code
        |        copy:
        |          deptAgain: full
        |outputs: {}
        |""".stripMargin
    val loaded = YamlPlaybook.load(yaml, dir.toString)
    val out = loaded.playbook.resolve(spark, "xform")
    assert(out.count() === 4)
    // TWO lookup steps in one pipeline: each keeps its own counters
    // (the ordinal in the key is what prevents first-completed-wins
    // from silently dropping one of them)
    assert(loaded.counters.snapshot().get("lookup:xform[1]") ===
      Some(Map("hit" -> 3L, "miss" -> 1L)))
    assert(loaded.counters.snapshot().get("lookup:xform[2]") ===
      Some(Map("hit" -> 3L, "miss" -> 1L)))
    // the replace path counts too (engine extension; same join)
    val e2e = YamlPlaybook.loadFile(dir.resolve("pb.yaml").toString)
    e2e.playbook.resolve(spark, "transform").count()
    // key carries the step ordinal (two lookups in one pipeline must
    // not collide), so match by prefix rather than pin the position
    val e2eLookup = e2e.counters.snapshot().collect {
      case (k, v) if k.startsWith("lookup:transform[") => v
    }
    assert(e2eLookup === List(Map("hit" -> 3L, "miss" -> 1L)))
    // counters commit as a real IceLite metrics table and read back
    val root = Files.createTempDirectory("graft_opmetrics").toString
    val ice = new graft.io.IceLite(root)
    val mdf = loaded.counters.toDF(spark)
    ice.commitPartition(1L, "playbook", mdf.count(), Map("op_metrics" -> mdf))
    ice.commitSnapshot(1L, Seq("playbook"))
    val back = ice.readTable(spark, 1L, "op_metrics")
      .select("op", "metric", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(back === Set(
      ("lookup:xform[1]", "hit", 3L), ("lookup:xform[1]", "miss", 1L),
      ("lookup:xform[2]", "hit", 3L), ("lookup:xform[2]", "miss", 1L)))
  }

  test("param overrides replace YAML defaults; undefined params fail loudly") {
    val dir = writeFixture()
    // point the people param at a different file via the override path
    Files.writeString(dir.resolve("two.json"),
      """{"id": "x1", "name": "zed", "dept": "d2", "active": "true"}
        |""".stripMargin)
    val loaded = YamlPlaybook.loadFile(dir.resolve("pb.yaml").toString,
      params = Map("people" -> "two.json"))
    val out = loaded.playbook.resolve(spark, "transform").collect()
    assert(out.length === 1)
    val bad = intercept[RuntimeException] {
      YamlPlaybook.load("inputs:\n  a:\n    json:\n      path: \"{{params.nope}}\"\n" +
        "pipelines:\n  p:\n    - from: a\noutputs: {}\n", dir.toString)
    }
    assert(bad.getMessage.contains("undefined param"))
  }

  test("inspect-yaml: required params + resolved output paths, statically") {
    val dir = Files.createTempDirectory("graft_yaml_inspect")
    val yaml =
      """name: demo
        |outdir: out
        |params:
        |  people:
        |    default: people.json
        |  release:
        |    type: string
        |inputs:
        |  src:
        |    json:
        |      path: "{{params.people}}"
        |pipelines:
        |  p:
        |    - from: src
        |outputs:
        |  result:
        |    json:
        |      from: p
        |      path: "result_{{params.release}}.json"
        |  wide:
        |    table:
        |      from: p
        |      path: wide.tsv
        |""".stripMargin
    Files.writeString(dir.resolve("pb.yaml"), yaml)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // no params given: inspect still works (no execution), people shows
    // its default, release is required-but-unprovided, its placeholder
    // survives verbatim in the output path
    val j1 = om.readTree(YamlPlaybook.inspectFile(dir.resolve("pb.yaml").toString))
    assert(j1.get("name").asText === "demo")
    assert(j1.get("outdir").asText === s"$dir/out")
    val cfg1 = (0 until j1.get("config").size).map(j1.get("config").get)
      .map(n => n.get("name").asText -> n.get("provided").asBoolean).toMap
    assert(cfg1 === Map("people" -> true, "release" -> false))
    assert(j1.get("outputs").get("result").asText ===
      s"$dir/out/result_{{params.release}}.json")
    assert(j1.get("outputs").get("wide").asText === s"$dir/out/wide.tsv")
    // with the param provided, the path resolves
    val j2 = om.readTree(YamlPlaybook.inspectFile(dir.resolve("pb.yaml").toString,
      Map("release" -> "v7")))
    assert(j2.get("outputs").get("result").asText === s"$dir/out/result_v7.json")
    val cfg2 = (0 until j2.get("config").size).map(j2.get("config").get)
      .map(n => n.get("name").asText -> n.get("provided").asBoolean).toMap
    assert(cfg2("release"))
  }

  test("glob input with inner json loader + storeFilename; uuid without value -> v4") {
    val dir = writeFixture()
    Files.writeString(dir.resolve("part1.json"), "{\"id\": \"a\"}\n")
    Files.writeString(dir.resolve("part2.json"), "{\"id\": \"b\"}\n")
    val yaml =
      """inputs:
        |  parts:
        |    glob:
        |      path: "part*.json"
        |      storeFilename: src_file
        |      json: {}
        |pipelines:
        |  p:
        |    - from: parts
        |    - uuid:
        |        field: rid
        |outputs: {}
        |""".stripMargin
    val loaded = YamlPlaybook.load(yaml, dir.toString)
    val rows = loaded.playbook.resolve(spark, "p")
      .select("id", "src_file", "rid").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      Seq(("a", "part1.json"), ("b", "part2.json")))
    // v4: valid uuid shape, distinct per row
    val uuidRx = "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}"
    assert(rows.forall(_._3.matches(uuidRx)), rows.map(_._3).mkString(","))
    assert(rows.map(_._3).distinct.length === 2)
  }

  test("json/glob inputs with schema: DDL pin the scan — no inference " +
    "pass, single-scan plan, declared types win") {
    val dir = writeFixture()
    Files.writeString(dir.resolve("g1.json"), "{\"id\": \"a\", \"w\": 1}\n")
    Files.writeString(dir.resolve("g2.json"), "{\"id\": \"b\", \"w\": 2}\n")
    val yaml =
      """inputs:
        |  parts:
        |    glob:
        |      path: "g*.json"
        |      storeFilename: src_file
        |      json:
        |        schema: "id STRING, w DOUBLE"
        |  direct:
        |    json:
        |      path: g1.json
        |      schema: "id STRING, w DOUBLE"
        |pipelines:
        |  p:
        |    - from: parts
        |  q:
        |    - from: direct
        |outputs: {}
        |""".stripMargin
    val loaded = YamlPlaybook.load(yaml, dir.toString)
    val df = loaded.playbook.resolve(spark, "p")
    // inference would type w as BIGINT; the declared DOUBLE proves the
    // schema was PINNED (no inference read happened)
    assert(df.schema("w").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(loaded.playbook.resolve(spark, "q").schema("w").dataType ===
      org.apache.spark.sql.types.DoubleType)
    // single-scan fast path: one file-source relation, not a per-file fold
    val planLines = df.queryExecution.optimizedPlan
      .numberedTreeString.linesIterator.size
    assert(planLines <= 4, s"expected a single-scan plan, got $planLines lines")
    assert(df.select("id", "w", "src_file").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted.toSeq ===
      Seq(("a", 1.0, "g1.json"), ("b", 2.0, "g2.json")))
    // bad DDL fails at LOAD time (UnmarshalStrict moment), not first run
    val bad = intercept[RuntimeException] {
      YamlPlaybook.load(
        "inputs:\n  a:\n    json:\n      path: g1.json\n      schema: \"id STRING w\"\n" +
          "pipelines:\n  p:\n    - from: a\noutputs: {}\n", dir.toString)
    }
    assert(bad.getMessage.contains("bad schema DDL"))
  }

  test("param spec without default fails as undefined; filter not keeps nulls; dropNull keeps rows") {
    val dir = writeFixture()
    // spec map with no default and no override -> undefined param, not
    // a silent toString path
    val noDefault = intercept[RuntimeException] {
      YamlPlaybook.load(
        "params:\n  rows:\n    type: File\ninputs:\n  a:\n    json:\n      path: \"{{params.rows}}\"\n" +
          "pipelines:\n  p:\n    - from: a\noutputs: {}\n", dir.toString)
    }
    assert(noDefault.getMessage.contains("undefined param"))
    // filter check:not must KEEP rows whose field is null (reference
    // renders a missing field as "" != match); dropNull must not delete
    // sparse rows (the reference only drops null KEYS per row)
    Files.writeString(dir.resolve("sparse.json"),
      """{"id": "a", "status": "banned"}
        |{"id": "b", "status": "ok"}
        |{"id": "c"}
        |""".stripMargin)
    val yaml =
      """inputs:
        |  rows:
        |    json:
        |      path: sparse.json
        |pipelines:
        |  p:
        |    - from: rows
        |    - dropNull: {}
        |    - filter:
        |        field: status
        |        check: not
        |        match: banned
        |outputs: {}
        |""".stripMargin
    val kept = YamlPlaybook.load(yaml, dir.toString).playbook
      .resolve(spark, "p").select("id").collect().map(_.getString(0)).sorted
    assert(kept.toSeq === Seq("b", "c"))
  }

  test("lookup via pipeline: hash join between two pipelines of the playbook") {
    val dir = writeFixture()
    Files.writeString(dir.resolve("codes.json"),
      """{"code": "d1", "full": "Engineering"}
        |{"code": "d2", "full": "Sales"}
        |""".stripMargin)
    val yaml =
      """inputs:
        |  people:
        |    json:
        |      path: people.json
        |  codes:
        |    json:
        |      path: codes.json
        |pipelines:
        |  cleanCodes:
        |    - from: codes
        |    - filter:
        |        field: code
        |        check: hasValue
        |  xform:
        |    - from: people
        |    - lookup:
        |        replace: dept
        |        pipeline:
        |          from: cleanCodes
        |          key: code
        |          value: full
        |outputs: {}
        |""".stripMargin
    val rows = YamlPlaybook.load(yaml, dir.toString).playbook
      .resolve(spark, "xform").select("id", "dept").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows === Map("p1" -> "Engineering", "p2" -> "Sales",
      "p3" -> "Engineering", "p4" -> "dX"))
  }

  test("objectValidate: failing rows dropped per the compiled schema class") {
    val dir = writeFixture()
    Files.writeString(dir.resolve("schemas/strictperson.yaml"),
      """$id: strictperson
        |title: strictperson
        |required:
        |  - id
        |properties:
        |  id:
        |    type: string
        |  dept:
        |    type: string
        |    pattern: "^d[0-9]$"
        |""".stripMargin)
    val yaml =
      """inputs:
        |  people:
        |    json:
        |      path: people.json
        |pipelines:
        |  ok:
        |    - from: people
        |    - objectValidate:
        |        title: strictperson
        |        schema: schemas
        |outputs: {}
        |""".stripMargin
    val kept = YamlPlaybook.load(yaml, dir.toString).playbook
      .resolve(spark, "ok").select("id").collect().map(_.getString(0)).sorted
    // p4 has dept "dX" failing the ^d[0-9]$ pattern; the rest pass
    assert(kept.toSeq === Seq("p1", "p2", "p3"))
  }

  test("arbitrary-code steps are rejected with a clear message") {
    val dir = writeFixture()
    val yaml =
      """inputs:
        |  a:
        |    json:
        |      path: people.json
        |pipelines:
        |  p:
        |    - from: a
        |    - map:
        |        python: "def f(x): return x"
        |outputs: {}
        |""".stripMargin
    val err = intercept[RuntimeException] { YamlPlaybook.load(yaml, dir.toString) }
    assert(err.getMessage.contains("out of scope"))
  }

  test("gpython steps end-to-end: map ($ref + inline), filter, flatMap, reduce with init") {
    // the code-ref harness shape (test/examples/code-ref/Pipeline.yaml +
    // flatMappipeline.yaml): chained map blocks, a python filter, a
    // flatMap fan-out and a keyed reduce fold — fresh data, PyLite engine
    val dir = Files.createTempDirectory("graft_pylite_pb")
    Files.writeString(dir.resolve("bump.py"),
      "def update(x):\n    x[\"value\"] = x[\"value\"] + 10\n    return x\n")
    Files.writeString(dir.resolve("keep.py"),
      "def keep_even(row):\n    return row[\"value\"] % 2 == 0\n")
    val yaml =
      """name: pyliteTest
        |inputs:
        |  startData:
        |    embedded:
        |      - {"value": 0, "name": "ann", "grp": "g1"}
        |      - {"value": 1, "name": "bob", "grp": "g1"}
        |      - {"value": 2, "name": "cyd", "grp": "g2"}
        |pipelines:
        |  mapped:
        |    - from: startData
        |    - map:
        |        method: update
        |        gpython:
        |          $ref: bump.py
        |    - map:
        |        method: update
        |        gpython: |
        |          def update(x):
        |            x["value"] = x["value"] + 1
        |            return x
        |  evens:
        |    - from: mapped
        |    - filter:
        |        method: keep_even
        |        gpython:
        |          $ref: keep.py
        |  fanned:
        |    - from: mapped
        |    - flatMap:
        |        method: fan
        |        gpython: |
        |          def fan(row):
        |            out = []
        |            for i in range(2):
        |              out.append({"name": row["name"], "copy": i})
        |            return out
        |  folded:
        |    - from: mapped
        |    - reduce:
        |        field: grp
        |        method: merge
        |        init: { "names": [] }
        |        gpython: |
        |          def merge(x, y):
        |            y["grp"] = x["grp"]
        |            y["names"] = sorted(y["names"] + [x["name"]])
        |            return y
        |outputs: {}
        |""".stripMargin
    val pb = YamlPlaybook.load(yaml, dir.toString).playbook
    // map: 0,1,2 -> +10 -> +1 = 11,12,13
    val mapped = pb.resolve(spark, "mapped").orderBy("value")
      .collect().map(r => (r.getAs[String]("name"), r.getAs[Long]("value")))
    assert(mapped.toSeq === Seq(("ann", 11L), ("bob", 12L), ("cyd", 13L)))
    // filter keeps the single even value
    assert(pb.resolve(spark, "evens").collect().map(_.getAs[String]("name")).toSeq === Seq("bob"))
    // flatMap doubles every row
    assert(pb.resolve(spark, "fanned").count() === 6)
    // reduce folds names per grp from the init list
    val folded = pb.resolve(spark, "folded").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[scala.collection.Seq[String]]("names").toSeq).toMap
    assert(folded === Map("g1" -> Seq("ann", "bob"), "g2" -> Seq("cyd")))
  }

  test("dedup step: near-dup survivors from a YAML playbook (engine extension)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val yaml =
      s"""inputs:
         |  docs:
         |    embedded:
         |      - {doc_id: 1, text: "$base one"}
         |      - {doc_id: 2, text: "$base one"}
         |      - {doc_id: 3, text: "$base one zz"}
         |      - {doc_id: 4, text: "totally different words entirely here now yes ok fine sure"}
         |pipelines:
         |  clean:
         |    - from: docs
         |    - dedup:
         |        id: doc_id
         |        text: text
         |        keep: survivors
         |outputs: {}
         |""".stripMargin
    val dir = Files.createTempDirectory("graft_yaml_dedup")
    val loaded = YamlPlaybook.load(yaml, dir.toString)
    val kept = loaded.playbook.resolve(spark, "clean")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 2 is an exact dup of 1; 3 is a near dup of 1; 4 is unique
    assert(kept === Seq(1L, 4L))
  }

  test("five more reference example goldens run unmodified (test/config.yaml LineCounts)") {
    val res = "/root/reference/test/resources"
    val ex = java.nio.file.Paths.get("/root/reference/test/examples")
    assume(Files.exists(ex))
    def run(rel: String, params: Map[String, String]): YamlPlaybook.Loaded = {
      val dir = Files.createTempDirectory("graft_refgold")
      val fname = java.nio.file.Paths.get(rel).getFileName
      Files.copy(ex.resolve(rel), dir.resolve(fname))
      val loaded = YamlPlaybook.loadFile(dir.resolve(fname).toString, params)
      loaded.playbook.outputs.foreach { case (_, (from, sink)) =>
        sink(loaded.playbook.resolve(spark, from))
      }
      loaded
    }
    def lines(p: String): Long = spark.read.text(p).count()

    // gene-table: gz TSV + comment header, filter, 2-column table sink
    val gt = run("gene-table/gene-table.yaml", Map("geneTSV" -> s"$res/gene2ensembl.gz"))
    assert(lines(s"${gt.outdir}/gene.table") === 20L) // 19 rows + header

    // inline-table: lookup replace from an inline YAML map
    val it = run("lookup/inline-table.yaml", Map("json" -> s"$res/projects.json"))
    assert(lines(s"${it.outdir}/sifter.transform.test.json.gz") === 10L)

    // tsv-table-replace: fieldProcess over a MAP field + array replace
    val tr = run("lookup/tsv-table-replace.yaml", Map(
      "cases" -> s"$res/case.json", "diseaseTSV" -> s"$res/disease_table.tsv"))
    assert(lines(s"${tr.outdir}/gdc-projects.transform.case-mondo.json.gz") === 10L)

    // gene_collect: gpython reduce with list-append accumulator
    val gc = run("pathwaycommons/gene_collect.yaml", Map("sifFile" -> s"$res/pathways.sif"))
    assert(lines(s"${gc.outdir}/sifout.json.gz") === 3L)

    // pathway_commons: NESTED project template (list of maps) ->
    // fieldProcess -> distinct on a template key
    val pc = run("pathwaycommons/pathway_commons.yaml", Map("sifFile" -> s"$res/pathways.sif"))
    assert(lines(s"${pc.outdir}/pathway_commons.edges.json.gz") === 200L)
    assert(lines(s"${pc.outdir}/pathway_commons.nodes.json.gz") === 192L)
  }

  test("pfb golden: avro input + recursive gpython union-unwrap (1138 edges / 873 vertices)") {
    val res = "/root/reference/test/resources"
    val ex = java.nio.file.Paths.get("/root/reference/test/examples")
    assume(Files.exists(ex))
    val dir = Files.createTempDirectory("graft_pfb")
    Files.copy(ex.resolve("pfb/transform.yaml"), dir.resolve("transform.yaml"))
    val loaded = YamlPlaybook.loadFile(dir.resolve("transform.yaml").toString,
      Map("file" -> s"$res/1000G.pfb.avro"))
    loaded.playbook.outputs.foreach { case (_, (from, sink)) =>
      sink(loaded.playbook.resolve(spark, from))
    }
    def lines(p: String): Long = spark.read.text(p).count()
    assert(lines(s"${loaded.outdir}/pfb.edge.json") === 1138L)
    assert(lines(s"${loaded.outdir}/pfb.vertex.json") === 873L)
  }

  test("gdc-convert golden: 106,521 cases through project -> objectValidate -> 3 outputs") {
    // the reference's heaviest golden (test/config.yaml): the full
    // gdc-case corpus through a template project (with a MISSING nested
    // path — handlebars renders ''), objectValidate over the 30+-class
    // schema dir, a json output, and schema-links graph emission with a
    // gpython EdgeFix
    val src = java.nio.file.Paths.get("/root/reference/test/examples/gdc")
    assume(Files.exists(src.resolve("gdc-convert.yaml")))
    val dir = Files.createTempDirectory("graft_gdc")
    Files.copy(src.resolve("gdc-convert.yaml"), dir.resolve("gdc-convert.yaml"))
    Files.copy(src.resolve("test.py"), dir.resolve("test.py"))
    val loaded = YamlPlaybook.loadFile(dir.resolve("gdc-convert.yaml").toString,
      params = Map(
        "cases" -> "/root/reference/test/resources/gdc-case.json.gz",
        "schema" -> "/root/reference/test/resources/schemas"))
    loaded.playbook.outputs.foreach { case (_, (from, sink)) =>
      sink(loaded.playbook.resolve(spark, from))
    }
    def lines(path: String): Long = spark.read.text(path).count()
    // reference golden LineCounts (test/config.yaml): case file 106521,
    // vertices 106521. Its edge golden is 0 with a '#TODO: fix this
    // test' comment — the reference's own pointer-resolution bug; the
    // schema-CORRECT edge set is one per projects element (106521) plus
    // one per phenotypes element (21701) = 128222, which is what the
    // templatePointer-aware emission produces.
    assert(lines(s"${loaded.outdir}/gdc.caseObject.case.json.gz") === 106521L)
    assert(lines(s"${loaded.outdir}/gdc.caseGraph/vertex.json") === 106521L)
    assert(lines(s"${loaded.outdir}/gdc.caseGraph/edge.json") === 128222L)
    // EdgeFix (test.py) ran over every edge
    val edges = spark.read.json(s"${loaded.outdir}/gdc.caseGraph/edge.json")
    assert(edges.filter(col("TEST") === "test_string").count() === 128222L)
    // operator counters = the reference's Close()-time Validation
    // Summary (object_validate.go:86): 106,521 objects seen, 0 dropped
    // (its golden output keeps every case)
    val caseCounts = loaded.counters.snapshot().collect {
      case (k, v) if k.startsWith("objectValidate:") && k.endsWith(":Case") => v
    }
    assert(caseCounts === List(
      Map("validationCount" -> 106521L, "errorCount" -> 0L)))
  }

  test("the reference's own code-ref playbooks run UNMODIFIED (incl. $ref python files)") {
    // the strongest migration proof available: load
    // test/examples/code-ref/{Pipeline,flatMappipeline}.yaml from the
    // reference checkout byte-for-byte — embedded inputs, chained map
    // blocks ($ref + inline), python filter, flatMap fan-out, keyed
    // reduce with init — and assert the exact rows sifter produces
    val refDir = java.nio.file.Paths.get("/root/reference/test/examples/code-ref")
    assume(java.nio.file.Files.isDirectory(refDir), "reference repo not present")

    val pb1 = YamlPlaybook.loadFile(refDir.resolve("Pipeline.yaml").toString).playbook
    // codeTest: map($ref map.py: value+1) then inline map(value+1)
    val got1 = pb1.resolve(spark, "codeTest").orderBy("value")
      .collect().map(r => (r.getAs[String]("name"), r.getAs[Long]("value")))
    assert(got1.toSeq === Seq(("alice", 2L), ("bob", 3L), ("charlie", 4L)))

    val pb2 = YamlPlaybook.loadFile(refDir.resolve("flatMappipeline.yaml").toString).playbook
    // filterpipeline: reduce.py merge per COMPLEX_ID from init {proteins: []}
    val folded = pb2.resolve(spark, "filterpipeline").collect()
    assert(folded.length === 3) // three distinct COMPLEX_IDs
    folded.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("proteins").toSeq ===
        Seq(r.getAs[String]("PROTEIN")))
    }
    // otherpipelines: filter.py keeps bob; flatMap.py fans to 2 identifier rows
    val fanned = pb2.resolve(spark, "otherpipelines").collect()
    assert(fanned.length === 2)
    val bySystem = fanned.map(_.getAs[String]("value")).sorted
    assert(bySystem.toSeq === Seq("-3210373572193940992", "10011398_None"))
  }

  test("map step with explicit schema: DDL pins the output shape, bad shape fails loudly") {
    val dir = Files.createTempDirectory("graft_pylite_schema")
    val yaml =
      """inputs:
        |  a:
        |    embedded:
        |      - {"v": 1}
        |      - {"v": 2}
        |pipelines:
        |  good:
        |    - from: a
        |    - map:
        |        method: f
        |        schema: "v BIGINT, tag STRING"
        |        gpython: |
        |          def f(x):
        |            x["tag"] = "t" + str(x["v"])
        |            return x
        |  bad:
        |    - from: a
        |    - map:
        |        method: f
        |        schema: "only_this BIGINT"
        |        gpython: |
        |          def f(x):
        |            x["tag"] = "t"
        |            return x
        |outputs: {}
        |""".stripMargin
    val pb = YamlPlaybook.load(yaml, dir.toString).playbook
    val good = pb.resolve(spark, "good")
    assert(good.schema.map(f => f.name -> f.dataType.simpleString).toSeq ===
      Seq("v" -> "bigint", "tag" -> "string"))
    assert(good.orderBy("v").collect().map(_.getString(1)).toSeq === Seq("t1", "t2"))
    // keys outside the declared schema fail the task, not silently drop
    val err = intercept[Exception] { pb.resolve(spark, "bad").collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(err).exists(m => m != null && m.contains("output schema")))
  }

  test("third-review fixes: output-path params, null template rendering, " +
    "lookup-pipeline cycle, YAML-ordered project mapping") {
    val dir = Files.createTempDirectory("graft_r5fix")
    Files.writeString(dir.resolve("in.json"),
      """{"id": "r1", "a": "va", "b": null, "k1":"1","k2":"2","k3":"3","k4":"4","k5":"5","k6":"6"}
        |""".stripMargin)
    val yaml =
      """name: fixes
        |outdir: out
        |params:
        |  sub:
        |    type: String
        |    default: subdir
        |inputs:
        |  rows:
        |    json:
        |      path: in.json
        |outputs:
        |  o:
        |    json:
        |      from: t
        |      path: "{{params.sub}}/res.json"
        |pipelines:
        |  t:
        |    - from: rows
        |    - project:
        |        mapping:
        |          joined: "{{row.a}}-{{row.b}}"
        |          c1: "{{row.k1}}"
        |          c2: "{{row.k2}}"
        |          c3: "{{row.k3}}"
        |          c4: "{{row.k4}}"
        |          c5: "{{row.k5}}"
        |          c6: "{{row.k6}}"
        |""".stripMargin
    val loaded = YamlPlaybook.load(yaml, dir.toString)
    loaded.playbook.outputs.foreach { case (_, (from, sink)) =>
      sink(loaded.playbook.resolve(spark, from))
    }
    // 1) the output path substituted {{params.sub}} (was written literally)
    assert(Files.isDirectory(dir.resolve("out").resolve("subdir")),
      "output path must substitute params")
    val row = spark.read.json(s"${loaded.outdir}/subdir/res.json").collect().head
    // 2) mixed template renders the NULL field as "" (raymond), not NULL
    assert(row.getAs[String]("joined") === "va-")
    // 3) project mapping columns land in YAML order, not hash order
    val df = loaded.playbook.resolve(spark, "t")
    assert(df.columns.toSeq.filter(_.startsWith("c")) ===
      Seq("c1", "c2", "c3", "c4", "c5", "c6"))
    // 4) a cycle through lookup.pipeline fails at LOAD with a clean error
    val cyclic =
      """name: cyc
        |outdir: out
        |inputs:
        |  src:
        |    json:
        |      path: in.json
        |pipelines:
        |  a:
        |    - from: src
        |    - lookup:
        |        lookup: "{{row.id}}"
        |        pipeline:
        |          from: b
        |          key: id
        |        copy:
        |          x: id
        |  b:
        |    - from: a
        |""".stripMargin
    val e = intercept[RuntimeException](YamlPlaybook.load(cyclic, dir.toString))
    assert(e.getMessage.contains("pipeline cycle"), e.getMessage)
  }

  test("fieldProcess resolves a nested dotted field ($.a.b jsonpath semantics)") {
    // StructType.apply only sees top-level names; the reference resolves
    // `field:` through GetJSONPath, so `a.b` must reach the nested array
    // (transform/field_process.go:26-71 + evaluate/jsonpath.go)
    val dir = Files.createTempDirectory("graft_fp_nested")
    Files.writeString(dir.resolve("in.json"),
      """{"id": "r1", "a": {"b": [{"x": "1"}, {"x": "2"}]}}
        |{"id": "r2", "a": {"b": [{"x": "3"}]}}
        |""".stripMargin)
    val yaml =
      """name: fp-nested
        |outdir: out
        |inputs:
        |  rows:
        |    json:
        |      path: in.json
        |pipelines:
        |  t:
        |    - from: rows
        |    - fieldProcess:
        |        field: a.b
        |        mapping:
        |          pid: "{{row.id}}"
        |""".stripMargin
    val pb = YamlPlaybook.load(yaml, dir.toString).playbook
    val got = pb.resolve(spark, "t").select("pid", "x").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got === Seq(("r1", "1"), ("r1", "2"), ("r2", "3")))
  }
}
