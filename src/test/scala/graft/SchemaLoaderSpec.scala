package graft

import java.nio.file.{Files, Paths}
import graft.graph.GraphEmit
import graft.rules._
import graft.validate.Violations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** YAML schema-class loading + compilation (the sifter user's migration
  * path: point the engine at an existing schema directory). */
class SchemaLoaderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  val yaml: String =
    """$schema: https://json-schema.org/draft/2020-12/schema
      |$id: file
      |title: File
      |required:
      |- id
      |- repo_id
      |- size
      |links:
      |- rel: repos
      |  href: repo/{repo_id}
      |  templateRequired:
      |  - repo_id
      |  targetSchema:
      |    $ref: repo.yaml
      |  targetHints:
      |    multiplicity:
      |    - has_many
      |    backref:
      |    - files
      |properties:
      |  id:
      |    type: string
      |    pattern: '^f[0-9]+$'
      |  repo_id:
      |    type: string
      |  lang:
      |    type:
      |    - 'null'
      |    - string
      |    enum: [scala, go]
      |  size:
      |    type: integer
      |""".stripMargin

  lazy val cls = SchemaLoader.loadClassYaml(yaml)

  test("parses id/required/properties/links from sifter-shaped YAML") {
    assert(cls.id === "file")
    assert(cls.required === Seq("id", "repo_id", "size"))
    assert(cls.properties("lang").types === Seq("null", "string"))
    assert(cls.properties("lang").enumVals === Seq("scala", "go"))
    assert(cls.properties("id").pattern === Some("^f[0-9]+$"))
    val link = cls.links.head
    assert((link.rel, link.targetClass, link.href) === ("repos", "repo", "repo/{repo_id}"))
    assert(link.backref === Some("files"))
  }

  test("compiled rules reproduce objectValidate semantics on rows") {
    val df = Seq(
      ("f1", "r1", "scala", "10"),   // clean
      (null, "r1", "go", "11"),      // required_id
      ("x2", "r1", "scala", "12"),   // pattern_id
      ("f3", "r1", "klingon", "13"), // enum_lang
      ("f4", "r1", null, "14"),      // lang null allowed (union type)
      ("f5", "r1", "go", "big"))     // type_size
      .toDF("id", "repo_id", "lang", "size")
    val rules = SchemaLoader.compileRules(cls, df.columns.toSet)
    assert(rules.map(_.id).toSet === Set(
      "file.required_id", "file.required_repo_id", "file.required_size",
      "file.pattern_id", "file.enum_lang", "file.type_size"))
    val v = Violations.extract(df, rules, keyCols = Seq("id"))
      .select("rule_id").collect().map(_.getString(0)).sorted.toSeq
    assert(v === Seq("file.enum_lang", "file.pattern_id", "file.required_id",
      "file.type_size"))
  }

  test("schema-driven graph emission renders href targets; orphans detected") {
    val files = Seq(("f1", "r1"), ("f2", "r1"), ("f3", "rMISSING"))
      .toDF("id", "repo_id")
    val repos = Seq("r1").toDF("id")
    val edges = GraphEmit.schemaEdges(files, cls)
    assert(edges.count() === 3)
    assert(edges.filter(col("_to") === "repo/r1").count() === 2)
    val repoCls = SchemaLoader.loadClassYaml("$id: repo\ntitle: Repo\n")
    // graphcheck probes BOTH endpoints, so the vertex set must be the
    // union of all classes — file vertices included, or every _from
    // would (correctly) count as dangling
    val verts = GraphEmit.schemaVertices(repos, repoCls)
      .unionByName(GraphEmit.schemaVertices(files.select("id"), cls))
    val orphans = GraphEmit.orphanEdges(edges, verts)
    assert(orphans.collect().map(_.getAs[String]("_to")).toSeq === Seq("repo/rMISSING"))
  }

  test("compat: loads the reference's own schema directory when present") {
    val dir = "/root/reference/test/resources/schemas"
    assume(Files.exists(Paths.get(dir)))
    val classes = SchemaLoader.loadDir(dir)
    assert(classes.size > 10)
    val project = classes("project")
    assert(project.required.contains("project_id"))
    assert(project.links.exists(l => l.targetClass == "program"))
    // and compiling against a plausible column set yields rules
    val rules = SchemaLoader.compileRules(project,
      Set("id", "submitter_id", "project_id"))
    assert(rules.nonEmpty)
  }
}
