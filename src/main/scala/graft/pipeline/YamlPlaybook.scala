package graft.pipeline

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.RowOps
import graft.sinks.Sinks
import graft.sources.{Sources, SqlDump, SqliteSource, XmlSource}

/** Loader for reference-style YAML playbooks (playbook/load.go:26-75):
  * `params` / `inputs` / `pipelines` / `outputs` parse into the existing
  * [[Playbook]] DSL, each step mapping onto the RowOps/Sources/Sinks
  * inventory — so a sifter-shaped playbook file runs unmodified on the
  * Spark engine. Field names follow the reference's `json:"..."` tags
  * (transform/interface.go:58-80, extractors/interface.go:16-25,
  * playbook/load.go:20-37).
  *
  * Templating: `{{params.x}}` resolves at load time from YAML defaults
  * overridden by the caller's map (config/params); any other
  * `{{path}}` placeholder becomes a column reference at plan-build time
  * (the handlebars row context, evaluate/template.go) — a mixed string
  * compiles to a codegen'd `concat` of literals and columns.
  *
  * Python code blocks (`map`/`flatmap`/`reduce`/`filter` with
  * `gpython:` inline code or a `$ref:` file, playbook/refs/
  * code_block.go:16-45) run on the from-scratch PyLite interpreter
  * ([[graft.pylite.PyOps]]) — compiled once at load time, interpreted
  * per partition. The `python:` engine key (CPython over gRPC/docker,
  * evaluate/python.go) remains out of scope: it is an external-service
  * bridge; `gpython:` is the embedded engine the reference's own test
  * playbooks use, and that is what PyLite replaces.
  */
object YamlPlaybook {

  // ---------- YAML plumbing ----------

  /** YAML mappings preserve INSERTION order (snakeyaml gives a
    * LinkedHashMap): keep it — scala's default HashMap reorders beyond
    * 4 entries, which would emit project mappings / struct templates /
    * output columns in hash order instead of playbook order. */
  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] =>
      scala.collection.immutable.ListMap(
        m.asScala.toSeq.map { case (k, v) => k.toString -> v }: _*)
    case _ => Map.empty
  }
  private def asSeq(o: Any): Seq[Any] = o match {
    case l: java.util.List[_] => l.asScala.toSeq
    case null => Seq.empty
    case x => Seq(x)
  }
  private def str(o: Any): String = Option(o).map(_.toString).getOrElse("")

  /** The `{{params.x}}` placeholder — ONE compiled pattern shared by
    * inspect() and load()'s subst (drift between copies is how the
    * output-path substitution gap happened). */
  private val ParamRx = "\\{\\{\\s*params\\.([A-Za-z0-9_]+)\\s*\\}\\}".r

  /** `counters` carries the run's operator-level metrics (lookup
    * hit/miss, objectValidate error/object counts — the reference's
    * Close()-time log lines, see [[OpCounters]]); populated by the
    * output actions of `playbook.run`. */
  final case class Loaded(playbook: Playbook, name: String, outdir: String,
      counters: OpCounters = new OpCounters)

  def loadFile(path: String, params: Map[String, String] = Map.empty): Loaded =
    load(java.nio.file.Files.readString(java.nio.file.Paths.get(path)),
      java.nio.file.Paths.get(path).toAbsolutePath.getParent.toString, params)

  /** `params:` section → defaulted values. A spec map WITHOUT `default:`
    * contributes no value — the param must come from the caller. */
  private def paramDefaults(root: Map[String, Any]): Map[String, String] =
    asMap(root.getOrElse("params", null)).flatMap { case (k, v) =>
      v match {
        case m: java.util.Map[_, _] => asMap(m).get("default").map(d => k -> str(d))
        case other => Some(k -> str(other))
      }
    }

  // ---------- inspect (cmd/inspect/main.go:18-78) ----------

  def inspectFile(path: String, params: Map[String, String] = Map.empty): String =
    inspect(java.nio.file.Files.readString(java.nio.file.Paths.get(path)),
      java.nio.file.Paths.get(path).toAbsolutePath.getParent.toString, params)

  /** `sifter inspect` parity for YAML playbooks: required-param
    * discovery (every `{{params.x}}` referenced anywhere in the
    * document — the analog of walking step templates,
    * playbook/inspect.go:10-24) plus resolved output paths
    * (inspect.go:26-37), as JSON. Purely static: no pipeline
    * compilation, no Spark session — a playbook whose required params
    * are NOT provided still inspects (unresolved placeholders stay
    * verbatim in the reported paths). */
  def inspect(yaml: String, baseDir: String,
      params: Map[String, String] = Map.empty): String = {
    val raw = new org.yaml.snakeyaml.Yaml().load[Any](yaml)
    val root = asMap(raw)
    val defaults = paramDefaults(root)
    val have = defaults ++ params
    val rx = ParamRx

    def strings(o: Any): Iterator[String] = o match {
      case m: java.util.Map[_, _] =>
        m.asScala.iterator.flatMap { case (k, v) => strings(k) ++ strings(v) }
      case l: java.util.List[_] => l.asScala.iterator.flatMap(strings)
      case null => Iterator.empty
      case x => Iterator(x.toString)
    }
    val referenced = strings(raw)
      .flatMap(s => rx.findAllMatchIn(s).map(_.group(1))).toSeq.distinct.sorted

    // best-effort substitution: provided/defaulted params resolve,
    // missing ones keep their {{params.x}} placeholder
    def subst(s: String): String = rx.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        have.getOrElse(m.group(1), m.matched)))
    def resolve(s: String): String = {
      val sub = subst(s)
      if (sub.startsWith("/") || sub.contains("://")) sub else s"$baseDir/$sub"
    }
    val outdir = resolve(str(root.getOrElse("outdir", ".")))
    def outPath(p: String): String = {
      val sub = subst(p)
      if (sub.startsWith("/") || sub.contains("://")) sub else s"$outdir/$sub"
    }
    val outputs = asMap(root.getOrElse("outputs", null)).map { case (name, rawSink) =>
      val m = asMap(rawSink)
      val path =
        if (m.contains("json")) outPath(str(asMap(m("json")).getOrElse("path", "")))
        else if (m.contains("table")) outPath(str(asMap(m("table")).getOrElse("path", "")))
        else if (m.contains("graph")) outPath(str(asMap(m("graph")).getOrElse("path", name)))
        else s"<unsupported sink: ${m.keys.mkString(",")}>"
      name -> path
    }

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = om.createObjectNode()
    out.put("name", str(root.getOrElse("name", "")))
    out.put("outdir", outdir)
    val cf = out.putObject("configFields")
    referenced.foreach(n => cf.put(n, n))
    val cfg = out.putArray("config")
    referenced.foreach { n =>
      val e = cfg.addObject()
      e.put("name", n)
      defaults.get(n).foreach(d => e.put("default", d))
      e.put("provided", have.contains(n))
    }
    val outs = out.putObject("outputs")
    outputs.toSeq.sortBy(_._1).foreach { case (k, v) => outs.put(k, v) }
    om.writerWithDefaultPrettyPrinter().writeValueAsString(out)
  }

  def load(yaml: String, baseDir: String,
      params: Map[String, String] = Map.empty): Loaded = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](yaml))

    // params: YAML defaults overridden by caller values (config.Params).
    // Referencing an undefaulted, unoverridden param must fail as
    // `undefined param`, not silently substitute junk into a path.
    val p = paramDefaults(root) ++ params
    def subst(s: String): String =
      ParamRx.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(
          p.getOrElse(m.group(1), sys.error(s"undefined param: ${m.group(1)}"))))
    def resolvePath(s: String): String = {
      val sub = subst(s)
      if (sub.startsWith("/") || sub.contains("://")) sub else s"$baseDir/$sub"
    }

    // any remaining {{path}} is a row-context template -> Column,
    // resolved against the concrete frame's schema: a path that doesn't
    // exist renders "" — raymond/handlebars semantics for missing
    // fields (evaluate/template.go) — instead of failing analysis
    def colTemplate(df: DataFrame)(s: String): Column = {
      val rx = "\\{\\{\\s*([^}]+?)\\s*\\}\\}".r
      val sub = subst(s)
      val lits = rx.split(sub)
      val fields = rx.findAllMatchIn(sub).map(_.group(1).stripPrefix("row.")).toSeq
      def fieldCol(f: String): Column =
        if (graft.rules.SchemaLoader.hasPath(df.schema, f)) col(f) else lit("")
      if (fields.isEmpty) lit(sub)
      else {
        val pieces = lits.toSeq.map(l => Option(l).filter(_.nonEmpty).map(lit))
          .zipAll(fields.map(f => Some(fieldCol(f))), None, None)
          .flatMap { case (a, b) => Seq(a, b).flatten }
        // a single bare {{row.x}} passes the TYPED column through (the
        // engine's fixed-schema strengthening of raymond's stringify);
        // a MIXED template renders null fields as "" like raymond —
        // concat alone would null the whole rendered string on one
        // null field, which silently breaks hash/lookup/filter steps
        if (pieces.size == 1) pieces.head
        else concat(pieces.map(p => coalesce(p.cast("string"), lit(""))): _*)
      }
    }

    val inputs: Map[String, SparkSession => DataFrame] =
      asMap(root.getOrElse("inputs", null)).map { case (name, raw) =>
        name -> inputLoader(name, asMap(raw), resolvePath)
      }

    // lookup.pipeline joins against ANOTHER pipeline of this playbook —
    // steps run at resolve time (after load returns), so a forward
    // reference through this holder is safe and Playbook.resolve's own
    // cycle detection still applies to the main `from` graph
    var built: Playbook = null
    val resolvePipeline: (SparkSession, String) => DataFrame = (s, n) => {
      require(built != null, "playbook not fully constructed")
      built.resolve(s, n)
    }

    val counters = new OpCounters
    val pipelines: Map[String, Pipeline] =
      asMap(root.getOrElse("pipelines", null)).map { case (name, raw) =>
        val stepMaps = asSeq(raw).map(asMap)
        require(stepMaps.nonEmpty, s"pipeline '$name' has no steps")
        val from = str(stepMaps.head.getOrElse("from",
          sys.error(s"pipeline '$name': first step must be `from:` (playbook/execute.go)")))
        // 1-based step ordinal (after `from:`) disambiguates counter
        // labels — two lookup steps in one pipeline must not share an
        // OpCounters key (first-completed-wins would drop one silently)
        val steps = stepMaps.tail.zipWithIndex.map { case (m, i) =>
          stepFn(name, m, resolvePath, subst, colTemplate, resolvePipeline,
            counters, i + 1)
        }
        name -> Pipeline(from, steps)
      }

    val outdir = resolvePath(str(root.getOrElse("outdir", ".")))
    val outputs: Map[String, (String, DataFrame => Unit)] =
      asMap(root.getOrElse("outputs", null)).map { case (name, raw) =>
        name -> outputSink(name, asMap(raw), outdir, resolvePath, subst)
      }

    // static cycle check over `from` AND lookup-pipeline references:
    // Playbook.resolve's runtime detection covers the main from-graph,
    // but a lookup step resolving its pipeline: target starts a FRESH
    // resolve — a cycle through it would recurse to StackOverflow
    // instead of a clean error, so reject it at load
    {
      val rawPipes = asMap(root.getOrElse("pipelines", null))
        .map { case (n, raw) => n -> asSeq(raw).map(asMap) }
      def refs(steps: Seq[Map[String, Any]]): Seq[String] = steps.flatMap { m =>
        m.get("from").map(str).toSeq ++
          m.get("lookup").toSeq.flatMap(l =>
            asMap(asMap(l).getOrElse("pipeline", null)).get("from").map(str))
      }
      val edges = rawPipes.map { case (n, steps) =>
        n -> refs(steps).filter(rawPipes.contains).distinct }
      val done = scala.collection.mutable.Set.empty[String]
      def visit(n: String, path: Seq[String]): Unit =
        if (!done.contains(n)) {
          if (path.contains(n)) sys.error(
            s"pipeline cycle: ${(path.dropWhile(_ != n) :+ n).mkString(" -> ")}")
          edges.getOrElse(n, Seq.empty).foreach(visit(_, path :+ n))
          done += n
        }
      rawPipes.keys.foreach(visit(_, Seq.empty))
    }

    built = Playbook(inputs, pipelines, outputs)
    Loaded(built, str(root.getOrElse("name", "")), outdir, counters)
  }

  // ---------- inputs (extractors/interface.go:16-25) ----------

  private def inputLoader(name: String, m: Map[String, Any],
      resolvePath: String => String): SparkSession => DataFrame = {
    // paths and params resolve EAGERLY: a bad path template or missing
    // param fails at load time (the reference's UnmarshalStrict moment),
    // not on the first run of whatever pipeline touches this input
    def cfg(k: String) = asMap(m(k))
    if (m.contains("json")) {
      val c = cfg("json")
      val path = resolvePath(str(c("path")))
      val multiline = c.get("multiline").exists(_ == true)
      val pinned = jsonSchemaOf(name, c, multiline)
      s =>
        if (multiline) Sources.jsonDoc(s, path)
        else pinned.fold(Sources.ndjson(s, path))(
          sch => Sources.ndjsonWithSchema(sch)(s, path))
    } else if (m.contains("table")) {
      val c = cfg("table")
      val path = resolvePath(str(c("path")))
      val spec = Sources.TableSpec(
        sep = c.get("sep").map(str).filter(_.nonEmpty).getOrElse("\t"),
        comment = c.get("comment").map(str).getOrElse("#"),
        rowSkip = c.get("rowSkip").map(str(_).toInt).getOrElse(0),
        columns = Option(asSeq(c.getOrElse("columns", null)).map(str)).filter(_.nonEmpty),
        extraColumns = c.get("extraColumns").map(str).filter(_.nonEmpty))
      s => Sources.table(s, path, spec)
    } else if (m.contains("avro")) {
      val path = resolvePath(str(cfg("avro")("path")))
      s => Sources.avro(s, path)
    } else if (m.contains("xml")) {
      val c = cfg("xml")
      val path = resolvePath(str(c("path")))
      val level = c.get("level").map(str(_).toInt).getOrElse(0)
      s => XmlSource.xml(s, path, level)
    } else if (m.contains("sqldump")) {
      val c = cfg("sqldump")
      val path = resolvePath(str(c("path")))
      val tables = asSeq(c.getOrElse("tables", null)).map(str)
      s => SqlDump.load(s, path, tables)
    } else if (m.contains("sqlite")) {
      val c = cfg("sqlite")
      // the reference's Query is a plain `SELECT * FROM t` scan
      // (sqlite_load.go:14-15); richer SQL composes in Spark on top
      val q = str(c.getOrElse("query", ""))
      val table = "(?is)SELECT\\s+\\*\\s+FROM\\s+([A-Za-z0-9_\"`]+)".r
        .findFirstMatchIn(q).map(_.group(1))
        .getOrElse(sys.error(s"input '$name': sqlite query must be SELECT * FROM <table>, got '$q'"))
        .stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")
      val path = resolvePath(str(c("input")))
      s => SqliteSource.table(s, path, table)
    } else if (m.contains("embedded")) {
      // embedded: a YAML list of row objects (extractors/embedded.go)
      val rows = asSeq(m("embedded")).map(r => toJsonString(asMap(r)))
      s => { import s.implicits._; s.read.json(s.createDataset(rows)) }
    } else if (m.contains("glob")) {
      // glob: expand a pattern through an inner json/table/avro/xml
      // loader, optionally storing source file name/path per row
      // (extractors/glob_load.go:14-98)
      val c = cfg("glob")
      val pattern = resolvePath(str(c("path")))
      val innerKeys = Seq("json", "table", "avro", "xml").filter(c.contains)
      require(innerKeys.size == 1,
        s"input '$name': glob needs exactly one inner loader (json/table/avro/xml)")
      val innerCfg = c(innerKeys.head) match {
        case im: java.util.Map[_, _] => asMap(im)
        case _ => Map.empty[String, Any]
      }
      val inner = inputLoaderAt(name, innerKeys.head, innerCfg, resolvePath)
      val storeFilename = c.get("storeFilename").map(str).filter(_.nonEmpty)
      val storeFilepath = c.get("storeFilepath").map(str).filter(_.nonEmpty)
      // NDJSON inner = a Spark file source → one multi-file scan with
      // input_file_name(), not a per-file plan fold (scale path)
      val fileSource = innerKeys.head == "json" &&
        !innerCfg.get("multiline").exists(_ == true)
      s => Sources.glob(s, pattern, inner, storeFilename, storeFilepath,
        fileSourceInner = fileSource)
    } else
      sys.error(s"input '$name': unsupported extractor ${m.keys.mkString(",")} " +
        "(supported: json, table, avro, xml, sqldump, sqlite, embedded; " +
        "gripper/plugin are declared out of scope)")
  }

  /** Optional `schema:` DDL on a `json:` input (an extension over the
    * schema-free reference, mirroring the `schema:` the python steps
    * already take): NDJSON without a declared schema pays a hidden
    * EAGER inference pass — a full extra read of the corpus at plan
    * build, measured at ~2x total cost over 10^5 files
    * (BENCH/NOTES.md glob_fanin) — so a playbook that knows its
    * columns pins them and gets the single-scan plan
    * ([[Sources.ndjsonWithSchema]]). Parsed eagerly: a bad DDL fails at
    * load time like every other config error. */
  private def jsonSchemaOf(name: String, c: Map[String, Any],
      multiline: Boolean): Option[org.apache.spark.sql.types.StructType] =
    c.get("schema").map(str).map { ddl =>
      require(!multiline,
        s"input '$name': schema pinning applies to NDJSON (multiline " +
          "documents are whole-file reads; inference is not the cost there)")
      try org.apache.spark.sql.types.StructType.fromDDL(ddl)
      catch {
        case e: Exception =>
          sys.error(s"input '$name': bad schema DDL '$ddl': ${e.getMessage}")
      }
    }

  /** Inner loader for `glob:` — the inner config without its own path;
    * the glob pattern is injected as the path argument. */
  private def inputLoaderAt(name: String, kind: String, c: Map[String, Any],
      resolvePath: String => String): (SparkSession, String) => DataFrame = kind match {
    case "json" =>
      val multiline = c.get("multiline").exists(_ == true)
      val pinned = jsonSchemaOf(name, c, multiline)
      (s, p) =>
        if (multiline) Sources.jsonDoc(s, p)
        else pinned.fold(Sources.ndjson(s, p))(
          sch => Sources.ndjsonWithSchema(sch)(s, p))
    case "table" =>
      val spec = Sources.TableSpec(
        sep = c.get("sep").map(str).filter(_.nonEmpty).getOrElse("\t"),
        comment = c.get("comment").map(str).getOrElse("#"),
        rowSkip = c.get("rowSkip").map(str(_).toInt).getOrElse(0),
        columns = Option(asSeq(c.getOrElse("columns", null)).map(str)).filter(_.nonEmpty),
        extraColumns = c.get("extraColumns").map(str).filter(_.nonEmpty))
      (s, p) => Sources.table(s, p, spec)
    case "avro" => (s, p) => Sources.avro(s, p)
    case "xml" =>
      val level = c.get("level").map(str(_).toInt).getOrElse(0)
      (s, p) => XmlSource.xml(s, p, level)
    case other => sys.error(s"input '$name': glob inner loader '$other' unsupported")
  }

  private def toJsonString(m: Map[String, Any]): String = {
    def enc(v: Any): String = v match {
      case null => "null"
      case s: String => "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      case b: java.lang.Boolean => b.toString
      case n: Number => n.toString
      case l: java.util.List[_] => l.asScala.map(enc).mkString("[", ",", "]")
      case mm: java.util.Map[_, _] => enc(asMap(mm))
      case mm: Map[_, _] =>
        mm.map { case (k, x) => enc(k.toString) + ":" + enc(x) }.mkString("{", ",", "}")
      case other => enc(other.toString)
    }
    enc(m)
  }

  // ---------- steps (transform/interface.go:58-80) ----------

  private def stepFn(pipe: String, m: Map[String, Any],
      resolvePath: String => String, subst: String => String,
      colTemplate: DataFrame => String => Column,
      resolvePipeline: (SparkSession, String) => DataFrame,
      counters: OpCounters, stepIdx: Int): (String, DataFrame => DataFrame) = {
    require(m.size == 1 || (m.size == 2 && m.contains("docs")),
      s"pipeline '$pipe': each step must be a single-key map, got ${m.keys.mkString(",")}")
    val (key, raw) = m.view.filterKeys(_ != "docs").head
    def c = asMap(raw)
    def field = str(c.getOrElse("field", ""))
    val fn: DataFrame => DataFrame = key match {
      case "project" =>
        val rawMapping = asMap(c.getOrElse("mapping", null)).toSeq
        val renames = asMap(c.getOrElse("rename", null)).toSeq
          .map { case (from, to) => from -> str(to) }
        // template values render RECURSIVELY through nested YAML
        // lists/maps (project.go:57-82 valueRender): a list of maps of
        // templates becomes array(struct(...)) of rendered columns
        def valueCol(df: DataFrame)(v: Any): Column = v match {
          case s: String => colTemplate(df)(s)
          case l: java.util.List[_] =>
            array(l.asScala.toSeq.map(valueCol(df)): _*)
          case m: java.util.Map[_, _] =>
            struct(asMap(m).toSeq.map { case (k, x) => valueCol(df)(x).as(k) }: _*)
          case other => lit(other)
        }
        df => {
          val mapping = rawMapping.map { case (dst, v) => dst -> valueCol(df)(v) }
          RowOps.rename(RowOps.project(df, mapping: _*), renames: _*)
        }
      case "filter" if c.contains("gpython") || c.contains("python") =>
        // python-predicate form (filter.go:30-47): EvaluateBool per row
        val code = codeBlock(pipe, "filter", c, resolvePath)
        val method = str(c.getOrElse("method", ""))
        require(method.nonEmpty, s"pipeline '$pipe': filter gpython needs method:")
        df => graft.pylite.PyOps.filterPy(df, code, method)
      case "filter" =>
        val check = str(c.getOrElse("check", ""))
        df => {
          val f = col(field)
          val pred = check match {
            case "exists" => f.isNotNull
            case "hasValue" => RowOps.hasValue(f)
            // null-safe: the reference renders a missing field as "" so
            // null ≠ match KEEPS the row under `not` — plain !(===)
            // would yield SQL NULL and drop it
            case "not" => !(f.cast("string") <=> colTemplate(df)(str(c("match"))).cast("string"))
            case _ => f.cast("string") === colTemplate(df)(str(c("match"))).cast("string")
          }
          RowOps.keep(df, pred)
        }
      case "clean" =>
        val fields = asSeq(c.getOrElse("fields", null)).map(str)
        val removeEmpty = c.get("removeEmpty").exists(_ == true)
        val storeExtra = c.get("storeExtra").map(str).filter(_.nonEmpty)
        df => RowOps.clean(df, fields, removeEmpty, storeExtra)
      case "fieldParse" =>
        // empty YAML values fall back to the reference defaults
        // (field_parse.go:25-32: sep ";", assign "=")
        df => RowOps.fieldParse(df, field, field,
          sep = Some(str(c.getOrElse("sep", ""))).filter(_.nonEmpty).getOrElse(";"),
          assign = Some(str(c.getOrElse("assign", ""))).filter(_.nonEmpty).getOrElse("="))
      case "fieldType" =>
        // FieldTypeStep is a plain map field -> type (field_type.go:9)
        val casts = asMap(raw).toSeq
        df => casts.foldLeft(df) { case (d, (f, t)) =>
          str(t) match {
            case "int" | "integer" => RowOps.fieldType(d, f -> LongType)
            case "float" | "number" => RowOps.fieldType(d, f -> DoubleType)
            case "list" => RowOps.promoteToList(d, f)
            case other => sys.error(s"pipeline '$pipe': fieldType '$other' unsupported")
          }
        }
      case "split" =>
        df => RowOps.splitField(df, field, str(c.getOrElse("sep", ",")))
      case "regexReplace" =>
        df => RowOps.regexReplace(df, field, subst(str(c("regex"))),
          subst(str(c("replace"))), c.get("dst").map(str).filter(_.nonEmpty))
      case "hash" =>
        df => RowOps.hashField(df, field, colTemplate(df)(str(c("value"))),
          str(c.getOrElse("method", "sha1")))
      case "uuid" =>
        // no value template -> random v4 per row (uuid.go:38-41)
        val valueTpl = str(c.getOrElse("value", ""))
        df => {
          graft.expr.UuidExprs.register(df.sparkSession)
          val u =
            if (valueTpl.isEmpty) expr("uuid()")
            else graft.expr.UuidExprs.uuid5(
              lit(str(c.getOrElse("namespace", graft.expr.NameUuid.NamespaceUrl))),
              colTemplate(df)(valueTpl))
          df.withColumn(field, u)
        }
      case "dropNull" =>
        // the reference removes null-valued KEYS per row, keeping the
        // row (drop_null.go:14-22). Under a fixed columnar schema that
        // is a serialization concern, and Spark's JSON writer already
        // omits null fields (ignoreNullFields=true by default) — so the
        // step is an identity on the DataFrame, NOT a row filter
        // (na.drop would silently delete sparse rows).
        df => df
      case "distinct" =>
        df => df.dropDuplicates(Seq(templateFields(str(c.getOrElse("value", ""))): _*))
      case "accumulate" =>
        df => RowOps.accumulateRows(df, field, str(c.getOrElse("dest", "rows")))
      case "fieldProcess" =>
        val mapping = asMap(c.getOrElse("mapping", null)).toSeq
          .map { case (dst, v) => dst -> str(v) }
        val itemField = str(c.getOrElse("itemField", ""))
        // NOTE: resolve the field's type through the analyzer, not
        // StructType.apply — the latter only sees top-level names, but
        // `field:` may be a nested dotted path (the reference resolves it
        // via GetJSONPath '$.a.b', jsonpath.go).
        df => df.select(col(field)).schema.head.dataType.typeName match {
          case "struct" =>
            // a MAP-valued field emits ONE row: the sub-object plus the
            // mapping columns rendered against the parent row
            // (field_process.go:61-67)
            df.select(col(s"$field.*") +:
              mapping.map { case (dst, tpl) => colTemplate(df)(tpl).as(dst) }: _*)
          case _ =>
            val exploded = df.select(col("*"), explode(col(field)).as("__elem"))
            val elemT = exploded.schema("__elem").dataType
            elemT.typeName match {
              case "struct" => exploded.select(col("__elem.*") +:
                mapping.map { case (dst, tpl) => colTemplate(exploded)(tpl).as(dst) }: _*)
              case _ =>
                val elemName = if (itemField.nonEmpty) itemField else field
                exploded.select(col("__elem").as(elemName) +:
                  mapping.map { case (dst, tpl) => colTemplate(exploded)(tpl).as(dst) }: _*)
            }
        }
      case "lookup" =>
        lookupStep(pipe, c, resolvePath, colTemplate, resolvePipeline,
          counters, stepIdx)
      case "intervalIntersect" =>
        val j = asMap(c.getOrElse("json", null))
        df => {
          val ref = Sources.ndjson(df.sparkSession, resolvePath(str(j("input"))))
          RowOps.intervalAttach(df, ref,
            str(c("match")), str(c("start")), str(c("end")),
            str(j("match")), str(j("start")), str(j("end")),
            attachAs = if (field.nonEmpty) field else "intersect")
        }
      case "debug" => df => RowOps.debug(df)
      case "objectValidate" =>
        // per-row JSON-Schema validation (object_validate.go:31-87):
        // rules compile ONCE to Column predicates; pass -> row kept,
        // fail -> row dropped, exactly the reference's stream behavior.
        // Violation ROWS (the engine's richer output) remain available
        // through graft.validate.Violations on the same compiled rules.
        val schemaDir = resolvePath(str(c("schema")))
        val title = str(c.getOrElse("title", ""))
        df => {
          val classes = graft.rules.SchemaLoader.loadDir(schemaDir)
          val cls = classes.getOrElse(title,
            classes.values.find(_.title == title).getOrElse(
              sys.error(s"pipeline '$pipe': objectValidate class '$title' not found in $schemaDir")))
          val rules = graft.rules.SchemaLoader.compileRules(cls, df.columns.toSet)
          rules.map(_.pass).reduceOption(_ && _) match {
            case None => df
            case Some(pass) =>
              // per-class counters (object_validate.go:71-86:
              // validationCount = rows seen, errorCount = rows dropped)
              // observed BELOW the filter so they ride the output job
              counters.attach(df, s"objectValidate:$pipe[$stepIdx]:$title", Seq(
                count(lit(1)).as("validationCount"),
                sum(when(pass, 0L).otherwise(1L)).as("errorCount")))
                .filter(pass)
          }
        }
      case "map" =>
        val code = codeBlock(pipe, "map", c, resolvePath)
        val method = str(c.getOrElse("method", ""))
        require(method.nonEmpty, s"pipeline '$pipe': map needs method:")
        df => graft.pylite.PyOps.mapPy(df, code, method, schema = ddlSchema(c))
      case "flatmap" | "flatMap" =>
        // Go's json unmarshal matches field names case-insensitively, so
        // reference playbooks spell this both ways (interface.go:71 tag
        // is `flatmap`; test/examples/code-ref uses `flatMap`)
        val code = codeBlock(pipe, "flatMap", c, resolvePath)
        val method = str(c.getOrElse("method", ""))
        require(method.nonEmpty, s"pipeline '$pipe': flatMap needs method:")
        df => graft.pylite.PyOps.flatMapPy(df, code, method, schema = ddlSchema(c))
      case "reduce" =>
        val code = codeBlock(pipe, "reduce", c, resolvePath)
        val method = str(c.getOrElse("method", ""))
        require(method.nonEmpty, s"pipeline '$pipe': reduce needs method:")
        val keyField = str(c.getOrElse("field", ""))
        val init = c.get("init").map(i => toJsonString(asMap(i)))
        df => graft.pylite.PyOps.reducePy(df, keyField, code, method, init,
          schema = ddlSchema(c))
      case "dedup" =>
        // ENGINE EXTENSION (no reference analog — its only dedup is
        // first-wins `distinct`): the production near-dup pipeline as a
        // playbook step, so a sifter user can drop corpus dedup into an
        // existing YAML flow. keep: survivors (default) keeps one doc
        // per exact+near-dup cluster; clusters / pairs expose the
        // intermediate tables instead.
        val idField = str(c.getOrElse("id", ""))
        val textField = str(c.getOrElse("text", ""))
        require(idField.nonEmpty && textField.nonEmpty,
          s"pipeline '$pipe': dedup needs id: and text: fields")
        val keep = str(c.getOrElse("keep", "survivors"))
        require(Set("survivors", "clusters", "pairs")(keep),
          s"pipeline '$pipe': dedup keep: must be survivors/clusters/pairs, got '$keep'")
        val threshold = c.get("threshold").map(str(_).toDouble).getOrElse(0.8)
        df => {
          val r = graft.dedup.Dedup.pipeline(df, idField, textField, threshold)
          // keep=pairs never pays for clustering (DedupResult is lazy);
          // the kept table is materialized eagerly (localCheckpoint) so
          // the pipeline's persisted intermediates can be RELEASED here
          // instead of leaking for the session lifetime
          val out = (keep match {
            case "survivors" => r.survivors
            case "clusters" => r.clusters
            case "pairs" => r.pairs
          }).localCheckpoint()
          r.unpersist()
          out
        }
      case "plugin" =>
        sys.error(s"pipeline '$pipe': step 'plugin' runs an external executable — " +
          "use graft.sources.Plugin.transform from the Scala DSL, where the " +
          "command allow-listing is explicit")
      case other => sys.error(s"pipeline '$pipe': unknown step '$other'")
    }
    key -> fn
  }

  /** Optional `schema:` DDL on python steps (an extension over the
    * schema-free reference): at 100 TB, pinning the output schema skips
    * the driver-side sample-inference pass and catches shape drift at
    * load time instead of mid-job. */
  private def ddlSchema(c: Map[String, Any]): Option[org.apache.spark.sql.types.StructType] =
    c.get("schema").map(s => org.apache.spark.sql.types.StructType.fromDDL(str(s)))

  /** Resolve a `gpython:` block — inline code string or `{$ref: file}`
    * loaded relative to the playbook dir (refs/code_block.go:16-45).
    * The `python:` key (external CPython engine) is rejected with a
    * pointer to the gpython form. */
  private def codeBlock(pipe: String, step: String, c: Map[String, Any],
      resolvePath: String => String): String = {
    require(!c.contains("python") || c.contains("gpython"),
      s"pipeline '$pipe': $step `python:` uses the external CPython/gRPC engine " +
        "(out of scope); use `gpython:` — it runs on the embedded PyLite interpreter")
    c.getOrElse("gpython", sys.error(s"pipeline '$pipe': $step needs gpython:")) match {
      case s: String => s
      case m: java.util.Map[_, _] =>
        val ref = str(asMap(m).getOrElse("$ref",
          sys.error(s"pipeline '$pipe': $step gpython map must be {$$ref: file}")))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(resolvePath(ref))), java.nio.charset.StandardCharsets.UTF_8)
      case other => sys.error(s"pipeline '$pipe': bad gpython block: $other")
    }
  }

  private def templateFields(tpl: String): Seq[String] = {
    val fields = "\\{\\{\\s*([^}]+?)\\s*\\}\\}".r
      .findAllMatchIn(tpl).map(_.group(1).stripPrefix("row.")).toSeq
    require(fields.nonEmpty, s"distinct value template has no fields: '$tpl'")
    fields
  }

  private def lookupStep(pipe: String, c: Map[String, Any],
      resolvePath: String => String,
      colTemplate: DataFrame => String => Column,
      resolvePipeline: (SparkSession, String) => DataFrame,
      counters: OpCounters, stepIdx: Int): DataFrame => DataFrame = {
    val replace = str(c.getOrElse("replace", ""))
    val copy = asMap(c.getOrElse("copy", null)).map { case (k, v) => k -> str(v) }
    def lookupTable(spark: SparkSession): (DataFrame, String, String) =
      if (c.contains("tsv")) {
        val t = asMap(c("tsv"))
        val header = asSeq(t.getOrElse("header", null)).map(str)
        val df = Sources.table(spark, resolvePath(str(t("input"))),
          Sources.TableSpec(
            sep = if (t.contains("sep")) str(t("sep")) else "\t",
            columns = Option(header).filter(_.nonEmpty)))
        (df, str(t("key")), str(t.getOrElse("value", "")))
      } else if (c.contains("json")) {
        val t = asMap(c("json"))
        (Sources.ndjson(spark, resolvePath(str(t("input")))),
          str(t("key")), str(t.getOrElse("value", "")))
      } else if (c.contains("table")) {
        // inline YAML map (lookup_table.go / the inline-table example)
        import spark.implicits._
        val rows = asMap(c("table")).toSeq.map { case (k, v) => (k, str(v)) }
        (rows.toDF("key", "value"), "key", "value")
      } else if (c.contains("pipeline")) {
        // right side = another pipeline of this playbook — the
        // reference's hash join between pipelines (lookup_pipeline.go)
        val t = asMap(c("pipeline"))
        (resolvePipeline(spark, str(t("from"))),
          str(t("key")), str(t.getOrElse("value", "")))
      } else sys.error(s"pipeline '$pipe': lookup needs tsv/json/table/pipeline")
    if (replace.nonEmpty) { df =>
      val (lk, k, v) = lookupTable(df.sparkSession)
      val valCol = if (v.nonEmpty) v else lk.columns.find(_ != k).getOrElse(v)
      // dispatch on the field's shape like the reference's replace path
      // (lookup.go:154-214: scalar / []any elements / map keys).
      // Scalar replace gets hit/miss counters too (ENGINE EXTENSION:
      // the reference only counts on the copy path — lookup.go:199-208
      // — but the numbers are free here, riding the same join)
      df.schema(replace).dataType.typeName match {
        case "array" => RowOps.lookupReplaceArray(df, lk, replace, k, valCol)
        case "map" => RowOps.lookupReplaceMapKeys(df, lk, replace, k, valCol)
        case _ => RowOps.lookupReplace(df, lk, replace, k, valCol,
          tap = j => counters.attach(j, s"lookup:$pipe[$stepIdx]", Seq(
            sum(when(col("__lk_key").isNotNull, 1L).otherwise(0L)).as("hit"),
            sum(when(col("__lk_key").isNull, 1L).otherwise(0L)).as("miss"))))
      }
    } else if (copy.nonEmpty) {
      // loud load-time failure: an absent/empty `lookup:` template would
      // otherwise join every row on "" and silently attach nothing
      val tpl = str(c.getOrElse("lookup", ""))
      if (tpl.isEmpty)
        sys.error(s"pipeline '$pipe': lookup copy needs a non-empty `lookup:` key template")
      df => {
        val (lk, k, _) = lookupTable(df.sparkSession)
        // reference counter semantics (lookup.go:199-208): hit++ per
        // (row, copy field) actually attached on a record match —
        // relationally, matched AND source value present (non-null);
        // miss++ per row whose key has no record
        val nCopies = copy.size
        val tap: DataFrame => DataFrame = j =>
          counters.attach(j, s"lookup:$pipe[$stepIdx]", Seq(
            (0 until nCopies).map(i =>
              sum(when(col("__lk_key").isNotNull &&
                col(s"__lk_src_$i").isNotNull, 1L).otherwise(0L)))
              .reduce(_ + _).as("hit"),
            sum(when(col("__lk_key").isNull, 1L).otherwise(0L)).as("miss")))
        RowOps.lookupCopy(df, lk, colTemplate(df)(tpl), col(k), tap,
          copy.toSeq: _*)
      }
    } else sys.error(s"pipeline '$pipe': lookup needs replace: or copy:")
  }

  // ---------- outputs (playbook/load.go:20-24) ----------

  private def outputSink(name: String, m: Map[String, Any], outdir: String,
      resolvePath: String => String,
      subst: String => String): (String, DataFrame => Unit) = {
    // output paths get the SAME param substitution inputs do (an
    // undefined param fails at load, a defined one resolves — without
    // this a {{params.x}} path was written literally while inspect()
    // reported the substituted one)
    def out(p: String): String = {
      val s0 = subst(p)
      if (s0.startsWith("/") || s0.contains("://")) s0 else s"$outdir/$s0"
    }
    if (m.contains("json")) {
      val c = asMap(m("json"))
      val path = out(str(c("path")))
      (str(c("from")), df => Sinks.ndjson(df, path, gzip = path.endsWith(".gz")))
    } else if (m.contains("table")) {
      val c = asMap(m("table"))
      val path = out(str(c("path")))
      val cols = asSeq(c.getOrElse("columns", null)).map(str)
      val sep = if (c.contains("sep")) str(c("sep")) else "\t"
      (str(c("from")), df =>
        Sinks.table(df, path, if (cols.nonEmpty) cols else df.columns.toIndexedSeq,
          sep, gzip = path.endsWith(".gz")))
    } else if (m.contains("graph")) {
      // schema-driven vertex/edge emission (output_graph.go:55-158)
      val c = asMap(m("graph"))
      val schemaDir = resolvePath(str(c("schema")))
      val title = str(c.getOrElse("title", ""))
      val idField = str(c.getOrElse("idField", "id"))
      val dir = out(str(c.getOrElse("path", name)))
      // optional edgeFix/EdgeFix (Go's json unmarshal is case-tolerant):
      // a user python row→row function over each edge before emission
      // (output_graph.go:79-90, applied at :138-143)
      val edgeFix: DataFrame => DataFrame =
        c.get("edgeFix").orElse(c.get("EdgeFix")).map(asMap) match {
          case Some(ef) =>
            val code = codeBlock(name, "edgeFix", ef, resolvePath)
            val method = str(ef.getOrElse("method", ""))
            require(method.nonEmpty, s"output '$name': edgeFix needs method:")
            graft.pylite.PyOps.compile(code, method) // fail fast at load
            edges =>
              // sample inference can't run on zero rows; zero edges
              // also means there is nothing to fix
              if (edges.isEmpty) edges
              else graft.pylite.PyOps.mapPy(edges, code, method)
          case None => identity
        }
      (str(c("from")), df => {
        val classes = graft.rules.SchemaLoader.loadDir(schemaDir)
        val cls = classes.getOrElse(title,
          classes.values.find(_.title == title).getOrElse(
            sys.error(s"output '$name': schema class '$title' not found in $schemaDir")))
        Sinks.graph(
          graft.graph.GraphEmit.schemaVertices(df, cls, idField,
            df.columns.toIndexedSeq.filterNot(Set("_id", "_label"))),
          graft.graph.GraphEmit.schemaEdges(df, cls, idField), dir,
          edgeFix = edgeFix)
      })
    } else sys.error(s"output '$name': unsupported sink ${m.keys.mkString(",")}")
  }
}
