package graft

import graft.pylite._
import graft.pylite.PyInterp._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** PyLite language semantics + the four Spark steps, exercised with the
  * reference's OWN playbook code blocks verbatim
  * (test/examples/code-ref/{map,filter,flatMap,reduce}.py and
  * test/examples/pfb/transform.yaml). */
class PyLiteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(code: String, method: String, args: Any*): Any =
    new PyInterp(PyParser.compile(code, method)).call(method, args: _*)

  private def dict(kv: (Any, Any)*): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap[Any, Any](kv: _*)
  private def list(xs: Any*): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer[Any](xs: _*)

  // ---- language level ---------------------------------------------------

  test("reference map.py: increments a dict field in place") {
    // test/examples/code-ref/map.py, verbatim
    val code = "def update(x):\n    x[\"value\"] = x[\"value\"] + 1\n    return x"
    val out = run(code, "update", dict("value" -> 41L, "name" -> "alice"))
    assert(out === dict("value" -> 42L, "name" -> "alice"))
  }

  test("reference filter.py: equality test (tab-indented source)") {
    // filter.py is indented with a TAB
    val code = "def filter_bob(row):\n\treturn row['name'] == \"bob\""
    assert(run(code, "filter_bob", dict("name" -> "bob")) === java.lang.Boolean.TRUE)
    assert(run(code, "filter_bob", dict("name" -> "alice")) === java.lang.Boolean.FALSE)
  }

  test("reference flatMap.py: nested literals, str(int()), is not None, else branch") {
    val code =
      """def fix(row):
        |    out = {
        |        "identifier":[{
        |        "system": "https://redivis.com/datasets/ye2v-6skh7wdr7/tables",
        |        "value":str(int(row["person_id"]))
        |        }]
        |    }
        |
        |    if(row["person_source_value"] is not None):
        |        out["identifier"].append({
        |        "value": row["person_source_value"],
        |        "system": "https://redivis.com/datasets/ye2v-6skh7wdr7/tables"
        |        })
        |    else:
        |        out["identifier"].append({"value": "None", "system": "https://redivis.com/datasets/ye2v-6skh7wdr7/tables"})
        |
        |    out["identifier"][1]["value"] =  str(out["identifier"][1]["value"]) + "_" + "None"
        |
        |    return out["identifier"]
        |""".stripMargin
    val out = run(code, "fix", dict("person_id" -> 3589912774911670272L, "person_source_value" -> 10009628L))
      .asInstanceOf[mutable.ArrayBuffer[Any]]
    assert(out.length === 2)
    assert(out(0).asInstanceOf[mutable.LinkedHashMap[Any, Any]]("value") === "3589912774911670272")
    // nested-subscript assignment target mutated element 1
    assert(out(1).asInstanceOf[mutable.LinkedHashMap[Any, Any]]("value") === "10009628_None")
    // the None branch
    val out2 = run(code, "fix", dict("person_id" -> 7L, "person_source_value" -> null))
      .asInstanceOf[mutable.ArrayBuffer[Any]]
    assert(out2(1).asInstanceOf[mutable.LinkedHashMap[Any, Any]]("value") === "None_None")
  }

  test("reference pfb transform: recursion, isinstance, len, in, items() over nested values") {
    // test/examples/pfb/transform.yaml lines 37-57, verbatim
    val code =
      """def transform(x):
        |  if x is None:
        |    return x
        |  if isinstance(x, dict):
        |      if len(x) == 1 and "string" in x:
        |          return x["string"]
        |      elif len(x) == 1 and "float" in x:
        |          return x["float"]
        |      elif len(x) == 1 and "long" in x:
        |          return x["long"]
        |      else:
        |          out = {}
        |          for i in x.items():
        |              out[i[0]] = transform(i[1])
        |          return out
        |  elif isinstance(x, list):
        |      out = []
        |      for i in x:
        |          out.append(transform(i))
        |      return out
        |  return x
        |""".stripMargin
    val in = dict(
      "a" -> dict("string" -> "hello"),
      "b" -> list(dict("long" -> 7L), dict("float" -> 1.5), null),
      "c" -> dict("x" -> dict("string" -> "deep"), "y" -> 3L))
    val out = run(code, "transform", in)
    assert(out === dict(
      "a" -> "hello",
      "b" -> list(7L, 1.5, null),
      "c" -> dict("x" -> "deep", "y" -> 3L)))
  }

  test("reference reduce.py merge: list concat with accumulator") {
    val code = "def merge(x,y):\n\tx[\"proteins\"] = [x[\"PROTEIN\"]] + y[\"proteins\"]\n\treturn x"
    val acc0 = dict("proteins" -> list())
    val r1 = run(code, "merge", dict("COMPLEX_ID" -> "c1", "PROTEIN" -> "p1"), acc0)
    val r2 = run(code, "merge", dict("COMPLEX_ID" -> "c1", "PROTEIN" -> "p2"), r1)
    assert(r2.asInstanceOf[mutable.LinkedHashMap[Any, Any]]("proteins") === list("p2", "p1"))
  }

  test("arithmetic: int/float promotion, floor div/mod, division is float, ** precedence") {
    val code =
      """def f():
        |  return [7 // 2, -7 // 2, 7 % 3, -7 % 3, 7 / 2, 2 ** 3 ** 1, -2 ** 2, 1.5 * 2]
        |""".stripMargin
    assert(run(code, "f") === list(3L, -4L, 1L, 2L, 3.5, 8L, -4L, 3.0))
  }

  test("string methods: no-arg split vs literal split, strip/join/replace/startswith") {
    val code =
      """def f(s):
        |  parts = s.split()
        |  csv = s.strip().replace("  ", " ")
        |  return {"n": len(parts), "j": "-".join(parts), "lit": "a,,b".split(","),
        |          "sw": s.strip().startswith("he"), "up": "a b".title()}
        |""".stripMargin
    val out = run(code, "f", "  hello   world  ").asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    assert(out("n") === 2L)
    assert(out("j") === "hello-world")
    assert(out("lit") === list("a", "", "b")) // literal split keeps empties
    assert(out("sw") === java.lang.Boolean.TRUE)
    assert(out("up") === "A B")
  }

  test("truthiness, and/or return operands, conditional expression, not in") {
    val code =
      """def f(x):
        |  a = x or "dflt"
        |  b = x and "set"
        |  c = "yes" if len(a) > 3 else "no"
        |  d = "q" not in a
        |  return [a, b, c, d]
        |""".stripMargin
    assert(run(code, "f", "") === list("dflt", "", "yes", true))
    assert(run(code, "f", "hi") === list("hi", "set", "no", true))
  }

  test("while/break/continue, augmented assignment, range") {
    val code =
      """def f(n):
        |  total = 0
        |  i = 0
        |  while True:
        |    i += 1
        |    if i > n:
        |      break
        |    if i % 2 == 0:
        |      continue
        |    total += i
        |  evens = []
        |  for j in range(0, n + 1, 2):
        |    evens.append(j)
        |  return {"odd_sum": total, "evens": evens}
        |""".stripMargin
    val out = run(code, "f", 10L).asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    assert(out("odd_sum") === 25L)
    assert(out("evens") === list(0L, 2L, 4L, 6L, 8L, 10L))
  }

  test("slices, negative indices, dict get/pop/update, sorted/min/max/sum") {
    val code =
      """def f():
        |  xs = [3, 1, 2]
        |  d = {"a": 1}
        |  d.update({"b": 2})
        |  return {"s1": "hello"[1:4], "s2": "hello"[-3:], "e": xs[-1],
        |          "g": d.get("z", 9), "srt": sorted(xs), "mn": min(xs),
        |          "mx": max(1, 5, 3), "sm": sum(xs), "b": d["b"]}
        |""".stripMargin
    val out = run(code, "f").asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    assert(out("s1") === "ell"); assert(out("s2") === "llo")
    assert(out("e") === 2L); assert(out("g") === 9L)
    assert(out("srt") === list(1L, 2L, 3L))
    assert(out("mn") === 1L); assert(out("mx") === 5L); assert(out("sm") === 6L)
  }

  test("loud failures: KeyError, missing name, bad method, chained comparison, step budget") {
    intercept[PyLiteException](run("def f(d):\n  return d[\"nope\"]", "f", dict()))
    intercept[PyLiteException](run("def f():\n  return zzz", "f"))
    intercept[PyLiteException](PyParser.compile("def g():\n  return 1", "other"))
    intercept[PyLiteException](PyParser.compile("def f(a):\n  return 1 < a < 3", "f"))
    // imports parse (playbooks write `import hashlib`), but a module
    // outside the allow-list fails at execution
    intercept[PyLiteException](run("def f():\n  import os\n  return 1", "f"))
    intercept[PyLiteException](PyParser.compile("def f():\n  class X:\n    pass\n  return 1", "f"))
    val budget = new PyInterp(PyParser.compile("def f():\n  while True:\n    pass", "f"), maxSteps = 10000)
    intercept[PyBudgetExceeded](budget.call("f"))
    // and an except: handler cannot swallow the budget — the runaway
    // loop still fails the task
    val sneaky = new PyInterp(PyParser.compile(
      "def f():\n  try:\n    while True:\n      pass\n  except:\n    return 'swallowed'", "f"),
      maxSteps = 10000)
    intercept[PyBudgetExceeded](sneaky.call("f"))
  }

  test("try/except: defensive parse pattern; control flow passes through") {
    val code =
      """def parse(row):
        |  try:
        |    row["n"] = int(row["s"])
        |  except:
        |    row["n"] = None
        |  return row
        |""".stripMargin
    assert(run(code, "parse", dict("s" -> "42")).asInstanceOf[mutable.LinkedHashMap[Any, Any]]("n") === 42L)
    assert(run(code, "parse", dict("s" -> "oops")).asInstanceOf[mutable.LinkedHashMap[Any, Any]]("n") === null)
    // return inside try is control flow, not an exception
    val ret = "def g():\n  try:\n    return 'from_try'\n  except Exception:\n    return 'from_handler'"
    assert(run(ret, "g") === "from_try")
    // a named specific exception is rejected loudly at parse
    intercept[PyLiteException](PyParser.compile(
      "def h():\n  try:\n    pass\n  except ValueError:\n    pass", "h"))
  }

  test("single-line blocks take keyword statements; type(x) == dict compares true") {
    val code =
      """def f(x):
        |  if x > 10: return "big"
        |  while x < 5: x += 1
        |  for i in range(2): pass
        |  if type({}) == dict and type(x) == int: return x
        |  return -1
        |""".stripMargin
    assert(run(code, "f", 20L) === "big")
    assert(run(code, "f", 1L) === 5L)
  }

  test("int overflow raises instead of wrapping") {
    intercept[PyLiteException](run("def f(x):\n  return x * x * x * x", "f", 3037000500L))
    // unary minus on Long.MinValue raises the same PyLite overflow
    intercept[PyLiteException](run("def f(x):\n  return -x", "f", Long.MinValue))
  }

  test("review-batch regressions: power budget, literal errors, float strictness") {
    // 1 ** huge cannot overflow its way out of the loop — the budget
    // (not wall-clock) must stop it
    val p = new PyInterp(PyParser.compile("def f():\n  return 1 ** 1000000000000", "f"), maxSteps = 10000)
    intercept[PyBudgetExceeded](p.call("f"))
    // bignum literal and malformed float literal fail as PyLite parse
    // errors, not raw NumberFormatException
    intercept[PyLiteException](PyParser.parse("x = 99999999999999999999"))
    // '1e' lexes as NUM(1) NAME(e), so the parser reports a clean
    // syntax error rather than a raw NumberFormatException
    intercept[PyLiteException](PyParser.parse("x = 1e"))
    // float() rejects java-isms CPython rejects, accepts python's inf/nan
    intercept[PyLiteException](run("def f():\n  return float('1.5d')", "f"))
    intercept[PyLiteException](run("def f():\n  return float('0x1p3')", "f"))
    assert(run("def f():\n  return float('inf')", "f").asInstanceOf[Double].isPosInfinity)
    // %f of inf prints like python instead of crashing
    assert(run("def f():\n  return '%.2f' % float('-inf')", "f") === "-inf")
    // stray conversion raises instead of passing through
    intercept[PyLiteException](run("def f():\n  return '%s %q' % 'a'", "f"))
  }

  test("cbio alleleID: import hashlib + sha1(s.encode()).hexdigest() (examples/cbio.yaml)") {
    val code =
      """import hashlib
        |def alleleID(row):
        |  s = "GRCh37" + row["Chromosome"] + str(row["Start_Position"]) + str(row["End_Position"]) + row["Reference_Allele"] + row["Tumor_Seq_Allele1"]
        |  row["allele_id"] = "Allele:" + hashlib.sha1(s.encode()).hexdigest()
        |  return row
        |""".stripMargin
    val out = run(code, "alleleID", dict(
      "Chromosome" -> "7", "Start_Position" -> 140453136L, "End_Position" -> 140453136L,
      "Reference_Allele" -> "A", "Tumor_Seq_Allele1" -> "T"))
      .asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    val expected = java.security.MessageDigest.getInstance("SHA-1")
      .digest("GRCh377140453136140453136AT".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(out("allele_id") === s"Allele:$expected")
  }

  test("cbio nodeMap: for k,v over items with not-in keep-list") {
    val code =
      """def nodeMap(x):
        |  values = {}
        |  for k, v in x.items():
        |    if k not in ["id", "aliquot_id", "Entrez_Gene_Id"]:
        |      values[k] = v
        |  return {
        |    "id": x["id"],
        |    "aliquot_id": x["aliquot_id"],
        |    "metric": "OTHER",
        |    "values": values
        |  }
        |""".stripMargin
    val out = run(code, "nodeMap", dict(
      "id" -> "s1", "aliquot_id" -> "a1", "Entrez_Gene_Id" -> 7L, "TP53" -> 0.5, "KRAS" -> 1.5))
      .asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    assert(out("metric") === "OTHER")
    assert(out("values") === dict("TP53" -> 0.5, "KRAS" -> 1.5))
  }

  test("gdc test.py parses despite mixed tab/8-space indentation (tab = 8 cols)") {
    val code = "def test(row):\n\trow[\"TEST\"] = \"test_string\"\n        return row\n"
    val out = run(code, "test", dict("a" -> 1L)).asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    assert(out("TEST") === "test_string")
  }

  test("every python block in the reference repo compiles under PyLite") {
    // parse-certification over the reference's OWN playbooks: walk
    // test/examples + examples for gpython/python blocks and .py code
    // files; each must lex+parse (the CLI scripts under docschema/ and
    // gdc-scan-docker/ are dev tooling, not playbook code blocks)
    val refRoot = java.nio.file.Paths.get("/root/reference")
    assume(java.nio.file.Files.isDirectory(refRoot), "reference repo not present")
    val keyRx = "^(\\s*)(?:gpython|python):\\s*\\|[-+]?\\s*$".r
    /** YAML block-scalar extraction: after a `gpython: |` key, the code
      * is every following line blank or indented deeper than the key. */
    def yamlBlocks(src: String): Seq[String] = {
      val lines = src.split("\n", -1)
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < lines.length) {
        keyRx.findFirstMatchIn(lines(i)) match {
          case Some(m) =>
            val keyIndent = m.group(1).length
            val body = Seq.newBuilder[String]
            var j = i + 1
            while (j < lines.length &&
              (lines(j).trim.isEmpty || lines(j).takeWhile(_ == ' ').length > keyIndent)) {
              body += lines(j); j += 1
            }
            val bl = body.result()
            val indents = bl.filter(_.trim.nonEmpty).map(_.takeWhile(_ == ' ').length)
            val cut = if (indents.isEmpty) 0 else indents.min
            out += bl.map(l => if (l.length >= cut) l.substring(cut) else l).mkString("\n")
            i = j
          case None => i += 1
        }
      }
      out.result()
    }
    def blocks(dir: String): Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(refRoot.resolve(dir)).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .flatMap { p =>
          val name = p.toString
          if (name.endsWith(".py")) {
            Seq(name -> new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
          } else if (name.endsWith(".yaml") || name.endsWith(".yml")) {
            yamlBlocks(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
              .zipWithIndex.map { case (code, k) => s"$name#gpython$k" -> code }
          } else Seq.empty
        }.toSeq
    }
    val all = (blocks("test/examples") ++ blocks("examples"))
      .filterNot(_._1.contains("gdc-scan-docker"))
    assert(all.size >= 12, s"expected the reference's known code blocks, found ${all.size}")
    val failures = all.flatMap { case (src, code) =>
      try { PyParser.parse(code); None }
      catch { case e: PyLiteException => Some(s"$src: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("CPython differential goldens: 46 semantic cases match real python output") {
    // src/test/resources/pylite_golden.json is generated ONCE by
    // tools/gen_pylite_golden.py under real CPython (the same
    // golden-row pattern the uuid5 expressions use): arithmetic incl.
    // negative floor-div/mod, string/list/dict methods, slicing,
    // truthiness, and/or returns, round()'s banker's rounding,
    // conversions, isinstance, recursion
    val url = getClass.getResource("/pylite_golden.json")
    assert(url != null, "pylite_golden.json fixture missing")
    val cases = PyBridge.jsonToPy(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(url.toURI)), "UTF-8"))
      .asInstanceOf[mutable.ArrayBuffer[Any]]
    assert(cases.length >= 46)
    val failures = cases.flatMap { c =>
      val m = c.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
      val name = m("name").asInstanceOf[String]
      val args = m("args").asInstanceOf[mutable.ArrayBuffer[Any]].toSeq
      try {
        val got = run(m("code").asInstanceOf[String], m("method").asInstanceOf[String],
          args.map(PyBridge.deepCopy): _*)
        if (pyEq(got, m("expected"))) None
        else Some(s"$name: PyLite=${pyRepr(got)} CPython=${pyRepr(m("expected"))}")
      } catch { case e: PyLiteException => Some(s"$name: threw ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("kwargs limits documented: positional-after-keyword, unknown/dup kwargs, " +
    "method kwargs, non-dict splat all raise precisely") {
    def bad(code: String, frag: String): Unit = {
      val e = intercept[PyLiteException](run(code, "f"))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    bad("def g(a, b):\n  return a\ndef f():\n  return g(b=1, 2)",
      "positional argument follows keyword")
    bad("def g(a):\n  return a\ndef f():\n  return g(zz=1)",
      "unexpected keyword argument 'zz'")
    bad("def g(a):\n  return a\ndef f():\n  return g(1, a=2)",
      "multiple values for argument 'a'")
    bad("def f():\n  return [3, 1].sort(reverse=True)",
      "keyword arguments are not supported for method")
    bad("def f():\n  return dict(**[1])", "must be a mapping")
    bad("def f():\n  return dict(a=1, **{'a': 2})", "multiple values")
    bad("def f():\n  return len(x=1)", "unexpected keyword argument")
  }

  test("numeric underscores: 1_000 lexes; 1_, 1__0, 1_.5 raise like CPython") {
    assert(run("def f():\n  return 1_000 + 2_5", "f") === java.lang.Long.valueOf(1025L))
    for (bad <- Seq("1_", "1__0", "1_.5", "_1" /* lexes as a NAME → undefined */ ))
      intercept[PyLiteException](run(s"def f():\n  return $bad", "f"))
  }

  test("astral-plane strings: len/index/slice/iterate count codepoints, not UTF-16 units") {
    val s = "😀é🚀z" // 😀é🚀z — 4 chars, 6 UTF-16 units
    assert(run("def f(s):\n  return len(s)", "f", s) === java.lang.Long.valueOf(4L))
    assert(run("def f(s):\n  return s[0]", "f", s) === "😀")
    assert(run("def f(s):\n  return s[-1]", "f", s) === "z")
    assert(run("def f(s):\n  return s[1:3]", "f", s) === "é🚀")
    assert(run("def f(s):\n  return [c for c in s]", "f", s)
      .asInstanceOf[mutable.ArrayBuffer[Any]].toSeq ===
      Seq("😀", "é", "🚀", "z"))
    assert(run("def f(s):\n  return s.find('z')", "f", s) === java.lang.Long.valueOf(3L))
  }

  test("self-referential containers: str() renders [...] like python; == raises cleanly") {
    assert(run("def f():\n  x = [1]\n  x.append(x)\n  return str(x)", "f") === "[1, [...]]")
    assert(run("def f():\n  d = {}\n  d['self'] = d\n  return str(d)", "f") === "{'self': {...}}")
    intercept[PyLiteException](
      run("def f():\n  x = [1]\n  x.append(x)\n  y = [1]\n  y.append(y)\n  return x == y", "f"))
    // identity fast path: x == x on a cyclic container is True (CPython)
    assert(run("def f():\n  x = [1]\n  x.append(x)\n  return x == x", "f") === java.lang.Boolean.TRUE)
    // ordering on cyclic lists raises cleanly, not StackOverflowError
    intercept[PyLiteException](
      run("def f():\n  x = [1]\n  x.append(x)\n  y = [1]\n  y.append(y)\n  return x < y", "f"))
    // deeply nested ACYCLIC container: repr raises cleanly too
    intercept[PyLiteException](
      run("def f():\n  x = []\n  i = 0\n  while i < 5000:\n    x = [x]\n    i += 1\n  return str(x)", "f"))
  }

  test("fuzz: arbitrary input parses or raises PyLiteException — never hangs or leaks") {
    // an executor wedged or killed by a MatchError from a malformed
    // code block is the worst failure mode an embedded interpreter can
    // have; every input must terminate in a clean parse or a clean
    // PyLiteException
    val rnd = new scala.util.Random(0xC0FFEE)
    val pieces = Array(
      "def ", "f", "(", ")", ":", "\n", "  ", "\t", "return ", "if ", "else",
      "elif ", "for ", "in ", "while ", "try", "except", "import ", "[", "]",
      "{", "}", ",", ".", "=", "==", "+", "-", "*", "/", "%", "'", "\"",
      "f'", "x", "1", "2.5", "'a'", "\"b\"", "not ", "and ", "or ", "None",
      "True", "lambda", "#c", "@", "$", "\\", "0x", "!", "!=", "**", "...",
      "f\"{", "}'", "'''", ":=")
    var parsed = 0
    (1 to 800).foreach { _ =>
      val src = Seq.fill(rnd.nextInt(30) + 1)(pieces(rnd.nextInt(pieces.length))).mkString
      try { PyParser.parse(src); parsed += 1 }
      catch {
        case _: PyLiteException => () // the contract
        case t: Throwable => fail(s"non-PyLite failure on input ${src.take(120).replace("\n", "\\n")}: $t")
      }
    }
    assert(parsed > 0) // sanity: the generator does produce some valid programs
  }

  // ---- Spark level ------------------------------------------------------

  test("mapPy: schema inference + execution matches a Column-based plan") {
    val df = Seq((0L, "alice"), (1L, "bob"), (2L, "charlie")).toDF("value", "name")
    val code = "def update(x):\n    x[\"value\"] = x[\"value\"] + 1\n    return x"
    val out = PyOps.mapPy(df, code, "update")
    assert(out.schema.fieldNames.toSeq === Seq("value", "name"))
    assert(out.orderBy("value").as[(Long, String)].collect().toSeq ===
      Seq((1L, "alice"), (2L, "bob"), (3L, "charlie")))
  }

  test("pyToAny: Infinity / out-of-range whole doubles into a Long field " +
    "fail LOUDLY, never silently saturate to Long.MaxValue") {
    import org.apache.spark.sql.types.LongType
    // (through mapPy the sampled inference would just widen the field
    // to double — the saturation hazard is the declared-Long target)
    assert(PyBridge.pyToAny(java.lang.Double.valueOf(3.0), LongType, "n")
      === java.lang.Long.valueOf(3L))
    intercept[Exception](PyBridge.pyToAny(
      java.lang.Double.valueOf(Double.PositiveInfinity), LongType, "n"))
    intercept[Exception](PyBridge.pyToAny(
      java.lang.Double.valueOf(1e19), LongType, "n"))
  }

  test("filterPy keeps schema and matches the reference filter example") {
    val df = Seq(("alice", 1L), ("bob", 2L), ("charlie", 3L)).toDF("name", "k")
    val code = "def filter_bob(row):\n\treturn row['name'] == \"bob\""
    val out = PyOps.filterPy(df, code, "filter_bob")
    assert(out.schema === df.schema)
    assert(out.collect().map(_.getString(0)).toSeq === Seq("bob"))
  }

  test("flatMapPy: one row to N rows with nested struct schema inferred") {
    val df = Seq((3589912774911670272L, Some(10009628L)), (7L, None))
      .toDF("person_id", "person_source_value")
    val code =
      """def fix(row):
        |    out = [{"value": str(int(row["person_id"])), "n": 0}]
        |    if row["person_source_value"] is not None:
        |        out.append({"value": str(row["person_source_value"]), "n": 1})
        |    return out
        |""".stripMargin
    val out = PyOps.flatMapPy(df, code, "fix")
    assert(out.count() === 3)
    assert(out.where($"n" === 1).select("value").as[String].collect().toSeq === Seq("10009628"))
  }

  test("reducePy: fold from init dict per key, reference arg order merge(row, acc)") {
    val df = Seq(("c1", "p1"), ("c1", "p2"), ("c2", "p3"))
      .toDF("COMPLEX_ID", "PROTEIN")
    val code = "def merge(x,y):\n\tx[\"proteins\"] = [x[\"PROTEIN\"]] + y[\"proteins\"]\n\treturn x"
    val out = PyOps.reducePy(df, "COMPLEX_ID", code, "merge", initJson = Some("""{"proteins": []}"""))
    val rows = out.collect().map { r =>
      r.getAs[String]("COMPLEX_ID") -> r.getAs[scala.collection.Seq[String]]("proteins").sorted.toSeq
    }.toMap
    assert(rows("c1") === Seq("p1", "p2"))
    assert(rows("c2") === Seq("p3"))
  }

  test("schema inference unions shapes across sampled rows; missing keys are null") {
    val df = Seq(1L, 2L, 3L).toDF("v")
    val code =
      """def f(x):
        |  if x["v"] == 1:
        |    return {"a": x["v"]}
        |  return {"a": x["v"], "b": "extra"}
        |""".stripMargin
    val out = PyOps.mapPy(df, code, "f")
    assert(out.schema.fieldNames.sorted.toSeq === Seq("a", "b"))
    assert(out.where($"b".isNull).count() === 1)
  }

  test("a key outside the inferred/explicit schema fails the task loudly") {
    val df = Seq(1L, 2L).toDF("v")
    val code = "def f(x):\n  return {\"a\": x[\"v\"]}"
    val explicit = StructType(Seq(StructField("z", LongType)))
    val ex = intercept[Exception] {
      PyOps.mapPy(df, code, "f", schema = Some(explicit)).collect()
    }
    assert(ex.getMessage.contains("output schema") || ex.getCause != null)
  }

  test("mixed-type field widens to string with deterministic rendering") {
    val df = Seq(1L, 2L).toDF("v")
    val code =
      """def f(x):
        |  if x["v"] == 1:
        |    return {"v": x["v"], "a": 5}
        |  return {"v": x["v"], "a": "five"}
        |""".stripMargin
    val out = PyOps.mapPy(df, code, "f")
    assert(out.schema("a").dataType === StringType)
    assert(out.orderBy("v").select("a").as[String].collect().toSeq === Seq("5", "five"))
  }

  test("mapPy works inside Structured Streaming (file stream, explicit schema)") {
    // the python step is a deserialize->mapPartitions->serialize island,
    // legal in a streaming plan; explicit schema because sample
    // inference cannot run on an unstarted stream
    val dir = java.nio.file.Files.createTempDirectory("pylite_stream").toString
    Seq((1L, "a"), (2L, "b")).toDF("v", "s").write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema("v LONG, s STRING").parquet(dir)
    val out = PyOps.mapPy(in, "def f(x):\n  return {\"v2\": x[\"v\"] * 2, \"s\": x[\"s\"]}", "f",
      schema = Some(StructType(Seq(StructField("v2", LongType), StructField("s", StringType)))))
    val q = out.writeStream.format("memory").queryName("pylite_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT v2, s FROM pylite_stream_out ORDER BY v2")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((2L, "a"), (4L, "b")))
    } finally q.stop()
  }

  test("PyRefs: constant row subscripts are collected; escapes disable pruning") {
    def refs(code: String, m: String = "f") =
      PyRefs.referencedKeys(PyOps.compile(code, m), m)
    assert(refs("def f(r):\n  return {\"x\": r[\"a\"] + r[\"b\"], \"w\": r[\"a\"]}")
      === Some(Set("a", "b")))
    // writes count as references (a conditional write + read must see input)
    assert(refs("def f(r):\n  r[\"c\"] = 1\n  return {\"x\": r[\"a\"]}")
      === Some(Set("a", "c")))
    assert(refs("def f(r):\n  return r") === None) // bare return escapes
    assert(refs("def f(r):\n  k = \"a\"\n  return {\"x\": r[k]}") === None) // dynamic key
    assert(refs("def f(r):\n  s = r\n  return {\"x\": s[\"a\"]}") === None) // alias
    assert(refs("def f(r):\n  return {\"n\": len([k for k in r])}") === None) // iteration
    assert(refs("def f(r):\n  return g(r)\ndef g(d):\n  return {\"x\": d[\"a\"]}") === None) // call escape
  }

  test("pruning: unreferenced columns never reach inference or execution") {
    // the poison column has a type the python bridge REJECTS (ANSI
    // interval) — it throws if (and only if) it reaches rowToPy, i.e.
    // if the driver-side inference sample or the executors ever bridge
    // an unreferenced column
    import org.apache.spark.sql.functions.{expr => fExpr}
    val df = Seq(1L, 2L, 3L).toDF("a").select($"a",
      fExpr("INTERVAL '1' DAY").as("boom"))
    val out = PyOps.mapPy(df, "def f(r):\n  return {\"x\": r[\"a\"] * 10}", "f")
    assert(out.orderBy("x").as[Long].collect().toSeq === Seq(10L, 20L, 30L))
    // sanity: an ESCAPING function does bridge the poison and fails
    intercept[Exception] {
      PyOps.mapPy(df, "def f(r):\n  r[\"x\"] = r[\"a\"]\n  return r", "f").collect()
    }
    val red = PyOps.reducePy(
      Seq(("k1", 1L), ("k1", 2L), ("k2", 3L)).toDF("k", "n").select($"k", $"n",
        fExpr("INTERVAL '1' DAY").as("boom")),
      "k", "def f(r, acc):\n  acc[\"s\"] = acc[\"s\"] + r[\"n\"]\n  return acc",
      "f", initJson = Some("""{"s": 0}"""))
    assert(red.orderBy("s").select("s").as[Long].collect().toSeq === Seq(3L, 3L))
  }

  test("pruning reaches the parquet scan (ReadSchema) on a wide table") {
    val dir = java.nio.file.Files.createTempDirectory("pylite_prune").toString
    Seq((1L, "w1", "z1"), (2L, "w2", "z2")).toDF("a", "wide_col", "other_col")
      .write.mode("overwrite").parquet(dir)
    val full = spark.read.parquet(dir)
    val out = PyOps.mapPy(full, "def f(r):\n  return {\"x\": r[\"a\"] + 1}", "f")
    val scans = out.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.requiredSchema
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSeq === Seq("a"),
      s"scan should read only the referenced column, got ${scans.head.fieldNames.toSeq}")
    // escape hatch: a function returning the row keeps every column
    val esc = PyOps.mapPy(full, "def f(r):\n  r[\"x\"] = r[\"a\"]\n  return r", "f")
    assert(esc.schema.fieldNames.sorted.toSeq === Seq("a", "other_col", "wide_col", "x"))
  }

  test("filterPy works inside Structured Streaming (predicate island on a stream)") {
    val dir = java.nio.file.Files.createTempDirectory("pylite_sfilter").toString
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("v", "lang")
      .write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema("v LONG, lang STRING").parquet(dir)
    val out = PyOps.filterPy(in, "def f(x):\n  return x[\"lang\"] == \"en\"", "f")
    val q = out.writeStream.format("memory").queryName("pylite_sfilter_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT v FROM pylite_sfilter_out ORDER BY v")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("bridge round-trips arrays, maps, structs, decimals and timestamps") {
    val df = spark.sql(
      """select array(1, 2) as arr, map('k', 1.5D) as m,
        |       named_struct('x', 1L, 'y', 'z') as st,
        |       cast(3.14 as decimal(5,2)) as dec,
        |       timestamp'2026-01-02 03:04:05' as ts""".stripMargin)
    val code = "def f(r):\n  return {\"a0\": r[\"arr\"][0], \"mk\": r[\"m\"][\"k\"], \"sx\": r[\"st\"][\"x\"], \"sy\": r[\"st\"][\"y\"], \"d\": r[\"dec\"], \"t\": r[\"ts\"]}"
    val out = PyOps.mapPy(df, code, "f").collect().head
    assert(out.getAs[Long]("a0") === 1L)
    assert(out.getAs[Double]("mk") === 1.5)
    assert(out.getAs[Long]("sx") === 1L)
    assert(out.getAs[String]("sy") === "z")
    assert(out.getAs[Double]("d") === 3.14)
    assert(out.getAs[String]("t").startsWith("2026-01-02"))
  }

  test("unsupported-surface boundary: every rejected construct fails at " +
    "COMPILE (plan) time with a targeted message, never mid-partition") {
    // VERDICT r5 ask #9 — the contract a user hits first: anything
    // outside the subset dies when the playbook LOADS (PyOps.compile
    // runs on the driver at plan build), with a message naming the
    // construct, not an executor stack trace hours in
    val rejected: Seq[(String, String, String)] = Seq(
      ("class", "class A:\n  pass\n", "'class' is outside"),
      ("yield statement", "def f():\n  yield 1\n", "yield"),
      ("yield expression", "def f():\n  x = yield 1\n  return x\n", "yield"),
      ("generator expr delegation", "def f():\n  return (yield 2)\n", "yield"),
      ("decorator", "@memo\ndef f():\n  return 1\n", "decorators are outside"),
      ("for-else", "def f(xs):\n  for x in xs:\n    pass\n  else:\n    return 1\n",
        "`for ... else:` is outside"),
      ("while-else", "def f(n):\n  while n > 0:\n    n = n - 1\n  else:\n    return n\n",
        "`while ... else:` is outside"),
      ("from-import", "from os import path\n", "'from' is outside"),
      ("with", "def f():\n  with open('x') as h:\n    return 1\n", "'with' is outside"),
      ("raise", "def f():\n  raise ValueError('x')\n", "'raise' is outside"),
      ("global", "def f():\n  global g\n  return g\n", "'global' is outside"),
      ("del", "def f(d):\n  del d['k']\n  return d\n", "'del' is outside"),
      ("assert", "def f(x):\n  assert x > 0\n  return x\n", "'assert' is outside"),
      ("named except", "def f():\n  try:\n    return 1\n  except KeyError:\n    return 2\n",
        "except KeyError"),
      ("except-as", "def f():\n  try:\n    return 1\n  except Exception as e:\n    return 2\n",
        "as name"),
      ("finally", "def f():\n  try:\n    return 1\n  except:\n    return 2\n  finally:\n    return 3\n",
        "finally"),
      ("bignum literal", "def f():\n  return 99999999999999999999\n", "64-bit"))
    rejected.foreach { case (label, code, needle) =>
      val e = intercept[PyLiteException](PyParser.compile(code, "f"))
      assert(e.getMessage.contains(needle),
        s"$label: got '${e.getMessage}', wanted substring '$needle'")
    }
    // and the boundary is tight: the adjacent SUPPORTED forms compile
    Seq(
      "def f(xs):\n  for x in xs:\n    pass\n  return 1\n",
      "def f():\n  try:\n    return 1\n  except:\n    return 2\n",
      "def f():\n  try:\n    return 1\n  except Exception:\n    return 2\n",
      "def f():\n  g = lambda x: x + 1\n  return g(2)\n",
      "import hashlib\ndef f():\n  return 1\n"
    ).foreach(code => PyParser.compile(code, "f"))
  }
}
