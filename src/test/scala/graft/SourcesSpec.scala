package graft

import java.nio.file.Files
import graft.expr.{NameUuid, UuidExprs}
import graft.sources.Sources
import graft.sources.Sources.TableSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Extractor semantics (SURVEY.md §2.1) + UUID expression vectors. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("src")
    val f = d.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("table: header mode, comments, short-row padding, overflow") {
    val p = tmpFile("t.tsv",
      "# a comment (tabular_load.go comment lines)\n" +
        "id\tname\tscore\n" +
        "1\talice\t10\n" +
        "2\tbob\n" + // short row -> padded with ""
        "3\tcarol\t30\textra1\textra2\n") // long row -> overflow
    val df = Sources.table(spark, p,
      TableSpec(extraColumns = Some("rest")))
    val rows = df.orderBy("id").collect()
    assert(df.columns.toSeq === Seq("id", "name", "score", "rest"))
    assert(rows.length === 3)
    assert(rows(1).getString(2) === "") // pad (tabular_load.go:112-128)
    assert(rows(2).getSeq[String](3) === Seq("extra1", "extra2"))
    assert(rows(0).getSeq[String](3) === Seq.empty)
  }

  test("table: explicit columns + rowSkip (no header consumed)") {
    val p = tmpFile("t2.tsv",
      "garbage line 1\ngarbage line 2\n" +
        "x\t1\ny\t2\n")
    val df = Sources.table(spark, p,
      TableSpec(rowSkip = 2, columns = Some(Seq("k", "v"))))
    assert(df.orderBy("k").collect().map(_.getString(0)).toSeq === Seq("x", "y"))
  }

  test("table: glob applies header-drop, comments, and rowSkip PER FILE") {
    val d = Files.createTempDirectory("multi")
    // comment lines must NOT count toward rowSkip (csv.Reader drops them
    // before the skip counter, tabular_load.go:88-135)
    Files.writeString(d.resolve("a.tsv"),
      "# preamble a\nskipme\nid\tv\n1\tx\n")
    Files.writeString(d.resolve("b.tsv"),
      "skipme\n# comment inside\nid\tv\n2\ty\n3\tz\n")
    val df = Sources.table(spark, d.toString + "/*.tsv", TableSpec(rowSkip = 1))
    assert(df.columns.toSeq === Seq("id", "v"))
    val got = df.orderBy("id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("1", "x"), ("2", "y"), ("3", "z"))) // no 'id' data rows
  }

  test("tableNative: splittable fast path matches table() on well-formed files") {
    val d = Files.createTempDirectory("native")
    Files.writeString(d.resolve("a.tsv"), "id\tv\n# mid comment\n1\tx\n2\ty\n")
    Files.writeString(d.resolve("b.tsv"), "id\tv\n3\tz\n")
    val glob = d.toString + "/*.tsv"
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(canon(Sources.tableNative(spark, glob)) ===
      canon(Sources.table(spark, glob)))
    assert(canon(Sources.tableNative(spark, glob)) ===
      Seq(("1", "x"), ("2", "y"), ("3", "z")))
  }

  test("table: duplicate header names deduped (buildUniqueArray)") {
    assert(Sources.dedupHeader(Seq("a", "b", "a", "a")) ===
      Seq("a", "b", "a_1", "a_2"))
  }

  test("table: custom sep + gz transparently decoded") {
    val d = Files.createTempDirectory("gz")
    val f = d.resolve("t.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(f))
    out.write("a,b\n1,2\n".getBytes("UTF-8")); out.close()
    val df = Sources.table(spark, f.toString, TableSpec(sep = ","))
    assert(df.collect()(0).toSeq === Seq("1", "2"))
  }

  test("sqldump: CREATE columns + multi-row INSERT -> {table, data} rows") {
    val dump =
      """-- dump preamble
        |CREATE TABLE `genes` (
        |  `id` int NOT NULL,
        |  `symbol` varchar(32) DEFAULT NULL,
        |  `descr` text,
        |  PRIMARY KEY (`id`)
        |);
        |CREATE TABLE ignored (x int);
        |INSERT INTO `genes` VALUES (1,'TP53','tumor protein; it''s famous'),(2,'BRCA1',NULL);
        |INSERT INTO `genes` (`id`, `symbol`) VALUES (3, 'O\'Neil gene');
        |INSERT INTO ignored VALUES (99);
        |""".stripMargin
    val p = tmpFile("d.sql", dump)
    val df = graft.sources.SqlDump.load(spark, p, tables = Seq("genes"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getMap[String, String](1).toMap))
    assert(rows.length === 3)
    assert(rows.forall(_._1 === "genes"))
    val byId = rows.map(_._2).map(m => m("id") -> m).toMap
    assert(byId("1") === Map("id" -> "1", "symbol" -> "TP53",
      "descr" -> "tumor protein; it's famous"))
    assert(byId("2") === Map("id" -> "2", "symbol" -> "BRCA1")) // NULL absent
    assert(byId("3") === Map("id" -> "3", "symbol" -> "O'Neil gene"))
  }

  test("sqldump: ON DUPLICATE/ON CONFLICT trailing clauses emit no phantom " +
    "rows; multi-whitespace keywords dispatch") {
    val dump =
      "CREATE  TABLE t (a INT, b VARCHAR(10));\n" +
        "INSERT\nINTO t VALUES (1, 'x'), (2, 'y') ON DUPLICATE KEY UPDATE a=VALUES(a);\n" +
        "INSERT INTO t VALUES (3, 'z') ON CONFLICT (a) DO NOTHING;\n"
    val rows = graft.sources.SqlDump.parse(dump)
    // exactly 3 real rows — the VALUES(a) parens inside the trailing
    // clause must not become a phantom empty row, and the \n/double
    // space between keywords must not drop statements
    assert(rows.length === 3, rows.mkString(";"))
    assert(rows.map(_._2("a")).sorted === Seq("1", "2", "3"))
    assert(rows.forall(_._2.contains("b")))
  }

  test("plugin source: external command stdout NDJSON becomes rows") {
    val df = graft.sources.Plugin.source(spark,
      Seq("/bin/sh", "-c", """printf '{"a":1,"b":"x"}\n{"a":2,"b":"y"}\n'"""))
    val got = df.orderBy("a").collect().map(r => (r.getAs[Long]("a"), r.getAs[String]("b")))
    assert(got.toSeq === Seq((1L, "x"), (2L, "y")))
  }

  test("plugin transform: rows pipe through an external command per partition") {
    import org.apache.spark.sql.types._
    val df = spark.range(100).toDF("id").repartition(4)
    // sed rewrites the NDJSON field name — a real (if tiny) external transform
    val out = graft.sources.Plugin.transform(df,
      Seq("sed", "s/\"id\"/\"doubled\"/"),
      StructType(Seq(StructField("doubled", LongType))))
    assert(out.agg(org.apache.spark.sql.functions.sum("doubled")).collect()(0).getLong(0) === 4950L)
    assert(out.count() === 100)
  }

  test("plugin transform: non-zero exit fails the task loudly") {
    val df = spark.range(2).toDF("id")
    val ex = intercept[Exception] {
      graft.sources.Plugin.transformRaw(df, Seq("/bin/sh", "-c", "exit 3")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("plugin transform: upstream failure mid-stream fails the task (no partial-input rows)") {
    import org.apache.spark.sql.functions._
    // the row iterator feeding the plugin's stdin throws midway; without
    // writer-failure propagation the plugin would see clean EOF, exit 0,
    // and the task would SUCCEED on rows derived from partial input
    val df = spark.range(100).toDF("id").repartition(1)
      .withColumn("x",
        when(col("id") === 50, expr("raise_error('upstream corrupt block')"))
          .otherwise(col("id").cast("string")))
    val ex = intercept[Exception] {
      graft.sources.Plugin.transformRaw(df, Seq("cat")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(m => m.contains("plugin stdin feed failed") ||
      m.contains("upstream corrupt block")), chain(ex).mkString(" | "))
  }

  test("plugin transform contract: per-partition processes, so stateful commands reorder only locally") {
    // DOC-TEST (negative example): `transform` runs ONE process PER
    // PARTITION — the command must be row-wise or partition-associative
    // (grep/sed/jq-per-line). A stateful command like `sort` sorts each
    // partition independently: the multiset of rows is preserved, but
    // there is NO global order — callers must not use transform for
    // anything whose semantics span partitions.
    import spark.implicits._
    // two positional partitions: p0 = evens, p1 = odds (deterministic)
    val keys = (0 until 100 by 2) ++ (1 until 100 by 2)
    val df = spark.sparkContext.parallelize(keys.map(i => f"$i%03d"), 2)
      .toDF("k")
    val piped = graft.sources.Plugin.transformRaw(df, Seq("sort"))
      .collect().toSeq
    val expected = keys.map(i => f"""{"k":"$i%03d"}""")
    // multiset preserved...
    assert(piped.sorted === expected.sorted)
    // ...but NOT globally ordered: each partition sorted independently
    assert(piped !== piped.sorted,
      "sort through transform must not produce a global order — if this " +
        "ever passes, the per-partition contract was silently changed")
  }

  test("table: header dedup survives pre-existing name_N collisions") {
    assert(graft.sources.Sources.dedupHeader(Seq("a", "a_1", "a")) ===
      Seq("a", "a_1", "a_2"))
    assert(graft.sources.Sources.dedupHeader(Seq("a", "a", "a_1", "a")) ===
      Seq("a", "a_1", "a_1_1", "a_2"))
    // every output name unique, always
    val out = graft.sources.Sources.dedupHeader(Seq("x", "x", "x_1", "x_1", "x"))
    assert(out.distinct.size === out.size)
  }

  test("plugin transform: malformed stdout line FAILS the task (no silent null rows)") {
    import org.apache.spark.sql.types._
    val df = spark.range(3).toDF("id").repartition(1)
    // sed injects a non-JSON diagnostic line amid valid output
    val ex = intercept[Exception] {
      graft.sources.Plugin.transform(df,
        Seq("/bin/sh", "-c", "cat; echo 'WARN: not json'"),
        StructType(Seq(StructField("id", LongType)))).collect()
    }
    assert(ex != null)
  }

  test("plugin transform: downstream closing stdin early (head) is NOT a failure") {
    // `head -3` exits 0 after 3 lines and breaks the pipe mid-feed; the
    // broken-pipe IOException must not be conflated with an upstream
    // iterator failure — output is complete by the plugin's contract
    val df = spark.range(100000).toDF("id").repartition(1)
    val out = graft.sources.Plugin.transformRaw(df, Seq("head", "-3")).collect()
    assert(out.length === 3)
  }

  test("sqlite: table-level PRIMARY KEY(x DESC) over INTEGER is a rowid alias; over INT is NOT") {
    val p = getClass.getResource("/fixture_pk.sqlite").getPath
    def rows(t: String) = graft.sources.SqliteSource.table(spark, p, t)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._2)
    // INTEGER + table-level PK: stored NULL, value materialized from rowid
    assert(rows("tbl_alias").toSeq === Seq(("100", "a"), ("200", "b")))
    // INT + table-level PK: NOT an alias — real stored values must
    // survive (an affinity-based check would corrupt them into 1,2)
    assert(rows("tbl_int").toSeq === Seq(("100", "a"), ("200", "b")))
    // inline INTEGER PRIMARY KEY DESC: the documented quirk — NOT an
    // alias; real values stored (rowids here are 1,2)
    assert(rows("tbl_desc").toSeq === Seq(("100", "a"), ("200", "b")))
    // the alias phrase inside a DEFAULT string literal must not trigger
    val defstr = graft.sources.SqliteSource.table(spark, p, "tbl_defstr")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(defstr.toSeq === Seq(("hi", "7")))
  }

  test("sqlite: multi-page b-tree, overflow chain, NULLs, IPK rowid alias") {
    val p = getClass.getResource("/fixture.sqlite").getPath
    assert(graft.sources.SqliteSource.tables(spark, p).map(_._1).toSet ===
      Set("genes", "tiny"))
    val df = graft.sources.SqliteSource.table(spark, p, "genes")
    assert(df.columns.toSeq === Seq("id", "symbol", "score", "descr", "blobcol"))
    assert(df.count() === 3002)
    val byId = df.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(byId("1") === (("GENE00000", "0.0", "désc_")))          // ipk from rowid
    assert(byId("4")._2 === null)                                  // NULL real
    assert(byId("6")._3 === null)                                  // NULL text
    assert(byId("43")._1 === "GENE00042")                          // interior-page row
    val big = byId("100000")
    assert(big._1 === "BIGONE" && big._2 === "-2.25")
    assert(big._3.length === 5 + 20000 && big._3.startsWith("LONG:abcdefghij")) // overflow
    val tiny = graft.sources.SqliteSource.table(spark, p, "tiny")
      .collect().map(r => r.getString(0) -> (r.getString(1))).toMap
    assert(tiny("a") === "1")
    assert(tiny("b") === "-32769") // 3-byte signed int serial type
    assert(tiny("c") === null)
  }

  test("sqlite: read is partitioned — multi-page b-tree splits into >=2 tasks, " +
    "driver never buffers rows") {
    // the b-tree subtree split must spread a multi-page table across
    // tasks (the 100 TB posture: a multi-GB sqlite file is walked by
    // executors against a page-cached random-access view, never
    // materialized on the driver — files > 64 MiB skip full buffering
    // entirely, see SqliteSource.BufferCap)
    val p = getClass.getResource("/fixture.sqlite").getPath
    val df = graft.sources.SqliteSource.table(spark, p, "genes")
    val nParts = df.select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().count()
    assert(nParts >= 2, s"expected the sqlite scan in >=2 tasks, got $nParts")
    // partitioned read returns the same rows as ever (count + spot keys)
    assert(df.count() === 3002)
    // rowid order is preserved across the contiguous subtree chunks
    val ids = df.select("id").collect().map(_.getString(0).toLong)
    assert(ids.toSeq === ids.sorted.toSeq)
  }

  test("sqlite: paged reader (CachedFileBytes) decodes byte-identically to the " +
    "full-buffer path — overflow chains and interior pages across cache blocks") {
    // force the >BufferCap code path on the committed fixture (same
    // JVM in local mode, so the override reaches the tasks)
    val p = getClass.getResource("/fixture.sqlite").getPath
    def rows() = graft.sources.SqliteSource.table(spark, p, "genes")
      .collect().map(_.toSeq).sortBy(_.toString)
    val buffered = rows()
    graft.sources.SqliteSource.bufferCapOverride = Some(0L)
    try {
      val paged = rows()
      assert(paged.length === 3002)
      assert(paged === buffered)
    } finally graft.sources.SqliteSource.bufferCapOverride = None
  }

  test("table glob: files with REORDERED headers map by their own header, " +
    "never positionally under the first file's names") {
    val d = Files.createTempDirectory("tblhdr")
    Files.writeString(d.resolve("f1.tsv"), "a\tb\n1\tx\n")
    Files.writeString(d.resolve("f2.tsv"), "b\ta\ny\t2\n") // reversed order
    val df = Sources.table(spark, d.toString + "/*.tsv")
    val got = df.select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    // before the per-file fallback, f2's 'y' landed in column a
    assert(got === Seq(("1", "x"), ("2", "y")))
  }

  test("ndjson and multiline json doc") {
    val nd = tmpFile("d.ndjson", """{"a":1,"b":"x"}""" + "\n" + """{"a":2,"b":"y"}""" + "\n")
    assert(Sources.ndjson(spark, nd).count() === 2)
    val doc = tmpFile("d.json", """{"a": [1,2,3],""" + "\n" + """ "b": "x"}""")
    val r = Sources.jsonDoc(spark, doc).collect()(0)
    assert(r.getAs[Seq[Long]]("a") === Seq(1L, 2L, 3L))
  }

  test("glob: filename column stored per row (glob_load.go storeFilename)") {
    val d = Files.createTempDirectory("glob")
    Files.writeString(d.resolve("one.ndjson"), """{"v":1}""" + "\n")
    Files.writeString(d.resolve("two.ndjson"), """{"v":2}""" + "\n")
    val df = Sources.glob(spark, d.toString + "/*.ndjson", Sources.ndjson,
      storeFilename = Some("fname"))
    val got = df.select("v", "fname").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "one.ndjson")
    assert(got(2L) === "two.ndjson")
  }

  test("glob fast path (single scan + input_file_name) equals the per-file fold") {
    val d = Files.createTempDirectory("globfast")
    Files.writeString(d.resolve("a.ndjson"), """{"v":1,"s":"x"}""" + "\n")
    // heterogeneous: b has an extra field, is missing s
    Files.writeString(d.resolve("b.ndjson"), """{"v":2,"extra":"y"}""" + "\n")
    val pat = d.toString + "/*.ndjson"
    def canonRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(c => col(c).cast("string")): _*)
        .collect().map(_.mkString("|")).sorted.toIndexedSeq
    }
    val slow = Sources.glob(spark, pat, Sources.ndjson,
      storeFilename = Some("fname"), storeFilepath = Some("fpath"))
    val fast = Sources.glob(spark, pat, Sources.ndjson,
      storeFilename = Some("fname"), storeFilepath = Some("fpath"),
      fileSourceInner = true)
    assert(fast.columns.sorted.toSeq === slow.columns.sorted.toSeq)
    assert(canonRows(fast) === canonRows(slow))
    // the fast path is ONE scan: no per-file union in the plan
    assert(!fast.queryExecution.optimizedPlan.toString.contains("Union"))
  }

  test("glob + ndjsonWithSchema: pinned schema skips inference, same rows, " +
    "absent fields null / extra fields dropped") {
    val d = Files.createTempDirectory("globpin")
    Files.writeString(d.resolve("a.ndjson"), """{"v":1,"s":"x"}""" + "\n")
    Files.writeString(d.resolve("b.ndjson"), """{"v":2,"extra":"y"}""" + "\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val df = Sources.glob(spark, d.toString + "/*.ndjson",
      Sources.ndjsonWithSchema(schema),
      storeFilename = Some("fname"), fileSourceInner = true)
    assert(df.schema.fieldNames.toSeq === Seq("v", "s", "fname"))
    val rows = df.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, Some("x"), "a.ndjson"), (2L, None, "b.ndjson")))
  }

  test("uuid5/uuid3 match RFC 4122 test vectors") {
    UuidExprs.register(spark)
    val df = Seq(("www.example.com")).toDF("name")
    val out = df.select(
      UuidExprs.uuid5(lit(NameUuid.NamespaceDns), $"name").as("u5"),
      UuidExprs.uuid3(lit(NameUuid.NamespaceDns), $"name").as("u3"))
      .collect()(0)
    assert(out.getString(0) === "2ed6657d-e927-568b-95e1-2665a8aea6a2")
    assert(out.getString(1) === "5df41881-3aed-3515-88a7-2f4a814cf09e")
  }

  test("uuid5 golden rows: x_uuid5's repo/path@commit shape vs python uuid.uuid5") {
    // goldens precomputed with CPython: uuid.uuid5(uuid.NAMESPACE_URL, name)
    UuidExprs.register(spark)
    val goldens = Seq(
      "org0/repo_a/src/main.rs@c0ffee01" -> "56a2e9c5-d0ba-575f-98ca-e45213cdbe1f",
      "hello world" -> "7b3d66ac-cb60-5154-8edf-0bcfd0c418b3",
      "" -> "1b4db7eb-4057-5ddf-91e0-36dec72071f5",
      "graft/engine@deadbeef" -> "0f04bfdb-757e-54c3-bcab-147610350e8a")
    val out = goldens.map(_._1).toDF("name")
      .select($"name", UuidExprs.uuid5(lit(NameUuid.NamespaceUrl), $"name").as("u"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    goldens.foreach { case (name, want) => assert(out(name) === want, s"for '$name'") }
  }

  test("uuid5 via SQL registration; null-safe") {
    UuidExprs.register(spark)
    val r = spark.sql(
      s"SELECT uuid5('${NameUuid.NamespaceUrl}', 'https://example.org/x') AS u," +
        s" uuid5('${NameUuid.NamespaceUrl}', CAST(NULL AS STRING)) AS n")
      .collect()(0)
    assert(r.getString(0).charAt(14) === '5') // version nibble
    assert(r.isNullAt(1))
  }
}
