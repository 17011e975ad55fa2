package graft

import graft.ops.RowOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-semantics tests for the round-2 RowOps additions: lookup
  * replace over array elements and map keys (transform/lookup.go:154-214),
  * intervalIntersect's attach-as-array output shape
  * (transform/lookup_interval.go:166-205), and the nested project set
  * (evaluate/jsonpath.go:9-21). */
class LookupOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  lazy val lk = Seq(("a", "A"), ("b", "B")).toDF("k", "v")

  test("lookupReplaceArray: hit elements mapped, misses unchanged, order kept") {
    val df = Seq((1L, Seq("a", "x", "b", "a")), (2L, Seq.empty[String]))
      .toDF("id", "xs")
    val out = RowOps.lookupReplaceArray(df, lk, "xs", "k", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("A", "x", "B", "A"))
    assert(out(2L) === Seq.empty)
  }

  test("lookupReplaceMapKeys: keys rewritten, values untouched, misses kept") {
    val df = Seq((1L, Map("a" -> "1", "z" -> "2"))).toDF("id", "m")
    val out = RowOps.lookupReplaceMapKeys(df, lk, "m", "k", "v")
      .collect().map(r => r.getLong(0) -> r.getMap[String, String](1)).toMap
    assert(out(1L).toMap === Map("A" -> "1", "z" -> "2"))
  }

  test("litMap at the 10k cap: literal plan at the boundary, join fallback above") {
    // 10k entries = 20k Literal nodes in one map constructor — pinned
    // here so a future cap raise that silently breaks codegen (Janino
    // method-size limits force interpreted fallback well before 100k
    // entries) fails a test instead of a production plan
    val n = 10000
    val bigLk = spark.range(n).selectExpr("concat('k', id) AS k", "concat('v', id) AS v")
    val df = Seq((1L, Seq("k0", s"k${n - 1}", "miss")), (2L, Seq.empty[String]))
      .toDF("id", "xs")
    val out = RowOps.lookupReplaceArray(df, bigLk, "xs", "k", "v")
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) === Seq("v0", s"v${n - 1}", "miss"))
    assert(out(1).getSeq[String](1) === Seq.empty)
    // one row past the cap: the table no longer fits as a literal, but
    // the data's ACTIVE element set ({k0, k9999, miss}) does — the
    // middle tier intersects and restores the join-free literal plan
    val tooBig = spark.range(n + 1).selectExpr("concat('k', id) AS k", "concat('v', id) AS v")
    val active = RowOps.lookupReplaceArray(df, tooBig, "xs", "k", "v")
    assert(!active.queryExecution.optimizedPlan.toString.contains("Join"))
    val out2 = active.orderBy("id").collect()
    assert(out2(0).getSeq[String](1) === Seq("v0", s"v${n - 1}", "miss"))
    assert(out2(1).getSeq[String](1) === Seq.empty)
    // map-keys form: same middle tier
    val dfm = Seq((1L, Map("k0" -> "a", "zz" -> "b"))).toDF("id", "m")
    val outm = RowOps.lookupReplaceMapKeys(dfm, tooBig, "m", "k", "v")
      .collect().head.getMap[String, String](1)
    assert(outm.toMap === Map("v0" -> "a", "zz" -> "b"))
    // BOTH the table and the active set past the cap: the final
    // join-based tier (explode + broadcast join + positional regroup)
    val wide = spark.range(n + 1)
      .selectExpr("id", "array(concat('k', id), 'miss') AS xs")
    val joined = RowOps.lookupReplaceArray(wide, tooBig, "xs", "k", "v")
    assert(joined.queryExecution.optimizedPlan.toString.contains("Join"))
    val sample = joined.filter(col("id") === n).collect().head
    assert(sample.getSeq[String](1) === Seq(s"v$n", "miss"))
    assert(joined.count() === n + 1)
  }

  test("lookup dup-key winner is deterministic: greatest value wins everywhere") {
    val dupLk = Seq(("a", "A1"), ("a", "A9"), ("a", "A5")).toDF("k", "v")
    val main = Seq((1L, "a")).toDF("id", "f")
    assert(RowOps.lookupReplace(main, dupLk, "f", "k", "v")
      .collect().head.getString(1) === "A9")
    assert(RowOps.lookupCopy(main, dupLk, col("f"), col("k"), "cv" -> "v")
      .collect().head.getAs[String]("cv") === "A9")
    val arr = Seq((1L, Seq("a"))).toDF("id", "xs")
    assert(RowOps.lookupReplaceArray(arr, dupLk, "xs", "k", "v")
      .collect().head.getSeq[String](1) === Seq("A9"))
  }

  test("lookup with duplicate keys never multiplies probe rows (map semantics)") {
    val dupLk = Seq(("a", "A1"), ("a", "A2"), ("b", "B")).toDF("k", "v")
    val main = Seq((1L, "a"), (2L, "a"), (3L, "z")).toDF("id", "f")
    val replaced = RowOps.lookupReplace(main, dupLk, "f", "k", "v")
    assert(replaced.count() === 3) // the reference's map collapses dups
    val copied = RowOps.lookupCopy(main, dupLk, col("f"), col("k"), "cv" -> "v")
    assert(copied.count() === 3)
  }

  test("intervalAttach: all overlaps attached sorted, miss -> empty array, dup rows kept") {
    val ref = Seq(("c1", 0.0, 10.0, "r1"), ("c1", 5.0, 20.0, "r2"),
      ("c2", 0.0, 100.0, "r3")).toDF("rm", "rs", "re", "rname")
    // two identical rows must each keep their own attachment (no merge)
    val rows = Seq(("c1", 7.0, 8.0), ("c1", 7.0, 8.0), ("c1", 50.0, 60.0),
      ("c9", 1.0, 2.0)).toDF("m", "s", "e")
    val out = RowOps.intervalAttach(rows, ref, "m", "s", "e", "rm", "rs", "re", "hits")
      .withColumn("names", expr("transform(hits, h -> h.rname)"))
    val got = out.select("m", "s", "names").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getSeq[String](2)))
    assert(got.count { case (m, s, ns) => m == "c1" && s == 7.0 && ns == Seq("r1", "r2") } === 2)
    assert(got.exists { case (m, s, ns) => m == "c1" && s == 50.0 && ns.isEmpty })
    assert(got.exists { case (m, _, ns) => m == "c9" && ns.isEmpty })
    assert(got.length === 4)
  }

  test("intervalAttach: literal path is zero-shuffle and equals the joined fallback") {
    val ref = Seq(("c1", 0.0, 10.0, "r1"), ("c1", 5.0, 20.0, "r2"),
      ("c2", 0.0, 100.0, "r3")).toDF("rm", "rs", "re", "rname")
    val rows = Seq(("c1", 7.0, 8.0), ("c1", 50.0, 60.0), ("c9", 1.0, 2.0),
      (null, 5.0, 6.0)).toDF("m", "s", "e")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("names", expr("transform(hits, h -> h.rname)"))
        .select("m", "s", "names").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getSeq[String](2).toList))
        .sortBy(t => (Option(t._1).getOrElse(""), t._2)).toSeq
    val literal = RowOps.intervalAttach(rows, ref, "m", "s", "e", "rm", "rs", "re", "hits")
    val joined = RowOps.intervalAttachJoined(rows, ref, "m", "s", "e", "rm", "rs", "re", "hits")
    assert(canon(literal) === canon(joined))
    // the whole point of the literal path: the probe side must not move
    // through an exchange for a per-row lookup against a tiny ref
    val plan = literal.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"literal intervalAttach must be a zero-shuffle projection:\n$plan")
  }

  test("intervalAttach: nested-typed ref falls back to the joined path (no lit() crash)") {
    // lit() cannot embed arrays/structs — a ref carrying a complex
    // column must take intervalAttachJoined instead of crashing at
    // plan build
    val ref = Seq(("c1", 0.0, 10.0, Seq("tag1", "tag2")))
      .toDF("rm", "rs", "re", "tags")
    val rows = Seq(("c1", 5.0, 6.0), ("c1", 50.0, 60.0)).toDF("m", "s", "e")
    val out = RowOps.intervalAttach(rows, ref, "m", "s", "e", "rm", "rs", "re", "hits")
      .withColumn("n", size(col("hits")))
      .select("s", "n").collect().map(r => (r.getDouble(0), r.getInt(1))).toMap
    assert(out === Map(5.0 -> 1, 50.0 -> 0))
  }

  test("intervalIntersectBinned: identical rows to the broadcast form, each pair once") {
    val ref = Seq(("c1", 0.0, 10.0, "r1"), ("c1", 5.0, 20.0, "r2"),
      ("c1", -7.5, -2.0, "rneg"), ("c2", 0.0, 100.0, "r3"))
      .toDF("rm", "rs", "re", "rname")
    val rows = Seq(("c1", 7.0, 8.0), ("c1", -3.0, 6.0), ("c1", 9.5, 30.0),
      ("c1", 50.0, 60.0), ("c2", 99.0, 200.0), ("c9", 1.0, 2.0))
      .toDF("m", "s", "e")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("m", "s", "e", "rname").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
        .sorted.toSeq
    val exact = canon(RowOps.intervalIntersect(rows, ref, "m", "s", "e", "rm", "rs", "re"))
    assert(exact.nonEmpty)
    // several widths, including ones far smaller/larger than the intervals
    Seq(0.5, 3.0, 10.0, 1000.0).foreach { w =>
      val binned = canon(RowOps.intervalIntersectBinned(
        rows, ref, "m", "s", "e", "rm", "rs", "re", w))
      assert(binned === exact, s"binWidth=$w")
    }
  }

  test("projectNested: sets and creates fields inside a struct column") {
    val df = Seq((1L, ("x", 2L))).toDF("id", "s")
    val out = RowOps.projectNested(
      RowOps.projectNested(df, "s._1", lit("y")), "s.extra", lit(9L))
    val r = out.select("s._1", "s._2", "s.extra").collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2)) === (("y", 2L, 9L)))
    intercept[IllegalArgumentException](RowOps.projectNested(df, "flat", lit(1)))
  }

  test("debug: passes rows through unchanged") {
    val df = Seq((1L, "a")).toDF("id", "x")
    assert(RowOps.debug(df, 1).collect() === df.collect())
  }

  test("lookupReplace: unorderable (map) lookup values skip max() at analysis") {
    // maps are unorderable, so the deterministic-winner max() would fail
    // analysis; the hasMap guard must route map-valued tables through
    // dropDuplicates (mirroring lookupCopy). A map-typed field can't be
    // a join key anyway, so the full replace can't run end-to-end — the
    // guard is proven by analysis getting PAST the aggregate to Spark's
    // join-key complaint instead of dying inside max().
    val lkm = Seq((Map("k" -> "1"), Map("v" -> "1"))).toDF("k", "v")
    val main = Seq((1L, Map("k" -> "1"))).toDF("id", "f")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      RowOps.lookupReplace(main, lkm, "f", "k", "v").collect()
    }
    val msg = e.getMessage.toLowerCase
    assert(!msg.contains("\"max\""), s"died inside max(): $msg")
    // struct-wrapped map values: same guard via the recursive hasMap
    val lks = Seq(("a", ("x", Map("m" -> "1")))).toDF("k", "v")
    val scalarMain = Seq((1L, "a")).toDF("id", "f")
    // value coalesces against a string field -> type error is expected,
    // but it must be the coalesce/type mismatch, not an ordering error
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      RowOps.lookupReplace(scalarMain, lks, "f", "k", "v").collect()
    }
    assert(!e2.getMessage.toLowerCase.contains("ordering"), e2.getMessage)
  }

  test("active-set literal tier is GATED on a deterministic plan: a rand() " +
    "upstream with a small active set still routes through the checkpoint join") {
    // the probe evaluates df once and the real plan again; with a
    // nondeterministic upstream the second evaluation could contain
    // elements the probe never saw, leaving them silently unreplaced —
    // so tier 2 must decline and the localCheckpoint join tier run
    val n = 10001 // lookup past the literal cap
    val lk = spark.range(n).selectExpr("concat('k', id) AS k", "concat('v', id) AS v")
    val df = spark.range(50)
      .selectExpr("id", s"concat('k', cast(rand() * 10 AS int)) AS key")
      .selectExpr("id", "key", "array(key) AS xs") // tiny active set
    val out = RowOps.lookupReplaceArray(df, lk, "xs", "k", "v")
    assert(out.queryExecution.optimizedPlan.toString.contains("Join"),
      "nondeterministic upstream must take the join tier")
    // internally consistent despite the rand upstream (checkpoint pins rows)
    out.collect().foreach { r =>
      val key = r.getAs[String]("key")
      assert(r.getSeq[String](r.fieldIndex("xs")) === Seq("v" + key.stripPrefix("k")))
    }
  }

  test("lookupReplaceArray join fallback: ids pinned across the self-join " +
    "(nondeterministic upstream cannot misalign rows)") {
    // a rand()-derived array column is recomputed differently per action;
    // without localCheckpoint the fallback's two withId evaluations could
    // see different rows for the same id. With the checkpoint the output
    // rows must be internally consistent: every replaced array matches
    // the row's own key column through the lookup table. The probe rows
    // span > LitMapMaxRows DISTINCT elements so the active-set literal
    // tier cannot absorb the call — this really is the join-based plan.
    val n = 10001
    val lk = spark.range(2 * n).selectExpr("concat('k', id) AS k", "concat('v', id) AS v")
    val df = spark.range(n.toLong + 5)
      .selectExpr("id", s"concat('k', id + cast(rand() * 3 AS int)) AS key")
      .selectExpr("id", "key", "array(key, 'miss') AS xs")
    val out = RowOps.lookupReplaceArray(df, lk, "xs", "k", "v").collect()
    assert(out.length === n + 5)
    out.foreach { r =>
      val key = r.getAs[String]("key")
      val xs = r.getSeq[String](r.fieldIndex("xs"))
      assert(xs === Seq("v" + key.stripPrefix("k"), "miss"),
        s"row ${r.getAs[Long]("id")}: key=$key got $xs")
    }
  }
}
