package graft

import graft.dedup.Dedup
import graft.expr.{GraftFunctions, PolyHash}
import graft.ops.RowOps
import graft.sources.Sources
import graft.validate.DriftCheck
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for rule compilation and the deterministic hashes
  * (the SURVEY §5 plan: cast-fail→null, pattern/jaccard invariants,
  * drift on known distributions). Raw scalacheck generators with a
  * fixed seed (deterministic CI); Spark evaluates the properties.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("PolyHash(expr) == the SQL-lambda fold over random ASCII strings") {
    GraftFunctions.register(spark)
    val ss = samples(Gen.asciiPrintableStr.map(_.take(40)), 60)
    val rows = ss.toDF("s").select(
      call_function("polyhash", $"s").as("a"),
      when(length($"s") === 0, 0L).otherwise(expr(
        """aggregate(transform(sequence(1, length(s)),
          |  i -> ascii(substring(s, i, 1))), 0L,
          |  (acc, x) -> (acc * 131 + x) % 1000000007)""".stripMargin)).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("PolyHash static fold is the mathematical definition") {
    samples(Gen.asciiPrintableStr.map(_.take(64)), 200).foreach { s =>
      val expected = s.foldLeft(0L)((a, ch) => (a * 131 + ch.toInt) % 1000000007L)
      assert(PolyHash.hash(UTF8String.fromString(s)) === expected)
    }
  }

  test("fieldType: numeric strings parse, garbage casts to null") {
    val nums = samples(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2), 40)
    val garbage = samples(Gen.alphaStr.map("x" + _), 20) ++ Seq("", "12a", "a12")
    val inputs = nums.map(_.toString) ++ garbage
    val out = RowOps.fieldType(inputs.toDF("v"), "v" -> LongType)
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    inputs.zip(out).foreach {
      case (s, got) if nums.map(_.toString).contains(s) =>
        assert(got === Some(s.toLong), s"numeric '$s'")
      case (s, got) => assert(got === None, s"garbage '$s'")
    }
  }

  test("jaccard bounded in [0,1], symmetric, 1 on self") {
    val gen = Gen.listOfN(8, Gen.chooseNum(1L, 20L)).map(_.distinct)
    samples(Gen.zip(gen, gen), 30).foreach { case (a, b) =>
      val r = Seq((a, b)).toDF("a", "b").select(
        Dedup.jaccardCol($"a", $"b"), Dedup.jaccardCol($"b", $"a"),
        Dedup.jaccardCol($"a", $"a")).collect()(0)
      val (j1, j2, self) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(j1 >= 0.0 && j1 <= 1.0)
      assert(j1 === j2)
      assert(self === 1.0)
    }
  }

  test("KS distance is exactly 0 on identical halves, 1 on disjoint") {
    val same = (0 until 400).map(i => (i, (i / 2) % 40)).toDF("id", "v")
    assert(DriftCheck.ks(same, col("v"), col("id") % 2 === 0, 1)
      .collect()(0).getDouble(0) === 0.0)
    val disjoint = (0 until 400).map(i => (i, if (i % 2 == 0) i % 40 else 100 + i % 40))
      .toDF("id", "v")
    assert(DriftCheck.ks(disjoint, col("v"), col("id") % 2 === 0, 1)
      .collect()(0).getDouble(0) === 1.0)
  }

  test("dedupHeader: unique outputs, order- and prefix-preserving") {
    samples(Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d")), 50).foreach { names =>
      val out = Sources.dedupHeader(names)
      assert(out.distinct.size === out.size)
      assert(out.zip(names).forall { case (o, n) => o.startsWith(n) })
    }
  }

  test("word_shingles/simhash16 match the SQL-lambda formulation on hostile whitespace") {
    GraftFunctions.register(spark)
    val P = 1000000007L
    val hostile = Seq("a b c", "\ta b c\t", "a  b\nc ", "  x  ", "", " ",
      "one\ttwo  three\n", "ab") ++
      samples(Gen.listOfN(6, Gen.oneOf("tok", " ", "\t", "\n", "zz")), 40)
        .map(_.mkString)
    val df = hostile.toDF("text")
    val sqlShingles = expr(
      s"""CASE WHEN size(split(trim(text), '\\\\s+')) < 3 THEN array()
         |ELSE array_distinct(transform(sequence(1, size(split(trim(text), '\\\\s+')) - 2),
         |  i -> ((polyhash(element_at(split(trim(text), '\\\\s+'), i)) * 131
         |         + polyhash(element_at(split(trim(text), '\\\\s+'), i + 1))) % $P * 131
         |        + polyhash(element_at(split(trim(text), '\\\\s+'), i + 2))) % $P))
         |END""".stripMargin).cast("array<bigint>")
    val sqlSimhash = expr(
      s"""aggregate(sequence(0, 15), 0L, (acc, b) -> acc + CASE WHEN
         |  2 * size(filter(transform(split(trim(text), '\\\\s+'), t -> polyhash(t)),
         |                  h -> (h div shiftleft(1L, b)) % 2 = 1))
         |    >= size(split(trim(text), '\\\\s+'))
         |  THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin)
    val rows = df.select(
      expr("sort_array(word_shingles(text))").as("cg_sh"),
      sort_array(sqlShingles).as("sql_sh"),
      expr("simhash16(text)").as("cg_sim"), sqlSimhash.as("sql_sim"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"shingles for ${r.getString(4)}")
      assert(r.getLong(2) === r.getLong(3), s"simhash for '${r.getString(4)}'")
    }
  }

  test("sqldump: arbitrary strings survive SQL-quoting round trips") {
    import graft.sources.SqlDump
    // values containing quotes, semicolons, newlines, comment markers —
    // everything the statement splitter and literal parser must not trip on
    val hostile = Gen.listOfN(8, Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(20)),
      Gen.const("it's; a -- trap"), Gen.const("a''b"), Gen.const("line\nbreak"),
      Gen.const("""back\slash"""), Gen.const("/* not a comment */")))
    samples(hostile, 30).foreach { vals =>
      val quoted = vals.map(v => "'" + v.replace("\\", "\\\\").replace("'", "''") + "'")
      val dump =
        s"""CREATE TABLE t (${vals.indices.map(i => s"c$i text").mkString(", ")});
           |INSERT INTO t VALUES (${quoted.mkString(", ")});""".stripMargin
      val rows = SqlDump.parse(dump)
      assert(rows.length === 1)
      val got = rows.head._2
      vals.zipWithIndex.foreach { case (v, i) =>
        assert(got.get(s"c$i") === Some(v), s"column c$i of $vals")
      }
    }
  }

  test("interval binned == broadcast form over random intervals and widths") {
    val iv = for {
      m <- Gen.oneOf("c1", "c2")
      a <- Gen.chooseNum(-50.0, 50.0)
      len <- Gen.chooseNum(0.0, 30.0)
    } yield (m, a, a + len)
    samples(Gen.zip(Gen.listOfN(25, iv), Gen.listOfN(10, iv), Gen.oneOf(0.7, 5.0, 40.0)), 6)
      .foreach { case (ls, rs, w) =>
        val l = ls.toDF("m", "s", "e")
        val r = rs.toDF("rm", "rs", "re")
        def canon(df: org.apache.spark.sql.DataFrame) =
          df.select("m", "s", "e", "rs", "re").collect()
            .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2),
              x.getDouble(3), x.getDouble(4))).sorted.toSeq
        assert(canon(RowOps.intervalIntersectBinned(l, r, "m", "s", "e", "rm", "rs", "re", w))
          === canon(RowOps.intervalIntersect(l, r, "m", "s", "e", "rm", "rs", "re")),
          s"width $w")
      }
  }
}
