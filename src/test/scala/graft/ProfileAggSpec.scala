package graft

import graft.synth.FilesTable
import graft.validate.{Profile, ProfileSinglePass}
import org.scalatest.funsuite.AnyFunSuite

/** The custom TypedImperativeAggregate profile vs the exact reference. */
class ProfileAggSpec extends AnyFunSuite {
  import TestSpark._

  lazy val files = FilesTable.files(spark, sf).cache()
  val cols = Seq("repo", "path", "lang", "content")

  test("single-pass profile: exact stats match, HLL within 5%") {
    val exact = Profile.columns(files, cols, exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val fast = ProfileSinglePass.columns(files, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val (e, f) = (exact(c), fast(c))
      assert(f.getAs[Long]("n_rows") === e.getAs[Long]("n_rows"), c)
      assert(f.getAs[Long]("n_null") === e.getAs[Long]("n_null"), c)
      assert(f.getAs[Long]("min_len") === e.getAs[Long]("min_len"), c)
      assert(f.getAs[Long]("max_len") === e.getAs[Long]("max_len"), c)
      val (ed, fd) = (e.getAs[Long]("n_distinct").toDouble,
        f.getAs[Long]("n_distinct_est").toDouble)
      assert(math.abs(fd - ed) / math.max(ed, 1.0) < 0.05,
        s"$c: exact=$ed est=$fd")
    }
  }

  test("single-pass profile plan has one aggregate, no Expand") {
    val plan = ProfileSinglePass.columns(files, cols)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(400))
  }

  test("all-null column: both profile forms agree on NULL min/max length") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(1, 2, 3).toDF("i")
      .select(lit(null).cast("string").as("allnull"))
    val exact = Profile.columns(df, Seq("allnull")).collect()(0)
    val fast = ProfileSinglePass.columns(df, Seq("allnull")).collect()(0)
    // no length was observed — 0 would claim an empty string was seen
    assert(exact.isNullAt(exact.fieldIndex("min_len")))
    assert(exact.isNullAt(exact.fieldIndex("max_len")))
    assert(fast.isNullAt(fast.fieldIndex("min_len")))
    assert(fast.isNullAt(fast.fieldIndex("max_len")))
    assert(fast.getAs[Long]("n_null") === 3L)
  }

  test("hostile column names (dots, dashes, quotes) survive the profile stack expr") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("x", "yy"), ("zzz", null)).toDF("content-type", "a.b's")
    val exact = Profile.columns(df, Seq("content-type", "a.b's"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_null")).toMap
    assert(exact === Map("content-type" -> 0L, "a.b's" -> 1L))
    val fast = ProfileSinglePass.columns(df, Seq("content-type", "a.b's"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_null")).toMap
    assert(fast === Map("content-type" -> 0L, "a.b's" -> 1L))
  }

  test("buffer survives serialize/deserialize roundtrip") {
    import graft.expr.ColumnProfileAgg
    val agg = ColumnProfileAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    val b = agg.createAggregationBuffer()
    b.n = 7; b.nulls = 2; b.minLen = 1; b.maxLen = 9; b.regs(3) = 5
    val b2 = agg.deserialize(agg.serialize(b))
    assert((b2.n, b2.nulls, b2.minLen, b2.maxLen, b2.regs(3)) === ((7L, 2L, 1L, 9L, 5.toByte)))
  }
}
