package graft

import graft.synth.FilesTable
import graft.validate.{DriftCheck, IncrementalProfile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable per-partition stats: the merge of per-partition rows must
  * equal the whole-table computation (the property that makes
  * incremental, zero-rescan profiles correct at any partition count).
  */
class IncrementalProfileSpec extends AnyFunSuite {
  import TestSpark._

  lazy val files = FilesTable.files(spark, sf).cache()

  private def splits = Seq(
    col("doc_id") % 3 === 0, col("doc_id") % 3 === 1, col("doc_id") % 3 === 2)

  test("merged per-partition profiles == whole-table profile (exact fields)") {
    val whole = IncrementalProfile.partitionProfile(files,
      nullCols = Seq("lang"), rangeCols = Seq("doc_id"),
      distinctCols = Seq("commit"))
    val parts = splits.map(p =>
      IncrementalProfile.partitionProfile(files.filter(p),
        nullCols = Seq("lang"), rangeCols = Seq("doc_id"),
        distinctCols = Seq("commit")))
    val merged = IncrementalProfile
      .mergeProfiles(parts.reduce(_.unionByName(_))).collect()(0)
    val w = whole.collect()(0)
    assert(merged.getAs[Long]("n_rows") === w.getAs[Long]("n_rows"))
    assert(merged.getAs[Long]("null_lang") === w.getAs[Long]("null_lang"))
    assert(merged.getAs[Long]("min_doc_id") === w.getAs[Long]("min_doc_id"))
    assert(merged.getAs[Long]("max_doc_id") === w.getAs[Long]("max_doc_id"))
    val exact = files.select("commit").distinct().count().toDouble
    val est = merged.getAs[Long]("distinct_commit").toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"exact=$exact est=$est")
  }

  test("merged histograms give the same PSI as directly-built histograms") {
    val width = graft.rules.FileRules.drift.bucketWidth
    val h0parts = splits.take(2).map(p => IncrementalProfile
      .lengthHistogram(files.filter(p), length(col("content")), width))
    val h1 = IncrementalProfile
      .lengthHistogram(files.filter(splits(2)), length(col("content")), width)
    val viaMerge = DriftCheck.psiFromHists(
      IncrementalProfile.mergeHistograms(h0parts.reduce(_.unionByName(_))),
      h1).collect()(0).getDouble(0)
    val direct = DriftCheck.psiFromHists(
      IncrementalProfile.lengthHistogram(
        files.filter(splits(0) || splits(1)), length(col("content")), width),
      h1).collect()(0).getDouble(0)
    assert(viaMerge === direct)
    // identical distributions merge to PSI == 0 exactly (same ε path)
    val self = DriftCheck.psiFromHists(h1, h1).collect()(0).getDouble(0)
    assert(self === 0.0)
  }

  test("non-numeric range column is rejected at call time") {
    intercept[IllegalArgumentException] {
      IncrementalProfile.partitionProfile(files, Seq.empty,
        rangeCols = Seq("commit"), Seq.empty)
    }
  }
}
