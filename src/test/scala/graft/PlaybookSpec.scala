package graft

import graft.dedup.Dedup
import graft.ops.RowOps
import graft.pipeline.{Pipeline, Playbook}
import graft.streaming.StreamValidate
import graft.synth.FilesTable
import graft.model.FileRow
import graft.rules.FileRules
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PlaybookSpec extends AnyFunSuite {
  import TestSpark._

  test("playbook: inputs -> chained pipelines -> outputs, one Catalyst plan") {
    var written = 0L
    val pb = Playbook(
      inputs = Map("docs" -> (s => s.read.parquet(s"$sf/documents.parquet"))),
      pipelines = Map(
        "enrich" -> Pipeline("docs", Seq(
          "project" -> (df => RowOps.project(df,
            "lang_up" -> upper(col("lang")))),
          "filter" -> (df => RowOps.keep(df, col("n_chars") > 200)))),
        "final" -> Pipeline("enrich", Seq(
          "clean" -> (df => RowOps.clean(df, Seq("doc_id", "lang_up"))))),
      ),
      outputs = Map("out" -> ("final", df => written = df.count())))
    val res = pb.run(spark)
    assert(res("out").columns.toSeq === Seq("doc_id", "lang_up"))
    assert(written > 0 && written < 500)
    // plan fused end-to-end: the filter reaches the parquet scan
    val plan = res("out").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("GreaterThan"))
  }

  test("playbook: from-cycle detected (execute.go self-loop check)") {
    val pb = Playbook(
      inputs = Map.empty,
      pipelines = Map(
        "a" -> Pipeline("b", Seq.empty),
        "b" -> Pipeline("a", Seq.empty)),
      outputs = Map("o" -> ("a", _ => ())))
    val e = intercept[IllegalArgumentException](pb.run(spark))
    assert(e.getMessage.contains("cycle"))
  }

  test("embedding near-dups: planted perturbed vectors found, no noise") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val aug = e.unionAll(e.filter(col("vec_id") % 20 === 0).select(
      (col("vec_id") + 100000).as("vec_id"),
      concat(array(element_at(col("v"), 1) + lit(0.5)),
        expr("slice(v, 2, size(v) - 1)")).as("v")))
    val pairs = Dedup.embeddingNearDups(aug, "vec_id", "v", 0.8).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 100000,
        s"unexpected near-dup pair ${r.getLong(0)}-${r.getLong(1)}")
    }
  }

  test("stateful streaming: running totals accumulate across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("state").toString
    val files = FilesTable.files(spark, sf).drop("doc_id")
    files.limit(200).write.mode("append").parquet(dir)
    val stream = StreamValidate.violationStream(spark, dir, FileRow.schema,
      FileRules.rowRules)
    val q = StreamValidate.statefulRuleTotals(stream)
      .writeStream.format("memory").queryName("rule_totals")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val t1 = spark.sql(
        "SELECT sum(batch_inc) FROM rule_totals").collect()(0).getLong(0)
      files.write.mode("append").parquet(dir) // second micro-batch: full set
      q.processAllAvailable()
      val total = spark.sql(
        "SELECT sum(total) FROM (SELECT rule_id, max(total) AS total FROM rule_totals GROUP BY 1)")
        .collect()(0).getLong(0)
      val expectedAll = graft.validate.Violations.extract(files, FileRules.rowRules).count()
      assert(t1 > 0)
      assert(total === t1 + expectedAll) // state carried batch 1 -> batch 2
    } finally q.stop()
  }
}
