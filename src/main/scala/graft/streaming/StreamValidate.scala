package graft.streaming

import graft.rules.RowRule
import graft.validate.Violations
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** One update row per (rule, micro-batch): cumulative + increment. */
final case class RuleTotal(rule_id: String, total: Long, batch_inc: Long)

/** Structured Streaming surface of the engine.
  *
  * The reference is strictly batch (finite file sources, pipelines
  * terminate — playbook/execute.go:366-369), so nothing here maps 1:1;
  * this is the engine's scale path for CONTINUOUS validation: new file
  * rows land in the table (an Iceberg commit stream at 100 TB), and the
  * same compiled rule predicates run incrementally.
  *
  * Because [[Violations.extract]] is a stateless narrow projection, the
  * identical plan works unchanged under `readStream` — one of the
  * payoffs of keeping rules as Column expressions rather than driver
  * logic.
  */
object StreamValidate {

  /** Continuous violation stream from a parquet directory source.
    * `maxFilesPerTrigger` caps each micro-batch's file intake (the
    * knob that turns one drain into genuinely incremental batches). */
  def violationStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      rules: Seq[RowRule],
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    val tuned = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    Violations.extract(tuned.parquet(dir), rules)
  }

  /** Windowed event-rate monitoring (the ops-side health signal):
    * per event_type counts + value sums over sliding windows with a
    * watermark bounding state. The sum runs in decimal(18,2) and is
    * cast back to double so the result is exact (bit-stable across
    * partition orderings and engines — the same move q_window_agg's
    * batch face makes for its DuckDB oracle). */
  def windowedEventAgg(events: DataFrame,
      window_ : String = "5 minutes", slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("value_sum"))

  /** Per-key running violation counts via mapGroupsWithState-style
    * stateful tracking — here expressed with the simpler built-in
    * aggregation (complete-mode memory sink for tests). */
  def runningViolationCounts(violations: DataFrame): DataFrame =
    violations.groupBy(col("rule_id")).count()

  /** Custom state: running per-rule totals via mapGroupsWithState —
    * the escape hatch when the running metric isn't a built-in
    * aggregate (here it also carries the batch increment, which plain
    * counts can't emit in update mode). */
  def statefulRuleTotals(violations: DataFrame): org.apache.spark.sql.Dataset[RuleTotal] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    val spark = violations.sparkSession
    import spark.implicits._
    violations.select(col("rule_id").as[String])
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (rule: String, batch: Iterator[String], state: GroupState[Long]) => {
          val inc = batch.size.toLong
          val total = state.getOption.getOrElse(0L) + inc
          state.update(total)
          RuleTotal(rule, total, inc)
        })
  }

  /** Streaming exact dedup on a digest key with bounded state:
    * dropDuplicatesWithinWatermark keeps only the keys whose event time
    * is still inside the watermark horizon, so state does NOT grow with
    * the corpus — the streaming face of [[graft.dedup.Dedup.exact]]
    * (the reference's `distinct` badger KV grows unboundedly,
    * transform/distinct.go:24-53; the watermark is the scale answer).
    * Columns: the input plus a `digest` column used as the dedup key. */
  def streamingDedup(rows: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    rows
      .withColumn("digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  def toMemorySink(df: DataFrame, name: String,
      outputMode: String): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode)

  /** Commit a stream into an IceLite table, one PARTITION per
    * micro-batch — the piece that unifies the engine's two
    * resumability stories: the streaming checkpoint decides WHAT each
    * batch contains, the snapshot lineage decides whether it already
    * LANDED. foreachBatch is at-least-once (a batch replays after a
    * crash between sink write and checkpoint commit), so the batch id
    * is the partition name and a replayed batch whose lineage record
    * exists is SKIPPED — an O(1) existence probe per batch, not a
    * lineage-dir listing (a long drain would otherwise pay O(parts²)
    * metadata IO). Row counts come from the written parquet footers:
    * a `() => batch.count()` thunk would re-execute the whole
    * unpersisted batch plan a second time per batch.
    *
    * Exactly-once scope: content dedup is BY BATCH ID, which is
    * exactly right for replays from the SAME checkpoint (Spark
    * guarantees a replayed id re-delivers the identical file set). A
    * REBUILT checkpoint re-numbers from 0 — each commit therefore
    * records the batch's SOURCE-FILE SET in its lineage record, and a
    * replayed id whose file set differs from the record fails loudly
    * (ADVICE r6: before this witness, a rebuilt checkpoint over input
    * that had grown would silently drop batch 0's new content against
    * the old b00000 record). Cross-checkpoint migration still wants a
    * fresh snapshot id; the witness turns the unsafe shortcut from
    * silent data loss into an error.
    *
    * The caller seals the snapshot with
    * `ice.commitSnapshot(snap, ice.completedParts(snap).toSeq.sorted)`
    * once the drain finishes; until then the lineage records are the
    * (crash-safe) in-progress state. */
  def toIceLite(df: DataFrame, ice: graft.io.IceLite, snap: Long,
      table: String): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val part = f"b$id%05d"
      val srcs = batch.inputFiles.toSeq.sorted
      if (!ice.isPartCompleted(snap, part))
        ice.commitPartitionFromFooters(snap, part, Map(table -> batch),
          srcFiles = Some(srcs))
      else
        // O(1) record read, no relisting of the lineage dir; records
        // written before the witness (no srcFiles) skip as before
        ice.partSourceFiles(snap, part).filter(_ != srcs).foreach { rec =>
          sys.error(s"replayed batch $id delivers a different source-file " +
            s"set than its lineage record (${rec.size} recorded vs " +
            s"${srcs.size} delivered): this checkpoint was rebuilt over " +
            "changed input — commit under a fresh snapshot id instead of " +
            "relying on batch-id dedup")
        }
      ()
    }
}
