package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's generic escape hatch: external commands speaking
  * NDJSON.
  *
  *  - [[source]] — run a command, parse its stdout NDJSON as rows
  *    (extractors/plugin_load.go:18-82). One process = one task, like
  *    the reference's single reader goroutine.
  *  - [[transform]] / [[transformRaw]] — pipe rows through a command:
  *    each PARTITION spawns one process, streams its rows to stdin as
  *    NDJSON, and yields stdout NDJSON rows (transform/plugin.go:29-88;
  *    the reference runs exactly one process on one stream — per
  *    partition is the distributed generalization, same contract as
  *    Hadoop streaming). The command must therefore be row-wise or
  *    partition-associative, and must be installed on executors.
  *
  * stdin is fed from a separate thread (the reference uses a goroutine)
  * so neither pipe can deadlock; stderr is inherited. Malformed output
  * lines fail the task rather than being silently logged-and-dropped —
  * an engine that feeds training pipelines should not eat rows. If the
  * UPSTREAM iterator fails mid-stream, the writer thread's exception is
  * rethrown from the output iterator so the task fails instead of
  * succeeding on rows derived from partial input.
  *
  * Contract example — what callers must NOT do:
  * {{{
  * Plugin.transformRaw(df, Seq("grep", "-v", "skipme"))  // OK: row-wise
  * Plugin.transformRaw(df, Seq("sort"))  // WRONG for global semantics:
  *   // each partition sorts independently; there is no global order
  *   // (SourcesSpec "per-partition processes" doc-test demonstrates it)
  * }}}
  */
object Plugin {

  /** Stream NDJSON through `command` within each partition; returns the
    * raw stdout lines. */
  def transformRaw(df: DataFrame, command: Seq[String]): Dataset[String] = {
    import df.sparkSession.implicits._
    df.toJSON.mapPartitions(pipeThrough(command, _))
  }

  /** [[transformRaw]] parsed with an explicit output schema (from_json;
    * stays one fused pass, no inference job). FAILFAST: a malformed
    * stdout line fails the task — the default PERMISSIVE mode would
    * quietly turn a plugin's stray diagnostic line into an all-null row
    * (the documented contract is that malformed output must not be
    * silently eaten OR invented). */
  def transform(df: DataFrame, command: Seq[String], outSchema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    transformRaw(df, command)
      .select(from_json(col("value"), outSchema,
        Map("mode" -> "FAILFAST").asJava).as("r")).select("r.*")
  }

  /** Run `command` once (a single task), parse stdout NDJSON rows with
    * schema inference. The output RDD is persisted (MEMORY_AND_DISK —
    * memory-only caching is all-or-nothing per partition and would
    * silently re-execute an oversized output) BEFORE inference:
    * read.json's schema pass is its own job, and without the persist
    * the command would re-run for every downstream action — fatal for
    * slow or non-idempotent plugins (the reference runs its extractor
    * exactly once). The persisted block lives until the session ends or
    * the caller unpersists `df.rdd` — the price of run-once semantics
    * for an arbitrary external command. */
  def source(spark: SparkSession, command: Seq[String]): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext.parallelize(Seq(command), 1)
      .flatMap(cmd => pipeThrough(cmd, Iterator.empty))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // FAILFAST for the same reason as [[transform]]: no silent null rows
    spark.read.option("mode", "FAILFAST").json(spark.createDataset(lines))
  }

  /** Spawn `command`, feed `in` lines to stdin from a writer thread,
    * iterate stdout lines. */
  private def pipeThrough(command: Seq[String], in: Iterator[String]): Iterator[String] = {
    import java.io.{BufferedReader, InputStreamReader}
    val pb = new ProcessBuilder(command: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    // if the UPSTREAM iterator throws mid-stream, the plugin sees a clean
    // EOF and exits 0 — without re-throwing here the task would SUCCEED on
    // rows derived from partial input (silent data loss; Spark's own piped
    // RDD propagates its child-thread exception for the same reason).
    // WRITE failures are a different case: a plugin that legitimately
    // closes stdin early (`head`, `grep -m`) breaks the pipe while the
    // output is complete and the exit code is 0 — so IOExceptions from
    // the write stop the feed quietly and the exit-code check remains
    // the arbiter, while anything thrown by the upstream iterator
    // itself is fatal.
    @volatile var writerFailure: Throwable = null
    val writer = new Thread(() => {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
      try {
        var feeding = true
        while (feeding && in.hasNext) { // hasNext/next throw = upstream failure
          val l = in.next()
          try { w.write(l); w.write('\n') }
          catch { case _: java.io.IOException => feeding = false }
        }
      } catch { case t: Throwable => writerFailure = t }
      finally {
        try w.close() catch { case _: java.io.IOException => () }
      }
    }, "graft-plugin-stdin")
    writer.setDaemon(true)
    writer.start()
    val r = new BufferedReader(new InputStreamReader(proc.getInputStream, "UTF-8"))
    new Iterator[String] {
      private var nextLine: String = advance()
      private def advance(): String = {
        val l = r.readLine()
        if (l == null) {
          writer.join()
          if (writerFailure != null)
            throw new RuntimeException(
              s"plugin stdin feed failed mid-stream; output discarded", writerFailure)
          val code = proc.waitFor()
          if (code != 0)
            throw new RuntimeException(
              s"plugin command ${command.mkString(" ")} exited with $code")
        }
        l
      }
      def hasNext: Boolean = nextLine != null
      def next(): String = {
        val l = nextLine
        nextLine = advance()
        l
      }
    }.filter(_.nonEmpty)
  }
}
