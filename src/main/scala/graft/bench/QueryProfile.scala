package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-query Spark-job breakdown for optimization work (guide §1:
  * measure first). NOT part of the frozen bench contract — Bench.scala
  * stays the driver's measured artifact; this tool exists to answer
  * "where do the seconds of query X go" (job count, per-job wall time,
  * cold vs warm pass) without touching the measured harness.
  *
  * Usage: `sbt "runMain graft.bench.QueryProfile q1 q2 ..."` with the
  * same SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env contract as Bench.
  */
object QueryProfile {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "3").toInt
    val names: Seq[String] =
      if (args.nonEmpty) args.toIndexedSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .appName("graft-query-profile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("__h"))
        .agg(bit_xor(col("__h"))).collect()

    // job-level listener: (jobId, startMs, endMs, description)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(j.jobId, (j.time, desc)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
          jobs.add((j.jobId, t0, j.time, d)); ()
        }
      }
    })
    // stage-level: (stageId, name, numTasks, executorRunTime ms, wall ms)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
          .getOrElse(0L)
        stages.add((i.stageId, i.name, i.numTasks,
          i.taskMetrics.executorRunTime, wall)); ()
      }
    })

    // global warmup (mirrors Bench): codegen/parquet-footer costs land here
    Seq("q_filter", "q_agg_reduce", "s_ann_topk").foreach { w =>
      try force(graft.SparkEntry.queries(w)(spark, sfDir))
      catch { case _: Throwable => () }
    }

    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"== $name: UNKNOWN QUERY ==")
        case Some(fn) =>
          (1 to passes).foreach { pass =>
            jobs.clear(); stages.clear()
            val t0 = System.nanoTime()
            val ok = try { force(fn(spark, sfDir)); true }
              catch { case t: Throwable =>
                println(s"== $name pass $pass FAILED: ${t.getMessage}"); false }
            val dt = (System.nanoTime() - t0) / 1e9
            if (ok) {
              import scala.jdk.CollectionConverters._
              val js = jobs.asScala.toSeq.sortBy(_._2)
              val jobTotal = js.map(j => j._3 - j._2).sum / 1e3
              println(f"== $name pass $pass: $dt%.3fs, ${js.size} jobs " +
                f"(sum of job wall $jobTotal%.3fs; gaps = driver/planning) ==")
              js.sortBy(j => -(j._3 - j._2)).take(12).foreach { case (id, s, e, d) =>
                println(f"   job $id%4d  ${(e - s) / 1e3}%7.3fs  ${d.take(90)}")
              }
              import scala.jdk.CollectionConverters.{ConcurrentMapHasAsScala => _, _}
              stages.asScala.toSeq.sortBy(st => -st._5).take(10)
                .foreach { case (id, nm, nt, run, wall) =>
                  println(f"   stage $id%4d wall ${wall / 1e3}%7.3fs run ${run / 1e3}%7.3fs tasks $nt%3d  ${nm.take(70)}")
                }
              // chronological gap report: time between a job's end and
              // the next job's start = driver/planning/engine work
              if (sys.env.get("SPARK_GRAFT_PROFILE_GAPS").contains("1")) {
                var lastEnd = 0L
                js.foreach { case (id, st, en, d) =>
                  val gap = if (lastEnd == 0) 0.0 else (st - lastEnd) / 1e3
                  if (gap > 0.05)
                    println(f"   GAP  ${gap}%7.3fs before job $id%4d (${d.take(60)})")
                  lastEnd = math.max(lastEnd, en)
                }
              }
            }
          }
      }
    }
    spark.stop()
  }
}
