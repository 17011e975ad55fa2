package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-query benchmark over SPARK_GRAFT_SF_DIR. Each query is forced
  * through a full-row hash aggregate — `agg(bit_xor(xxhash64(struct(*))))`
  * — so every output column is computed and consumed; a bare `.count()`
  * lets Catalyst prune unreferenced projections and times the parquet
  * scan instead of the operator under test. The combining aggregate is
  * bit_xor, NOT sum: under ANSI mode a running sum of uniform 64-bit
  * hashes overflows Long within a handful of rows and kills the task
  * mid-partition (round ≤2 used sum and swallowed the failure, so those
  * timings measured evaluation only up to the first overflow). Also
  * reports recall@10 of the approximate ANN paths (SRP-LSH, IVF)
  * against the exact brute-force baseline, so the quality/speed trade
  * is graded alongside the timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // locale-proof: f"%.2f" under a comma-decimal default locale would
    // emit malformed JSON into the bench artifact
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the SHIPPED session configuration (AQE, skew-join splitting, split
    // sizing, extensions — GraftSession), not a bare builder: timings
    // must measure the engine a user actually runs
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      // xxhash64 over map-typed columns (the force-eval hash) is exact
      // and deterministic; Spark only gates it for hash-partitioning use
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .appName("graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("__h"))
        .agg(bit_xor(col("__h"))).collect()

    // untimed warmup: JIT/codegen/parquet-footer costs land here, not on
    // whichever query happens to run first; timed queries then run in
    // stable name order so per-query numbers compare round-over-round
    Seq("q_filter", "q_agg_reduce", "s_ann_topk").foreach { w =>
      try force(SparkEntry.queries(w)(spark, sfDir)) catch { case _: Throwable => () }
    }

    // Tenancy sentinel (VERDICT r6 ask #2): this host's effective CPU
    // swings ~2x between same-code runs (round 6 produced 70.9s / 91.9s
    // / 116s grids from byte-identical code), so every run interleaves
    // a FIXED CPU-bound computation — constant shape, constant data,
    // independent of the query grid and the sf dir — before/after each
    // pass. Its min time calibrates the run's effective speed:
    // `drift` = sentinel_min / SentinelRef (1.0 = the round-7
    // calibration host state; 1.5 = this run's host was 1.5x slower),
    // so round-over-round grid totals compare drift-normalized instead
    // of by forensics.
    val SentinelRef = 0.54 // seconds; round-7 calibration (BENCH/NOTES.md)
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 4000000L, 1L, 8)
        .select(xxhash64(sha2(concat(lit("graft-sentinel-"),
          col("id").cast("string")), 256)).as("h"))
        .agg(bit_xor(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    sentinel() // untimed warm-up of the sentinel's own codegen

    // a failed query must stay visible in the output (a swallowed error
    // would masquerade as a suspiciously fast timing): elapsed time is
    // NEGATED on failure and the name lands in an `errors` array.
    // Each query is timed across THREE full passes, per-query MIN kept,
    // and the per-query SPREAD (max/min over succeeding passes) reported
    // alongside: this sandbox's effective CPU fluctuates ~2x run-to-run
    // (identical code measured 49.5s and 80.8s totals back-to-back), so
    // minima are the comparable number and the spread field is what says
    // whether a round-over-round delta is signal or tenancy noise.
    // Nothing is cached between passes (no .persist here), so later
    // passes cannot hide real cost.
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
          catch { case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${t.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        (name, if (ok) dt else -dt)
      }
    val sentinels = scala.collection.mutable.ArrayBuffer(sentinel())
    val passes = Seq.fill(3) {
      val p = pass(); sentinels += sentinel(); p
    }
    val byQuery = passes.transpose.map { samples =>
      val name = samples.head._1
      val oks = samples.map(_._2).filter(_ > 0)
      if (oks.nonEmpty) (name, oks.min, oks.max / oks.min, samples.length - oks.length)
      else (name, -samples.map(s => -s._2).min, 1.0, samples.length)
    }
    val results = byQuery.map { case (n, t, _, _) => (n, t) }
    val spreads = byQuery.map { case (n, _, s, _) => (n, s) }
    val errors = results.collect { case (n, t) if t < 0 => n }
    // a query that failed SOME passes but succeeded once would otherwise
    // read as a clean success — partial failures stay visible
    val flaky = byQuery.collect { case (n, t, _, fails) if t > 0 && fails > 0 => n }

    // recall@10 of the approximate ANN queries vs the exact baseline
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall: Map[String, Double] =
      try {
        val exact = pairs("s_ann_topk")
        if (exact.isEmpty) Map.empty // avoid NaN (invalid JSON) on 0/0
        else Map(
          "ann_lsh" -> exact.count(pairs("x_ann_lsh").contains).toDouble / exact.size,
          "ann_ivf" -> exact.count(pairs("x_ann_ivf").contains).toDouble / exact.size)
      } catch { case t: Throwable =>
        // recall vanishing silently is the swallowed-error failure mode
        // this file documents for timings — at least leave a trace
        System.err.println(s"[bench] recall computation FAILED: $t")
        t.printStackTrace()
        Map.empty
      }

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => s"\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val rc = recall.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(r => math.abs(r._2)).sum
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flk = flaky.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sMin = sentinels.min
    val sSpread = sentinels.max / sentinels.min
    val drift = sMin / SentinelRef
    val sJson = sentinels.map(v => f"$v%.3f").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$sp,"recall":$rc,"errors":$errs,"flaky":$flk,""" +
        f""""sentinel":{"samples":$sJson,"min":$sMin%.3f,"spread":$sSpread%.2f},"drift":$drift%.3f,"sf":"$sfDir"}"""
    println(line)
    // the one-line grid outgrew the driver's stdout-tail capture (the r4
    // artifact lost its headline number to truncation) — persist the
    // complete JSON to a file as well, referenced from BENCH/BASELINE.md
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH/last_run.json"))
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, line + "\n")
    } catch { case t: Throwable =>
      System.err.println(s"[bench] could not write BENCH/last_run.json: ${t.getMessage}")
    }
    spark.stop()
  }
}
