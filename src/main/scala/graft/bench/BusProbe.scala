package graft.bench

import org.apache.spark.sql.functions._

/** Memory-bus attribution probe for the dedup job's scaling tail.
  *
  * Two single-stage-pair jobs over the SAME 1M-row table, run at two
  * parallelism levels in forked JVMs (ScalingBench protocol):
  *
  *  - `compute`: per-row arithmetic over a long column, ~no shuffle
  *    bytes (bit_xor of a 200-iteration hash chain) — bounded by CPU.
  *  - `shuffle`: hash-repartition the 200-element array column and
  *    bit_xor it on the far side — the work IS moving the arrays
  *    through serialize→exchange→deserialize, bounded by memory
  *    bandwidth on a single box.
  *
  * If `compute` scales near the CpuProbe ceiling (~0.85 at 4→16 on
  * this host) while `shuffle` lands where the dedup job's
  * shingle/lsh_candidates phases land (~0.6), the dedup tail is the
  * box's memory bus, not a plan defect: on a real cluster those bytes
  * cross per-node NICs/buses that scale WITH the node count.
  *
  * Usage: runMain graft.bench.BusProbe  → one JSON line.
  */
object BusProbe {

  private val Rows = 1000000L
  private val Width = 200

  def prepare(workDir: String): String = {
    val path = s"$workDir/busprobe_${Rows}_$Width.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
      val spark = ScalingBench.session(16)
      try {
        // xxhash64 mixing: ANSI mode forbids overflowing multiplies
        spark.range(Rows).repartition(64)
          .select(col("id"),
            expr(s"transform(sequence(1, $Width), j -> xxhash64(id, j))").as("arr"))
          .write.parquet(path)
      } finally spark.stop()
    }
    path
  }

  /** One measured pass; returns (rows, seconds) via ScalingBench.pass
    * plumbing. */
  def probePass(kind: String, spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Seq[(String, Double)]) = {
    val df = spark.read.parquet(path)
    val t0 = System.nanoTime()
    kind match {
      case "compute" =>
        // 200 dependent hash rounds per row, no wide columns: matches
        // the shuffle variant's per-row op count, moves ~nothing
        df.select(col("id"))
          .select(expr(
            "aggregate(sequence(1, 200), id, (acc, j) -> xxhash64(acc, j))").as("h"))
          .agg(bit_xor(col("h"))).collect()
      case "shuffle" =>
        // the array column through a full exchange, then one fold —
        // bytes moved dominate compute
        df.repartition(64, col("id"))
          .select(xxhash64(col("arr")).as("h"))
          .agg(bit_xor(col("h"))).collect()
      case other => sys.error(s"unknown probe: $other")
    }
    (Rows, Seq(kind -> (System.nanoTime() - t0) / 1e9))
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--single")) {
      // child protocol: --single <cores> <path> <kind> <iters>
      val (cores, path, kind, iters) =
        (args(1).toInt, args(2), args(3), args(4).toInt)
      val spark = ScalingBench.session(cores)
      try {
        probePass(kind, spark, path) // warm-up
        val best = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          probePass(kind, spark, path)
          (System.nanoTime() - t0) / 1e9
        }.min
        println(s"RESULT $Rows $best")
      } finally spark.stop()
      return
    }
    val path = prepare("/tmp/graft_bench")
    val out = Seq("compute", "shuffle").map { kind =>
      val rounds = (1 to 2).map { _ =>
        (forkProbe(4, path, kind), forkProbe(16, path, kind))
      }
      val lo = rounds.map(_._1).min
      val hi = rounds.map(_._2).min
      val eff = (lo / hi) / 4.0
      f""""$kind":{"sec_lo":$lo%.2f,"sec_hi":$hi%.2f,"efficiency":$eff%.3f}"""
    }
    println(s"""{"metric":"bus_probe","rows":$Rows,"width":$Width,${out.mkString(",")}}""")
  }

  private def forkProbe(cores: Int, path: String, kind: String): Double = {
    // reuse ScalingBench's forked-JVM runner by shelling the same way
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx24g",
      "-Dspark.ui.enabled=false", "-cp", System.getProperty("java.class.path"),
      "graft.bench.BusProbe", "--single", cores.toString, path, kind, "3")
    val proc = new ProcessBuilder(cmd: _*).start()
    // drain stderr CONCURRENTLY: a chatty Spark child fills the ~64KB
    // pipe and deadlocks against a sequential read (same fix as
    // ScalingBench.forkLevel's errDrain thread)
    val errBuf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => proc.getErrorStream.transferTo(errBuf): Unit)
    drain.start()
    val out = new String(proc.getInputStream.readAllBytes())
    proc.waitFor()
    drain.join()
    out.linesIterator.find(_.startsWith("RESULT "))
      .map(_.split(" ")(2).toDouble)
      .getOrElse(sys.error(s"probe child failed:\n$out\n${errBuf.toString.takeRight(4000)}"))
  }
}
