package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal pure-CPU Spark scaling probe (diagnostic): hash a synthetic
  * range at a given local[N] and print per-iteration wall time. Used to
  * separate machine-level scaling from engine-plan effects.
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rows = args.lift(1).map(_.toLong).getOrElse(100000000L)
    val useSha = args.lift(2).forall(_ == "sha")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 10000000, 1, cores * 2)
      .select(sum(pmod(xxhash64(col("id")), lit(1000000)))).collect() // warm-up
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val h =
        if (useSha) xxhash64(sha2(concat(lit("x"), col("id").cast("string")), 256))
        else xxhash64(concat(lit("x"), col("id").cast("string")),
          col("id"), col("id") * 31, col("id") + 7)
      spark.range(0, rows, 1, cores * 2)
        .select(sum(pmod(h, lit(1000000)))).collect()
      println(f"cores=$cores iter=$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
