package graft.bench
import graft.pylite.PyOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PyThroughput {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // replicate to ~1M rows so per-row interpreter cost dominates setup
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "10").toInt
    val base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val ev = (1 to rep).map(i => base.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionAll _)
    val n = ev.count()
    val code =
      """def f(x):
        |  x["vtag"] = x["event_type"].upper() + ":" + str(x["user_id"] % 100)
        |  x["v2"] = x["value"] * 2.0 if x["value"] is not None else 0.0
        |  return x
        |""".stripMargin
    def force(): Unit =
      PyOps.mapPy(ev, code, "f")
        .select(xxhash64(col("vtag"), col("v2")).as("h"))
        .agg(bit_xor(col("h"))).collect()
    force() // warmup
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      force()
      (System.nanoTime() - t0) / 1e9
    }
    val best = times.min
    println(f"""{"metric":"pylite_map_throughput","rows":$n,"cpus":$cpus,"sec":$best%.2f,"rows_per_sec":${(n/best).toLong}}""")
    spark.stop()
  }
}
