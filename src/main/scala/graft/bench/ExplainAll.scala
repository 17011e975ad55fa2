package graft.bench

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected queries (plan-quality
  * review: pushdown, pruning, broadcast choice, codegen spans). */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set(
      "v_violations", "v_unique_dups", "v_ref_orphans", "v_profile",
      "q_agg_reduce", "q_lookup_copy", "q_interval", "s_ann_topk")
    // SPARK_GRAFT_NO_BROADCAST=1 shows the at-scale join shape: tiny
    // test inputs otherwise let AQE broadcast sides that would be
    // shuffled equi-joins on a real corpus
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("SPARK_GRAFT_NO_BROADCAST").contains("1"))
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      println(s"\n=============== $name ===============")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
