package graft.bench

import org.apache.spark.sql.functions._

/** Capacity evidence for the 64-bit SimHash banding: candidate-pair
  * volume as the corpus grows to 10^6 docs. The thing that kills a
  * banded near-dup scheme at scale is candidates going quadratic
  * (birthday collisions inside band buckets — what saturates the
  * 16-bit variant at ~10^4 docs, Dedup.simhashPairs); this measures
  * the 64-bit bands' actual curve on the same deterministic corpora
  * ScalingBench uses (every token tagged per copy, 5% planted
  * near-dups — candidates must stay ~linear).
  *
  * Usage: runMain graft.bench.SimhashCapacity [sfDir] [sizes...]
  * Prints one JSON line per corpus size:
  *   {"metric":"simhash64_capacity","docs":N,"banded_candidates":C,
  *    "matched_pairs":M,"cand_per_doc":C/N}
  * Sub-quadratic = cand_per_doc roughly flat as docs grows 8x.
  */
object SimhashCapacity {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // f"%.2f" JSON must not localize
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(25, 50, 100, 200) // x5250 seeds: 131k..1.05M docs
      case xs => xs
    }
    val spark = ScalingBench.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    graft.expr.GraftFunctions.register(spark)
    try {
      reps.foreach { rep =>
        val path = ScalingBench.prepareDedup(spark, sfDir, rep, "/tmp/graft_bench")
        val docs = spark.read.parquet(path)
        val n = docs.count()
        // the banded self-join BEFORE the hamming filter = the volume
        // the shuffle actually carries (Dedup.simhashPairs64 internals,
        // maxHamming=2 -> 22/21/21-bit bands)
        val sigs = docs.select(col("doc_id").as("id"),
          call_function("simhash64", col("text")).as("sig"))
        val bandExprs = Seq((0, 22), (22, 21), (43, 21)).map { case (off, wid) =>
          s"shiftrightunsigned(sig, $off) & ${(1L << wid) - 1}"
        }.mkString("array(", ", ", ")")
        val banded = sigs.select(col("id"), col("sig"),
          posexplode(expr(bandExprs)).as(Seq("band", "bv")))
        val a = banded.select(col("band"), col("bv"), col("id").as("id_a"), col("sig").as("sa"))
        val b = banded.select(col("band"), col("bv"), col("id").as("id_b"), col("sig").as("sb"))
        val cand = a.join(b, Seq("band", "bv")).filter(col("id_a") < col("id_b"))
        val agg = cand.agg(
          count(lit(1)).as("c"),
          count(when(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 2, 1)).as("m"))
          .collect()(0)
        val (c, m) = (agg.getLong(0), agg.getLong(1))
        println(f"""{"metric":"simhash64_capacity","docs":$n,"banded_candidates":$c,"matched_pairs":$m,"cand_per_doc":${c.toDouble / n}%.3f}""")
      }
    } finally spark.stop()
  }
}
