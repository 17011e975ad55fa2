package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into K coarse cells around centroids, probe only the
  * `nprobe` cells nearest each query, exact cosine re-rank inside.
  *
  * Everything is DataFrame ops: centroid refinement is
  * posexplode→groupBy→rebuild (a shuffle per Lloyd iteration, K×dim
  * tiny output), assignment is a broadcast cross-score against K
  * centroids, and the probe join shuffles on the cell id — the corpus
  * is touched once per query batch, never O(n²). Deterministic
  * throughout: seeds are strided picks, no RNG.
  */
object Ivf {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** K strided seed vectors refined by `iters` Lloyd steps.
    * Returns (cell, centroid: array<double>). */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 1): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    // Seeds: the k smallest ids — TakeOrderedAndProject (per-partition
    // heaps, no global sort), deterministic for ANY id space (dense,
    // hashed, offset); the Lloyd step below does the spreading. The
    // window ranks only the k seed rows.
    val c0 = corpus
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("centroid"))
      .orderBy(col("cid"))
      .limit(k)
      .withColumn("cell", row_number().over(Window.orderBy("cid")) - 1)
      .select("cell", "centroid")
    (1 to iters).foldLeft(c0) { (cents, _) =>
      val assigned = assign(corpus, idCol, vecCol, cents)
      val refined = assigned
        .select(col("cell"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("centroid2"))
      // a cell that received no assignments keeps its previous centroid
      // (dropping it would silently shrink the effective nCells)
      cents.join(refined, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("centroid2"), col("centroid")).as("centroid"))
    }
  }

  /** Nearest-cell assignment: (nid, nv, cell). */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val scored = c.crossJoin(broadcast(cents))
      .withColumn("sim", Ann.cosine("nv", "centroid"))
    val w = Window.partitionBy("nid").orderBy(col("sim").desc, col("cell"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("nid", "nv", "cell")
  }

  /** Approximate top-k: probe the `nprobe` best cells per query. */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nprobe: Int = 4,
      iters: Int = 1): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    // centroids are K×dim — tiny by construction. Materialize them to
    // the driver and re-plan as a literal DataFrame: the (broadcast)
    // reuse across corpus assignment and query probes costs nothing,
    // and no cached blocks leak into a long-lived session (a .cache()
    // here had no safe unpersist point, since the returned plan is lazy)
    val centRows = centroids(corpus, idCol, vecCol, nCells, iters).collect().toIndexedSeq
    val cents = spark.createDataFrame(
      spark.sparkContext.parallelize(centRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val cells = assign(corpus, idCol, vecCol, cents)
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val probeW = Window.partitionBy("qid").orderBy(col("csim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", Ann.cosine("qv", "centroid"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select("qid", "qv", "cell")
    val cand = probes.join(cells, Seq("cell"))
      .filter(col("nid") =!= col("qid"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    cand.withColumn("sim", round(Ann.cosine("qv", "nv"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("sim"))
  }
}
