package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into K coarse cells around centroids, probe only the
  * `nprobe` cells nearest each query, exact cosine re-rank inside.
  *
  * Centroids are K×dim — tiny by construction — so they live as a PLAN
  * LITERAL (array-of-arrays), pre-normalized on the driver: cell
  * assignment and query probing are pure projections (argmax / top-n
  * over K dot products per row), no crossJoin, no window, no shuffle.
  * The only shuffles are the Lloyd refinement aggregation (K×dim
  * output) and the probe join on the cell id. Deterministic
  * throughout: seeds are the k smallest ids, no RNG.
  */
object Ivf {

  /** Fixed-point scale (2^30) for the Lloyd mean. Component values are
    * rounded to `x * 2^30` LONGS before summing: long addition is
    * exact and order-independent, so the refined centroids are
    * bit-identical under ANY partitioning / AQE re-plan (a plain
    * `avg(double)` is not — float addition reorders), the aggregation
    * keeps map-side combine (no ordered-fold collect_list needed, so
    * the refine step stays a two-level shuffle agg at any corpus
    * size), and the DuckDB oracle replays the exact same integers.
    * Headroom: |x| ≤ 2^8 per component leaves 2^25 rows per (cell,pos)
    * before the *double conversion* of the sum could lose a bit
    * (2^53 mantissa); the long sum itself is exact to 2^63. */
  val FixedScale: Long = 1L << 30

  private def asDouble(c: Column) = transform(c, x => x.cast("double"))

  /** `(negsim, cell)` structs of a vector column against the centroid
    * literal, ascending sort = best cell first (ties → lowest cell). */
  private def cellRanking(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val centsLit = typedlit(cents)
    array_sort(transform(sequence(lit(0), lit(cents.size - 1)), i =>
      struct(
        (-call_function("dotp", vec, element_at(centsLit, i + 1))).as("negsim"),
        i.as("cell"))))
  }

  private def normalize(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** K strided seed vectors refined by `iters` Lloyd steps, materialized
    * to the driver. Returns (cell, centroid) with UNIT-NORM centroids
    * (cosine argmax over unit centroids = dot-product argmax). */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 1): Seq[(Int, Seq[Double])] = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    // Seeds: the k smallest ids — TakeOrderedAndProject (per-partition
    // heaps, no global sort), deterministic for ANY id space; the Lloyd
    // step does the spreading.
    val c0: Seq[(Int, Seq[Double])] = corpus
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("centroid"))
      .orderBy(col("cid")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, normalize(r.getSeq[Double](1))) }.toIndexedSeq
    (1 to iters).foldLeft(c0) { (cents, _) =>
      val assigned = assign(corpus, idCol, vecCol, cents)
      // mean via fixed-point long sums (see FixedScale): deterministic
      // and cross-engine reproducible; the division order (sum→double,
      // /count, /scale) is frozen — the oracle divides in the same order
      val refined = assigned
        .select(col("cell"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(round(col("x") * FixedScale).cast("long")).as("fx"),
          count(lit(1)).as("n"))
        .groupBy("cell")
        .agg(expr(s"""transform(array_sort(collect_list(struct(pos, fx, n))),
          s -> CAST(s.fx AS DOUBLE) / CAST(s.n AS DOUBLE) / CAST($FixedScale AS DOUBLE))""")
          .as("centroid"))
        .collect().map(r => r.getInt(0) -> normalize(r.getSeq[Double](1))).toMap
      // a cell that received no assignments keeps its previous centroid
      // (dropping it would silently shrink the effective nCells)
      cents.map { case (cell, c) => (cell, refined.getOrElse(cell, c)) }
    }
  }

  /** Nearest-cell assignment: (nid, nv, cell). One narrow projection —
    * argmax over the centroid literal. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
      .withColumn("cell",
        element_at(cellRanking(col("nv"), cents.sortBy(_._1).map(_._2)), 1)
          .getField("cell"))
  }

  /** Approximate top-k: probe the `nprobe` best cells per query. */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nprobe: Int = 4,
      iters: Int = 1): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val cents = centroids(corpus, idCol, vecCol, nCells, iters)
    val ordered = cents.sortBy(_._1).map(_._2)
    // norms hoisted out of the re-rank (one fold per vector, not two
    // per candidate pair — the Ann.withNorm shape); zero-norm vectors
    // excluded: their cosine is NaN, which Spark ranks above everything
    def norm(v: String) = sqrt(call_function("dotp", col(v), col(v)))
    val cells = assign(corpus, idCol, vecCol, cents)
      .withColumn("nn", norm("nv")).filter(col("nn") > 0)
    val probes = queries
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm("qv")).filter(col("qn") > 0)
      .withColumn("cell", explode(
        transform(slice(cellRanking(col("qv"), ordered), 1, nprobe),
          s => s.getField("cell"))))
    val cand = probes.join(cells, Seq("cell"))
      .filter(col("nid") =!= col("qid"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    cand.withColumn("sim", round(
      call_function("dotp", col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("sim"))
  }
}
