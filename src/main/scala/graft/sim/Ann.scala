package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *    query set against the corpus; one narrow pass + a per-query
  *    window for ranking. The baseline and the verification oracle.
  *  - [[lshTopK]] — the scale path: sign-random-projection buckets
  *    (deterministic hyperplanes) shrink each query's candidate set to
  *    its bucket before exact re-ranking. Recall is tested against the
  *    brute-force baseline rather than oracle-compared (it is an
  *    approximation by construction).
  *
  * Dot products fold left-to-right over the zipped arrays in double
  * precision — deterministic, and reproducible by any engine that folds
  * sequentially (the DuckDB oracle does).
  */
object Ann {

  /** Cosine similarity between two array<double> columns (by name).
    * Uses the codegen'd [[graft.expr.DotProduct]] (left-to-right
    * accumulation — bit-identical to the zip_with/aggregate fold, and
    * norm = sqrt(dot(v,v)) matches the acc + v*v fold). Callers go
    * through the public entry points below, which register the
    * function on the session. */
  def cosine(a: String, b: String): Column = {
    def dot(x: String, y: String): Column = call_function("dotp", col(x), col(y))
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Norm hoisted out of pair scoring: one fold per VECTOR instead of
    * two extra folds per PAIR (sqrt(dot(v,v)) of the same value —
    * bit-identical to folding inside [[cosine]], so oracle hashes are
    * unchanged; [[graft.dedup.Dedup.embeddingNearDups]] does the same).
    * Zero-norm vectors are EXCLUDED: their cosine is 0/0 = NaN, which
    * Spark orders above every double — a zero corpus vector would rank
    * as the #1 neighbor of every query, and a zero query would return k
    * arbitrary NaN-scored rows. Directionless vectors have no
    * neighbors, by definition. */
  private[graft] def withNorm(df: DataFrame, vec: String, as: String): DataFrame =
    df.withColumn(as, sqrt(call_function("dotp", col(vec), col(vec))))
      .filter(col(as) > 0)

  private def pairSim(qv: String, nv: String, qn: String, nn: String): Column =
    round(call_function("dotp", col(qv), col(nv)) / (col(qn) * col(nn)), 6)

  /** Exact top-k neighbors for each query row. `queries` must be small
    * (broadcast); excludes self-matches; deterministic tie-break on
    * neighbor id after rounding to 6dp. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val q = withNorm(queries.select(col(idCol).as("qid"),
      asDouble(col(vecCol)).as("qv")), "qv", "qn")
    val c = withNorm(corpus.select(col(idCol).as("nid"),
      asDouble(col(vecCol)).as("nv")), "nv", "nn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", pairSim("qv", "nv", "qn", "nn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("sim"))
  }

  /** A bucket code plus its `planes` 1-bit-flip neighbors — the
    * multiprobe probe set (Lv et al.). THE single definition of the
    * probe scheme, shared by [[lshTopK]] and
    * [[graft.dedup.Dedup.embeddingNearDups]] so the two engines cannot
    * silently diverge. */
  def multiprobeFlips(bucket: Column, planes: Int): Column =
    concat(array(bucket),
      transform(sequence(lit(0), lit(planes - 1)),
        b => bucket.bitwiseXOR(call_function("shiftleft", lit(1L), b))))

  /** Sign-random-projection bucket id for LSH table `tblCol`: `planes`
    * deterministic pseudo-random Rademacher hyperplanes, one sign bit
    * per plane — the codegen'd [[graft.expr.SrpBucket]] (splitmix64
    * plane components; see its scaladoc for why an integer-hash plane
    * family is required — sinusoidal constructions collapse every table
    * into one 2-D subspace and destroy multi-table recall). */
  def srpBucket(vecCol: String, planes: Int, tblCol: String): Column =
    call_function("srp_bucket", col(vecCol), col(tblCol), lit(planes))

  /** Approximate top-k: MULTIPROBE multi-table SRP-LSH — `tables`
    * independent plane sets, and each query additionally probes every
    * 1-bit-flip neighbor of its bucket (Lv et al., multi-probe LSH —
    * the same trick [[graft.dedup.Dedup.embeddingNearDups]] uses), so a
    * neighbor is a candidate when its code differs from the query's in
    * ≤ 1 plane in ANY table. Probing happens on the QUERY side: the
    * corpus contributes exactly `tables` rows per vector to the shuffle
    * (unchanged), while the tiny query side fans out ×(planes+1) —
    * recall of many more tables at no extra corpus cost. Candidates
    * then exact-cosine re-rank. One shuffle on (table, bucket); never
    * O(n²). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 8, tables: Int = 4): DataFrame = {
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val tbl = explode(expr(s"sequence(0, ${tables - 1})")).as("tbl")
    val c = withNorm(corpus.select(col(idCol).as("nid"),
      asDouble(col(vecCol)).as("nv")), "nv", "nn")
      .select(col("nid"), col("nv"), col("nn"), tbl)
      .withColumn("bucket", srpBucket("nv", planes, "tbl"))
    val q = withNorm(queries.select(col(idCol).as("qid"),
      asDouble(col(vecCol)).as("qv")), "qv", "qn")
      .select(col("qid"), col("qv"), col("qn"), tbl)
      .withColumn("bucket", srpBucket("qv", planes, "tbl"))
      .withColumn("bucket", explode(multiprobeFlips(col("bucket"), planes)))
    val cand = c.join(q, Seq("tbl", "bucket"))
      .filter(col("nid") =!= col("qid"))
      .dropDuplicates("qid", "nid")
    val scored = cand.withColumn("sim", pairSim("qv", "nv", "qn", "nn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("sim"))
  }
}
