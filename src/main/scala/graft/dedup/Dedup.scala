package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact through
  * approximate:
  *
  *  - [[exact]] — hash-groupBy on a content digest (one shuffle on a
  *    uniformly distributed key).
  *  - [[shingleHashes]] / [[minhashSignature]] / [[lshCandidatePairs]] —
  *    MinHash + banded LSH: shingle → k min-hashes → band buckets →
  *    candidate pairs from a self-join on (band, bucket). The self-join
  *    shuffles on the band-hash key, so only near-duplicates ever meet —
  *    the O(n²) pair space is never materialized.
  *  - [[simhash]] — per-doc bit-voted token-hash signature; equal or
  *    near-equal (Hamming) signatures are near-dups.
  *  - [[jaccard]] — exact n-gram Jaccard for a *candidate* pair set
  *    (verification stage after LSH blocking, never a full cross join).
  *
  * All hashing is deterministic polynomial arithmetic (not engine-native
  * hash functions) so results are identical across engines — the same
  * property that makes the DuckDB oracle able to replay them.
  *
  * The reference's only dedup is first-wins `distinct` over a KV store
  * (transform/distinct.go:24-62); everything beyond that is the
  * training-data extension the north star asks for.
  */
object Dedup {

  val P: Long = 1000000007L

  /** Exact dedup groups: one row per distinct digest with group size and
    * the kept (minimum) id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Distinct char-`k`-gram polynomial hashes of `textCol` as an array
    * column `shingles`. Pure lambda expressions — codegen, no UDF. */
  def withShingleHashes(df: DataFrame, textCol: String, k: Int = 5): DataFrame =
    df.withColumn("shingles",
      when(length(col(textCol)) < k, array().cast("array<bigint>"))
        .otherwise(expr(
          s"""array_distinct(transform(sequence(1, length($textCol) - ${k - 1}),
             |  i -> aggregate(transform(sequence(0, ${k - 1}),
             |                           j -> ascii(substring($textCol, i + j, 1))),
             |                 0L, (acc, x) -> (acc * 131 + x) % $P)))""".stripMargin)))

  /** Distinct word-trigram shingle hashes: hash each whitespace token
    * once (polynomial over chars), then combine consecutive triples.
    * Word grams stay distinctive even over small vocabularies where
    * char grams degenerate into every-doc-shares-every-shingle (which
    * turns LSH banding quadratic). */
  def withWordShingles(df: DataFrame, textCol: String): DataFrame = {
    // codegen'd PolyHash per token (identical fold to the SQL-lambda
    // formulation the oracle replays, minus the per-char array)
    graft.expr.GraftFunctions.register(df.sparkSession)
    df
      .withColumn("__th",
        expr(s"transform(split(trim($textCol), '\\\\s+'), t -> polyhash(t))"))
      .withColumn("shingles",
        when(size(col("__th")) < 3, array().cast("array<bigint>"))
          .otherwise(expr(
            s"""array_distinct(transform(sequence(1, size(__th) - 2),
               |  i -> ((element_at(__th, i) * 131 + element_at(__th, i + 1)) % $P * 131
               |        + element_at(__th, i + 2)) % $P))""".stripMargin)))
      .drop("__th")
  }

  /** MinHash signature: sig[i] = min over shingles of (a_i*x + b_i) mod P
    * with fixed odd multipliers — k permutation approximations. */
  def withMinhashSignature(df: DataFrame, numHashes: Int = 16): DataFrame =
    df.withColumn("sig", expr(
      s"""transform(sequence(0, ${numHashes - 1}),
         |  i -> array_min(transform(shingles,
         |         x -> ((2 * i + 1) * x + 7 * i + 3) % $P)))""".stripMargin))

  /** Banded LSH candidate pairs: split the signature into `bands` bands,
    * hash each band, self-join docs sharing a (band, hash) bucket.
    * Returns distinct (id_a < id_b) pairs. */
  def lshCandidatePairs(sigDf: DataFrame, idCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val banded = sigDf.select(col(idCol).as("doc"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> aggregate(slice(sig, b * $rowsPerBand + 1, $rowsPerBand),
           |                 0L, (acc, x) -> (acc * 131 + x % 1000000) % $P))""".stripMargin))
        .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("doc").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc").as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** 16-bit SimHash over whitespace tokens: each token's polynomial hash
    * votes ±1 per bit; majority sets the bit. Backed by the codegen'd
    * [[graft.expr.SimHash16]] (bit-identical to the SQL-lambda
    * formulation the oracle replays). Requires GraftFunctions.register
    * on the session — [[simhashDf]] does it for you. */
  def simhash(textCol: String): Column =
    call_function("simhash16", col(textCol))

  def simhashDf(df: DataFrame, textCol: String, dst: String): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    df.withColumn(dst, simhash(textCol))
  }

  /** SimHash near-dup pairs: Hamming distance of the signatures ≤
    * `maxHamming`. Exact pairwise form (the verification stage; for
    * blocking at scale, bucket on signature bands first exactly like
    * [[lshCandidatePairs]]). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sigs = simhashDf(df, textCol, "sig").select(col(idCol).as("id"), col("sig"))
    val a = sigs.select(col("id").as("id_a"), col("sig").as("sa"))
    val b = sigs.select(col("id").as("id_b"), col("sig").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-duplicates: pairs above a cosine threshold.
    * This is the exact O(n²) verification form (fine for a corpus slice
    * or an LSH bucket); the scale path blocks candidates first with
    * [[graft.sim.Ann.lshTopK]]'s SRP buckets and verifies only within
    * buckets. Cosine folds left-to-right in double precision
    * (cross-engine deterministic). */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // norms hoisted out of the O(n^2) pair scoring: one fold per vector
    // instead of two per pair (lambda folds are interpreted, so this is
    // a 3x on the quadratic stage)
    graft.expr.GraftFunctions.register(emb.sparkSession)
    def norm(v: String) = sqrt(call_function("dotp", col(v), col(v)))
    val base = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm("v"))
    val a = base.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = base.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(
        call_function("dotp", col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Exact Jaccard similarity between the shingle sets of a candidate
    * pair table (columns shingles_a, shingles_b). */
  def jaccardCol(a: Column, b: Column): Column =
    when(size(a) === 0 && size(b) === 0, lit(1.0))
      .otherwise(round(
        size(array_intersect(a, b)).cast("double") /
          size(array_union(a, b)).cast("double"), 6))
}
