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
    * `maxHamming`. Banded-signature blocking, NOT a cross join: the
    * 16-bit signature splits into 4 bands of 4 bits; by pigeonhole, any
    * pair with ≤ 3 differing bits has at least one identical band, so a
    * shuffled self-equi-join on (band, band_value) generates every
    * qualifying candidate — the result is EXACT (same rows as the
    * all-pairs form), but the O(n²) pair space is never materialized.
    * Verification (`bit_count(sa^sb) <= maxHamming`) runs inside the
    * candidate set only. At 100 TB the residual risk is bucket skew from
    * exact-duplicate signatures (all 4 bands collide); AQE skew-join
    * splitting covers it, and exact dups should be removed by [[exact]]
    * upstream anyway. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      s"banded blocking over 4x4-bit bands is exact only for maxHamming <= 3, got $maxHamming")
    val sigs = simhashDf(df, textCol, "sig").select(col(idCol).as("id"), col("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(expr("transform(sequence(0, 3), b -> shiftright(sig, b * 4) % 16)"))
        .as(Seq("band", "bv")))
    val a = banded.select(col("band"), col("bv"), col("id").as("id_a"), col("sig").as("sa"))
    val b = banded.select(col("band"), col("bv"), col("id").as("id_b"), col("sig").as("sb"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /** Embedding-cosine near-duplicates: pairs above a cosine threshold,
    * blocked by multi-table sign-random-projection buckets
    * ([[graft.sim.Ann.srpBucket]] — the same deterministic hyperplanes
    * the ANN path uses). Candidates = pairs sharing a (table, bucket)
    * cell in ANY of the `tables` independent plane sets; exact cosine is
    * verified only inside candidates. One shuffle on the (table, bucket)
    * key; the corpus is replicated `tables`× into the shuffle (the
    * classic memory-for-recall LSH trade) and the O(n²) pair space is
    * never materialized.
    *
    * Recall: a pair at angle θ shares one table's bucket with prob
    * (1-θ/π)^planes, so the miss probability is
    * (1-(1-θ/π)^planes)^tables — ≈ 8e-6 per pair at cosine 0.8 with the
    * defaults, and vanishing for the near-1 cosines real near-dups have.
    * Deterministic (fixed hyperplanes), so results are reproducible
    * run-over-run; PipelineOpsSpec asserts exact agreement with the
    * all-pairs form on the test corpus. Raise `planes` as corpus size
    * grows to keep buckets small; raise `tables` to push recall up. */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 4, tables: Int = 16): DataFrame = {
    // norms hoisted out of pair scoring: one fold per vector instead of
    // two per pair (lambda folds are interpreted, so this matters)
    graft.expr.GraftFunctions.register(emb.sparkSession)
    def norm(v: String) = sqrt(call_function("dotp", col(v), col(v)))
    val base = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm("v"))
    val bucketed = base
      .withColumn("tbl", explode(expr(s"sequence(0, ${tables - 1})")))
      .withColumn("bucket", graft.sim.Ann.srpBucket("v", planes, "tbl"))
    val a = bucketed.select(col("tbl"), col("bucket"),
      col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("tbl"), col("bucket"),
      col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", round(
        call_function("dotp", col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** The all-pairs O(n²) form of [[embeddingNearDups]] — the verification
    * baseline for recall tests only; never the scale path. */
  def embeddingNearDupsExact(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
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
