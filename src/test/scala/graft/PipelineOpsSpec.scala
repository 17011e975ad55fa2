package graft

import graft.dedup.Dedup
import graft.graph.GraphEmit
import graft.sim.Ann
import graft.synth.FilesTable
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph emission + training-data ops (dedup, similarity, text). */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  lazy val files = FilesTable.files(spark, sf)
  lazy val manifest = FilesTable.repoManifest(spark, sf)
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("graph: every edge endpoint except planted orphans resolves") {
    val edges = GraphEmit.edges(files)
    val verts = GraphEmit.vertices(files, manifest)
    val orphans = GraphEmit.orphanEdges(edges, verts)
    assert(orphans.count() === 26) // = the org11 rows planted in the fixture
    assert(orphans.select("_to").distinct().count() === 7)
    // and none of the non-orphan edges dangle
    assert(edges.count() - 26 ===
      edges.join(verts.select(col("_id").as("_to")), Seq("_to"), "left_semi").count())
  }

  test("graph: orphanEdges catches dangling _from endpoints too (graphcheck both probes)") {
    val verts = Seq(("v1", "T"), ("v2", "T")).toDF("_id", "_label")
    val edges = Seq(
      ("e1", "v1", "v2", "ok"),      // both resolve
      ("e2", "v1", "vX", "to_gone"), // dangling _to
      ("e3", "vY", "v2", "from_gone") // dangling _from
    ).toDF("_id", "_from", "_to", "_label")
    val got = GraphEmit.orphanEdges(edges, verts)
      .select("_id").collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("e2", "e3"))
  }

  test("zero-norm embeddings are excluded from near-dup pairing (no NaN pairs)") {
    import spark.implicits._
    // two zero vectors + two genuine near-dups: without the norm guard
    // the zero pair scores NaN and NaN >= 0.9 is TRUE under Spark's
    // NaN-is-greatest ordering
    val emb = Seq(
      (1L, Seq(0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0)),
      (3L, Seq(1.0, 0.0, 0.1)),
      (4L, Seq(1.0, 0.0, 0.11))).toDF("id", "v")
    val pairs = graft.dedup.Dedup.embeddingNearDupsExact(emb, "id", "v", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((3L, 4L)), s"zero-vector pair must not appear: $pairs")
    val banded = graft.dedup.Dedup.embeddingNearDups(emb, "id", "v", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === Set((3L, 4L)))
  }

  test("dedup exact/pipeline: NULL text is missing content, not a duplicate group") {
    import spark.implicits._
    val docs = Seq((1L, "same"), (2L, "same"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // exact(): only the real duplicate group; nulls contribute nothing
    val groups = graft.dedup.Dedup.exact(docs, "doc_id", "text").collect()
    assert(groups.length === 1 && groups.head.getAs[Long]("n_docs") === 2L)
    // pipeline(): both null-text docs survive as their own rows
    val res = graft.dedup.Dedup.pipeline(docs, "doc_id", "text")
    try {
      val surv = res.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(surv === Set(1L, 3L, 4L), s"null-text docs must survive: $surv")
    } finally res.unpersist()
  }

  test("graph: schemaEdges of a linkless class is an empty edge table, not a crash") {
    val cls = graft.rules.SchemaLoader.SchemaClass(
      id = "leaf", title = "leaf", required = Seq("id"),
      properties = Map.empty, links = Seq.empty)
    val df = Seq(("a", "x")).toDF("id", "v")
    val edges = GraphEmit.schemaEdges(df, cls)
    assert(edges.count() === 0)
    assert(edges.columns.toSet === Set("_id", "_from", "_to", "_label"))
  }

  test("graph: vertex ids are unique after dedup") {
    val v = GraphEmit.vertices(files, manifest)
    assert(v.count() === v.select("_id").distinct().count())
  }

  test("dedup exact: appended copies collapse onto their original") {
    val aug = docs.select("doc_id", "text").unionAll(
      docs.select((col("doc_id") + 5000).as("doc_id"), col("text"))
        .filter(col("doc_id") < 5010))
    val groups = Dedup.exact(aug, "doc_id", "text")
    assert(groups.filter(col("n_docs") === 2).count() === 10)
    assert(groups.filter(col("n_docs") === 2)
      .select(max("keep_id")).collect()(0).getLong(0) < 5000) // keeps the original
  }

  test("dedup minhash+LSH: planted near-dups are candidate pairs") {
    val base = docs.select("doc_id", "text").filter(col("doc_id") < 100)
    val aug = base.unionAll(base.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" zz")).as("text")))
    val pairs = Dedup.lshCandidatePairs(
      Dedup.withMinhashSignature(Dedup.withWordShingles(aug, "text")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (i, i+1e6) near-identical pair must be recalled by the LSH bands
    (0L until 100L).foreach { i =>
      assert(pairs.contains((i, i + 1000000)), s"missed near-dup pair for doc $i")
    }
  }

  test("dedup jaccard: verification stage scores candidates correctly") {
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "zzzzzyyyyy"))
      .toDF("doc_id", "text")
    val sh = Dedup.withShingleHashes(df, "text")
    val a = sh.select(col("doc_id").as("id_a"), col("shingles").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("shingles").as("sb"))
    val scored = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("j", Dedup.jaccardCol(col("sa"), col("sb")))
      .select("id_a", "id_b", "j")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(scored((1L, 2L)) === 1.0)
    assert(scored((1L, 3L)) === 0.0)
  }

  test("nearDupClusters: min-label components; survivors keep one per cluster") {
    // chain 1-2-3, pair 7-8, triangle 10-11-12 (+edge to 13): diameters > 1
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 11L), (11L, 12L),
      (10L, 12L), (12L, 13L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
    val corpus = (1L to 15L).toDF("doc_id")
    val kept = Dedup.survivors(corpus, "doc_id",
      Dedup.nearDupClusters(pairs)).collect().map(_.getLong(0)).sorted
    // losers 2,3,8,11,12,13 dropped; isolated docs untouched
    assert(kept.toSeq === Seq(1L, 4L, 5L, 6L, 7L, 9L, 10L, 14L, 15L))
  }

  test("nearDupClusters: string ids cluster on lexicographic min (type-generic fixpoint)") {
    // the convergence check must not assume numeric labels — this repo
    // mints string UUID doc ids; min-label propagation is ordered-type
    // generic and the fixpoint test has to be too
    val pairs = Seq(("uuid-c", "uuid-a"), ("uuid-a", "uuid-b"), ("zz-1", "zz-2"))
      .toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("uuid-a" -> "uuid-a", "uuid-b" -> "uuid-a",
      "uuid-c" -> "uuid-a", "zz-1" -> "zz-1", "zz-2" -> "zz-1"))
  }

  test("nearDupClusters: driver union-find and distributed loop agree exactly") {
    // random-ish graph with chains, triangles, self-contained pairs
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 400).map { _ =>
      val a = rnd.nextInt(300).toLong; val b = rnd.nextInt(300).toLong
      (math.min(a, b), math.max(a, b) + 1)
    }.toDF("id_a", "id_b")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val driver = canon(Dedup.nearDupClusters(pairs)) // small -> driver path
    val dist = canon(Dedup.nearDupClusters(pairs, driverMaxEdges = 0L))
    assert(driver === dist)
    assert(driver.nonEmpty)
  }

  test("lshCandidatePairs: degenerate banding configs are rejected") {
    val sig = Dedup.withMinhashSignature(
      Dedup.withWordShingles(docs.select("doc_id", "text").limit(5), "text"))
    // bands > numHashes would put EVERY doc in bucket (band, 0) -> O(n^2)
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 16, bands = 32)
    }
    intercept[IllegalArgumentException] { // non-dividing silently drops hashes
      Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 16, bands = 5)
    }
  }

  test("nearDupClusters: pointer jumping converges a 300-node chain in O(log) rounds") {
    val chain = (1000L until 1299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(chain, maxIters = 12).collect()
    assert(got.length === 300)
    assert(got.forall(_.getLong(1) === 1000L)) // one component, min label
  }

  test("simhash64: banded pairs match all-pairs; wide sigs separate unrelated docs") {
    graft.expr.GraftFunctions.register(spark)
    val base = docs.select("doc_id", "text").filter(col("doc_id") < 200)
    val aug = base.unionAll(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    val banded = Dedup.simhashPairs64(aug, "doc_id", "text", maxHamming = 3)
    val sigs = aug.select(col("doc_id").as("id"),
      call_function("simhash64", col("text")).as("sig"))
    val brute = sigs.select(col("id").as("id_a"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= 3).select("id_a", "id_b", "hamming")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pairs = toSet(banded)
    assert(pairs === toSet(brute))
    // a majority of the 20 planted near-dups sit within hamming 3 of 64
    // (appending one token flips few majority votes), and the organic
    // tail is small — unlike 16-bit sigs, where this corpus size would
    // produce hundreds of birthday collisions
    assert(pairs.nonEmpty)
    val planted = pairs.count { case (a, b, _) => b == a + 1000000 }
    assert(planted >= 10, s"recovered only $planted of 20 planted pairs")
    assert(pairs.size < 50, s"organic collision tail too large: ${pairs.size}")
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("dedup pipeline: exact-first, shingles/pairs computed once, outputs match independent path") {
    val base = docs.select("doc_id", "text").filter(col("doc_id") < 300)
    val aug = base.unionAll(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
      // plus EXACT duplicates: the pipeline must collapse these before
      // any blocking join sees them (the quadratic hot-block hazard)
      .unionAll(base.filter(col("doc_id") < 10)
        .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
    val res = Dedup.pipeline(aug, "doc_id", "text")
    try {
      // exact-dup copies are gone from both survivors and the pair space
      assert(res.survivors.filter(col("doc_id") >= 2000000).count() === 0)
      assert(res.pairs.filter(col("id_a") >= 2000000 || col("id_b") >= 2000000)
        .count() === 0)
      // independent recomputation — the per-operator oracle-query shape,
      // over the same exact-deduped corpus the pipeline derives
      val keep = Dedup.exact(aug, "doc_id", "text").select(col("keep_id").as("k"))
      val uniq = aug.join(keep, col("doc_id") === col("k"), "left_semi")
      val sh = Dedup.withWordShingles(uniq, "text").select(col("doc_id"), col("shingles"))
      val indPairs = Dedup.lshCandidatePairs(Dedup.withMinhashSignature(sh), "doc_id")
        .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("sa")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("sb")), Seq("id_b"))
        .withColumn("jaccard", Dedup.jaccardCol(col("sa"), col("sb")))
        .filter(col("jaccard") >= 0.8).select("id_a", "id_b")
      def pset(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pset(res.pairs) === pset(indPairs))
      assert(pset(res.pairs).nonEmpty)
      val indClusters = Dedup.nearDupClusters(indPairs)
      def cmap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cmap(res.clusters) === cmap(indClusters))
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids(res.survivors) ===
        ids(Dedup.survivors(uniq, "doc_id", indClusters)))
      // persist-once evidence: the verified-pair plan reads the shingle
      // table from cache on BOTH join sides (Spark's caching contract =
      // the word_shingles pass ran once per partition), instead of
      // re-deriving tokenize+hash three times like the independent path
      val plan = res.pairs.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"pipeline pairs must read persisted shingles:\n$plan")
    } finally res.unpersist()
  }

  test("simhash64 at 1e5 docs: banded pairing recovers exactly the constructed truth set") {
    // certifies the production-width path AT the corpus scale it exists
    // for. All-pairs verification is O(n^2)-impossible here, so ground
    // truth is constructed instead: 1e5 docs with fully-disjoint token
    // sets (unrelated signatures are ~uniform u64s — P[hamming<=2] per
    // pair ~ 2.1e3/2^64, so organic pairs are impossible even across
    // 5e9 pairs), plus a planted near-dup copy (one appended token) for
    // every 100th doc. The truth set = planted pairs whose true hamming
    // is <= 2, computed directly on the 1000 planted pairs.
    graft.expr.GraftFunctions.register(spark)
    val n = 100000L
    val base = spark.range(n).select(col("id").as("doc_id"),
      expr("array_join(transform(sequence(1, 30), " +
        "j -> concat('t', cast(id * 31 + j as string))), ' ')").as("text"))
    val aug = base.unionAll(base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    val truth = base.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"),
        call_function("simhash64", col("text")).as("sa"),
        call_function("simhash64", concat(col("text"), lit(" zz"))).as("sb"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= 2)
      .select(col("doc_id"), (col("doc_id") + 10000000L).as("id_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.simhashPairs64(aug, "doc_id", "text", maxHamming = 2)
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth)
    // the construction must actually plant within-threshold pairs, or
    // the equality above would pass vacuously on two empty sets
    assert(truth.size >= 20, s"only ${truth.size} planted pairs within hamming 2")
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("simhash skew: 1e3 exact dups go quadratic raw; upstream exact dedup bounds them") {
    // the documented residual risk of banded simhash (Dedup.simhashPairs
    // scaladoc): exact-duplicate signatures collide in EVERY band, so a
    // hot block of k copies contributes C(k,2) candidates to one bucket.
    // The documented mitigation is upstream Dedup.exact — this test
    // demonstrates both sides with measured pair counts.
    graft.expr.GraftFunctions.register(spark)
    val distinctDocs = spark.range(1000).select(col("id").as("doc_id"),
      expr("array_join(transform(sequence(1, 20), " +
        "j -> concat('u', cast(id * 23 + j as string))), ' ')").as("text"))
    val hot = spark.range(1000).select((col("id") + 10000).as("doc_id"),
      lit("hot duplicated doc with identical tokens everywhere").as("text"))
    val corpus = distinctDocs.unionAll(hot)
    val isHot = (c: org.apache.spark.sql.Column) => c >= 10000
    // the hazard, quantified: the hot block alone yields C(1000,2) pairs
    val rawHotPairs = Dedup.simhashPairs64(corpus, "doc_id", "text", maxHamming = 2)
      .filter(isHot(col("id_a")) && isHot(col("id_b"))).count()
    assert(rawHotPairs === 1000L * 999 / 2)
    // the mitigation: keep one representative per exact-digest group
    val keep = Dedup.exact(corpus, "doc_id", "text").select(col("keep_id").as("doc_id"))
    val deduped = corpus.join(keep, Seq("doc_id"), "left_semi")
    assert(deduped.count() === 1001) // 1000 distinct + 1 hot representative
    val pairs = Dedup.simhashPairs64(deduped, "doc_id", "text", maxHamming = 2)
    assert(pairs.filter(isHot(col("id_a")) && isHot(col("id_b"))).count() === 0)
    // whole-corpus candidate volume stays bounded (no quadratic block)
    assert(pairs.count() < 50, s"unexpected organic pair volume: ${pairs.count()}")
  }

  test("simhash: identical text => identical signature; disjoint differs") {
    val df = Seq((1L, "spark table scan merge"), (2L, "spark table scan merge"),
      (3L, "zq xv wk yj")).toDF("doc_id", "text")
    val sigs = Dedup.simhashDf(df, "text", "s").select(col("doc_id"), col("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("simhash pairs: banded blocking matches the all-pairs form exactly, no cartesian") {
    val base = docs.select("doc_id", "text").filter(col("doc_id") < 200)
    val aug = base.unionAll(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    val banded = Dedup.simhashPairs(aug, "doc_id", "text", maxHamming = 2)
    // all-pairs reference computed inline (the old formulation)
    val sigs = Dedup.simhashDf(aug, "text", "sig").select(col("doc_id").as("id"), col("sig"))
    val brute = sigs.select(col("id").as("id_a"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= 2).select("id_a", "id_b", "hamming")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(toSet(banded) === toSet(brute))
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "banded simhash pairs must not fall back to an all-pairs join")
  }

  test("embedding near-dups: SRP blocking recovers the exact pair set, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val aug = emb.unionAll(emb.filter(col("vec_id") % 20 === 0).select(
      (col("vec_id") + 100000).as("vec_id"),
      concat(array(element_at(col("v"), 1) + lit(0.5)),
        expr("slice(v, 2, size(v) - 1)")).as("v")))
    val blocked = Dedup.embeddingNearDups(aug, "vec_id", "v", 0.8)
    val exact = Dedup.embeddingNearDupsExact(aug, "vec_id", "v", 0.8)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(toSet(blocked) === toSet(exact))
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "SRP-blocked near-dups must not fall back to an all-pairs join")
  }

  test("ann: LSH bucketing recalls most brute-force top-3 neighbors") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, queries, "vec_id", "embedding", 3,
      planes = 4, tables = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall > 0.5, s"LSH recall too low: $recall") // 8 tables x 16 buckets, 500 vecs
  }

  test("text: token counts and fingerprint are stable and sane") {
    val r = docs.filter(col("doc_id") === 0).select(
      TextOps.wsTokenCount("text").as("ws"),
      TextOps.bpeTokenCount("text").as("bpe"),
      TextOps.fingerprint("text").as("fp"),
      TextOps.qualityScore("text").as("q")).collect()(0)
    assert(r.getAs[Long]("ws") > 0)
    assert(r.getAs[Long]("bpe") >= r.getAs[Long]("ws")) // BPE splits at least as fine
    assert(r.getAs[Long]("fp") > 0)
    val q = r.getAs[Double]("q")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("text: edge cases — empty and whitespace-only strings") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("id", "text")
    val out = df.select(col("id"), TextOps.wsTokenCount("text").as("ws"),
      TextOps.fingerprint("text").as("fp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 === 0L)
    assert(out(2L)._1 === 0L)
    assert(out(3L)._1 === 1L)
    assert(out(1L)._2 === 0L)
  }
}
