package graft

import graft.sim.{Ann, Ivf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  import TestSpark._

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()

  test("centroids: K cells, right dimensionality, unit norm, deterministic") {
    val c1 = Ivf.centroids(emb, "vec_id", "embedding", 8)
    val c2 = Ivf.centroids(emb, "vec_id", "embedding", 8)
    assert(c1.length === 8)
    assert(c1.head._2.size === 64)
    assert(c1.map(_._2) === c2.map(_._2))
    c1.foreach { case (_, c) =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("assignment covers the corpus, each vector exactly one cell") {
    val cents = Ivf.centroids(emb, "vec_id", "embedding", 8)
    val cells = Ivf.assign(emb, "vec_id", "embedding", cents)
    assert(cells.count() === emb.count())
    assert(cells.select("nid").distinct().count() === emb.count())
  }

  test("IVF search recall vs brute force is reasonable at nprobe=4/16") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.search(emb, queries, "vec_id", "embedding", 3,
      nCells = 16, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall > 0.3, s"IVF recall too low: $recall") // random vectors: cells
    // carry little signal, but probing 1/4 of them must beat 1/4 baseline
  }

  test("full probe (nprobe = nCells) reproduces brute force exactly") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("qid", "nid", "rank").collect().map(_.toSeq).toSet
    val full = Ivf.search(emb, queries, "vec_id", "embedding", 5,
      nCells = 8, nprobe = 8)
      .select("qid", "nid", "rank").collect().map(_.toSeq).toSet
    assert(full === exact)
  }
}
