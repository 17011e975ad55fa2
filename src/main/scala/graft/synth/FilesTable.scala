package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic derivation of the north-rule input table
  * `(repo, path, commit, lang, content, content_sha256)` from the
  * driver-generated `documents.parquet` — no external data, no RNG, no
  * wall clock. The same derivation is written once as a DataFrame plan
  * (Spark side) and once as a DuckDB CTE ([[cte]], oracle side) so every
  * validation query is exactly cross-checkable.
  *
  * Planted defects (all mod-arithmetic on doc_id, frozen here):
  *   - doc_id % 53 == 5   → lang NULL            (Required violation)
  *   - doc_id % 67 == 7   → lang 'klingon'       (Enum violation)
  *   - doc_id % 89 == 3   → path with spaces     (Pattern violation)
  *   - doc_id % 97 == 13  → corrupted sha256     (Invariant violation)
  *   - doc_id % 101 == 11 → row duplicated       (Uniqueness violation)
  *   - repos with org prefix 'org11' absent from the manifest (Referential violation)
  *   - doc_id % 10 < 3    → hot repo 'bigorg/monorepo' holds ~30% of rows
  *     (exercises skew handling in the uniqueness aggregation)
  *
  * Mirrors the reference's golden-fixture strategy
  * (test/command_line_test.go:51-103) with exact-row rather than
  * line-count goldens.
  */
object FilesTable {

  /** The files table, defects included. ~N(documents) + N/101 rows. */
  def files(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val id = col("doc_id")
    val base = d.select(
      when(id % 10 < 3, lit("bigorg/monorepo"))
        .otherwise(concat(lit("org"), (id % 13).cast(StringType),
          lit("/repo"), (id % 7).cast(StringType))).as("repo"),
      when(id % 89 === 3, concat(lit("bad path with space/doc_"), id.cast(StringType)))
        .otherwise(concat(lit("src/"), col("source"), lit("/doc_"),
          id.cast(StringType), lit("."), col("lang"))).as("path"),
      substring(md5(concat(lit("c"), id.cast(StringType))), 1, 12).as("commit"),
      when(id % 53 === 5, lit(null).cast(StringType))
        .when(id % 67 === 7, lit("klingon"))
        .otherwise(col("lang")).as("lang"),
      col("text").as("content"),
      when(id % 97 === 13, sha2(concat(col("text"), lit("CORRUPT")), 256))
        .otherwise(sha2(col("text"), 256)).as("content_sha256"),
      id.as("doc_id"))
    base.unionAll(base.filter(id % 101 === 11))
  }

  /** Repo manifest (the referential side table — the "vertex set" of
    * graphcheck's edge→vertex integrity model). org11 repos are omitted
    * deliberately so some file rows are orphans. Small by construction
    * (≤ 92 repos) ⇒ always broadcast-eligible; the engine still sizes it
    * explicitly (see Referential.check).
    */
  def repoManifest(spark: SparkSession, sfDir: String): DataFrame =
    files(spark, sfDir)
      .filter(!col("repo").startsWith("org11/"))
      .select(col("repo")).distinct()

  /** DuckDB CTE computing the identical tables from `documents`.
    * Prepend to every oracle query; exposes `files_all` and
    * `repo_manifest`. `commit` is quoted (SQL keyword).
    */
  val cte: String =
    """WITH files_base AS (
      |  SELECT
      |    CASE WHEN doc_id % 10 < 3 THEN 'bigorg/monorepo'
      |         ELSE 'org' || CAST(doc_id % 13 AS VARCHAR) || '/repo' || CAST(doc_id % 7 AS VARCHAR) END AS repo,
      |    CASE WHEN doc_id % 89 = 3 THEN 'bad path with space/doc_' || CAST(doc_id AS VARCHAR)
      |         ELSE 'src/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.' || lang END AS path,
      |    substr(md5('c' || CAST(doc_id AS VARCHAR)), 1, 12) AS "commit",
      |    CASE WHEN doc_id % 53 = 5 THEN NULL
      |         WHEN doc_id % 67 = 7 THEN 'klingon'
      |         ELSE lang END AS lang,
      |    text AS content,
      |    CASE WHEN doc_id % 97 = 13 THEN sha256(text || 'CORRUPT') ELSE sha256(text) END AS content_sha256,
      |    doc_id
      |  FROM documents
      |),
      |files_all AS (
      |  SELECT * FROM files_base
      |  UNION ALL SELECT * FROM files_base WHERE doc_id % 101 = 11
      |),
      |repo_manifest AS (
      |  SELECT DISTINCT repo FROM files_base WHERE repo NOT LIKE 'org11/%'
      |)
      |""".stripMargin
}
