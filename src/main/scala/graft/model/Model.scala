package graft.model

import org.apache.spark.sql.types._

/** Core row types of the validation engine.
  *
  * The input-table shape is fixed by the north rule: an Iceberg-style table
  * of source-code files `(repo, path, commit, lang, content)` plus a
  * reference column `content_sha256` used for the per-row invariant check.
  *
  * The reference engine (bmeg/sifter) models rows as untyped
  * `map[string]any` (reference: transform/interface.go:14-47); we use a
  * fixed case class + StructType so Catalyst can prune/push down.
  */
case class FileRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    content_sha256: String)

object FileRow {
  val schema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("content", StringType),
    StructField("content_sha256", StringType)))

  /** Natural key for uniqueness + violation addressing. */
  val key: Seq[String] = Seq("repo", "path", "commit")
}

/** A typed violation row. The reference only *logs* validation errors
  * (transform/object_validate.go:78-80); we strengthen that to a typed,
  * exactly-comparable output table per the north rule's
  * "violation-row exactness". These row types are encoder-enforced
  * against the engine's actual outputs in ValidationSpec
  * ("model row types bind to the engine outputs") — they cannot
  * silently drift from the DataFrames they describe.
  */
case class Violation(
    rule_id: String,
    col_name: String,
    repo: String,
    path: String,
    commit: String,
    observed: String)

/** Per-(partition, rule) verdict. `part` is a logical data partition — we
  * use the repo's org prefix, the natural partition key of a code table.
  */
case class Verdict(
    part: String,
    rule_id: String,
    violation_count: Long,
    pass: Boolean)

/** Single-pass per-column profile (null stats, cardinality, lengths).
  * Mirrors what sifter surfaces only as counters at Close()
  * (transform/object_validate.go:86) as a real metrics table.
  * min/max length are None for an all-null column (no length observed).
  */
case class ColumnProfile(
    col_name: String,
    n_rows: Long,
    n_null: Long,
    n_distinct: Long,
    min_len: Option[Long],
    max_len: Option[Long])
