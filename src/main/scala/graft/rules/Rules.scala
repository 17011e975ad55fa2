package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Rule model: the JSON-Schema subset sifter's `objectValidate` enforces
  * (type / required / enum / pattern — reference:
  * transform/object_validate.go:31-83, fixtures test/resources/schemas/),
  * extended with the table-level constraints the north rule demands
  * (uniqueness, referential integrity, sha256 invariant, drift).
  *
  * Row-level rules compile to a Catalyst `Column` *pass predicate* that is
  * never null: nullability is resolved inside the rule (JSON-Schema
  * semantics: `pattern`/`enum` apply only when the value is present, and
  * `type: [string, "null"]` admits null). Keeping rules as `Column`
  * expressions — not opaque UDFs — is what lets Catalyst push filters and
  * prune columns at 100 TB scale.
  */
sealed trait Rule { def id: String }

/** A rule checkable row-by-row (maps to sifter's per-row CleanAndValidate). */
sealed trait RowRule extends Rule {
  def column: String
  /** True ⇔ the row passes. Must never evaluate to null. */
  def pass: Column
  /** Value to report in the violation row (stringified). */
  def observed: Column = col(column).cast(StringType)
}

/** `required: [col]` — JSON-Schema required ⇒ value present (non-null). */
final case class Required(id: String, column: String) extends RowRule {
  def pass: Column = col(column).isNotNull
}

/** `pattern:` — anchored regex over a string column; null passes (type
  * union with null is a separate Required concern). */
final case class Pattern(id: String, column: String, regex: String) extends RowRule {
  def pass: Column = col(column).isNull || col(column).rlike(regex)
}

/** `enum:` — membership; null passes unless also Required. */
final case class EnumIn(id: String, column: String, values: Seq[String]) extends RowRule {
  def pass: Column = col(column).isNull || col(column).isin(values: _*)
}

/** `type:` — value must be castable to `dt`. Sifter's fieldType casts with
  * fail→null (transform/field_type.go:26-46); as a *check*, a non-null
  * value whose try_cast is null is a violation. */
final case class TypeIs(id: String, column: String, dt: DataType) extends RowRule {
  def pass: Column = col(column).isNull ||
    expr(s"try_cast(`${column.replace("`", "``")}` as ${dt.sql})").isNotNull
}

/** Row invariant: `column == sha256(of)` — the north rule's per-row
  * content-hash equality check. Uses Spark's codegen'd `sha2`. */
final case class Sha256Invariant(id: String, column: String, of: String) extends RowRule {
  // `of` null-guard: sha2(null) is null and `x === null` is null, which
  // Violations' `when(!pass, ...)` silently drops — a row with a hash
  // but a null source column (exactly the corruption this invariant
  // exists to catch) would be reported neither pass nor violation
  def pass: Column =
    col(column).isNotNull && col(of).isNotNull && col(column) === sha2(col(of), 256)
}

/** Arbitrary boolean column invariant (escape hatch replacing sifter's
  * gpython row predicates, evaluate/gpython.go — but as a Catalyst
  * expression, not embedded code). `passExpr` must be null-safe. */
final case class Check(id: String, column: String, passExpr: Column) extends RowRule {
  def pass: Column = passExpr
}

/** Table-level: no duplicate `(columns)` tuples. */
final case class Unique(id: String, columns: Seq[String]) extends Rule

/** Table-level: every `column` value exists as `refKey` in table `refName`
  * (the graphcheck edge→vertex integrity, graphcheck/graphCheck.go:15-72,
  * re-expressed as an anti-join). */
final case class RefIntegrity(id: String, column: String, refName: String, refKey: String)
    extends Rule

/** Table-level: two-sample KS distance over a derived numeric bucket of
  * `column` between a baseline selector and the rest must stay ≤ maxKs. */
final case class Drift(id: String, column: String, bucketWidth: Int, maxKs: Double)
    extends Rule

/** The default ruleset for the north-rule FileRow table. Mirrors the
  * shape of sifter's schema fixtures (test/resources/schemas/ YAML files). */
object FileRules {
  val langEnum: Seq[String] = Seq("en", "fr", "es", "de", "zh")

  val rowRules: Seq[RowRule] = Seq(
    Required("required_repo", "repo"),
    Required("required_path", "path"),
    Required("required_commit", "commit"),
    Required("required_lang", "lang"),
    Required("required_content", "content"),
    Pattern("pattern_repo", "repo", "^[A-Za-z0-9._-]+/[A-Za-z0-9._-]+$"),
    Pattern("pattern_path", "path", "^src/[A-Za-z0-9_./-]+$"),
    Pattern("pattern_commit", "commit", "^[0-9a-f]{7,40}$"),
    EnumIn("enum_lang", "lang", langEnum),
    Sha256Invariant("sha256_content", "content_sha256", "content"))

  val unique: Unique = Unique("unique_file", Seq("repo", "path", "commit"))
  val ref: RefIntegrity = RefIntegrity("ref_repo", "repo", "repo_manifest", "repo")
  val drift: Drift = Drift("drift_content_len", "content", 64, 0.2)

  val all: Seq[Rule] = rowRules ++ Seq(unique, ref, drift)
}
