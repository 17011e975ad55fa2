package graft.oracle

import graft.rules._
import graft.synth.FilesTable

/** Renders the engine's rule set into DuckDB SQL for the driver's oracle
  * compare. The rule objects in [[graft.rules.FileRules]] are the single
  * source of truth — both the Spark plan and this SQL derive from them,
  * so a rule edit cannot desynchronize the two sides.
  */
object DuckSql {

  private def q(c: String): String = if (c == "commit") "\"commit\"" else c

  /** DuckDB boolean expression that is TRUE when the row VIOLATES r. */
  def violationCond(r: RowRule): String = {
    val c = q(r.column)
    r match {
      case Required(_, _) => s"$c IS NULL"
      case Pattern(_, _, rx) =>
        s"$c IS NOT NULL AND NOT regexp_matches($c, '${rx.replace("'", "''")}')"
      case EnumIn(_, _, vs) =>
        s"$c IS NOT NULL AND $c NOT IN (${vs.map(v => s"'$v'").mkString(", ")})"
      case Sha256Invariant(_, _, of) => s"($c IS NULL OR $c <> sha256(${q(of)}))"
      case TypeIs(_, _, dt) =>
        s"$c IS NOT NULL AND TRY_CAST($c AS ${dt.sql}) IS NULL"
      case Check(id, _, _) =>
        sys.error(s"Check rule '$id' has no SQL rendering; supply oracle manually")
    }
  }

  /** UNION ALL of one SELECT per row rule over files_all (assumes the
    * [[FilesTable.cte]] prefix is in scope). */
  def violationsUnion(rules: Seq[RowRule]): String =
    rules.map { r =>
      s"""SELECT '${r.id}' AS rule_id, '${r.column}' AS col_name, repo, path, "commit", CAST(${q(r.column)} AS VARCHAR) AS observed
         |FROM files_all WHERE ${violationCond(r)}""".stripMargin
    }.mkString("\nUNION ALL\n")

  val cte: String = FilesTable.cte

  def vViolations: String = cte + violationsUnion(FileRules.rowRules)

  def vVerdicts: String = {
    val ruleValues = FileRules.rowRules.map(r => s"('${r.id}')").mkString(", ")
    cte +
      s""", viol AS (
         |  SELECT split_part(repo, '/', 1) AS part, rule_id, COUNT(*) AS n
         |  FROM (${violationsUnion(FileRules.rowRules)}) GROUP BY 1, 2
         |), orgs AS (SELECT DISTINCT split_part(repo, '/', 1) AS part FROM files_all),
         |rules(rule_id) AS (VALUES $ruleValues)
         |SELECT o.part, r.rule_id,
         |  CAST(COALESCE(v.n, 0) AS BIGINT) AS violation_count,
         |  COALESCE(v.n, 0) = 0 AS pass
         |FROM orgs o CROSS JOIN rules r
         |LEFT JOIN viol v ON v.part = o.part AND v.rule_id = r.rule_id""".stripMargin
  }

  def vUniqueDups: String = cte +
    """SELECT repo, path, "commit", CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM files_all GROUP BY 1, 2, 3 HAVING COUNT(*) > 1""".stripMargin

  def vRefOrphans: String = cte +
    """SELECT repo, CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM files_all WHERE repo NOT IN (SELECT repo FROM repo_manifest)
      |GROUP BY 1""".stripMargin

  def vProfile(cols: Seq[String]): String = cte +
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT(${q(c)}) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT ${q(c)}) AS BIGINT) AS n_distinct,
         |  CAST(MIN(LENGTH(${q(c)})) AS BIGINT) AS min_len,
         |  CAST(MAX(LENGTH(${q(c)})) AS BIGINT) AS max_len
         |FROM files_all""".stripMargin
    }.mkString("\nUNION ALL\n")

  def vDriftKs: String = cte +
    """, hist AS (
      |  SELECT CAST(FLOOR(LENGTH(content) / 64) AS BIGINT) AS bucket,
      |    SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS c0,
      |    SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS c1
      |  FROM files_all GROUP BY 1
      |), cdf AS (
      |  SELECT
      |    CAST(SUM(c0) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      / CAST(SUM(c0) OVER () AS DOUBLE) AS cdf0,
      |    CAST(SUM(c1) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      / CAST(SUM(c1) OVER () AS DOUBLE) AS cdf1
      |  FROM hist
      |)
      |SELECT ROUND(MAX(ABS(cdf0 - cdf1)), 9) AS ks_stat FROM cdf""".stripMargin
}
