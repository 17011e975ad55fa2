package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators: melt (wide→long), pivot (long→wide), and their
  * composition transpose — the Spark-native replacement for the
  * reference's out-of-core matrix transpose
  * (extractors/transpose_load.go:22-348: in-memory, pebble-KV spill, or
  * fixed-width scratch-file scans). Spark's shuffle IS the spill layer,
  * so none of the reference's 300 lines of manual disk management
  * survive: melt is a generate-side explode, pivot is one shuffle.
  */
object Reshape {

  /** Backtick-quote an identifier / single-quote a string literal for
    * interpolation into expr() text — a column named `o'brien` or
    * carrying a backtick must not break (or splice into) the stack(). */
  private def bq(name: String): String = "`" + name.replace("`", "``") + "`"
  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Wide→long: one output row per (id, column) pair. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      varName: String = "variable", valName: String = "value"): DataFrame = {
    val stackArgs = valueCols.map(c => s"${sqlStr(c)}, cast(${bq(c)} as string)").mkString(", ")
    df.select(idCols.map(col) :+
      expr(s"stack(${valueCols.size}, $stackArgs) as (${bq(varName)}, ${bq(valName)})"): _*)
  }

  /** Long→wide over a known pivot-value list (explicit values keep the
    * plan single-pass; Spark otherwise runs a distinct job first). */
  def pivot(df: DataFrame, idCol: String, pivotCol: String,
      pivotValues: Seq[String], agg: Column): DataFrame =
    df.groupBy(col(idCol)).pivot(pivotCol, pivotValues).agg(agg)

  /** Full transpose of a (small-side) matrix: columns become rows and
    * the id column's values become columns. The pivoted side must have
    * modest cardinality (it becomes the schema — same constraint every
    * engine has); the row side streams through one shuffle. */
  def transpose(df: DataFrame, idCol: String, idValues: Seq[String]): DataFrame = {
    val valueCols = df.columns.filterNot(_ == idCol).toSeq
    pivot(melt(df, Seq(idCol), valueCols), "variable", idCol, idValues,
      first(col("value")))
      .withColumnRenamed("variable", "col_name")
  }
}
