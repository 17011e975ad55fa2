package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Sifter's output inventory (SURVEY.md §2.6) as DataFrame writers.
  * Row counts are surfaced through `df.observe` metrics rather than the
  * reference's Close()-time log lines (playbook/output_json.go:29-61).
  */
object Sinks {

  /** outputs.json — NDJSON, optionally gzipped (output_json.go). */
  def ndjson(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** outputs.table — delimited text with chosen columns; non-string
    * cells JSON-encoded exactly like the reference
    * (output_table.go:77-96: non-string values marshal to JSON). */
  def table(df: DataFrame, path: String, columns: Seq[String],
      sep: String = "\t", gzip: Boolean = false): Unit = {
    val cells = columns.map { c =>
      df.schema(c).dataType match {
        case StringType => col(c)
        case _ => to_json_cell(df, c)
      }
    }
    val w = df.select(cells: _*).write.mode("overwrite")
      .option("sep", sep).option("header", "true")
      // RAW cells, no quoting: the reference writes bytes as-is
      // (output_table.go uses LazyQuotes-style raw emission), so a
      // JSON-encoded cell must appear as {"a":1}, not "{\"a\":1}" —
      // default CSV quoting would mangle every non-string cell
      .option("quote", "").option("escapeQuotes", "false")
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  private def to_json_cell(df: DataFrame, c: String) =
    df.schema(c).dataType.typeName match {
      case "struct" | "array" | "map" => to_json(col(c)).as(c)
      case _ => col(c).cast(StringType).as(c)
    }

  /** outputs.graph — vertex + edge NDJSON files (output_graph.go:55-124
    * writes <name>.vertex.json.gz / <name>.edge.json.gz). `edgeFix` is
    * the optional pre-write edge rewrite hook (output_graph.go:84-90
    * runs a user function over each edge before emission). */
  def graph(vertices: DataFrame, edges: DataFrame, dir: String,
      gzip: Boolean = true,
      edgeFix: DataFrame => DataFrame = identity): Unit = {
    ndjson(vertices, s"$dir/vertex.json", gzip)
    ndjson(edgeFix(edges), s"$dir/edge.json", gzip)
  }

  /** stdout loader — `name\tjson` lines to stdout (loader/stdout.go:14-30).
    * Inherently driver-side like the reference's single-process writer,
    * but STREAMED: `toLocalIterator` holds at most one partition's rows
    * on the driver at a time, so a misdirected large table cannot OOM
    * the driver or trip spark.driver.maxResultSize the way a collect()
    * would (each partition-fetch is its own small result). `rowCap`
    * additionally bounds the line count; the iterator stops fetching
    * partitions once the cap is hit. */
  def stdout(df: DataFrame, name: String, rowCap: Option[Long] = None,
      out: String => Unit = println): Unit = {
    val it = df.toJSON.toLocalIterator()
    var n = 0L
    while (it.hasNext && rowCap.forall(n < _)) {
      out(s"$name\t${it.next()}")
      n += 1
    }
    // the note goes to stderr — stdout stays pure `name\tjson` lines
    // (downstream parsers see exactly the reference's format)
    if (it.hasNext)
      System.err.println(s"[stdout sink] '$name' truncated at $n rows (rowCap)")
  }
}
