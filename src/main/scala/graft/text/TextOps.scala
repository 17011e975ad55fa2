package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * language-ID heuristics, quality scoring, and rolling-hash document
  * fingerprinting. All pure Column expressions (whole-stage codegen,
  * no UDFs) with deterministic arithmetic so results are reproducible
  * across engines and cluster sizes. Operators take the *column name*
  * (they build SQL lambda expressions, which need a resolvable name);
  * the name is backtick-quoted into the expression text so dotted or
  * hyphenated column names cannot parse as field access / arithmetic.
  */
object TextOps {

  /** Backtick-quoted identifier for interpolation into expr() text. */
  private def bq(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Whitespace token count — NON-EMPTY tokens of the \s+ split. The
    * former trim()-guarded form stripped SPACES only, so a trailing
    * newline/tab left an empty trailing token and overcounted by one
    * ("hello world\n" → 3), and a tabs-only string counted 2; filtering
    * empties is exact for any leading/trailing whitespace mix. */
  def wsTokenCount(c: String): Column =
    size(filter(split(col(bq(c)), "\\s+"), t => length(t) > 0)).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the pre-tokenizer shape most BPE vocab
    * builders use. */
  def bpeTokenCount(c: String): Column =
    expr(s"regexp_count(${bq(c)}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]')").cast("long")

  /** Marker-word language heuristic: first language whose markers score
    * ≥2 hits wins, else 'und'. Deterministic, one pass of regexp counts;
    * a real n-gram model plugs in behind the same Column signature. */
  def langGuess(c: String): Column = {
    def hits(rx: String): Column = expr(s"regexp_count(${bq(c)}, '$rx')")
    when(hits("\\\\b(the|and|of)\\\\b") >= 2, lit("en"))
      .when(hits("\\\\b(le|la|et)\\\\b") >= 2, lit("fr"))
      .when(hits("\\\\b(der|und|die)\\\\b") >= 2, lit("de"))
      .when(hits("\\\\b(el|los|y)\\\\b") >= 2, lit("es"))
      .otherwise(lit("und"))
  }

  /** Quality score in [0,1]: length band + punctuation ratio + stopword
    * presence — the standard cheap pre-filters for corpus text. Double
    * arithmetic on deterministic operands; round(6) for stable
    * cross-engine comparison. */
  def qualityScore(c: String): Column = {
    val len = length(col(bq(c))).cast("double")
    val punct = expr(s"regexp_count(${bq(c)}, '[^A-Za-z0-9\\\\s]')").cast("double")
    val stop = expr(s"regexp_count(${bq(c)}, '\\\\b(the|and|of|a|to)\\\\b')").cast("double")
    val lenScore = when(len >= 100 && len <= 10000, lit(1.0))
      .when(len < 100, len / 100.0)
      .otherwise(lit(10000.0) / len)
    val punctScore = when(punct / greatest(len, lit(1.0)) <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopScore = when(stop >= 3, lit(1.0)).otherwise(stop / 3.0)
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** Polynomial rolling-hash fingerprint of the first `n` chars:
    * fold(acc * 131 + ascii(char)) mod 1e9+7 — deterministic integer
    * arithmetic, identical in any engine that can fold a list. */
  def fingerprint(c: String, n: Int = 64): Column =
    when(length(col(bq(c))) === 0, lit(0L)).otherwise(expr(
      s"""aggregate(
         |  transform(sequence(1, least(length(${bq(c)}), $n)),
         |            i -> ascii(substring(${bq(c)}, i, 1))),
         |  0L, (acc, x) -> (acc * 131 + x) % 1000000007)""".stripMargin))
}
