package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 16-bit SimHash over whitespace tokens: each token's
  * [[PolyHash]] votes per bit, majority sets the bit. Bit-identical to
  * the SQL-lambda formulation (same tokenization `trim+split(\s+)`,
  * same polynomial token hash, same `2*ones >= n` majority rule) that
  * the DuckDB oracle replays — but one generated call per row instead
  * of a 16x-tokens nested lambda evaluation.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHash16.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash16.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
  override def prettyName: String = "simhash16"
}

object SimHash16 {
  def hash(u: UTF8String): Long = {
    // SQL-faithful trim + split (space-only trim, trailing empties
    // kept) — see WordShingles.sqlTokens for why Java's defaults differ
    val th = WordShingles.tokenHashes(u.toString)
    val n = th.length
    val ones = new Array[Int](16)
    var t = 0
    while (t < n) {
      val h = th(t)
      var b = 0
      while (b < 16) {
        ones(b) += ((h >> b) & 1L).toInt // branchless — see SimHash64
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (2 * ones(b) >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
