package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash: fold (acc * 131 + codepoint) mod
  * 1e9+7 over the string's code points. This is the deterministic,
  * engine-portable hash every dedup/fingerprint operator builds on
  * (identical to the SQL-lambda formulation the DuckDB oracle replays,
  * but evaluated as one generated call instead of a per-character
  * array materialization + fold — the hot path of MinHash shingling).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L
  final val Mult = 131L

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(u: UTF8String): Long = hashString(u.toString)

  /** Same fold over a JVM String directly — for callers that already
    * hold decoded text (WordShingles/SimHash16 tokenizers), avoiding a
    * String -> UTF8String encode + decode round trip per token. */
  def hashString(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
