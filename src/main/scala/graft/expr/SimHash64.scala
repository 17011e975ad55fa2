package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash — the PRODUCTION-width variant of [[SimHash16]]. The
  * 16-bit signature exists because the DuckDB oracle can replay each
  * bit test in SQL, but its signature space saturates around ~10^4
  * documents; at corpus scale near-dup pairing needs all 64 bits.
  * Token hashes are the same [[PolyHash]] fold widened through the
  * splitmix64 finalizer ([[SrpBucket.mix]]) so every bit position
  * carries signal (the raw polynomial hash only populates ~30 bits).
  * Not oracle-replayable (DuckDB has no wrapping u64 multiply) —
  * verified by ScalaTest against structural properties and the banded
  * pairing against its own brute-force form.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def hash(u: UTF8String): Long = {
    val th = WordShingles.tokenHashes(u.toString)
    val n = th.length
    val ones = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = SrpBucket.mix(th(t))
      var b = 0
      while (b < 64) {
        // branchless: h's bits are uniform, so a conditional increment
        // mispredicts half the time — this loop is the hot path of the
        // dedup job's dominant phase
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
