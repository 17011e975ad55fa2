package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd sign-random-projection bucket id: `planes` sign bits of the
  * vector's projection onto deterministic pseudo-random Rademacher (±1)
  * hyperplanes, concatenated MSB-first into one bucket value.
  *
  * Plane component j of plane index `idx = tbl * planes + p` is
  * `splitmix64(idx * 2^20 + j) & 1 == 0 ? +1 : -1`. The integer-hash
  * construction matters: earlier sin-based planes (`sin(a + b*j)`) were
  * all same-frequency sinusoids in j, i.e. every "independent" plane
  * lived in the 2-D subspace spanned by (sin bj, cos bj), collapsing
  * multi-table LSH recall. splitmix64 gives effectively iid components,
  * so the per-plane split probability matches the textbook θ/π and
  * tables are genuinely independent. Pure wrapping-Long arithmetic —
  * deterministic on any engine/JVM.
  *
  * Used by [[graft.sim.Ann.lshTopK]] (ANN candidate blocking) and
  * [[graft.dedup.Dedup.embeddingNearDups]] (near-dup blocking).
  */
case class SrpBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(vec: Any, tbl: Any, planes: Any): Any =
    SrpBucket.bucket(vec.asInstanceOf[ArrayData],
      tbl.asInstanceOf[Number].longValue(),
      planes.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, t, p) =>
      s"graft.expr.SrpBucket.bucket($v, (long)($t), (int)($p))")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SrpBucket =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "srp_bucket"
}

object SrpBucket {
  /** splitmix64 finalizer — the standard public-domain mix. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def bucket(v: ArrayData, tbl: Long, planes: Int): Long = {
    val n = v.numElements()
    var acc = 0L
    var p = 0
    while (p < planes) {
      val base = (tbl * planes + p) * 1048576L
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = v.getDouble(j)
        dot += (if ((mix(base + j) & 1L) == 0L) x else -x)
        j += 1
      }
      acc = acc * 2 + (if (dot >= 0) 1L else 0L)
      p += 1
    }
    acc
  }
}
