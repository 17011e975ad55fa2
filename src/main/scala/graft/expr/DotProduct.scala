package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns. Left-to-right
  * accumulation — the same order as `aggregate(zip_with(a, b, ...))`,
  * so results are bit-identical to the lambda formulation (and to the
  * DuckDB oracle's fold) while running as one generated loop instead
  * of interpreted higher-order functions: the hot inner op of every
  * cosine-similarity stage (ANN brute force, IVF re-rank, embedding
  * near-dup verification).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // also null when the array LENGTHS differ — a corrupt/truncated
  // embedding must surface as null (like the zip_with/aggregate fold
  // this mirrors), not as a plausible similarity over the shared prefix
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else DotProduct.dot(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.expr.DotProduct.dot($a, $b);
      }""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dotp"
}

object DotProduct {
  /** Left-to-right fold; caller guarantees equal lengths. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
