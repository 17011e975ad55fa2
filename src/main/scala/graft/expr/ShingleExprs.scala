package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word-trigram shingle hashes: tokenize on whitespace,
  * [[PolyHash]] each token, fold consecutive triples, distinct (sorted
  * order). The element SET is identical to the SQL-lambda
  * `array_distinct(transform(...))` formulation the DuckDB oracle
  * replays — same trim+split semantics, same polynomial fold — and
  * every consumer is a set function; one generated call per row
  * replaces interpreted nested higher-order functions over every
  * token.
  */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordShingles.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  val P: Long = PolyHash.Mod // one canonical modulus for every engine-side hash

  /** Tokenize exactly like `split(trim(s), '\\s+')` in Spark SQL (and
    * the DuckDB oracle's TRIM + string_split_regex): SQL trim strips
    * SPACES only (Java's String.trim strips all control chars ≤ U+0020)
    * and SQL split keeps trailing empty tokens (Java's default split
    * drops them — pass limit -1). A doc ending in '\t' must yield the
    * trailing "" token both engines produce, or shingle sets silently
    * diverge from the oracle. */
  def sqlTokens(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e).split("\\s+", -1)
  }

  /** Polynomial hash of every token of `s` under SQL split semantics.
    * Primitive arrays only — this runs once per document per pass, and
    * boxed-collection churn here measurably hurts multi-core scaling
    * (GC contention). */
  def tokenHashes(s: String): Array[Long] = {
    val tokens = sqlTokens(s)
    val th = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      th(i) = PolyHash.hashString(tokens(i))
      i += 1
    }
    th
  }

  /** Distinct trigram hashes, SORTED (not first-occurrence) order: every
    * consumer — minhash, jaccard intersect/union, the oracle's
    * list_min/list_intersect — is a set function, so only the element
    * SET must match the SQL array_distinct formulation. Sort+dedup on a
    * primitive array avoids per-element boxing. */
  def shingles(u: UTF8String): ArrayData = {
    val th = tokenHashes(u.toString)
    val n = th.length
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val tri = new Array[Long](n - 2)
    var i = 0
    while (i + 2 < n) {
      tri(i) = ((th(i) * 131 + th(i + 1)) % P * 131 + th(i + 2)) % P
      i += 1
    }
    java.util.Arrays.sort(tri)
    var uniq = 1
    i = 1
    while (i < tri.length) {
      if (tri(i) != tri(i - 1)) { tri(uniq) = tri(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(tri, uniq))
  }
}

/** Codegen'd 16-hash MinHash signature over a shingle array:
  * sig(i) = min over shingles of ((2i+1)*x + 7i+3) mod P — the same
  * fixed permutation family as the SQL-lambda formulation; an empty
  * shingle set yields all-null (array_min of an empty array is null),
  * matching both the lambda form and the DuckDB oracle. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashSig.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  val P: Long = PolyHash.Mod // one canonical modulus for every engine-side hash
  val NumHashes = 16

  def sig(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](NumHashes)(null))
    val out = new Array[Long](NumHashes)
    var i = 0
    while (i < NumHashes) {
      val a = 2L * i + 1
      val b = 7L * i + 3
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * sh.getLong(j) + b) % P
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}
