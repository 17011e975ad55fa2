package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4122 name-based UUIDs as Catalyst expressions — the engine's
  * version of sifter's `uuid` transform (transform/uuid.go:21-48, which
  * derives UUIDv5 ids from rendered template values; random v4 is
  * Spark's built-in `uuid()`).
  *
  * v5 = SHA-1, v3 = MD5, both over namespaceBytes ++ nameBytes with
  * version/variant bits patched per the RFC. Deterministic: the same
  * (namespace, name) gives the same id on every engine — the property
  * graph ids need for idempotent re-runs.
  *
  * CodegenFallback is deliberate: digest calls dominate the cost, so
  * generated code would save only the virtual call; the expression still
  * composes with codegen'd neighbors.
  */
abstract class NameUuid extends BinaryExpression with CodegenFallback {
  def digestAlgo: String
  def version: Int

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(ns: Any, name: Any): Any = {
    val nsBytes = NameUuid.uuidStringToBytes(ns.toString)
    val md = MessageDigest.getInstance(digestAlgo)
    md.update(nsBytes)
    md.update(name.toString.getBytes(StandardCharsets.UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | (version << 4)).toByte
    h(8) = ((h(8) & 0x3f) | 0x80).toByte
    UTF8String.fromString(NameUuid.bytesToUuidString(h))
  }
}

object NameUuid {
  def uuidStringToBytes(s: String): Array[Byte] = {
    val hex = s.replace("-", "")
    require(hex.length == 32, s"not a UUID: $s")
    Array.tabulate(16)(i =>
      Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte)
  }

  def bytesToUuidString(b: Array[Byte]): String = {
    val hex = b.take(16).map(x => f"${x & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }

  /** RFC 4122 well-known namespaces. */
  val NamespaceDns = "6ba7b810-9dad-11d1-80b4-00c04fd430c8"
  val NamespaceUrl = "6ba7b811-9dad-11d1-80b4-00c04fd430c8"
}

case class UuidV5(left: Expression, right: Expression) extends NameUuid {
  def digestAlgo = "SHA-1"
  def version = 5
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UuidV5 =
    copy(left = l, right = r)
}

case class UuidV3(left: Expression, right: Expression) extends NameUuid {
  def digestAlgo = "MD5"
  def version = 3
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UuidV3 =
    copy(left = l, right = r)
}

object UuidExprs {
  /** Column API (Spark 4 removed public Expression→Column construction;
    * the expressions are reached through the function registry, so call
    * [[register]] once per session first). */
  def uuid5(namespace: Column, name: Column): Column =
    org.apache.spark.sql.functions.call_function("uuid5", namespace, name)
  def uuid3(namespace: Column, name: Column): Column =
    org.apache.spark.sql.functions.call_function("uuid3", namespace, name)

  /** SQL + Column registration: `SELECT uuid5(ns, name)`. */
  /** Delegates to [[GraftFunctions.register]] — ONE registration path
    * (it registers uuid5/uuid3 with identical builders; a second copy
    * here had to be kept in sync by hand). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.register(spark)
}
