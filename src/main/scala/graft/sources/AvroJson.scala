package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.Schema
import org.apache.avro.Schema.Type._
import org.apache.avro.generic.{GenericData, GenericRecord}

/** Avro generic datum → Jackson JSON in goavro's "native Go form"
  * (linkedin/goavro v2 — what the reference's avro extractor emits,
  * extractors/avro_load.go:38-50): a non-null union value becomes a
  * one-key object `{"<branch>": value}`, where the branch key is the
  * full name for named types (record/enum/fixed), `"array"`/`"map"`
  * for those complex types, and the primitive type name otherwise.
  * `[null, X]` with a null value is plain JSON null (never wrapped).
  */
object AvroJson {

  def toJackson(v: Any, schema: Schema, om: ObjectMapper): JsonNode = {
    val nf = om.getNodeFactory
    schema.getType match {
      case UNION =>
        if (v == null) nf.nullNode()
        else {
          val idx = GenericData.get().resolveUnion(schema, v)
          val branch = schema.getTypes.get(idx)
          if (branch.getType == NULL) nf.nullNode()
          else {
            val o = nf.objectNode()
            o.set[JsonNode](unionKey(branch), toJackson(v, branch, om))
            o
          }
        }
      case RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        val o = nf.objectNode()
        schema.getFields.asScala.foreach { f =>
          o.set[JsonNode](f.name, toJackson(rec.get(f.pos), f.schema, om))
        }
        o
      case MAP =>
        val o = nf.objectNode()
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.foreach { case (k, x) =>
          o.set[JsonNode](k.toString, toJackson(x, schema.getValueType, om))
        }
        o
      case ARRAY =>
        val a = nf.arrayNode()
        v.asInstanceOf[java.lang.Iterable[Any]].asScala.foreach(x =>
          a.add(toJackson(x, schema.getElementType, om)))
        a
      case NULL => nf.nullNode()
      case STRING | ENUM => nf.textNode(v.toString)
      case INT => nf.numberNode(v.asInstanceOf[Number].intValue)
      case LONG => nf.numberNode(v.asInstanceOf[Number].longValue)
      case FLOAT => nf.numberNode(v.asInstanceOf[Number].floatValue)
      case DOUBLE => nf.numberNode(v.asInstanceOf[Number].doubleValue)
      case BOOLEAN => nf.booleanNode(v.asInstanceOf[Boolean])
      case BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining); bb.duplicate.get(arr)
        nf.binaryNode(arr) // base64 text in JSON
      case FIXED =>
        nf.binaryNode(v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes)
    }
  }

  private def unionKey(branch: Schema): String = branch.getType match {
    case RECORD | ENUM | FIXED => branch.getFullName
    case ARRAY => "array"
    case MAP => "map"
    case t => t.getName // string, long, int, float, double, boolean, bytes
  }
}
