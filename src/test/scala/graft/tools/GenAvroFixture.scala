package graft.tools

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** One-off generator for fixtures/src_oracle/sample.avro (committed
  * binary): three records with union-typed fields, so the source oracle
  * pins goavro's `{"<type>": value}` union rendering in CORRECTNESS.
  * Reproduce with: sbt "Test/runMain graft.tools.GenAvroFixture"
  */
object GenAvroFixture {
  def main(args: Array[String]): Unit = {
    val addr: Schema = SchemaBuilder.record("Addr").fields()
      .name("city").`type`().stringType().noDefault()
      .endRecord()
    val schema: Schema = SchemaBuilder.record("Person").fields()
      .name("id").`type`().longType().noDefault()
      .name("name").`type`().unionOf().nullType().and().stringType().endUnion().nullDefault()
      .name("score").`type`().unionOf().nullType().and().doubleType().endUnion().nullDefault()
      .name("addr").`type`().unionOf().nullType().and().`type`(addr).endUnion().nullDefault()
      .endRecord()

    def rec(id: Long, name: String, score: java.lang.Double, city: String): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id)
      r.put("name", name)
      r.put("score", score)
      if (city != null) {
        val a = new GenericData.Record(addr)
        a.put("city", city)
        r.put("addr", a)
      }
      r
    }

    val out = new java.io.File("fixtures/src_oracle/sample.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    try {
      w.append(rec(1L, "ada", 2.5, "paris"))
      w.append(rec(2L, null, null, null))
      w.append(rec(3L, "bob", -0.5, "oslo"))
    } finally w.close()
    println(s"wrote ${out.getAbsolutePath}")
  }
}
