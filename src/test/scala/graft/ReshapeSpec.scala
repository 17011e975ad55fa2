package graft

import java.nio.file.Files
import graft.ops.{Reshape, RowOps}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReshapeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("melt -> pivot -> transpose roundtrips a small matrix") {
    val m = Seq(("r1", 1, 2), ("r2", 3, 4)).toDF("id", "a", "b")
    val melted = Reshape.melt(m, Seq("id"), Seq("a", "b"))
    assert(melted.count() === 4)
    val t = Reshape.transpose(m, "id", Seq("r1", "r2"))
    val rows = t.orderBy("col_name").collect()
    assert(t.columns.toSeq === Seq("col_name", "r1", "r2"))
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(rows(0).getString(1) === "1") // a/r1
    assert(rows(1).getString(2) === "4") // b/r2
  }

  test("transpose of transpose restores the matrix (as strings)") {
    val m = Seq(("r1", "1", "2"), ("r2", "3", "4")).toDF("id", "a", "b")
    val once = Reshape.transpose(m, "id", Seq("r1", "r2"))
    val twice = Reshape.transpose(once, "col_name", Seq("a", "b"))
      .withColumnRenamed("col_name", "id")
    assert(twice.orderBy("id").collect().map(_.toSeq).toSeq ===
      m.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("typed Dataset map/flatMap replace sifter's embedded-python row fns") {
    // transform/mapping.go + flat_map.go run user gpython row->row(s);
    // the engine's surface for user logic is typed Scala lambdas.
    case class Ev(user_id: Long, event_type: String)
    val ds = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").as[(Long, String)]
    val mapped = ds.map { case (u, t) => (u, t.toUpperCase) }
    assert(mapped.filter(_._2 == "PURCHASE").count() ===
      ds.filter(_._2 == "purchase").count())
    val doubled = ds.flatMap { case (u, t) => Seq((u, t), (u + 1000000, t)) }
    assert(doubled.count() === ds.count() * 2)
  }

  test("avro OCF read (avro_load.go)") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecordBuilder}
    val d = Files.createTempDirectory("avro")
    val schema: Schema = SchemaBuilder.record("Rec").fields()
      .requiredLong("id").requiredString("name").endRecord()
    val w = new DataFileWriter(new GenericDatumWriter[Any](schema))
    w.create(schema, d.resolve("r.avro").toFile)
    (1L to 5L).foreach(i => w.append(
      new GenericRecordBuilder(schema).set("id", i).set("name", s"n$i").build()))
    w.close()
    val back = Sources.avro(spark, d.toString + "/*.avro")
    assert(back.count() === 5)
    assert(back.columns.sorted.toSeq === Seq("id", "name"))
    assert(back.agg(sum("id")).collect()(0).getLong(0) === 15L)
  }

  test("dropNullRows (transform/drop_null.go analog)") {
    val df = Seq((Some("a"), 1), (None, 2)).toDF("s", "n")
    assert(RowOps.dropNullRows(df, Seq("s")).count() === 1)
  }
}
