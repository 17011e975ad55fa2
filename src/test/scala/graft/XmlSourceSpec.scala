package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files
import graft.sources.XmlSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class XmlSourceSpec extends AnyFunSuite {
  import TestSpark._

  val doc: String =
    """<catalog>
      |  <book id="b1"><title>Dune</title><year>1965</year></book>
      |  <book id="b2"><title>Neuromancer</title><year>1984</year>
      |    <tag>cyber</tag><tag>classic</tag></book>
      |</catalog>""".stripMargin

  test("level=1 splits into one row per child element (xml_step.go)") {
    val rows = XmlSource.rows(new ByteArrayInputStream(doc.getBytes("UTF-8")), 1)
    assert(rows.size === 2)
    assert(rows.head.contains(""""-id":"b1""""))
    assert(rows.head.contains(""""title":"Dune""""))
    assert(rows(1).contains("""["cyber","classic"]""")) // repeated name -> array
  }

  test("level=0 gives the whole document as one row") {
    val rows = XmlSource.rows(new ByteArrayInputStream(doc.getBytes("UTF-8")), 0)
    assert(rows.size === 1)
    assert(rows.head.startsWith("""{"catalog":"""))
  }

  test("DataFrame path: schema inferred, attributes and arrays intact") {
    val d = Files.createTempDirectory("xml")
    Files.writeString(d.resolve("books.xml"), doc)
    val df = XmlSource.xml(spark, d.toString + "/*.xml", 1)
    assert(df.count() === 2)
    val r = df.filter(col("book.-id") === "b2").select("book.title", "book.tag")
      .collect()(0)
    assert(r.getString(0) === "Neuromancer")
    assert(r.getSeq[String](1) === Seq("cyber", "classic"))
  }

  test("gz input decodes transparently") {
    val d = Files.createTempDirectory("xmlgz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(d.resolve("books.xml.gz")))
    out.write(doc.getBytes("UTF-8")); out.close()
    assert(XmlSource.xml(spark, d.toString + "/*.xml.gz", 1).count() === 2)
  }
}
