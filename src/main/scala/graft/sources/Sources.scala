package graft.sources

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Sifter's extractor inventory (SURVEY.md §2.1) as DataFrame readers.
  *
  * The `table` reader reproduces the reference's TSV semantics exactly
  * (extractors/tabular_load.go:18-160): `sep`, `comment` lines, `rowSkip`,
  * explicit `columns` vs header row, short-row padding with "" (lines
  * 112-128), and `extraColumns` overflow array (lines 93-97). Spark's CSV
  * source can't express pad/overflow, so rows are parsed as text with
  * codegen'd split/get — still columnar, still one pass.
  */
object Sources {

  final case class TableSpec(
      sep: String = "\t",
      comment: String = "#",
      rowSkip: Int = 0,
      columns: Option[Seq[String]] = None,
      extraColumns: Option[String] = None)

  /** TSV/CSV with sifter semantics. Gzip handled by codec inference. */
  def table(spark: SparkSession, path: String, spec: TableSpec = TableSpec()): DataFrame = {
    // Physical line numbers drive rowSkip and header-drop, matching the
    // reference's sequential single-file scan. zipWithIndex is the one
    // genuinely order-dependent operation in the engine — RDD use is
    // confined to tagging line numbers; everything after is columnar.
    val raw: DataFrame = {
      val schema = StructType(Seq(StructField("value", StringType),
        StructField("__line", LongType)))
      val rdd = spark.read.text(path).rdd.zipWithIndex()
        .map { case (r, i) => Row(r.getString(0), i) }
      spark.createDataFrame(rdd, schema)
    }
    val afterSkip = raw.filter(col("__line") >= spec.rowSkip)
    val noComment =
      if (spec.comment.isEmpty) afterSkip
      else afterSkip.filter(!col("value").startsWith(spec.comment))

    val (cols: Seq[String], body: DataFrame) = spec.columns match {
      case Some(cs) => (cs, noComment)
      case None =>
        // header mode: first non-comment line names the columns
        // (driver-side single-line read, as the reference does)
        val hdr = noComment.orderBy(col("__line")).take(1).headOption
          .getOrElse(throw new IllegalArgumentException(
            s"table source '$path': no header line (file empty, fully " +
              "commented, or rowSkip past the end); pass explicit columns"))
        val names = dedupHeader(
          hdr.getString(0).split(Pattern.quote(spec.sep), -1).toSeq)
        (names, noComment.filter(col("__line") > hdr.getLong(1)))
    }

    val parts = split(col("value"), Pattern.quote(spec.sep), -1)
    val fields = cols.zipWithIndex.map { case (c, i) =>
      coalesce(get(parts, lit(i)), lit("")).as(c) // short-row padding
    }
    val extras = spec.extraColumns.map { name =>
      when(size(parts) > cols.size,
        slice(parts, lit(cols.size + 1), size(parts) - lit(cols.size)))
        .otherwise(array().cast("array<string>")).as(name)
    }
    body.select((fields ++ extras): _*)
  }

  /** Duplicate header names deduped as name, name_1, name_2...
    * (tabular_load.go:37-49 buildUniqueArray). */
  def dedupHeader(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
  }

  /** NDJSON (one object per line, opt .gz) — json_load.go:17-45. */
  def ndjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Single multiline JSON document — json_load.go:47-68. */
  def jsonDoc(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", value = true).json(path)

  /** Avro OCF — avro_load.go:15-58. The spark-avro module isn't on this
    * classpath (only avro-core), so records are decoded per-partition
    * with the bundled GenericDatumReader and handed to the JSON reader
    * for schema inference — same rows-as-maps semantics as the
    * reference's avro extractor. One file per task; fine for the OCF
    * sizes sifter handles (a real deployment adds spark-avro and this
    * becomes `read.format("avro")` behind the same signature). */
  def avro(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(new HPath(path)) match {
      case null => Array.empty[String]
      case st => st.map(_.getPath.toUri.getPath)
    }
    val jsons = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { f =>
        val reader = new org.apache.avro.file.DataFileReader(
          new java.io.File(f),
          new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
        try {
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (reader.hasNext) buf += reader.next().toString // Avro JSON encoding
          buf
        } finally reader.close()
      }
    import spark.implicits._
    spark.read.json(spark.createDataset(jsons))
  }

  /** Inline literal rows — embedded.go:5-16. */
  def embedded(spark: SparkSession, rows: Seq[(String, String)],
      keyName: String, valueName: String): DataFrame = {
    import spark.implicits._
    rows.toDF(keyName, valueName)
  }

  /** Glob of files through an inner reader, with the source filename /
    * filepath stored per row — glob_load.go:14-98 (parallelism is
    * Spark's splits rather than the reference's 4 goroutines). */
  def glob(spark: SparkSession, pattern: String,
      inner: (SparkSession, String) => DataFrame,
      storeFilename: Option[String] = None,
      storeFilepath: Option[String] = None): DataFrame = {
    val df = inner(spark, pattern)
    val withName = storeFilename.fold(df)(c =>
      df.withColumn(c, element_at(split(input_file_name(), "/"), -1)))
    storeFilepath.fold(withName)(c =>
      withName.withColumn(c, input_file_name()))
  }

  /** gripql-style graph file loaders (graph_file_reader.go:15-84):
    * NDJSON of vertices {gid,label,data} / edges {gid,label,from,to,data}
    * into the engine's vertex/edge frames. */
  def vertexFile(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path).select(
      col("gid").as("_id"), col("label").as("_label"),
      col("data").cast("string").as("data"))

  def edgeFile(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path).select(
      col("gid").as("_id"), col("label").as("_label"),
      col("from").as("_from"), col("to").as("_to"),
      col("data").cast("string").as("data"))
}
