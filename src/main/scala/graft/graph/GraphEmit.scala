package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property-graph emission + referential integrity, re-expressing
  * sifter's graph output (playbook/output_graph.go:55-184: vertex
  * `{_id,_label,...}` / edge `{_id,_from,_to,_label}` derived from schema
  * `links` declarations) and the standalone `graphcheck` orphan-edge
  * scan (graphcheck/graphCheck.go:15-72 — KV stores of vertex ids probed
  * per edge endpoint) as distinct+anti-join DataFrame plans.
  *
  * Scale: vertex/edge derivation is a narrow projection; dedup by _id is
  * one shuffle on a high-cardinality key; the orphan check broadcasts the
  * (small) vertex-id side when it fits, else falls back to a shuffled
  * anti-join — same policy as [[graft.validate.Referential]].
  */
object GraphEmit {

  /** File vertices: one per distinct file row. */
  def fileVertices(files: DataFrame): DataFrame =
    files.select(
      concat(lit("file:"), col("repo"), lit("/"), col("path"), lit("@"), col("commit")).as("_id"),
      lit("File").as("_label"),
      col("lang"))
      .dropDuplicates("_id")

  /** Repo vertices from the manifest (the referential "vertex set"). */
  def repoVertices(manifest: DataFrame): DataFrame =
    manifest.select(
      concat(lit("repo:"), col("repo")).as("_id"),
      lit("Repo").as("_label"),
      lit(null).cast("string").as("lang"))
      .dropDuplicates("_id")

  def vertices(files: DataFrame, manifest: DataFrame): DataFrame =
    fileVertices(files).unionByName(repoVertices(manifest))

  /** file →[in_repo]→ repo edges; _id = md5 of endpoints (the reference
    * hashes gid material the same way via its hash step). */
  def edges(files: DataFrame): DataFrame =
    files.select(
      concat(lit("file:"), col("repo"), lit("/"), col("path"), lit("@"), col("commit")).as("_from"),
      concat(lit("repo:"), col("repo")).as("_to"),
      lit("in_repo").as("_label"))
      .dropDuplicates("_from", "_to")
      .withColumn("_id", md5(concat(col("_from"), lit(">"), col("_to"))))

  /** Schema-driven emission (playbook/output_graph.go:55-158: vertices +
    * edges derived from a JSON-Schema class's `links` declarations).
    * Vertex gid = `class/{idField}`; one edge set per link, target gid
    * rendered from the link's href template. */
  def schemaVertices(df: DataFrame, cls: graft.rules.SchemaLoader.SchemaClass,
      idField: String = "id", dataCols: Seq[String] = Seq.empty): DataFrame =
    df.select(Seq(
      concat(lit(cls.id + "/"), col(idField)).as("_id"),
      lit(cls.title).as("_label")) ++ dataCols.map(col): _*)
      .dropDuplicates("_id")

  private def hasPath(schema: org.apache.spark.sql.types.StructType, path: String): Boolean =
    graft.rules.SchemaLoader.hasPath(schema, path)

  /** One edge set per schema link. Links carrying `templatePointers`
    * resolve their href variable through the pointer (output_graph.go →
    * bmeg/jsonschema Generate): `/projects/-/id` explodes the row's
    * `projects` array and binds one edge per element's `id`; a pointer
    * whose base field is absent from the frame's schema yields no edges
    * (the reference's pointer resolution fails silently per row).
    * Links without pointers keep the literal-column href rendering. */
  def schemaEdges(df: DataFrame, cls: graft.rules.SchemaLoader.SchemaClass,
      idField: String = "id"): DataFrame =
    cls.links.flatMap { link =>
      val from = concat(lit(cls.id + "/"), col(idField)).as("_from")
      if (link.templatePointers.isEmpty) {
        val ok = link.templateRequired.forall(hasPath(df.schema, _))
        if (!ok) None
        else Some(df.filter(link.templateRequired.map(col(_).isNotNull)
            .foldLeft(lit(true))(_ && _))
          .select(from,
            graft.rules.SchemaLoader.hrefColumn(link.href).as("_to"),
            lit(link.rel).as("_label")))
      } else {
        // every schema in the reference corpus is single-variable, but
        // its generator loops ALL pointers (output_graph.go:160-184 via
        // bmeg/jsonschemagraph): multiple array pointers advance in
        // LOCKSTEP — element i of each array binds edge i. Spark-first
        // that is NOT a join of explosions (which would cross-product):
        // one explode of arrays_zip keeps it a narrow, shuffle-free
        // projection; zip pads the shorter array with null, which the
        // templateRequired null filter then drops.
        case class Ptr(v: String, base: String, sub: Option[String], isArray: Boolean)
        val ps = link.templatePointers.toSeq.sortBy(_._1).map { case (v, ptr) =>
          val segs = ptr.stripPrefix("/").split("/").toIndexedSeq
          segs.indexOf("-") match {
            case -1 => Ptr(v, segs.mkString("."), None, isArray = false)
            case i => Ptr(v, segs.take(i).mkString("."),
              Some(segs.drop(i + 1).mkString(".")).filter(_.nonEmpty), isArray = true)
          }
        }
        if (!ps.forall(p => hasPath(df.schema, p.base))) None // field absent: no edges
        else {
          val arrays = ps.filter(_.isArray)
          val scalars = ps.filterNot(_.isArray)
          def requiredFilter(binds: Map[String, Column]): Column =
            binds.collect { case (v, c) if link.templateRequired.contains(v) =>
              c.isNotNull }.foldLeft(lit(true))(_ && _)
          if (arrays.isEmpty) {
            // all-scalar pointers: bind the paths directly — one edge
            // per row with non-null required values
            val binds = scalars.map(p => p.v -> col(p.base)).toMap
            val to = graft.rules.SchemaLoader.hrefColumnBound(link.href, binds)
            Some(df.filter(requiredFilter(binds))
              .select(from, to.as("_to"), lit(link.rel).as("_label")))
          } else {
            val elem =
              if (arrays.size == 1) explode(col(arrays.head.base))
              else explode(arrays_zip(
                arrays.zipWithIndex.map { case (p, i) => col(p.base).as(s"__p$i") }: _*))
            val exploded = df.select(
              from +: elem.as("__e") +:
                scalars.zipWithIndex.map { case (p, i) => col(p.base).as(s"__s$i") }: _*)
            val arrayBinds = arrays.zipWithIndex.map { case (p, i) =>
              val root = if (arrays.size == 1) col("__e") else col(s"__e.__p$i")
              p.v -> p.sub.fold(root)(s => s.split("\\.").foldLeft(root)(_ getField _))
            }
            val scalarBinds = scalars.zipWithIndex.map { case (p, i) =>
              p.v -> col(s"__s$i")
            }
            val binds = (arrayBinds ++ scalarBinds).toMap
            val to = graft.rules.SchemaLoader.hrefColumnBound(link.href, binds)
            Some(exploded.filter(requiredFilter(binds))
              .select(col("_from"), to.as("_to"), lit(link.rel).as("_label")))
          }
        }
      }
    }.reduceOption(_ unionByName _)
      // leaf class (no links): an EMPTY edge table with the edge schema,
      // not emptyDataFrame (zero columns — dropDuplicates("_from") would
      // throw on a perfectly normal linkless class)
      .getOrElse(df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "_from STRING, _to STRING, _label STRING")))
      .dropDuplicates("_from", "_to", "_label")
      .withColumn("_id", md5(concat(col("_from"), lit(">"), col("_to"), lit("#"), col("_label"))))

  /** graphcheck: edges whose destination vertex does not exist.
    * The vertex-id side includes one id per file row, so at 10^12 files
    * it is NOT broadcast-sized and probing its cardinality with a
    * count() would compute the (expensive) vertex dedup twice. Default
    * policy: plan the shuffled anti-join and let AQE convert it to a
    * broadcast join at runtime from the REAL shuffle size — the same
    * decision the old driver-side probe made, without the extra job.
    * `broadcastVertices` remains as an explicit override for stats-fed
    * callers. */
  def orphanEdges(edges: DataFrame, vertices: DataFrame,
      broadcastVertices: Option[Boolean] = None): DataFrame = {
    val ids = vertices.select(col("_id").as("__vid")).distinct()
    val right = if (broadcastVertices.contains(true)) broadcast(ids) else ids
    // graphcheck probes BOTH endpoints (graphCheck.go:15-72) — a dangling
    // _from in externally supplied edge files is just as orphaned
    def dangling(endpoint: String) =
      edges.join(right, edges(endpoint) === col("__vid"), "left_anti")
        .select("_id", "_from", "_to", "_label")
    dangling("_to").unionAll(dangling("_from")).dropDuplicates("_id")
  }
}
