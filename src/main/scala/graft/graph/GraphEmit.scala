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
    // null-id rows are dropped BEFORE the dedup: concat null-propagates
    // _id to NULL and dropDuplicates treats nulls as equal, so distinct
    // id-less rows would silently collapse into one phantom vertex (the
    // reference emits an _id-less map for these — a broken vertex either
    // way; dropping is the honest fixed-schema analog)
    df.filter(col(idField).isNotNull)
      .select(Seq(
        concat(lit(cls.id + "/"), col(idField)).as("_id"),
        lit(cls.title).as("_label")) ++ dataCols.map(col): _*)
      .dropDuplicates("_id")

  private def hasPath(schema: org.apache.spark.sql.types.StructType, path: String): Boolean =
    graft.rules.SchemaLoader.hasPath(schema, path)

  private val EdgeArmType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType.fromDDL("_to STRING, _label STRING"))

  /** Edges from a schema class's `links` declarations — emitted in ONE
    * scan of the frame. Each link compiles to an
    * `array<struct<_to,_label>>` "arm" column (empty array = no edges
    * for that row); a single `explode(concat(arms))` then yields every
    * link's edges without re-scanning the corpus per link, which at
    * 10^12 rows turns an N-link class from N passes into one.
    *
    * Per-link semantics (output_graph.go → bmeg/jsonschema Generate):
    *  - no `templatePointers`: href rendered from row columns, one edge
    *    per row with non-null `templateRequired` fields;
    *  - `/projects/-/id` array pointer: one edge per element, the href
    *    variable bound per element; a base field absent from the schema
    *    yields no edges (the reference's pointer resolution fails
    *    silently per row);
    *  - MULTIPLE array pointers advance in LOCKSTEP (the generator
    *    loop): `arrays_zip` inside the arm, shorter arrays padded with
    *    null and dropped by the `templateRequired` filter — never a
    *    join of explosions (which would cross-product). */
  def schemaEdges(df: DataFrame, cls: graft.rules.SchemaLoader.SchemaClass,
      idField: String = "id"): DataFrame = {
    val emptyArm = array().cast(EdgeArmType)
    def edge(to: Column, rel: String): Column =
      struct(to.as("_to"), lit(rel).as("_label"))

    val arms: Seq[Column] = cls.links.flatMap { link =>
      if (link.templatePointers.isEmpty) {
        if (!link.templateRequired.forall(hasPath(df.schema, _))) None
        else {
          val cond = link.templateRequired.map(col(_).isNotNull)
            .foldLeft(lit(true))(_ && _)
          Some(when(cond,
            array(edge(graft.rules.SchemaLoader.hrefColumn(link.href), link.rel)))
            .otherwise(emptyArm))
        }
      } else {
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
          // templateRequired names NOT bound by a pointer resolve to
          // plain row columns (the no-pointer branch already treats
          // them so): absent from the schema → no edges at all;
          // present → row-level non-null condition
          val extraRequired = link.templateRequired
            .filterNot(ps.map(_.v).toSet)
          def requiredFilter(binds: Map[String, Column]): Column =
            binds.collect { case (v, c) if link.templateRequired.contains(v) =>
              c.isNotNull }.foldLeft(lit(true))(_ && _)
          val rowRequired: Column =
            extraRequired.map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
          def subBind(root: Column, sub: Option[String]): Column =
            sub.fold(root)(s => s.split("\\.").foldLeft(root)(_ getField _))
          val scalarBinds = scalars.map(p => p.v -> col(p.base)).toMap
          if (!extraRequired.forall(hasPath(df.schema, _))) None
          else if (arrays.isEmpty) {
            // all-scalar pointers: one edge per row with non-null
            // required values, paths bound directly
            val to = graft.rules.SchemaLoader.hrefColumnBound(link.href, scalarBinds)
            Some(when(requiredFilter(scalarBinds) && rowRequired,
              array(edge(to, link.rel)))
              .otherwise(emptyArm))
          } else {
            // per-element source: the single array, or the lockstep zip.
            // Zip inputs are null-coalesced to typed empty arrays first:
            // arrays_zip is null-intolerant, so one NULL array column
            // would null the whole zip and silently suppress the
            // sibling arrays' edges — whereas the documented contract is
            // "shorter (incl. missing) arrays pad with null, dropped by
            // the templateRequired filter". A lone null array still
            // yields no edges via the trailing coalesce.
            def zipInput(base: String): Column = {
              val t = df.select(col(base)).schema.head.dataType
              coalesce(col(base), array().cast(t))
            }
            val src =
              if (arrays.size == 1) col(arrays.head.base)
              else arrays_zip(
                arrays.zipWithIndex.map { case (p, i) => zipInput(p.base).as(s"__p$i") }: _*)
            def binds(e: Column): Map[String, Column] =
              arrays.zipWithIndex.map { case (p, i) =>
                val root = if (arrays.size == 1) e else e.getField(s"__p$i")
                p.v -> subBind(root, p.sub)
              }.toMap ++ scalarBinds
            val arm = transform(
              filter(src, e => requiredFilter(binds(e))),
              e => edge(graft.rules.SchemaLoader.hrefColumnBound(link.href, binds(e)),
                link.rel))
            // a null array must contribute NOTHING, not null out the
            // whole concat (concat is null-propagating); the row-level
            // required columns gate the whole arm
            Some(when(rowRequired, coalesce(arm, emptyArm)).otherwise(emptyArm))
          }
        }
      }
    }
    val raw =
      if (arms.isEmpty)
        // leaf class (no links): an EMPTY edge table with the edge
        // schema, not emptyDataFrame (zero columns — dropDuplicates
        // would throw on a perfectly normal linkless class)
        df.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "_from STRING, _to STRING, _label STRING"))
      else df
        .select(concat(lit(cls.id + "/"), col(idField)).as("_from"),
          explode(concat(arms: _*)).as("__e"))
        .select(col("_from"), col("__e._to").as("_to"), col("__e._label").as("_label"))
    raw.dropDuplicates("_from", "_to", "_label")
      .withColumn("_id", md5(concat(col("_from"), lit(">"), col("_to"), lit("#"), col("_label"))))
  }

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
