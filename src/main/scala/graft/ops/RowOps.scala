package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Sifter's row-transform inventory (SURVEY.md §2.2-§2.4) re-expressed as
  * thin DataFrame combinators over codegen'd built-in functions — no
  * UDFs, so predicate pushdown / column pruning / whole-stage codegen all
  * apply. Each op cites the reference behavior it mirrors.
  */
object RowOps {

  /** `project:` — add/overwrite computed fields (reference:
    * transform/project.go:57-106; handlebars templates become Column
    * expressions — params are resolved at plan-build time). */
  def project(df: DataFrame, fields: (String, Column)*): DataFrame =
    // ONE projection node, not a withColumn-per-field stack (whose
    // nested Projects make analysis cost quadratic on wide mappings);
    // ListMap keeps the mapping's declared order for NEW columns. All
    // templates resolve against the INPUT row — faithful to the
    // reference, whose Go map iteration order is random, so its
    // projects can't rely on seeing earlier computed fields either
    df.withColumns(scala.collection.immutable.ListMap(fields: _*))

  /** `project.rename` (transform/project.go:99-104). */
  def rename(df: DataFrame, renames: (String, String)*): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** `filter:` — keep rows matching; sifter's match / exists / hasValue /
    * not checks (transform/filter.go:58-111) compose as Column predicates:
    * match = `col === lit`, exists = `isNotNull`, hasValue =
    * `isNotNull && length > 0`, not = `=!=`. */
  def keep(df: DataFrame, pred: Column): DataFrame = df.filter(pred)

  def hasValue(c: Column): Column = c.isNotNull && length(c) > 0

  /** `clean:` — keep-list of fields, optionally dropping empty strings to
    * null (transform/clean.go:28-56 `removeEmpty`); `storeExtra` gathers
    * every dropped column into a string map instead of discarding it
    * (clean.go:40-47). */
  def clean(df: DataFrame, fields: Seq[String], removeEmpty: Boolean = false,
      storeExtra: Option[String] = None): DataFrame = {
    val extraCol = storeExtra.map { dst =>
      val dropped = df.columns.toIndexedSeq.filterNot(fields.contains)
      dst -> map(dropped.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)
    }
    val kept = df.select(fields.map(col) ++
      extraCol.map { case (dst, c) => c.as(dst) }: _*)
    if (!removeEmpty) kept
    else {
      // one projection for all the empty->null rewrites, not a
      // withColumn stack per string field
      val rewrites = fields.filter(f =>
        kept.schema(f).dataType.typeName == "string")
        .map(f => f -> when(length(col(f)) === 0, lit(null)).otherwise(col(f)))
      if (rewrites.isEmpty) kept
      else kept.withColumns(scala.collection.immutable.ListMap(rewrites: _*))
    }
  }

  /** `fieldType:` — cast with fail→null, exactly sifter's parse semantics
    * (transform/field_type.go:26-46: unparseable string → nil). Uses
    * try_cast so the behavior is explicit under ANSI mode. */
  def fieldType(df: DataFrame, casts: (String, DataType)*): DataFrame =
    // backtick-quoted: a name like `token-count` must not parse as
    // arithmetic inside the expr text; single projection for all casts
    df.withColumns(scala.collection.immutable.ListMap(casts.map { case (f, t) =>
      f -> expr(s"try_cast(`${f.replace("`", "``")}` as ${t.sql})")
    }: _*))

  /** `fieldType: list` — promote scalar to single-element array
    * (transform/field_type.go:47-57). */
  def promoteToList(df: DataFrame, field: String): DataFrame =
    df.withColumn(field, array(col(field)))

  /** `dropNull:` — the reference removes null-valued keys per row
    * (transform/drop_null.go:14-22); with a fixed columnar schema the
    * honest analog is row-level null handling. */
  def dropNullRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** `jsonParse` — parse a JSON-string field into typed columns
    * (transform/json_parse.go:9-29; defined but unregistered in the
    * reference — completed here via from_json). */
  def jsonParse(df: DataFrame, field: String, schemaDdl: String, dst: String): DataFrame =
    df.withColumn(dst,
      from_json(col(field), org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)))

  /** `fieldParse:` — parse `k1=v1;k2=v2` string into a map
    * (transform/field_parse.go:24-55). A bare key with no assign
    * (`...;flag;...`) becomes `flag -> true` in the reference
    * (field_parse.go:44-47); the map is string-typed, so "true" is the
    * honest analog of the reference's boolean. A key with an EMPTY
    * value (`k=`) stays "" in both engines.
    *
    * For single-char sep/assign (the reference defaults) the bare-key
    * rewrite is a codegen'd regexp_replace pre-pass appending
    * `<assign>true` to assign-free segments; multi-char delimiters fall
    * back to an interpreted transform_values over the parsed map (HOF
    * lambdas don't codegen — fine for odd delimiters, not for the
    * default path a 100 TB corpus takes). */
  def fieldParse(df: DataFrame, field: String, dst: String,
      sep: String = ";", assign: String = "="): DataFrame = {
    // str_to_map's delimiters are REGEXES in Spark; the reference splits
    // on literal strings (strings.Split), so both are pattern-quoted
    val s = java.util.regex.Pattern.quote(sep)
    val a = java.util.regex.Pattern.quote(assign)
    val parsed = str_to_map(_: Column, lit(s), lit(a))
    if (sep.length == 1 && assign.length == 1) {
      val repl = "$1" + java.util.regex.Matcher.quoteReplacement(assign + "true")
      // \z, not $: Java's $ matches BEFORE a final trailing newline, so
      // a bare key ending in \n would be rewritten mid-string and key
      // "flag\n" would become key "flag" value "true\n" — diverging
      // from strings.Split and the multi-char fallback path
      val pre = regexp_replace(col(field), s"(?<=^|$s)([^$s$a]+)(?=$s|\\z)", repl)
      df.withColumn(dst, parsed(pre))
    } else
      df.withColumn(dst,
        transform_values(parsed(col(field)), (_, v) => coalesce(v, lit("true"))))
  }

  /** `split:` — split string field on separator into array, in place
    * (transform/split.go:19-31). */
  def splitField(df: DataFrame, field: String, sep: String): DataFrame =
    df.withColumn(field, split(col(field), java.util.regex.Pattern.quote(sep)))

  /** `regexReplace:` — global regex replace, optional distinct dst
    * (transform/regex.go:37-54). */
  def regexReplace(df: DataFrame, field: String, rx: String, repl: String,
      dst: Option[String] = None): DataFrame =
    df.withColumn(dst.getOrElse(field), regexp_replace(col(field), rx, repl))

  /** `hash:` — md5 / sha1 / sha256 hex digest of a value into a field
    * (transform/hash.go:27-46; the reference shares one hash.Hash across
    * a worker pool — a latent race — while these are pure columnar fns). */
  def hashField(df: DataFrame, dst: String, value: Column, method: String): DataFrame = {
    val h = method match {
      case "md5" => md5(value)
      case "sha1" => sha1(value)
      case "sha256" => sha2(value, 256)
      case other => sys.error(s"unknown hash method: $other")
    }
    df.withColumn(dst, h)
  }

  /** `fieldProcess:` — explode an array field into one row per element,
    * carrying chosen parent fields alongside
    * (transform/field_process.go:26-71). */
  def fieldProcess(df: DataFrame, arrayField: String, parentFields: Seq[String],
      elementAs: String): DataFrame =
    df.select(parentFields.map(col) :+ explode(col(arrayField)).as(elementAs): _*)

  /** `distinct:` — first-wins dedup on a key expression (reference keeps
    * the first row per rendered key via a badger KV,
    * transform/distinct.go:24-62). Spark's shuffle-backed dropDuplicates
    * replaces the out-of-core KV; "first" is arbitrary-per-group in both
    * engines (the reference's order is channel arrival order). */
  def distinctBy(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** `accumulate:` — gather all rows of a key into one row
    * (transform/accumulate.go:18-32). Caller picks the aggregations;
    * convenience for the common collect-a-column shape, sorted for
    * deterministic output (the reference's gather order is
    * nondeterministic channel order — we strengthen it). */
  def accumulate(df: DataFrame, key: String, gather: String): DataFrame =
    df.groupBy(col(key))
      .agg(sort_array(collect_list(col(gather))).as(s"${gather}s"),
        count(lit(1)).as("n_rows"))

  /** True if `dt` contains a MapType anywhere — such structs are not
    * orderable, so sort_array over them fails analysis. */
  private def hasMap(dt: DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
    case _ => false
  }

  /** Deterministically sorted array aggregate: sort_array for orderable
    * element types; structs containing maps (unorderable) sort on their
    * JSON rendering instead — a different but still deterministic order,
    * rather than an AnalysisException. */
  private def sortedArray(arr: Column, orderable: Boolean): Column =
    if (orderable) sort_array(arr)
    else array_sort(arr, (l, r) =>
      when(to_json(l) < to_json(r), -1)
        .when(to_json(l) > to_json(r), 1)
        .otherwise(0))

  /** `accumulate:` full-row form — gather each group's complete rows
    * into `{key, dest: [rows]}` exactly like the reference
    * (transform/accumulate.go:18-32), deterministically ordered by the
    * struct's field order (the reference's channel order is
    * nondeterministic; we strengthen it). Rows carrying map columns
    * (unorderable) order by their JSON rendering instead. */
  def accumulateRows(df: DataFrame, key: String, dest: String): DataFrame = {
    val others = df.columns.filterNot(_ == key)
    val payload = struct(others.map(col): _*)
    val orderable = !others.exists(c => hasMap(df.schema(c).dataType))
    df.groupBy(col(key))
      .agg(sortedArray(collect_list(payload), orderable).as(dest),
        count(lit(1)).as("n_rows"))
  }

  /** `lookup:` with `copy:` — enrich rows from a small reference table via
    * broadcast left join (transform/lookup.go:81-214 builds the whole
    * file into an in-memory map; broadcast is the cluster analog). */
  /** `tap` (default no-op) sees the joined frame BEFORE projection —
    * `__lk_key` is null exactly on miss rows and `__lk_src_i` holds the
    * i-th copy source (in `copies` order): the hook where callers
    * attach `observe` hit/miss counters without a second pass. */
  def lookupCopy(df: DataFrame, lookup: DataFrame, leftKey: Column,
      rightKey: Column, copies: (String, String)*): DataFrame =
    lookupCopy(df, lookup, leftKey, rightKey, identity[DataFrame] _, copies: _*)

  def lookupCopy(df: DataFrame, lookup: DataFrame, leftKey: Column,
      rightKey: Column, tap: DataFrame => DataFrame,
      copies: (String, String)*): DataFrame = {
    // project + rename the lookup side to reserved names BEFORE joining,
    // so lookup columns can never collide with (or silently drop)
    // same-named main-table columns
    val srcs = copies.map(_._2)
    // one row per key: the reference loads the lookup file into a map,
    // so duplicate keys collapse to one value — without this a dup key
    // would MULTIPLY matching probe rows through the left join.
    // Winner rule: lexicographically-greatest value tuple (deterministic
    // across runs/partitionings, unlike dropDuplicates' arbitrary row).
    // Non-orderable source types (maps) can't go through max(): those
    // fall back to dropDuplicates — still one row per key, winner
    // arbitrary, documented.
    val projected = lookup.select(rightKey.as("__lk_key") +:
      srcs.zipWithIndex.map { case (s, i) => lookup(s).as(s"__lk_src_$i") }: _*)
    val orderable = srcs.indices.forall(i =>
      !hasMap(projected.schema(s"__lk_src_$i").dataType))
    val lk =
      if (!orderable) projected.dropDuplicates("__lk_key")
      else {
        val packed = struct(srcs.indices.map(i => col(s"__lk_src_$i")): _*)
        projected.groupBy(col("__lk_key")).agg(max(packed).as("__lk_row"))
          .select(col("__lk_key") +:
            srcs.indices.map(i => col(s"__lk_row.__lk_src_$i").as(s"__lk_src_$i")): _*)
      }
    val joined = tap(df.join(broadcast(lk), leftKey === col("__lk_key"), "left"))
    copies.zipWithIndex.foldLeft(joined) { case (d, ((dst, _), i)) =>
      d.withColumn(dst, col(s"__lk_src_$i"))
    }.drop("__lk_key" +: srcs.indices.map(i => s"__lk_src_$i"): _*)
  }

  /** `lookup:` with `replace:` — map a field through the table, keeping
    * the original when there is no entry (transform/lookup.go:154-189
    * replace path: hit → mapped value, miss → unchanged). */
  def lookupReplace(df: DataFrame, lookup: DataFrame, field: String,
      rightKey: String, rightValue: String,
      tap: DataFrame => DataFrame = identity): DataFrame = {
    val projected = lookup.select(col(rightKey).as("__lk_key"), col(rightValue).as("__lk_val"))
    // map semantics, deterministic winner (greatest value) — see lookupCopy.
    // Unorderable value types (maps) can't go through max(): fall back to
    // dropDuplicates — still one row per key, winner arbitrary.
    val lk =
      if (hasMap(projected.schema("__lk_val").dataType)) projected.dropDuplicates("__lk_key")
      else projected.groupBy("__lk_key").agg(max(col("__lk_val")).as("__lk_val"))
    // tap contract as in lookupCopy: __lk_key null = miss
    tap(df.join(broadcast(lk), df(field) === col("__lk_key"), "left"))
      .withColumn(field, coalesce(col("__lk_val"), col(field)))
      .drop("__lk_key", "__lk_val")
  }

  /** Literal map column from a dictionary-sized lookup DataFrame — the
    * exact analog of the reference loading the whole lookup file into an
    * in-memory hash (transform/lookup.go:249-281): collected once on the
    * driver at plan build, then evaluated as a codegen'd map literal on
    * every executor (no shuffle, no join). Guarded: a lookup too large
    * to be a plan literal should go through the join-based
    * [[lookupReplace]]/[[lookupCopy]] instead. */
  /** Above this, a lookup stops being a plan literal (200k+ Literal
    * nodes approach Janino method-size limits and codegen silently
    * falls back to interpreted) and the element-wise replaces switch to
    * a join-based plan instead. */
  private val LitMapMaxRows = 10000

  /** Some(mapLiteral) when the lookup fits [[LitMapMaxRows]]; None when
    * it must go through the join-based fallback. */
  private def litMap(lookup: DataFrame, keyCol: String, valCol: String): Option[Column] = {
    val rows = lookup
      .select(col(keyCol).cast("string"), col(valCol).cast("string"))
      .limit(LitMapMaxRows + 1).collect()
    if (rows.length > LitMapMaxRows) None
    else {
      // dup keys collapse to the greatest value — same deterministic winner
      // rule as lookupCopy/lookupReplace (map() would throw on duplicates);
      // null keys/values can't live in a map literal and a null-keyed entry
      // can never match an element lookup anyway. "Greatest" is UTF-8
      // BYTE order (what Spark's max() on StringType uses) — Java's
      // String >= compares UTF-16 units and flips for supplementary
      // characters, which would make THIS tier's winner differ from the
      // active-set/join tiers' once the table outgrows the cap
      def utf8Gte(a: String, b: String): Boolean =
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >= 0
      val deduped = rows.toIndexedSeq
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .groupMapReduce(_.getString(0))(_.getString(1))((a, b) => if (utf8Gte(a, b)) a else b)
        .toIndexedSeq.sortBy(_._1)
      Some(map(deduped.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
    }
  }

  /** True when no expression anywhere in the plan is nondeterministic
    * (rand/uuid/monotonically_increasing_id/sample...). The active-set
    * tier evaluates the input twice (probe, then the real plan), which
    * is only sound when both evaluations produce the same element set. */
  private def planDeterministic(df: DataFrame): Boolean =
    !df.queryExecution.analyzed.exists(
      _.expressions.exists(_.exists(!_.deterministic)))

  /** The effective lookup is the INTERSECTION of the table with the
    * element values actually present in the data — a 10^9-row
    * dictionary probed by arrays drawing from a few thousand distinct
    * values still evaluates as a literal map.
    *
    * Real cost (ADVICE r5): the probe is a FULL extra evaluation of
    * the upstream plan plus a distinct — the `limit` caps the driver
    * collect, not the aggregate, so the input side is scanned twice
    * when this tier is taken. The exchange itself stays small (partial
    * map-side distinct means at most |partitions|×|per-partition
    * distinct| rows move), and the big LOOKUP side is touched only
    * when the active set fits the cap — then with the actives pushed
    * down as an IN filter, no join, no shuffle. Worth it when the
    * lookup is huge and the active set small (the case this tier
    * exists for); the caller falls through to the join tier otherwise.
    * None when the active set exceeds [[LitMapMaxRows]]. */
  private def activeLitMap(elems: DataFrame, lookup: DataFrame,
      keyCol: String, valCol: String): Option[Column] = {
    val actives = elems.select(col("__elem").cast("string").as("__elem"))
      .filter(col("__elem").isNotNull).distinct()
      .limit(LitMapMaxRows + 1).collect().map(_.getString(0))
    if (actives.length > LitMapMaxRows) None
    else {
      // dup keys collapse to the greatest value (the litMap winner
      // rule) BEFORE the collect: a table that repeats a hot key
      // millions of times must reach the driver as <= |actives| rows,
      // not raw
      val rows = lookup
        .select(col(keyCol).cast("string").as("__lk_key"),
          col(valCol).cast("string").as("__lk_val"))
        .filter(col("__lk_key").isin(actives.toIndexedSeq: _*) &&
          col("__lk_val").isNotNull)
        .groupBy("__lk_key").agg(max(col("__lk_val")).as("__lk_val"))
        .collect()
      val entries = rows.toIndexedSeq
        .map(r => r.getString(0) -> r.getString(1))
        .sortBy(_._1)
      Some(map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
    }
  }

  /** `lookup:` with `replace:` over an ARRAY field — each element is
    * mapped through the table, miss → element unchanged
    * (transform/lookup.go:190-201: the `[]any` branch of the replace
    * path). Three tiers: dictionary-sized tables evaluate as a
    * codegen'd map literal (no shuffle); above [[LitMapMaxRows]] the
    * table is first intersected with the data's ACTIVE element set
    * ([[activeLitMap]]) which usually restores the literal plan; only
    * when that too exceeds the cap do the elements posexplode,
    * broadcast-join the table, and regroup in position order. */
  def lookupReplaceArray(df: DataFrame, lookup: DataFrame, field: String,
      rightKey: String, rightValue: String): DataFrame = {
    def applyLit(m: Column): DataFrame =
      df.withColumn(field,
        transform(col(field), x => coalesce(element_at(m, x), x)))
    litMap(lookup, rightKey, rightValue).map(applyLit).getOrElse {
      // the active-set probe re-evaluates df, so it is gated on a fully
      // deterministic plan — a rand()/uuid upstream could produce
      // elements in the real evaluation that the probe never saw
      (if (planDeterministic(df))
        activeLitMap(df.select(explode(col(field)).as("__elem")),
          lookup, rightKey, rightValue).map(applyLit)
      else None).getOrElse {
        val lk = lookup
          .select(col(rightKey).cast("string").as("__lk_key"),
            col(rightValue).cast("string").as("__lk_val"))
          .groupBy("__lk_key").agg(max(col("__lk_val")).as("__lk_val"))
        // monotonically_increasing_id is NONdeterministic: the self-join
        // below recomputes withId on both sides, and with a
        // nondeterministic upstream (uuid step, sample) or a task retry
        // the two recomputations could assign different ids — silently
        // attaching replaced values to the wrong rows. localCheckpoint
        // materializes the ids once so both sides read the same frame.
        val withId = df.withColumn("__rid", monotonically_increasing_id())
          .localCheckpoint()
        val repl = withId
          .select(col("__rid"), posexplode(col(field)).as(Seq("__pos", "__elem")))
          // NO broadcast hint: this tier only runs when the lookup
          // exceeds both literal caps, so its size is unbounded — the
          // optimizer/AQE picks broadcast vs shuffle from actual stats
          .join(lk, col("__elem").cast("string") === col("__lk_key"), "left")
          .groupBy("__rid")
          .agg(transform(
            array_sort(collect_list(struct(col("__pos"),
              coalesce(col("__lk_val"), col("__elem").cast("string")).as("__v")))),
            e => e.getField("__v")).as("__replaced"))
        withId.join(repl, Seq("__rid"), "left")
          // rows whose array was empty/null produce no exploded rows:
          // keep the original value
          .withColumn(field,
            coalesce(col("__replaced"), col(field).cast("array<string>")))
          .drop("__rid", "__replaced")
      }
    }
  }

  /** `lookup:` with `replace:` over a MAP field's KEYS — each key is
    * mapped through the table, miss → key unchanged, values untouched
    * (transform/lookup.go:202-214: the `map[string]any` branch rewrites
    * keys). Same three tiers as [[lookupReplaceArray]]; map entry order
    * is not significant. */
  def lookupReplaceMapKeys(df: DataFrame, lookup: DataFrame, field: String,
      rightKey: String, rightValue: String): DataFrame = {
    def applyLit(m: Column): DataFrame =
      df.withColumn(field,
        map_from_entries(transform(map_entries(col(field)), e =>
          struct(coalesce(element_at(m, e.getField("key")), e.getField("key")).as("key"),
            e.getField("value").as("value")))))
    litMap(lookup, rightKey, rightValue).map(applyLit).getOrElse {
      // deterministic-plan gate: see lookupReplaceArray
      (if (planDeterministic(df))
        activeLitMap(df.select(explode(map_keys(col(field))).as("__elem")),
          lookup, rightKey, rightValue).map(applyLit)
      else None).getOrElse {
        val lk = lookup
          .select(col(rightKey).cast("string").as("__lk_key"),
            col(rightValue).cast("string").as("__lk_val"))
          .groupBy("__lk_key").agg(max(col("__lk_val")).as("__lk_val"))
        // monotonically_increasing_id is NONdeterministic: the self-join
        // below recomputes withId on both sides, and with a
        // nondeterministic upstream (uuid step, sample) or a task retry
        // the two recomputations could assign different ids — silently
        // attaching replaced values to the wrong rows. localCheckpoint
        // materializes the ids once so both sides read the same frame.
        val withId = df.withColumn("__rid", monotonically_increasing_id())
          .localCheckpoint()
        val repl = withId
          .select(col("__rid"), explode(map_entries(col(field))).as("__e"))
          // unbounded lookup here too — no broadcast hint (see above)
          .join(lk,
            col("__e.key").cast("string") === col("__lk_key"), "left")
          .groupBy("__rid")
          .agg(map_from_entries(collect_list(struct(
            coalesce(col("__lk_val"), col("__e.key").cast("string")).as("key"),
            col("__e.value").as("value")))).as("__replaced"))
        withId.join(repl, Seq("__rid"), "left")
          .withColumn(field, coalesce(col("__replaced"), col(field)))
          .drop("__rid", "__replaced")
      }
    }
  }

  /** `intervalIntersect:` joined-rows form — one output row per
    * (row, overlapping ref) pair. The reference materializes the whole
    * interval reference into per-worker RAM trees
    * (transform/lookup_interval.go:110-165), so the ref side gets a
    * broadcast hint: no shuffle of the (usually huge) probe side, and
    * no skew when the match key has few distinct values (chromosomes!).
    * The hint FORCES broadcast (it fails loudly past Spark's hard
    * broadcast limits rather than silently degrading) — a ref too big
    * for that is exactly what [[intervalIntersectBinned]] is for. */
  def intervalIntersect(df: DataFrame, ref: DataFrame,
      matchKey: String, start: String, end: String,
      refMatch: String, refStart: String, refEnd: String): DataFrame = {
    val r = broadcast(ref)
    df.join(r,
      df(matchKey) === r(refMatch) &&
        df(start) <= r(refEnd) && df(end) >= r(refStart),
      "inner")
  }

  /** Scale path for interval joins whose ref side is too big to
    * broadcast AND whose match key has too few distinct values to
    * spread a shuffle (five chromosomes over a thousand reducers):
    * both sides explode the bins their interval covers
    * (`floor(x / binWidth)`), the join runs on (match, bin) — a
    * high-cardinality composite key — and the exact range predicate
    * filters inside the bin. A pair overlapping several bins would
    * surface once per shared bin, so the join also requires
    * `bin = greatest(floor(start/w), floor(refStart/w))` — the larger
    * of the two interval starts lies inside both intervals, so exactly
    * ONE shared bin satisfies it: every qualifying pair appears exactly
    * once, no distinct pass. Same rows as [[intervalIntersect]]
    * (RowOpsSpec asserts equality); pick binWidth ≈ the typical
    * interval length so explosion factors stay small. */
  def intervalIntersectBinned(df: DataFrame, ref: DataFrame,
      matchKey: String, start: String, end: String,
      refMatch: String, refStart: String, refEnd: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(lo: Column, hi: Column) =
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long")))
    val l = df.withColumn("__binl", bins(df(start), df(end)))
    val r = ref.withColumn("__binr", bins(ref(refStart), ref(refEnd)))
    l.join(r,
      l(matchKey) === r(refMatch) && col("__binl") === col("__binr") &&
        l(start) <= r(refEnd) && l(end) >= r(refStart) &&
        col("__binl") === greatest(
          floor(l(start) / binWidth).cast("long"),
          floor(r(refStart) / binWidth).cast("long")),
      "inner")
      .drop("__binl", "__binr")
  }

  /** `intervalIntersect:` attach form — the reference's actual output
    * shape (transform/lookup_interval.go:166-205): every row is kept,
    * ALL intersecting reference rows are attached as a sorted array
    * field, no intersection → empty array.
    *
    * Scale shape: the reference materializes the whole interval table
    * into per-worker RAM trees, i.e. the ref side is dictionary-sized
    * by contract. The same assumption here makes the attach a
    * ZERO-SHUFFLE projection — the ref rows are collected once at plan
    * build into a literal struct array (the [[litMap]]/IVF-centroid
    * trick) and each probe row filters it in place. The previous shape
    * (row-id + left join + groupBy/collect_list) shuffled the ENTIRE
    * probe side on a synthetic key; at 100 TB that is the whole corpus
    * through the exchange for a per-row lookup.
    *
    * The literal path requires an atomic-typed ref (lit() cannot embed
    * nested rows/arrays/maps) and a genuinely dictionary-sized one —
    * every probe row scans the whole literal array linearly, so the
    * cutover default is 1000 rows (each ref row is `width` Literal
    * nodes in the plan; well below that the scan beats the join's
    * shuffle, far above it the probe-by-key join wins). Larger or
    * nested refs take [[intervalAttachJoined]] automatically. */
  def intervalAttach(df: DataFrame, ref: DataFrame,
      matchKey: String, start: String, end: String,
      refMatch: String, refStart: String, refEnd: String,
      attachAs: String, maxLiteralRefRows: Int = 1000): DataFrame = {
    val fields = ref.schema.fields.toIndexedSeq
    val atomic = fields.forall(f => f.dataType match {
      // lit() can embed scalars but not nested rows/collections
      case _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType => false
      case _ => true
    })
    val collected =
      if (atomic) ref.limit(maxLiteralRefRows + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (atomic && collected.length <= maxLiteralRefRows) {
      val refsLit =
        if (collected.isEmpty)
          array().cast(org.apache.spark.sql.types.ArrayType(ref.schema))
        else array(collected.toIndexedSeq.map(row =>
          struct(fields.zipWithIndex.map { case (f, i) =>
            lit(row.get(i)).cast(f.dataType).as(f.name)
          }: _*)): _*)
      // null match keys / bounds never attach (`===`/`<=` are null-
      // rejecting), matching the join path's left-join-miss behavior
      df.withColumn(attachAs, sort_array(filter(refsLit, r =>
        col(matchKey) === r.getField(refMatch) &&
          col(start) <= r.getField(refEnd) && col(end) >= r.getField(refStart))))
    } else intervalAttachJoined(df, ref, matchKey, start, end,
      refMatch, refStart, refEnd, attachAs)
  }

  /** Join+aggregate fallback of [[intervalAttach]] for a ref too large
    * to be a plan literal: left broadcast join on a plan-local row id,
    * then groupBy + collect_list (the `when(isNotNull)` wrapper makes
    * collect_list skip the miss rows → []). Shuffles the probe side —
    * only correct to prefer when the ref genuinely cannot broadcast. */
  def intervalAttachJoined(df: DataFrame, ref: DataFrame,
      matchKey: String, start: String, end: String,
      refMatch: String, refStart: String, refEnd: String,
      attachAs: String): DataFrame = {
    val withId = df.withColumn("__row_id", monotonically_increasing_id())
    val ref2 = broadcast(ref) // same rationale as intervalIntersect
    val joined = withId.join(ref2,
      withId(matchKey) === ref2(refMatch) &&
        withId(start) <= ref2(refEnd) && withId(end) >= ref2(refStart),
      "left")
    val refStruct = struct(ref.columns.toIndexedSeq.map(ref2(_)): _*)
    val leftCols = df.columns.toIndexedSeq
    // refs with map columns (e.g. SqlDump's data map) are unorderable —
    // exactly the refs intervalAttach auto-routes here, so the gather
    // must not die on sort_array
    val orderable = !ref.schema.fields.exists(f => hasMap(f.dataType))
    val aggs = leftCols.map(c => first(withId(c)).as(c)) :+
      sortedArray(collect_list(when(ref(refMatch).isNotNull, refStruct)), orderable)
        .as(attachAs)
    joined.groupBy(col("__row_id"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("__row_id")
  }

  /** JSONPath-style nested set (evaluate/jsonpath.go:9-21 auto-prefixes
    * `$.`): `projectNested(df, "a.b.c", v)` sets/creates field c inside
    * struct column a.b via withField — the `project:` analog for nested
    * targets. */
  def projectNested(df: DataFrame, path: String, value: Column): DataFrame = {
    val parts = path.split("\\.")
    require(parts.length >= 2,
      s"nested path must be struct.field[.field...], got '$path' (use project)")
    df.withColumn(parts.head,
      col(parts.head).withField(parts.tail.mkString("."), value))
  }

  /** `debug:` — log rows, pass the stream through unchanged
    * (transform/debug.go:17-20). */
  def debug(df: DataFrame, numRows: Int = 20): DataFrame = {
    df.show(numRows, truncate = false)
    df
  }
}
