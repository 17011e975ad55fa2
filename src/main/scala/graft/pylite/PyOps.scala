package graft.pylite

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Spark-side surface for PyLite code blocks: the four sifter steps
  * that take user python — `map` (row -> dict,
  * /root/reference/transform/mapping.go:52-57), `filter` (row -> bool,
  * transform/filter.go:30-47), `flatMap` (row -> list of dicts,
  * transform/flat_map.go:51-66) and `reduce` (fold merge(row, acc)
  * from an init dict per key, transform/reduce.go:54-80 +
  * playbook/execute.go:254-268).
  *
  * Execution model: the code is parsed ONCE on the driver (syntax
  * errors and a missing method fail fast at plan time), the immutable
  * AST ships in the task closure, and each partition instantiates one
  * interpreter — no subprocesses, no reflection, nothing
  * non-serializable. Arbitrary user code can't be expressed as Catalyst
  * expressions, so these four ops are the one place the engine
  * deliberately leaves whole-stage codegen; everything row-shaped
  * before/after them still plans as normal Catalyst.
  *
  * Schema: Spark needs a static output schema where the reference is
  * schema-free (Go maps). Callers either pass one explicitly or let
  * [[PyOps.inferOutputSchema]] run the function over a driver-side
  * sample and union the observed shapes (numeric widening, missing
  * keys nullable) — same contract as `spark.read.json` inference, same
  * caveat: rows outside the sampled shape fail loudly at execution
  * rather than silently dropping fields.
  *
  * Error contract: a python error on a row FAILS THE TASK (the
  * reference logs and emits a nil row, transform/mapping.go:52-57 —
  * silent row corruption at 100 TB; we diverge deliberately, matching
  * this engine's loud-failure convention for plugin/cast paths).
  */
object PyOps {
  import PyInterp._

  /** Compile + validate on the driver; returns the broadcast-safe AST. */
  def compile(code: String, method: String): PProgram = PyParser.compile(code, method)

  /** Prune the operator's input to the columns the user code can
    * observe ([[PyRefs.referencedKeys]]): a `select` BEFORE the
    * mapPartitions boundary, so Catalyst pushes it into the scan
    * (`ReadSchema` shows only the referenced columns even when the
    * caller passes a full wide table) and sample inference never
    * collects unreferenced columns to the driver. A row that escapes
    * the subscript discipline (e.g. `return row`) keeps every column —
    * pruning would change the output. */
  private def prunedInput(df: DataFrame, prog: PProgram, method: String,
      extra: Seq[String] = Nil): DataFrame =
    PyRefs.referencedKeys(prog, method) match {
      case Some(keys) =>
        val cols = df.columns.filter(c => keys(c) || extra.contains(c))
        if (cols.length == df.columns.length) df
        // backtick-quote: a column literally named "a.b" must select as
        // itself, not as nested field b of struct a
        else df.select(cols.map(c =>
          org.apache.spark.sql.functions.col(s"`${c.replace("`", "``")}`")): _*)
      case None => df
    }

  // ---- the four steps ---------------------------------------------------

  def mapPy(df: DataFrame, code: String, method: String,
            schema: Option[StructType] = None, sampleSize: Int = 1000): DataFrame = {
    val prog = compile(code, method)
    val src = prunedInput(df, prog, method)
    val inSchema = src.schema
    val outSchema = schema.getOrElse(
      inferOutputSchema(src, prog, method, sampleSize, flat = false))
    src.mapPartitions { it =>
      val interp = new PyInterp(prog)
      it.map { row =>
        interp.call(method, PyBridge.rowToPy(row, inSchema)) match {
          case d: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
            PyBridge.pyToRow(d, outSchema)
          case other => throw new PyLiteException(
            s"map method '$method' must return a dict, got ${typeName(other)}", 1)
        }
      }
    }(Encoders.row(outSchema))
  }

  def filterPy(df: DataFrame, code: String, method: String): DataFrame = {
    val prog = compile(code, method)
    val inSchema = df.schema
    // output keeps every column, so the scan can't prune — but the
    // per-row python dict only needs the referenced fields
    val keepIdx: Array[Int] = PyRefs.referencedKeys(prog, method) match {
      case Some(keys) =>
        inSchema.fieldNames.zipWithIndex.collect { case (n, i) if keys(n) => i }
      case None => Array.range(0, inSchema.length)
    }
    df.mapPartitions { it =>
      val interp = new PyInterp(prog)
      it.filter(row =>
        truthy(interp.call(method, PyBridge.rowToPySubset(row, inSchema, keepIdx))))
    }(Encoders.row(inSchema))
  }

  def flatMapPy(df: DataFrame, code: String, method: String,
                schema: Option[StructType] = None, sampleSize: Int = 1000): DataFrame = {
    val prog = compile(code, method)
    val src = prunedInput(df, prog, method)
    val inSchema = src.schema
    val outSchema = schema.getOrElse(
      inferOutputSchema(src, prog, method, sampleSize, flat = true))
    src.mapPartitions { it =>
      val interp = new PyInterp(prog)
      it.flatMap { row =>
        interp.call(method, PyBridge.rowToPy(row, inSchema)) match {
          case b: mutable.ArrayBuffer[Any @unchecked] =>
            // the reference drops non-dict elements with a logged error
            // (flat_map.go:57-63); dropping silently loses data — fail.
            b.iterator.map {
              case d: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
                PyBridge.pyToRow(d, outSchema)
              case other => throw new PyLiteException(
                s"flatMap method '$method' returned a list containing ${typeName(other)}; only dicts are allowed", 1)
            }
          case null => Iterator.empty
          case other => throw new PyLiteException(
            s"flatMap method '$method' must return a list, got ${typeName(other)}", 1)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** `reduce:` — group on the string value of `keyField` (a non-string
    * or missing value keys as "", the reference's GetKey contract,
    * reduce.go:62-71) and fold `acc = method(row, acc)` from a fresh
    * deep copy of `initJson` per key. The merge function must be
    * insensitive to row order within a key — the reference gives the
    * same non-guarantee (rows arrive over channels). */
  def reducePy(df: DataFrame, keyField: String, code: String, method: String,
               initJson: Option[String] = None,
               schema: Option[StructType] = None, sampleSize: Int = 1000): DataFrame = {
    val prog = compile(code, method)
    // prune BEFORE the groupByKey so the shrunken rows are what shuffles
    // (the key column rides along even when the merge doesn't read it)
    val src = prunedInput(df, prog, method, extra = Seq(keyField))
    val inSchema = src.schema
    val init = initJson.map(PyBridge.jsonToPy).getOrElse(mutable.LinkedHashMap[Any, Any]())
    init match {
      case _: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => ()
      case other => throw new PyLiteException(s"reduce init must be a dict, got ${typeName(other)}", 1)
    }

    val keyIdx = if (inSchema.fieldNames.contains(keyField)) inSchema.fieldIndex(keyField) else -1

    def fold(interp: PyInterp, rows: Iterator[Row]): Any =
      rows.foldLeft(PyBridge.deepCopy(init)) { (acc, row) =>
        interp.call(method, PyBridge.rowToPy(row, inSchema), acc)
      }

    val outSchema = schema.getOrElse {
      val sample = src.limit(sampleSize).collect()
      if (sample.isEmpty)
        throw new PyLiteException("cannot infer reduce output schema from empty input; pass an explicit schema", 1)
      val interp = new PyInterp(prog)
      val grouped = sample.groupBy(keyOf(_, keyIdx))
      grouped.values.map { rows =>
        fold(interp, rows.iterator) match {
          case d: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => PyBridge.inferStruct(d)
          case other => throw new PyLiteException(
            s"reduce method '$method' must return a dict, got ${typeName(other)}", 1)
        }
      }.reduce(PyBridge.mergeStructs)
    }

    import src.sparkSession.implicits._
    src.groupByKey(keyOf(_, keyIdx))
      .mapGroups { (_, rows) =>
        val interp = new PyInterp(prog)
        fold(interp, rows) match {
          case d: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
            PyBridge.pyToRow(d, outSchema)
          case other => throw new PyLiteException(
            s"reduce method '$method' must return a dict, got ${typeName(other)}", 1)
        }
      }(Encoders.row(outSchema))
  }

  private def keyOf(row: Row, keyIdx: Int): String =
    if (keyIdx < 0) "" else row.get(keyIdx) match {
      case s: String => s
      case _         => "" // reference: non-string key values collapse to ""
    }

  // ---- schema inference -------------------------------------------------

  /** Run the function over up to `sampleSize` driver-collected rows and
    * union the observed output shapes. */
  private def inferOutputSchema(df: DataFrame, prog: PProgram, method: String,
                                sampleSize: Int, flat: Boolean): StructType = {
    val inSchema = df.schema
    val sample = df.limit(sampleSize).collect()
    if (sample.isEmpty)
      throw new PyLiteException("cannot infer output schema from empty input; pass an explicit schema", 1)
    val interp = new PyInterp(prog)
    val shapes = sample.iterator.flatMap { row =>
      interp.call(method, PyBridge.rowToPy(row, inSchema)) match {
        case d: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] if !flat => Iterator(d)
        case b: mutable.ArrayBuffer[Any @unchecked] if flat =>
          b.iterator.collect { case d: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => d }
        // flatMap: None = emit nothing (valid). map: None is a
        // GUARANTEED distributed-run failure — surface it here, at plan
        // time, instead of letting the sample pass and the job die
        case null if flat => Iterator.empty
        case null => throw new PyLiteException(
          s"method '$method' returned None in the inference sample — map must return a dict for every row (use flatmap to drop rows)", 1)
        case other if !flat => throw new PyLiteException(
          s"method '$method' must return a dict, got ${typeName(other)}", 1)
        case other => throw new PyLiteException(
          s"method '$method' must return a list of dicts, got ${typeName(other)}", 1)
      }
    }.map(PyBridge.inferStruct).toSeq
    if (shapes.isEmpty)
      throw new PyLiteException(
        s"method '$method' produced no rows over the ${sample.length}-row sample; pass an explicit schema", 1)
    shapes.reduce(PyBridge.mergeStructs)
  }
}

/** Conversions between Spark row values and PyLite values, plus
  * sample-based schema inference/merging. */
object PyBridge {
  import PyInterp._

  // ---- Spark -> python --------------------------------------------------

  def rowToPy(row: Row, schema: StructType): mutable.LinkedHashMap[Any, Any] = {
    val m = mutable.LinkedHashMap[Any, Any]()
    var i = 0
    while (i < schema.length) {
      m(schema(i).name) = anyToPy(row.get(i), schema(i).dataType)
      i += 1
    }
    m
  }

  /** [[rowToPy]] over a subset of field ordinals — filterPy keeps full
    * rows in the plan but only bridges the fields the predicate reads. */
  def rowToPySubset(row: Row, schema: StructType,
      idxs: Array[Int]): mutable.LinkedHashMap[Any, Any] = {
    val m = mutable.LinkedHashMap[Any, Any]()
    var j = 0
    while (j < idxs.length) {
      val i = idxs(j)
      m(schema(i).name) = anyToPy(row.get(i), schema(i).dataType)
      j += 1
    }
    m
  }

  def anyToPy(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case _: ByteType | _: ShortType | _: IntegerType =>
        java.lang.Long.valueOf(v.asInstanceOf[Number].longValue)
      case _: LongType    => java.lang.Long.valueOf(v.asInstanceOf[Number].longValue)
      case _: FloatType   => java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue)
      case _: DoubleType  => java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue)
      case _: DecimalType => java.lang.Double.valueOf(v.asInstanceOf[java.math.BigDecimal].doubleValue)
      case _: StringType  => v.toString
      case _: BooleanType => java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
      case _: DateType | _: TimestampType | _: TimestampNTZType => v.toString // ISO text, documented
      case _: BinaryType  => v // opaque passthrough; python ops on it raise
      case ArrayType(et, _) =>
        val out = mutable.ArrayBuffer[Any]()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(x => out += anyToPy(x, et))
        out
      case MapType(_, vt, _) =>
        val out = mutable.LinkedHashMap[Any, Any]()
        v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, x) =>
          out(if (k == null) null else k.toString) = anyToPy(x, vt)
        }
        out
      case st: StructType => rowToPy(v.asInstanceOf[Row], st)
      case other => throw new PyLiteException(s"unsupported Spark type for python bridge: $other", 1)
    }

  // ---- python -> Spark --------------------------------------------------

  // per-schema field-name sets, computed once (pyToRow runs per row)
  private val fieldSets =
    new java.util.concurrent.ConcurrentHashMap[StructType, Set[String]]()

  def pyToRow(d: mutable.LinkedHashMap[Any, Any], schema: StructType): Row = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      values(i) = pyToAny(d.getOrElse(f.name, null), f.dataType, f.name)
      i += 1
    }
    // keys outside the schema are an inference gap, not ignorable noise
    val known = fieldSets.computeIfAbsent(schema, s => s.fieldNames.toSet)
    d.keys.foreach {
      case k: String if known(k) => ()
      case k => throw new PyLiteException(
        s"output key ${pyRepr(k)} is not in the ${if (schema.length <= 8) schema.fieldNames.mkString("(", ",", ")") else "inferred"} output schema — " +
          "widen the sample or pass an explicit schema", 1)
    }
    new GenericRowWithSchema(values, schema)
  }

  def pyToAny(v: Any, dt: DataType, field: String): Any =
    if (v == null) null
    else (dt, v) match {
      case (_: LongType, l: java.lang.Long)      => l
      case (_: LongType, b: java.lang.Boolean)   => java.lang.Long.valueOf(if (b) 1L else 0L)
      case (_: LongType, d: java.lang.Double)
        // Infinity passes rint(d)==d but longValue SATURATES to
        // Long.MaxValue; out-of-range whole doubles likewise — both must
        // fail loudly (the documented convention), like NaN already does
        if !d.isInfinite && d.doubleValue == math.rint(d.doubleValue) &&
          d.doubleValue >= Long.MinValue.toDouble &&
          d.doubleValue < Long.MaxValue.toDouble =>
        java.lang.Long.valueOf(d.longValue)
      case (_: DoubleType, d: java.lang.Double)  => d
      case (_: DoubleType, l: java.lang.Long)    => java.lang.Double.valueOf(l.doubleValue)
      case (_: BooleanType, b: java.lang.Boolean) => b
      case (_: StringType, s: String)            => s
      // a field widened to string during inference: render scalars via
      // python str(), containers as JSON for a deterministic encoding
      case (_: StringType, l: java.lang.Long)    => l.toString
      case (_: StringType, d: java.lang.Double)  => pyStr(d)
      case (_: StringType, b: java.lang.Boolean) => if (b) "True" else "False"
      case (_: StringType, c) => toJson(c)
      case (_: BinaryType, b: Array[Byte])       => b
      case (ArrayType(et, _), b: mutable.ArrayBuffer[Any @unchecked]) =>
        b.map(pyToAny(_, et, field)).toSeq
      case (MapType(_, vt, _), m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked]) =>
        m.map { case (k, x) => pyStr(k) -> pyToAny(x, vt, field) }.toMap
      case (st: StructType, m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked]) =>
        pyToRow(m, st)
      case (t, other) => throw new PyLiteException(
        s"field '$field': cannot store ${typeName(other)} value ${pyRepr(other)} as $t", 1)
    }

  /** Deterministic JSON rendering for container values that landed in a
    * string-typed column (inference widened a mixed field). */
  def toJson(v: Any): String = toJson0(v, 0)

  private def toJson0(v: Any, depth: Int): String = {
    if (depth > 200)
      throw new PyLiteException("maximum recursion depth exceeded rendering JSON (cyclic container?)", 1)
    v match {
      case null                 => "null"
      case b: java.lang.Boolean => if (b) "true" else "false"
      case l: java.lang.Long    => l.toString
      case d: java.lang.Double  => if (d.doubleValue == math.rint(d.doubleValue) && math.abs(d) < 1e15) s"${d.longValue}.0" else d.toString
      case s: String            => jsonQuote(s)
      case b: mutable.ArrayBuffer[Any @unchecked] => b.map(toJson0(_, depth + 1)).mkString("[", ",", "]")
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        m.map { case (k, x) => s"${jsonQuote(pyStr(k))}:${toJson0(x, depth + 1)}" }.mkString("{", ",", "}")
      case other => jsonQuote(pyStr(other))
    }
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    (sb += '"').toString
  }

  /** JSON -> python values (for `reduce: init:` blocks). Uses the
    * Jackson shipped inside Spark — no extra dependency. */
  def jsonToPy(json: String): Any = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    fromJackson(mapper.readValue(json, classOf[Object]))
  }

  private def fromJackson(v: Any): Any = v match {
    case null => null
    case b: java.lang.Boolean => b
    case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
    case l: java.lang.Long    => l
    case bi: java.math.BigInteger => java.lang.Long.valueOf(bi.longValueExact)
    case d: java.lang.Double  => d
    case f: java.lang.Float   => java.lang.Double.valueOf(f.doubleValue)
    case bd: java.math.BigDecimal => java.lang.Double.valueOf(bd.doubleValue)
    case s: String => s
    case l: java.util.List[Any @unchecked] =>
      val out = mutable.ArrayBuffer[Any]()
      l.forEach(x => out += fromJackson(x))
      out
    case m: java.util.Map[Any @unchecked, Any @unchecked] =>
      val out = mutable.LinkedHashMap[Any, Any]()
      m.forEach((k, x) => out(String.valueOf(k)) = fromJackson(x))
      out
    case other => throw new PyLiteException(s"unsupported JSON value: ${other.getClass}", 1)
  }

  def deepCopy(v: Any): Any = deepCopy0(v, 0)

  private def deepCopy0(v: Any, depth: Int): Any = {
    if (depth > 200)
      throw new PyLiteException("maximum recursion depth exceeded copying a container (cyclic?)", 1)
    v match {
      case b: mutable.ArrayBuffer[Any @unchecked] =>
        val out = mutable.ArrayBuffer[Any]()
        b.foreach(x => out += deepCopy0(x, depth + 1))
        out
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        val out = mutable.LinkedHashMap[Any, Any]()
        m.foreach { case (k, x) => out(k) = deepCopy0(x, depth + 1) }
        out
      case other => other // scalars are immutable
    }
  }

  // ---- inference --------------------------------------------------------

  def inferStruct(d: mutable.LinkedHashMap[Any, Any]): StructType =
    inferType0(d, 0).asInstanceOf[StructType]

  def inferType(v: Any): DataType = inferType0(v, 0)

  private def inferType0(v: Any, depth: Int): DataType = {
    if (depth > 100)
      throw new PyLiteException("maximum nesting depth exceeded inferring a schema (cyclic container?)", 1)
    v match {
      case null                 => NullType
      case _: java.lang.Boolean => BooleanType
      case _: java.lang.Long    => LongType
      case _: java.lang.Double  => DoubleType
      case _: String            => StringType
      case _: Array[Byte]       => BinaryType
      case b: mutable.ArrayBuffer[Any @unchecked] =>
        val et = if (b.isEmpty) NullType else b.map(inferType0(_, depth + 1)).reduce(mergeTypes)
        ArrayType(if (et == NullType) StringType else et, containsNull = true)
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        val fields = m.map {
          case (k: String, x) => StructField(k, inferType0(x, depth + 1), nullable = true)
          case (k, _) => throw new PyLiteException(
            s"dict with non-string key ${pyRepr(k)} cannot become a row; pass an explicit schema (MapType)", 1)
        }
        StructType(fields.toSeq)
      case other => throw new PyLiteException(s"cannot infer a Spark type for ${typeName(other)}", 1)
    }
  }

  def mergeStructs(a: StructType, b: StructType): StructType = {
    val out = mutable.LinkedHashMap[String, StructField]()
    a.fields.foreach(f => out(f.name) = f)
    b.fields.foreach { f =>
      out(f.name) = out.get(f.name) match {
        case Some(prev) => StructField(f.name, mergeTypes(prev.dataType, f.dataType), nullable = true)
        case None       => f.copy(nullable = true)
      }
    }
    StructType(out.values.toSeq)
  }

  def mergeTypes(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y   => x
    case (NullType, t)      => t
    case (t, NullType)      => t
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (x: StructType, y: StructType) => mergeStructs(x, y)
    case (ArrayType(x, _), ArrayType(y, _)) => ArrayType(mergeTypes(x, y), containsNull = true)
    // incompatible shapes widen to string (values rendered via str/JSON)
    // — the same escape hatch spark.read.json uses for mixed fields
    case _ => StringType
  }
}
