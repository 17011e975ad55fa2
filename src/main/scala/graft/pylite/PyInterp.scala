package graft.pylite

import scala.collection.mutable

/** Tree-walking evaluator for PyLite programs.
  *
  * Value model (chosen to round-trip Spark rows and JSON naturally,
  * the same shape gpython marshals Go `map[string]interface{}` rows
  * into, /root/reference/evaluate/gpython.go:45-135):
  *   None          -> null
  *   bool          -> java.lang.Boolean
  *   int           -> java.lang.Long   (overflow raises, no silent wrap)
  *   float         -> java.lang.Double
  *   str           -> String
  *   list / tuple  -> mutable.ArrayBuffer[Any]
  *   dict          -> mutable.LinkedHashMap[Any, Any] (insertion order)
  *
  * One interpreter per partition; the compiled [[PProgram]] is
  * immutable data shared via broadcast/closure. Module-level
  * statements run once at construction (gpython runs the module then
  * calls `Globals[method]`). A step budget bounds runaway loops so a
  * bad playbook fails the task instead of wedging an executor.
  */
final class PyInterp(prog: PProgram, maxSteps: Long = 50000000L) {
  import PyInterp._

  private val globals = mutable.HashMap[String, Any]()
  prog.funcs.foreach { case (n, f) => globals(n) = PyFunc(f) }
  // module exec for any top-level non-def statements
  locally {
    val env = new Env(globals, globals)
    prog.stmts.foreach {
      case _: PFuncDef => ()
      case s           => execStmt(s, env)
    }
  }

  private var steps = 0L
  private var depth = 0

  def call(method: String, args: Any*): Any = {
    steps = 0L
    val f = globals.getOrElse(method,
      throw new PyLiteException(s"function '$method' is not defined", 1))
    callValue(f, args.toVector, 1)
  }

  // ---- execution --------------------------------------------------------

  private final class Env(val locals: mutable.HashMap[String, Any],
                          val globalScope: mutable.HashMap[String, Any],
                          val parent: Env = null) {
    // null-based fast path: getOrNull avoids the by-name-thunk allocation
    // of getOrElse on every name reference (hottest call in the tree walk)
    // LEGB: locals, then enclosing lambda scopes (live refs — late
    // binding, as CPython closures), then globals, then builtins
    def lookup(n: String, line: Int): Any = {
      val l = locals.getOrElse(n, NotFound)
      if (l.asInstanceOf[AnyRef] ne NotFound) return l
      var e = parent
      while (e != null) {
        val v = e.locals.getOrElse(n, NotFound)
        if (v.asInstanceOf[AnyRef] ne NotFound) return v
        e = e.parent
      }
      val g = globalScope.getOrElse(n, NotFound)
      if (g.asInstanceOf[AnyRef] ne NotFound) return g
      builtinOrType(n).getOrElse(
        throw new PyLiteException(s"name '$n' is not defined", line))
    }
  }
  private object NotFound

  private def tick(line: Int): Unit = {
    steps += 1
    if (steps > maxSteps)
      throw new PyBudgetExceeded(s"step budget exceeded ($maxSteps) — non-terminating loop?", line)
  }

  /** Split a call's arg list into evaluated positionals and kwargs in
    * source order (the parser guarantees PKwArg only appears here). */
  private def evalArgs(args: Vector[PExpr],
      env: Env): (Vector[Any], Vector[(String, Any)]) = {
    val pos = Vector.newBuilder[Any]
    val kw = Vector.newBuilder[(String, Any)]
    var sawKw = false
    args.foreach {
      case PKwArg(n, v, _) =>
        sawKw = true
        kw += (n -> eval(v, env))
      case PKwSplat(v, line) =>
        sawKw = true
        eval(v, env) match {
          case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
            m.foreach {
              case (k: String, value) => kw += (k -> value)
              case (k, _) => throw new PyLiteException(
                s"keywords must be strings, not ${typeName(k)}", line)
            }
          case o => throw new PyLiteException(
            s"argument after ** must be a mapping, not ${typeName(o)}", line)
        }
      case e =>
        if (sawKw) throw new PyLiteException(
          "positional argument follows keyword argument", e.line)
        pos += eval(e, env)
    }
    (pos.result(), kw.result())
  }

  private def callValue(f: Any, args: Vector[Any], line: Int): Any = f match {
    case PyFunc(fd) =>
      if (args.length != fd.params.length)
        throw new PyLiteException(
          s"${fd.name}() takes ${fd.params.length} arguments but ${args.length} were given", line)
      depth += 1
      if (depth > 200) { depth -= 1; throw new PyLiteException("recursion limit (200) exceeded", line) }
      try {
        val env = new Env(mutable.HashMap(fd.params.zip(args): _*), globals)
        try { execBlock(fd.body, env); null }
        catch { case r: ReturnEx => r.value }
      } finally depth -= 1
    case PyLambda(params, body, defEnvRef) =>
      val defEnv = defEnvRef.asInstanceOf[Env]
      if (args.length != params.length)
        throw new PyLiteException(
          s"<lambda>() takes ${params.length} arguments but ${args.length} were given", line)
      depth += 1
      if (depth > 200) { depth -= 1; throw new PyLiteException("recursion limit (200) exceeded", line) }
      try eval(body, new Env(mutable.HashMap(params.zip(args): _*),
        defEnv.globalScope, defEnv))
      finally depth -= 1
    case PyBuiltin(name) => callBuiltin(name, args, line)
    case t: PyType => callTypeCtor(t, args, line)
    case other =>
      throw new PyLiteException(s"'${typeName(other)}' object is not callable", line)
  }

  /** Call with keyword arguments: kwargs bind to named parameters for
    * user functions/lambdas; dict/sorted/min/max understand their own
    * keywords; everything else rejects them with CPython's message. */
  private def callValueKw(f: Any, args: Vector[Any],
      kw: Vector[(String, Any)], line: Int): Any = f match {
    case _ if kw.isEmpty => callValue(f, args, line)
    case PyFunc(fd) => callValue(f, bindKw(fd.name, fd.params, args, kw, line), line)
    case PyLambda(params, _, _) => callValue(f, bindKw("<lambda>", params, args, kw, line), line)
    case PyBuiltin(name) => callBuiltinKw(name, args, kw, line)
    case t: PyType => callBuiltinKw(t.name, args, kw, line)
    case other =>
      throw new PyLiteException(s"'${typeName(other)}' object is not callable", line)
  }

  private def bindKw(fname: String, params: Vector[String], args: Vector[Any],
      kw: Vector[(String, Any)], line: Int): Vector[Any] = {
    val byName = mutable.HashMap[String, Any]()
    kw.foreach { case (k, v) =>
      if (!params.contains(k))
        throw new PyLiteException(s"$fname() got an unexpected keyword argument '$k'", line)
      if (byName.contains(k))
        throw new PyLiteException(s"keyword argument repeated: $k", line)
      byName(k) = v
    }
    // conflict check BEFORE the count check (CPython reports "multiple
    // values" for g(1, a=2), not an arity error)
    params.take(args.length).foreach { pn =>
      if (byName.contains(pn))
        throw new PyLiteException(s"$fname() got multiple values for argument '$pn'", line)
    }
    if (args.length + byName.size != params.length)
      throw new PyLiteException(
        s"$fname() takes ${params.length} arguments but ${args.length + byName.size} were given", line)
    params.zipWithIndex.map { case (pn, i) =>
      if (i < args.length) args(i)
      else byName.getOrElse(pn,
        throw new PyLiteException(s"$fname() missing required argument: '$pn'", line))
    }
  }

  private def callBuiltinKw(name: String, args: Vector[Any],
      kw: Vector[(String, Any)], line: Int): Any = name match {
    case "dict" =>
      // dict(**kw) / dict(mapping, **kw): kwargs are string keys, merged
      // after (and overriding) the optional positional mapping
      if (args.length > 1)
        throw new PyLiteException(s"dict() takes at most 1 positional argument", line)
      val out = mutable.LinkedHashMap[Any, Any]()
      args.headOption.foreach {
        case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => out ++= m
        case o => throw new PyLiteException(
          s"dict() argument must be a dict, not ${typeName(o)}", line)
      }
      // a key arriving twice VIA KWARGS (explicit + ** splat) is
      // CPython's "multiple values" TypeError; overriding the
      // positional mapping is allowed
      val seen = mutable.HashSet[String]()
      kw.foreach { case (k, v) =>
        if (!seen.add(k)) throw new PyLiteException(
          s"dict() got multiple values for keyword argument '$k'", line)
        out(k) = v
      }
      out
    case "sorted" | "min" | "max" =>
      var keyFn: Any = null
      var reverse = false
      kw.foreach {
        case ("key", f) => keyFn = f
        case ("reverse", r) if name == "sorted" => reverse = truthy(r)
        case (k, _) =>
          throw new PyLiteException(s"$name() got an unexpected keyword argument '$k'", line)
      }
      val items: Vector[Any] =
        if (name != "sorted" && args.length > 1) args.toVector
        else { arity(name, args, 1, line); iterate(args.head, line).toVector }
      if (name == "sorted") {
        val keyed = items.map(i =>
          (if (keyFn == null) i else callValue(keyFn, Vector(i), line), i))
        // strict-lt comparator + TimSort = stable, equal keys keep input
        // order under BOTH directions (CPython semantics for reverse)
        val sorted0 =
          if (reverse) keyed.sortWith((a, b) => pyCompare(a._1, b._1, line) > 0)
          else keyed.sortWith((a, b) => pyCompare(a._1, b._1, line) < 0)
        mutable.ArrayBuffer[Any](sorted0.map(_._2): _*)
      } else {
        if (items.isEmpty)
          throw new PyLiteException(s"$name() arg is an empty sequence", line)
        def k(v: Any): Any = if (keyFn == null) v else callValue(keyFn, Vector(v), line)
        items.reduce { (a, b) =>
          val c = pyCompare(k(a), k(b), line)
          if (name == "min") (if (c <= 0) a else b) else (if (c >= 0) a else b)
        }
      }
    case other =>
      throw new PyLiteException(
        s"$other() got an unexpected keyword argument '${kw.head._1}'", line)
  }

  private def execBlock(stmts: Vector[PStmt], env: Env): Unit = {
    var i = 0
    while (i < stmts.length) { execStmt(stmts(i), env); i += 1 }
  }

  private def execStmt(s: PStmt, env: Env): Unit = { tick(s.line); s match {
    case PExprStmt(e, _) => eval(e, env); ()
    case PAssign(target, op, value, line) =>
      val rhs0 = eval(value, env)
      target match {
        case PName(n, _) =>
          // augmented assignment reads from LOCALS only (unless locals
          // IS the module scope): `count += 1` against a global with no
          // `global` decl is CPython's UnboundLocalError — reading the
          // global and writing a fresh local would silently fork the
          // variable and never advance the global
          val rhs =
            if (op == "=") rhs0
            else {
              val cur =
                if ((env.locals eq env.globalScope) || env.locals.contains(n))
                  env.lookup(n, line)
                else throw new PyLiteException(
                  s"UnboundLocalError: local variable '$n' referenced before assignment", line)
              binOp(op.substring(0, 1), cur, rhs0, line)
            }
          env.locals(n) = rhs
        case PSub(obj, idx, _) =>
          val o = eval(obj, env)
          val k = eval(idx, env)
          val rhs = if (op == "=") rhs0 else binOp(op.substring(0, 1), getItem(o, k, line), rhs0, line)
          setItem(o, k, rhs, line)
        case _ => throw new PyLiteException("bad assignment target", line)
      }
    case PReturn(e, _) => throw new ReturnEx(e.map(eval(_, env)).orNull)
    case PPass(_)      => ()
    case PBreak(_)     => throw BreakEx
    case PContinue(_)  => throw ContinueEx
    case PIf(branches, orelse, _) =>
      branches.find { case (c, _) => truthy(eval(c, env)) } match {
        case Some((_, body)) => execBlock(body, env)
        case None            => execBlock(orelse, env)
      }
    case PFor(vars, iterE, body, line) =>
      val it = iterate(eval(iterE, env), line)
      val iter = it.iterator
      var broke = false
      while (!broke && iter.hasNext) {
        tick(line)
        val item = iter.next()
        if (vars.length == 1) env.locals(vars.head) = item
        else item match {
          case buf: mutable.ArrayBuffer[Any @unchecked] if buf.length == vars.length =>
            vars.indices.foreach(i => env.locals(vars(i)) = buf(i))
          case _ => throw new PyLiteException(
            s"cannot unpack ${typeName(item)} into ${vars.length} names", line)
        }
        try execBlock(body, env)
        catch {
          case BreakEx    => broke = true
          case ContinueEx => ()
        }
      }
    case PWhile(cond, body, line) =>
      var broke = false
      while (!broke && truthy(eval(cond, env))) {
        tick(line)
        try execBlock(body, env)
        catch {
          case BreakEx    => broke = true
          case ContinueEx => ()
        }
      }
    case fd: PFuncDef => env.locals(fd.name) = PyFunc(fd)
    case PTry(body, handler, _) =>
      // control-flow signals (return/break/continue) and the step
      // budget pass through; python-level errors run the handler
      try execBlock(body, env)
      catch { case _: PyLiteException => execBlock(handler, env) }
    case PImport(mods, line) =>
      mods.foreach {
        case m @ "hashlib" => env.locals(m) = PyModule(m)
        case other => throw new PyLiteException(
          s"module '$other' is not available in PyLite (available: hashlib)", line)
      }
  } }

  // ---- evaluation -------------------------------------------------------

  private def eval(e: PExpr, env: Env): Any = { tick(e.line); e match {
    case PNum(v, _)     => java.lang.Long.valueOf(v)
    case PFlt(v, _)     => java.lang.Double.valueOf(v)
    case PStr(v, _)     => v
    case PBoolLit(v, _) => java.lang.Boolean.valueOf(v)
    case PNone(_)       => null
    case PName(n, line) => env.lookup(n, line)
    case PListLit(items, _)  => mutable.ArrayBuffer[Any](items.map(eval(_, env)): _*)
    case PTupleLit(items, _) => mutable.ArrayBuffer[Any](items.map(eval(_, env)): _*)
    case PDictLit(items, _) =>
      val m = mutable.LinkedHashMap[Any, Any]()
      items.foreach { case (k, v) => m(hashableKey(eval(k, env), e.line)) = eval(v, env) }
      m
    case PSub(obj, idx, line)  => getItem(eval(obj, env), eval(idx, env), line)
    case PSliceE(obj, lo, hi, line) =>
      slice(eval(obj, env), lo.map(eval(_, env)), hi.map(eval(_, env)), line)
    case PAttr(obj, name, line) =>
      // bare attribute access (no call): only meaningful for methods in
      // this subset; fail with a precise message
      throw new PyLiteException(
        s"attribute '$name' accessed without a call — only method calls (x.$name(...)) are in the PyLite subset", line)
    case PCall(PAttr(objE, mname, _), args, line) =>
      val obj = eval(objE, env)
      val (pos, kw) = evalArgs(args, env)
      if (kw.nonEmpty) throw new PyLiteException(
        s"keyword arguments are not supported for method '$mname' in PyLite", line)
      callMethod(obj, mname, pos, line)
    case PCall(fnE, args, line) =>
      val f = eval(fnE, env)
      val (pos, kw) = evalArgs(args, env)
      callValueKw(f, pos, kw, line)
    case PLambda(params, body, _) => PyLambda(params, body, env)
    case PBin("and", l, r, _) => val lv = eval(l, env); if (!truthy(lv)) lv else eval(r, env)
    case PBin("or", l, r, _)  => val lv = eval(l, env); if (truthy(lv)) lv else eval(r, env)
    case PBin(op, l, r, line) => binOp(op, eval(l, env), eval(r, env), line)
    case PUn("not", x, _)     => java.lang.Boolean.valueOf(!truthy(eval(x, env)))
    case PUn("-", x, line) => eval(x, env) match {
      case l: java.lang.Long   =>
        if (l.longValue == Long.MinValue)
          throw new PyLiteException("integer overflow in unary - (PyLite ints are 64-bit, not bignum)", line)
        java.lang.Long.valueOf(-l.longValue)
      case d: java.lang.Double => java.lang.Double.valueOf(-d.doubleValue)
      case b: java.lang.Boolean => java.lang.Long.valueOf(if (b) -1L else 0L)
      case o => throw new PyLiteException(s"bad operand type for unary -: '${typeName(o)}'", line)
    }
    case PUn(op, _, line) => throw new PyLiteException(s"unknown unary op '$op'", line)
    case PCond(c, t, f, _) => if (truthy(eval(c, env))) eval(t, env) else eval(f, env)
    case PListComp(elem, vars, iterE, cond, line) =>
      val out = mutable.ArrayBuffer[Any]()
      comprehend(vars, iterE, cond, env, line)(() => out += eval(elem, env))
      out
    case PDictComp(k, v, vars, iterE, cond, line) =>
      val out = mutable.LinkedHashMap[Any, Any]()
      comprehend(vars, iterE, cond, env, line)(() =>
        out(hashableKey(eval(k, env), line)) = eval(v, env))
      out
  } }

  /** Shared comprehension loop. python 3 comprehensions have their own
    * scope: shadowed outer names are saved and restored around it. */
  private def comprehend(vars: Vector[String], iterE: PExpr, cond: Option[PExpr],
      env: Env, line: Int)(emit: () => Unit): Unit = {
    val saved = vars.map(v => v -> env.locals.get(v))
    try {
      iterate(eval(iterE, env), line).foreach { item =>
        tick(line)
        if (vars.length == 1) env.locals(vars.head) = item
        else item match {
          case buf: mutable.ArrayBuffer[Any @unchecked] if buf.length == vars.length =>
            vars.indices.foreach(i => env.locals(vars(i)) = buf(i))
          case _ => throw new PyLiteException(
            s"cannot unpack ${typeName(item)} into ${vars.length} names", line)
        }
        if (cond.forall(c => truthy(eval(c, env)))) emit()
      }
    } finally saved.foreach {
      case (v, Some(old)) => env.locals(v) = old
      case (v, None)      => env.locals.remove(v)
    }
  }

  // ---- operators --------------------------------------------------------

  private def binOp(op: String, l: Any, r: Any, line: Int): Any = op match {
    case "is"     => java.lang.Boolean.valueOf((l == null && r == null) || (l.asInstanceOf[AnyRef] eq r.asInstanceOf[AnyRef]))
    case "is not" => java.lang.Boolean.valueOf(!((l == null && r == null) || (l.asInstanceOf[AnyRef] eq r.asInstanceOf[AnyRef])))
    case "=="     => java.lang.Boolean.valueOf(pyEq(l, r))
    case "!="     => java.lang.Boolean.valueOf(!pyEq(l, r))
    case "in"     => java.lang.Boolean.valueOf(contains(r, l, line))
    case "not in" => java.lang.Boolean.valueOf(!contains(r, l, line))
    case "<" | ">" | "<=" | ">=" =>
      val c = pyCompare(l, r, line)
      java.lang.Boolean.valueOf(op match {
        case "<" => c < 0; case ">" => c > 0; case "<=" => c <= 0; case ">=" => c >= 0
      })
    case "+" => (l, r) match {
      case (a: String, b: String) => a + b
      case (a: mutable.ArrayBuffer[Any @unchecked], b: mutable.ArrayBuffer[Any @unchecked]) =>
        val out = mutable.ArrayBuffer[Any](); out ++= a; out ++= b; out
      case _ => numOp(op, l, r, line)
    }
    case "%" if l.isInstanceOf[String] =>
      PyFormat.percent(l.asInstanceOf[String], r, line)
    case "*" => (l, r) match {
      case (a: String, b: java.lang.Long) => repeatStr(a, b.longValue, line)
      case (a: java.lang.Long, b: String) => repeatStr(b, a.longValue, line)
      case (a: mutable.ArrayBuffer[Any @unchecked], b: java.lang.Long) =>
        // ticked per repetition so `[] * 10**18` hits the step budget
        // instead of spinning the executor outside it; size-capped so a
        // single repetition can't allocate past the budget either
        val n = math.max(0L, b.longValue)
        // n-first guard: the product could overflow Long for huge n
        if (n > maxSteps || n * math.max(1, a.length) > maxSteps)
          throw new PyBudgetExceeded(
            s"list repetition of $n x ${a.length} elements exceeds the step budget", line)
        val out = mutable.ArrayBuffer[Any]()
        (0L until n).foreach { _ => tick(line); out ++= a }
        out
      case _ => numOp(op, l, r, line)
    }
    case "-" | "/" | "//" | "%" | "**" => numOp(op, l, r, line)
    case _ => throw new PyLiteException(s"unknown operator '$op'", line)
  }

  /** String repetition with loud bounds: counts past Int range must not
    * silently wrap through .toInt ("x" * 2^32 returned ""), and a
    * single repetition can't allocate an unbudgeted multi-GB string
    * (CPython raises OverflowError/MemoryError for both). */
  private def repeatStr(s: String, n0: Long, line: Int): String = {
    val n = math.max(0L, n0)
    val MaxChars = 1L << 28 // 256M chars ~ 512MB — far past any row value
    if (n > MaxChars || n * math.max(1, s.length) > MaxChars)
      throw new PyLiteException(
        s"string repetition of $n x ${s.length} chars is too large", line)
    s * n.toInt
  }

  private def asNum(v: Any, op: String, line: Int): Either[Long, Double] = v match {
    case l: java.lang.Long    => Left(l.longValue)
    case d: java.lang.Double  => Right(d.doubleValue)
    case b: java.lang.Boolean => Left(if (b) 1L else 0L)
    case o => throw new PyLiteException(
      s"unsupported operand type for $op: '${typeName(o)}'", line)
  }

  private def numOp(op: String, l: Any, r: Any, line: Int): Any =
    try {
      // fast path: both ints (the overwhelmingly common case in row
      // code) — no Either boxing, no tuple
      (l, r) match {
        case (a: java.lang.Long, b: java.lang.Long) => intOp(op, a.longValue, b.longValue, line)
        case _ => numOp0(op, l, r, line)
      }
    } catch { case _: ArithmeticException =>
      throw new PyLiteException(s"integer overflow in '$op' (PyLite ints are 64-bit, not bignum)", line) }

  private def intOp(op: String, a: Long, b: Long, line: Int): Any = {
    def zero(z: Boolean) = if (z) throw new PyLiteException("division by zero", line)
    op match {
      case "+"  => java.lang.Long.valueOf(Math.addExact(a, b))
      case "-"  => java.lang.Long.valueOf(Math.subtractExact(a, b))
      case "*"  => java.lang.Long.valueOf(Math.multiplyExact(a, b))
      case "/"  => zero(b == 0); java.lang.Double.valueOf(a.toDouble / b.toDouble)
      case "//" => zero(b == 0); java.lang.Long.valueOf(Math.floorDiv(a, b))
      case "%"  => zero(b == 0); java.lang.Long.valueOf(Math.floorMod(a, b))
      case "**" =>
        if (b < 0) java.lang.Double.valueOf(math.pow(a.toDouble, b.toDouble))
        else {
          // ticked: a base of -1/0/1 never overflows, so without the
          // budget a huge exponent would spin the executor forever
          var acc = 1L; var i = 0L
          while (i < b) { tick(line); acc = Math.multiplyExact(acc, a); i += 1 }
          java.lang.Long.valueOf(acc)
        }
      case other => throw new PyLiteException(s"unknown operator '$other'", line)
    }
  }

  private def numOp0(op: String, l: Any, r: Any, line: Int): Any = {
    val (ln, rn) = (asNum(l, op, line), asNum(r, op, line))
    def zero(b: Boolean) = if (b) throw new PyLiteException("division by zero", line)
    (ln, rn) match {
      case (Left(a), Left(b)) => intOp(op, a, b, line) // one int path, one budget
      case _ =>
        val a = ln.fold(_.toDouble, identity)
        val b = rn.fold(_.toDouble, identity)
        op match {
          case "+"  => java.lang.Double.valueOf(a + b)
          case "-"  => java.lang.Double.valueOf(a - b)
          case "*"  => java.lang.Double.valueOf(a * b)
          case "/"  => zero(b == 0.0); java.lang.Double.valueOf(a / b)
          case "//" => zero(b == 0.0); java.lang.Double.valueOf(math.floor(a / b))
          case "%"  => zero(b == 0.0); java.lang.Double.valueOf(((a % b) + b) % b)
          case "**" => java.lang.Double.valueOf(math.pow(a, b))
        }
    }
  }

  private def contains(container: Any, item: Any, line: Int): Boolean = container match {
    case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
      // pure hash lookup: hashableKey canonicalizes True->1 and
      // integral floats->int, so python's cross-type key equality
      // (d[1] == d[1.0] == d[True]) holds without a linear scan
      m.contains(hashableKey(item, line))
    case r: PyRange => item match {
      case l: java.lang.Long => r.containsValue(l.longValue)
      case d: java.lang.Double => d.doubleValue == math.rint(d.doubleValue) && r.containsValue(d.longValue)
      case _ => false
    }
    case b: mutable.ArrayBuffer[Any @unchecked] => b.exists(pyEq(_, item))
    case s: String => item match {
      case sub: String => s.contains(sub)
      case o => throw new PyLiteException(s"'in <string>' requires string, not ${typeName(o)}", line)
    }
    case o => throw new PyLiteException(s"argument of type '${typeName(o)}' is not iterable", line)
  }

  private def iterate(v: Any, line: Int): Iterable[Any] = v match {
    case b: mutable.ArrayBuffer[Any @unchecked] =>
      // by-INDEX iteration over the live buffer, python's rule: a loop
      // body may append (sees new items) or pop (skips) — Scala's
      // checked iterator would instead leak ConcurrentModificationEx
      new Iterable[Any] {
        def iterator: Iterator[Any] = new Iterator[Any] {
          private var i = 0
          def hasNext: Boolean = i < b.length
          def next(): Any = { tick(line); val x = b(i); i += 1; x }
        }
      }
    case r: PyRange =>
      // ticking in next() keeps list(range(10**9)) and friends under
      // the budget even outside a for-loop
      new Iterable[Any] {
        def iterator: Iterator[Any] = new Iterator[Any] {
          private var i = r.start
          def hasNext: Boolean = if (r.step > 0) i < r.stop else i > r.stop
          def next(): Any = { tick(line); val x = i; i += r.step; java.lang.Long.valueOf(x) }
        }
      }
    case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => m.keys.toVector
    case s: String =>
      // by codepoint, like python — never yields surrogate halves
      s.codePoints().toArray.toIndexedSeq.map(cp => new String(Character.toChars(cp)))
    case o => throw new PyLiteException(s"'${typeName(o)}' object is not iterable", line)
  }

  // ---- codepoint-correct string helpers ---------------------------------
  // CPython counts CHARACTERS (codepoints): len("🙂") == 1, "🙂"[0] is the
  // whole emoji. Java Strings are UTF-16, so every length/index/slice on a
  // string goes through these instead of charAt/substring, which would
  // count astral-plane characters as 2 and split surrogate pairs.

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  private def cpSubstring(s: String, from: Int, until: Int): String = {
    val a = s.offsetByCodePoints(0, from)
    val b = s.offsetByCodePoints(a, math.max(0, until - from))
    s.substring(a, b)
  }

  private def cpAt(s: String, i: Int): String = {
    val a = s.offsetByCodePoints(0, i)
    new String(Character.toChars(s.codePointAt(a)))
  }

  // ---- subscripts and slices --------------------------------------------

  private def normIndex(i: Long, len: Int, line: Int, what: String): Int = {
    val j = if (i < 0) i + len else i
    if (j < 0 || j >= len) throw new PyLiteException(s"$what index out of range", line)
    j.toInt
  }

  private def getItem(o: Any, k: Any, line: Int): Any = o match {
    case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
      val kk = hashableKey(k, line)
      m.getOrElse(kk, throw new PyLiteException(s"KeyError: ${pyRepr(kk)}", line))
    case b: mutable.ArrayBuffer[Any @unchecked] => k match {
      case i: java.lang.Long => b(normIndex(i, b.length, line, "list"))
      case o2 => throw new PyLiteException(s"list indices must be integers, not ${typeName(o2)}", line)
    }
    case s: String => k match {
      case i: java.lang.Long => cpAt(s, normIndex(i, cpLen(s), line, "string"))
      case o2 => throw new PyLiteException(s"string indices must be integers, not ${typeName(o2)}", line)
    }
    case r: PyRange => k match {
      case i: java.lang.Long =>
        val len = r.length
        val j = if (i < 0) i + len else i.longValue
        if (j < 0 || j >= len) throw new PyLiteException("range object index out of range", line)
        java.lang.Long.valueOf(r.start + j * r.step)
      case o2 => throw new PyLiteException(s"range indices must be integers, not ${typeName(o2)}", line)
    }
    case null => throw new PyLiteException("'NoneType' object is not subscriptable", line)
    case o2   => throw new PyLiteException(s"'${typeName(o2)}' object is not subscriptable", line)
  }

  private def setItem(o: Any, k: Any, v: Any, line: Int): Unit = o match {
    case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => m(hashableKey(k, line)) = v
    case b: mutable.ArrayBuffer[Any @unchecked] => k match {
      case i: java.lang.Long => b(normIndex(i, b.length, line, "list")) = v
      case o2 => throw new PyLiteException(s"list indices must be integers, not ${typeName(o2)}", line)
    }
    case o2 => throw new PyLiteException(s"'${typeName(o2)}' object does not support item assignment", line)
  }

  private def slice(o: Any, lo: Option[Any], hi: Option[Any], line: Int): Any = {
    def bound(v: Option[Any], dflt: Int, len: Int): Int = v match {
      case None => dflt
      case Some(i: java.lang.Long) =>
        val j: Long = if (i < 0) i + len else i.longValue
        math.max(0L, math.min(len.toLong, j)).toInt
      case Some(x) => throw new PyLiteException(s"slice indices must be integers, not ${typeName(x)}", line)
    }
    o match {
      case b: mutable.ArrayBuffer[Any @unchecked] =>
        val s = bound(lo, 0, b.length); val e = bound(hi, b.length, b.length)
        mutable.ArrayBuffer[Any](b.slice(s, math.max(s, e)).toSeq: _*)
      case s: String =>
        val n = cpLen(s)
        val st = bound(lo, 0, n); val e = bound(hi, n, n)
        cpSubstring(s, st, math.max(st, e))
      case x => throw new PyLiteException(s"'${typeName(x)}' object is not sliceable", line)
    }
  }

  // dict keys must be hashable-by-value: reject mutable containers.
  // Numeric keys canonicalize to Long when integral — python hashes
  // 1, 1.0 and True identically, so d[1.0] must find d's key 1.
  private def hashableKey(k: Any, line: Int): Any = k match {
    case _: mutable.ArrayBuffer[Any @unchecked] | _: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
      throw new PyLiteException(s"unhashable type: '${typeName(k)}'", line)
    case b: java.lang.Boolean => java.lang.Long.valueOf(if (b) 1L else 0L)
    case d: java.lang.Double
        if d.doubleValue == math.rint(d.doubleValue) && math.abs(d.doubleValue) < 9.2e18 =>
      java.lang.Long.valueOf(d.longValue)
    case other => other
  }

  // ---- builtins ---------------------------------------------------------

  private def builtinOrType(n: String): Option[Any] = n match {
    // type names are PyType so they work both as isinstance() args and
    // as constructors (callValue dispatches PyType through callBuiltin)
    case "str" | "int" | "float" | "bool" | "list" | "dict" | "tuple" => Some(PyType(n))
    case "len" | "isinstance" | "range" | "abs" | "min" | "max" | "sum" |
         "sorted" | "round" | "enumerate" | "zip" | "type" | "repr" => Some(PyBuiltin(n))
    case _ => None
  }

  private def callTypeCtor(t: PyType, args: Vector[Any], line: Int): Any =
    callBuiltin(t.name, args, line)

  private def arity(name: String, args: Vector[Any], n: Int, line: Int): Unit =
    if (args.length != n)
      throw new PyLiteException(s"$name() takes $n argument(s) but ${args.length} were given", line)

  private def callBuiltin(name: String, args: Vector[Any], line: Int): Any = name match {
    case "len" =>
      arity("len", args, 1, line)
      args.head match {
        case s: String => java.lang.Long.valueOf(cpLen(s).toLong)
        case b: Array[Byte] => java.lang.Long.valueOf(b.length.toLong)
        case b: mutable.ArrayBuffer[Any @unchecked] => java.lang.Long.valueOf(b.length.toLong)
        case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => java.lang.Long.valueOf(m.size.toLong)
        case r: PyRange => java.lang.Long.valueOf(r.length)
        case o => throw new PyLiteException(s"object of type '${typeName(o)}' has no len()", line)
      }
    case "str" =>
      if (args.isEmpty) "" else { arity("str", args, 1, line); pyStr(args.head) }
    case "repr" => arity("repr", args, 1, line); pyRepr(args.head)
    case "int" => arity("int", args, 1, line); args.head match {
      case l: java.lang.Long    => l
      case d: java.lang.Double  =>
        if (d.isNaN || d.isInfinite || d > Long.MaxValue.toDouble || d < Long.MinValue.toDouble)
          throw new PyLiteException(s"cannot convert $d to int", line)
        java.lang.Long.valueOf(d.longValue) // truncation toward zero, as python
      case b: java.lang.Boolean => java.lang.Long.valueOf(if (b) 1L else 0L)
      case s: String =>
        try java.lang.Long.valueOf(java.lang.Long.parseLong(s.trim))
        catch { case _: NumberFormatException =>
          throw new PyLiteException(s"invalid literal for int(): ${pyRepr(s)}", line) }
      case o => throw new PyLiteException(s"int() argument must be a string or number, not '${typeName(o)}'", line)
    }
    case "float" => arity("float", args, 1, line); args.head match {
      case l: java.lang.Long    => java.lang.Double.valueOf(l.doubleValue)
      case d: java.lang.Double  => d
      case b: java.lang.Boolean => java.lang.Double.valueOf(if (b) 1.0 else 0.0)
      case s: String =>
        // java's parseDouble accepts "1.5d"/"0x1.8p1"/"Infinity" —
        // validate against PYTHON's float grammar first (inf/infinity/
        // nan are python-legal, case-insensitive)
        val t = s.trim
        val lower = t.toLowerCase(java.util.Locale.ROOT)
        val pyFloat = "[+-]?(\\d+\\.?\\d*([eE][+-]?\\d+)?|\\.\\d+([eE][+-]?\\d+)?|inf|infinity|nan)"
        if (!lower.matches(pyFloat))
          throw new PyLiteException(s"could not convert string to float: ${pyRepr(s)}", line)
        val norm =
          if (lower.endsWith("inf") || lower.endsWith("infinity"))
            if (lower.startsWith("-")) "-Infinity" else "Infinity"
          else if (lower.endsWith("nan")) "NaN"
          else t
        try java.lang.Double.valueOf(java.lang.Double.parseDouble(norm))
        catch { case _: NumberFormatException =>
          throw new PyLiteException(s"could not convert string to float: ${pyRepr(s)}", line) }
      case o => throw new PyLiteException(s"float() argument must be a string or number, not '${typeName(o)}'", line)
    }
    case "bool" =>
      if (args.isEmpty) java.lang.Boolean.FALSE
      else { arity("bool", args, 1, line); java.lang.Boolean.valueOf(truthy(args.head)) }
    case "isinstance" =>
      arity("isinstance", args, 2, line)
      val types: Vector[String] = args(1) match {
        case t: PyType => Vector(t.name)
        case b: mutable.ArrayBuffer[Any @unchecked] => b.toVector.map {
          case t: PyType => t.name
          case o => throw new PyLiteException(s"isinstance() arg 2 must be a type, not ${typeName(o)}", line)
        }
        case o => throw new PyLiteException(s"isinstance() arg 2 must be a type, not ${typeName(o)}", line)
      }
      java.lang.Boolean.valueOf(types.exists(isInstance(args.head, _)))
    case "range" =>
      // LAZY, like python's range object: materializing eagerly would
      // OOM the executor on range(10**8) before the step budget could
      // fail it; consumers tick per element through iterate()
      args match {
        case Vector(a: java.lang.Long) => PyRange(0L, a.longValue, 1L)
        case Vector(a: java.lang.Long, b: java.lang.Long) => PyRange(a.longValue, b.longValue, 1L)
        case Vector(a: java.lang.Long, b: java.lang.Long, c: java.lang.Long) =>
          if (c.longValue == 0) throw new PyLiteException("range() arg 3 must not be zero", line)
          PyRange(a.longValue, b.longValue, c.longValue)
        case _ => throw new PyLiteException("range() expects 1-3 integer arguments", line)
      }
    case "list" =>
      if (args.isEmpty) mutable.ArrayBuffer[Any]()
      else { arity("list", args, 1, line)
        mutable.ArrayBuffer[Any](iterate(args.head, line).toSeq: _*) }
    case "tuple" =>
      if (args.isEmpty) mutable.ArrayBuffer[Any]()
      else { arity("tuple", args, 1, line)
        mutable.ArrayBuffer[Any](iterate(args.head, line).toSeq: _*) }
    case "dict" =>
      if (args.isEmpty) mutable.LinkedHashMap[Any, Any]()
      else { arity("dict", args, 1, line)
        args.head match {
          case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
            val out = mutable.LinkedHashMap[Any, Any](); out ++= m; out
          case o => throw new PyLiteException(s"dict() argument must be a dict, not ${typeName(o)}", line)
        } }
    case "abs" => arity("abs", args, 1, line); args.head match {
      case l: java.lang.Long   =>
        if (l.longValue == Long.MinValue)
          throw new PyLiteException("integer overflow in abs()", line)
        java.lang.Long.valueOf(Math.abs(l.longValue))
      case d: java.lang.Double => java.lang.Double.valueOf(math.abs(d.doubleValue))
      case o => throw new PyLiteException(s"bad operand type for abs(): '${typeName(o)}'", line)
    }
    case "round" => args match {
      case Vector(d: java.lang.Double) =>
        java.lang.Long.valueOf(math.rint(d.doubleValue).toLong) // banker's rounding, as python
      case Vector(l: java.lang.Long) => l
      case Vector(b: java.lang.Boolean) => // bool subclasses int: round(True) == 1
        java.lang.Long.valueOf(if (b) 1L else 0L)
      case Vector(l: java.lang.Long, nd: java.lang.Long) =>
        // round(int, nd): identity for nd >= 0; NEGATIVE nd rounds to
        // tens/hundreds with banker's rounding (round(25,-1) == 20).
        // Clamped: any nd <= -20 zeroes every 64-bit value anyway
        java.lang.Long.valueOf(new java.math.BigDecimal(l.longValue)
          .setScale(math.max(-30L, math.min(0L, nd.longValue)).toInt,
            java.math.RoundingMode.HALF_EVEN)
          .longValueExact())
      case Vector(d: java.lang.Double, nd: java.lang.Long) =>
        // CPython rounds the EXACT binary value half-to-even at the
        // requested decimal place (round(2.675, 2) == 2.67 because
        // 2.675 is really 2.67499...); multiply-rint-divide gets that
        // wrong whenever the scaling multiplication rounds up
        if (d.isNaN || d.isInfinite) d
        else java.lang.Double.valueOf(
          new java.math.BigDecimal(d.doubleValue)
            .setScale(nd.intValue, java.math.RoundingMode.HALF_EVEN).doubleValue)
      case _ => throw new PyLiteException("round() expects (number[, ndigits])", line)
    }
    case "min" | "max" =>
      // single implementation: the keyword-aware path with no kwargs
      callBuiltinKw(name, args, Vector.empty, line)
    case "sum" =>
      arity("sum", args, 1, line)
      iterate(args.head, line).foldLeft(java.lang.Long.valueOf(0L): Any)((a, b) => numOp("+", a, b, line))
    case "sorted" =>
      // single implementation: the keyword-aware path with no kwargs
      callBuiltinKw("sorted", args, Vector.empty, line)
    case "enumerate" =>
      arity("enumerate", args, 1, line)
      val out = mutable.ArrayBuffer[Any]()
      iterate(args.head, line).zipWithIndex.foreach { case (v, i) =>
        out += mutable.ArrayBuffer[Any](java.lang.Long.valueOf(i.toLong), v)
      }
      out
    case "zip" =>
      val its = args.map(iterate(_, line).toVector)
      val out = mutable.ArrayBuffer[Any]()
      if (its.nonEmpty) {
        val m = its.map(_.length).min
        (0 until m).foreach(i => out += mutable.ArrayBuffer[Any](its.map(_(i)): _*))
      }
      out
    case "type" => arity("type", args, 1, line); PyType(typeName(args.head))
    case other => throw new PyLiteException(s"builtin '$other' not implemented in PyLite", line)
  }

  private def isInstance(v: Any, tname: String): Boolean = (v, tname) match {
    case (_: java.lang.Boolean, "bool")  => true
    case (_: java.lang.Boolean, "int")   => true // python: bool subclasses int
    case (_: java.lang.Long, "int")      => true
    case (_: java.lang.Double, "float")  => true
    case (_: String, "str")              => true
    case (_: mutable.ArrayBuffer[Any @unchecked], "list")  => true
    case (_: mutable.ArrayBuffer[Any @unchecked], "tuple") => false // lists model both; prefer list
    case (_: mutable.LinkedHashMap[Any @unchecked, Any @unchecked], "dict") => true
    case _ => false
  }

  // ---- methods ----------------------------------------------------------

  private def callMethod(obj: Any, name: String, args: Vector[Any], line: Int): Any = {
    def arityM(n: Int*): Unit =
      if (!n.contains(args.length))
        throw new PyLiteException(s"$name() takes ${n.mkString(" or ")} argument(s) but ${args.length} were given", line)
    obj match {
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => name match {
        case "items" =>
          arityM(0)
          val out = mutable.ArrayBuffer[Any]()
          m.foreach { case (k, v) => out += mutable.ArrayBuffer[Any](k, v) }
          out
        case "keys"   => arityM(0); mutable.ArrayBuffer[Any](m.keys.toSeq: _*)
        case "values" => arityM(0); mutable.ArrayBuffer[Any](m.values.toSeq: _*)
        case "get" =>
          arityM(1, 2)
          m.getOrElse(hashableKey(args.head, line), if (args.length == 2) args(1) else null)
        case "pop" =>
          arityM(1, 2)
          val k = hashableKey(args.head, line)
          m.remove(k).getOrElse {
            if (args.length == 2) args(1)
            else throw new PyLiteException(s"KeyError: ${pyRepr(k)}", line)
          }
        case "update" =>
          arityM(1)
          args.head match {
            case o: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => m ++= o; null
            case o => throw new PyLiteException(s"update() argument must be a dict, not ${typeName(o)}", line)
          }
        case "setdefault" =>
          arityM(1, 2)
          val k = hashableKey(args.head, line)
          m.getOrElseUpdate(k, if (args.length == 2) args(1) else null)
        case other => throw new PyLiteException(s"'dict' object has no method '$other'", line)
      }
      case b: mutable.ArrayBuffer[Any @unchecked] => name match {
        case "append" => arityM(1); b += args.head; null
        case "extend" =>
          // materialized first: `b.extend(b)` over the live by-index
          // view would grow the buffer as fast as it is consumed and
          // spin to the step budget instead of doubling like CPython
          arityM(1); b ++= iterate(args.head, line).toVector; null
        case "insert" => arityM(2)
          val i = args.head match {
            case l: java.lang.Long => math.max(0, math.min(b.length.toLong, if (l < 0) l + b.length else l.longValue)).toInt
            case o => throw new PyLiteException(s"insert() index must be int, not ${typeName(o)}", line)
          }
          b.insert(i, args(1)); null
        case "pop" =>
          arityM(0, 1)
          if (b.isEmpty) throw new PyLiteException("pop from empty list", line)
          val i = if (args.isEmpty) b.length - 1 else args.head match {
            case l: java.lang.Long => normIndex(l, b.length, line, "list")
            case o => throw new PyLiteException(s"pop() index must be int, not ${typeName(o)}", line)
          }
          b.remove(i)
        case "index" =>
          arityM(1)
          val i = b.indexWhere(pyEq(_, args.head))
          if (i < 0) throw new PyLiteException(s"${pyRepr(args.head)} is not in list", line)
          java.lang.Long.valueOf(i.toLong)
        case "count" => arityM(1); java.lang.Long.valueOf(b.count(pyEq(_, args.head)).toLong)
        case "sort" =>
          arityM(0)
          val s = b.toVector.sortWith((x, y) => pyCompare(x, y, line) < 0)
          b.clear(); b ++= s; null
        case "reverse" => arityM(0); val s = b.toVector.reverse; b.clear(); b ++= s; null
        case "remove" =>
          arityM(1)
          val i = b.indexWhere(pyEq(_, args.head))
          if (i < 0) throw new PyLiteException(s"list.remove(x): x not in list", line)
          b.remove(i); null
        case other => throw new PyLiteException(s"'list' object has no method '$other'", line)
      }
      case s: String => name match {
        case "split" => args match {
          case Vector() =>
            // no-arg split: whitespace runs, empties discarded (python semantics)
            mutable.ArrayBuffer[Any](s.split("\\s+").filter(_.nonEmpty).toIndexedSeq: _*)
          case Vector(sep: String) =>
            if (sep.isEmpty) throw new PyLiteException("empty separator", line)
            mutable.ArrayBuffer[Any](splitLiteral(s, sep): _*)
          case Vector(sep: String, max: java.lang.Long) =>
            if (sep.isEmpty) throw new PyLiteException("empty separator", line)
            val parts = splitLiteral(s, sep)
            val m = max.intValue
            if (m < 0 || m >= parts.length - 1) mutable.ArrayBuffer[Any](parts: _*)
            else mutable.ArrayBuffer[Any](
              (parts.take(m) :+ parts.drop(m).mkString(sep)): _*)
          case _ => throw new PyLiteException("split() takes (sep[, maxsplit]) in PyLite", line)
        }
        case "strip"  => arityM(0, 1); stripStr(s, args, both = true, left = true, right = true, line)
        case "lstrip" => arityM(0, 1); stripStr(s, args, both = false, left = true, right = false, line)
        case "rstrip" => arityM(0, 1); stripStr(s, args, both = false, left = false, right = true, line)
        case "lower" => arityM(0); s.toLowerCase(java.util.Locale.ROOT)
        case "upper" => arityM(0); s.toUpperCase(java.util.Locale.ROOT)
        case "title" => arityM(0)
          val sb = new StringBuilder; var prevAlpha = false
          s.foreach { c =>
            if (c.isLetter) { sb += (if (prevAlpha) c.toLower else c.toUpper); prevAlpha = true }
            else { sb += c; prevAlpha = false }
          }
          sb.toString
        case "capitalize" => arityM(0)
          if (s.isEmpty) s else s.head.toUpper.toString + s.tail.toLowerCase(java.util.Locale.ROOT)
        case "replace" => arityM(2); (args(0), args(1)) match {
          case (a: String, b2: String) => s.replace(a, b2)
          case _ => throw new PyLiteException("replace() arguments must be strings", line)
        }
        case "startswith" => arityM(1); args.head match {
          case p: String => java.lang.Boolean.valueOf(s.startsWith(p))
          case o => throw new PyLiteException(s"startswith() argument must be str, not ${typeName(o)}", line)
        }
        case "endswith" => arityM(1); args.head match {
          case p: String => java.lang.Boolean.valueOf(s.endsWith(p))
          case o => throw new PyLiteException(s"endswith() argument must be str, not ${typeName(o)}", line)
        }
        case "find" => arityM(1); args.head match {
          case p: String =>
            // python reports a CHARACTER index, not a UTF-16 offset
            val i = s.indexOf(p)
            java.lang.Long.valueOf(if (i < 0) -1L else s.codePointCount(0, i).toLong)
          case o => throw new PyLiteException(s"find() argument must be str, not ${typeName(o)}", line)
        }
        case "count" => arityM(1); args.head match {
          case p: String =>
            if (p.isEmpty) java.lang.Long.valueOf((cpLen(s) + 1).toLong)
            else {
              var c = 0L; var i = s.indexOf(p)
              while (i >= 0) { c += 1; i = s.indexOf(p, i + p.length) }
              java.lang.Long.valueOf(c)
            }
          case o => throw new PyLiteException(s"count() argument must be str, not ${typeName(o)}", line)
        }
        case "join" => arityM(1)
          val parts = iterate(args.head, line).map {
            case p: String => p
            case o => throw new PyLiteException(s"sequence item: expected str, got ${typeName(o)}", line)
          }
          parts.mkString(s)
        case "zfill" => arityM(1); args.head match {
          case w: java.lang.Long =>
            val pad = w.toInt - cpLen(s)
            if (pad <= 0) s
            else if (s.startsWith("-") || s.startsWith("+")) s.head.toString + ("0" * pad) + s.tail
            else ("0" * pad) + s
          case o => throw new PyLiteException(s"zfill() argument must be int, not ${typeName(o)}", line)
        }
        case "isdigit" => arityM(0); java.lang.Boolean.valueOf(s.nonEmpty && s.forall(_.isDigit))
        case "isalpha" => arityM(0); java.lang.Boolean.valueOf(s.nonEmpty && s.forall(_.isLetter))
        case "format" => PyFormat.format(s, args.toIndexedSeq, line)
        case "encode" =>
          arityM(0, 1)
          args.headOption.foreach {
            case enc: String if enc.toLowerCase(java.util.Locale.ROOT).replace("-", "") == "utf8" => ()
            case enc => throw new PyLiteException(s"encode(): only utf-8 is supported, got ${pyRepr(enc)}", line)
          }
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case other => throw new PyLiteException(s"'str' object has no method '$other'", line)
      }
      case PyModule("hashlib") => name match {
        // hashlib.sha1(data).hexdigest() — the cbio playbook's allele-id
        // pattern; CPython requires bytes input and so do we
        case "md5" | "sha1" | "sha256" | "sha512" | "sha224" | "sha384" =>
          arityM(0, 1)
          val h = PyHash(name)
          args.headOption.foreach {
            case b: Array[Byte] => h.update(b)
            case o => throw new PyLiteException(
              s"hashlib.$name() requires bytes (call .encode() on the string), got ${typeName(o)}", line)
          }
          h
        case other => throw new PyLiteException(s"hashlib has no attribute '$other'", line)
      }
      case h: PyHash => name match {
        case "hexdigest" => arityM(0); h.hexdigest
        case "digest"    => arityM(0); h.digestBytes
        case "update" =>
          arityM(1)
          args.head match {
            case b: Array[Byte] => h.update(b); null
            case o => throw new PyLiteException(s"update() requires bytes, got ${typeName(o)}", line)
          }
        case other => throw new PyLiteException(s"hash object has no method '$other'", line)
      }
      case null => throw new PyLiteException(s"'NoneType' object has no method '$name'", line)
      case o    => throw new PyLiteException(s"'${typeName(o)}' object has no method '$name'", line)
    }
  }

  private def splitLiteral(s: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var j = s.indexOf(sep)
    while (j >= 0) { out += s.substring(i, j); i = j + sep.length; j = s.indexOf(sep, i) }
    out += s.substring(i)
    out.result()
  }

  private def stripStr(s: String, args: Vector[Any], both: Boolean, left: Boolean, right: Boolean, line: Int): String = {
    val chars: Char => Boolean = args match {
      case Vector()          => _.isWhitespace
      case Vector(c: String) => c.toSet
      case _ => throw new PyLiteException("strip() argument must be a string", line)
    }
    var a = 0
    var b = s.length
    if (left) while (a < b && chars(s.charAt(a))) a += 1
    if (right) while (b > a && chars(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }
}

object PyInterp {
  import scala.collection.mutable

  final case class PyFunc(fd: PFuncDef)
  /** Lambda value: AST body + the live defining env (closure; typed
    * AnyRef because Env is interpreter-private — cast at the call). */
  final case class PyLambda(params: Vector[String], body: PExpr, defEnv: AnyRef)
  final case class PyBuiltin(name: String)
  final case class PyType(name: String)
  final case class PyModule(name: String)

  /** Lazy integer sequence, python's `range` object: O(1) memory, O(1)
    * len/membership/indexing; iteration ticks the step budget. */
  final case class PyRange(start: Long, stop: Long, step: Long) {
    def length: Long =
      if (step > 0) math.max(0L, (stop - start + step - 1) / step)
      else math.max(0L, (start - stop - step - 1) / (-step))
    def containsValue(v: Long): Boolean =
      length > 0 && (v - start) % step == 0 && {
        val k = (v - start) / step
        k >= 0 && k < length
      }
  }

  /** hashlib digest object (md5/sha1/sha256/...): thin wrapper over
    * java.security.MessageDigest with CPython's hexdigest contract —
    * digest() does not consume the accumulated state. */
  final class PyHash(algo: String) {
    private val md = java.security.MessageDigest.getInstance(algo match {
      case "md5" => "MD5"; case "sha1" => "SHA-1"; case "sha224" => "SHA-224"
      case "sha256" => "SHA-256"; case "sha384" => "SHA-384"; case "sha512" => "SHA-512"
    })
    def update(b: Array[Byte]): Unit = md.update(b)
    def digestBytes: Array[Byte] = md.clone().asInstanceOf[java.security.MessageDigest].digest()
    def hexdigest: String = digestBytes.map(b => f"$b%02x").mkString
  }
  object PyHash { def apply(algo: String): PyHash = new PyHash(algo) }

  // Control-flow signals: no stack traces captured (hot path).
  private final class ReturnEx(val value: Any) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private object BreakEx extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private object ContinueEx extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  def truthy(v: Any): Boolean = v match {
    case null                 => false
    case b: java.lang.Boolean => b.booleanValue
    case l: java.lang.Long    => l.longValue != 0L
    case d: java.lang.Double  => d.doubleValue != 0.0
    case s: String            => s.nonEmpty
    case b: Array[Byte]       => b.nonEmpty
    case b: mutable.ArrayBuffer[Any @unchecked] => b.nonEmpty
    case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => m.nonEmpty
    case r: PyRange => r.length > 0 // bool(range(0)) is False in CPython
    case _ => true
  }

  def pyEq(l: Any, r: Any): Boolean = pyEq0(l, r, 0)

  private def pyEq0(l: Any, r: Any, depth: Int): Boolean = {
    if (depth > 200)
      throw new PyLiteException("maximum recursion depth exceeded in comparison (cyclic container?)", 1)
    pyEq1(l, r, depth)
  }

  // canonical dict-key form, mirroring hashableKey (True == 1 == 1.0)
  private def canonKey(k: Any): Any = k match {
    case b: java.lang.Boolean => java.lang.Long.valueOf(if (b) 1L else 0L)
    case d: java.lang.Double
        if d.doubleValue == math.rint(d.doubleValue) && math.abs(d.doubleValue) < 9.2e18 =>
      java.lang.Long.valueOf(d.longValue)
    case other => other
  }

  private def pyEq1(l: Any, r: Any, depth: Int): Boolean = (l, r) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    // identity fast path, CPython's PyObject_RichCompareBool rule:
    // makes x == x on a cyclic container True instead of recursing
    case (a: AnyRef, b: AnyRef) if (a eq b) &&
        (a.isInstanceOf[mutable.ArrayBuffer[_]] || a.isInstanceOf[mutable.LinkedHashMap[_, _]]) => true
    case (a: java.lang.Boolean, b: java.lang.Boolean) => a.booleanValue == b.booleanValue
    case (a: java.lang.Boolean, b) => pyEq0(java.lang.Long.valueOf(if (a) 1L else 0L), b, depth + 1)
    case (a, b: java.lang.Boolean) => pyEq0(a, java.lang.Long.valueOf(if (b) 1L else 0L), depth + 1)
    case (a: java.lang.Long, b: java.lang.Long)     => a.longValue == b.longValue
    case (a: java.lang.Long, b: java.lang.Double)   => a.doubleValue == b.doubleValue
    case (a: java.lang.Double, b: java.lang.Long)   => a.doubleValue == b.doubleValue
    case (a: java.lang.Double, b: java.lang.Double) => a.doubleValue == b.doubleValue
    case (a: String, b: String) => a == b
    case (a: mutable.ArrayBuffer[Any @unchecked], b: mutable.ArrayBuffer[Any @unchecked]) =>
      a.length == b.length && a.indices.forall(i => pyEq0(a(i), b(i), depth + 1))
    case (a: mutable.LinkedHashMap[Any @unchecked, Any @unchecked], b: mutable.LinkedHashMap[Any @unchecked, Any @unchecked]) =>
      a.size == b.size && a.forall { case (k, v) => b.get(canonKey(k)).exists(pyEq0(_, v, depth + 1)) }
    case (a: PyType, b: PyType) => a == b // type(x) == dict
    case _ => false
  }

  def pyCompare(l: Any, r: Any, line: Int): Int = pyCompare0(l, r, line, 0)

  private def pyCompare0(l: Any, r: Any, line: Int, depth: Int): Int = {
    if (depth > 200)
      throw new PyLiteException("maximum recursion depth exceeded in ordering comparison (cyclic container?)", line)
    pyCompare1(l, r, line, depth)
  }

  private def pyCompare1(l: Any, r: Any, line: Int, depth: Int): Int = (l, r) match {
    case (a: java.lang.Long, b: java.lang.Long)     => java.lang.Long.compare(a, b)
    case (a: java.lang.Long, b: java.lang.Double)   => java.lang.Double.compare(a.doubleValue, b)
    case (a: java.lang.Double, b: java.lang.Long)   => java.lang.Double.compare(a, b.doubleValue)
    case (a: java.lang.Double, b: java.lang.Double) => java.lang.Double.compare(a, b)
    case (a: java.lang.Boolean, b) => pyCompare0(java.lang.Long.valueOf(if (a) 1L else 0L), b, line, depth + 1)
    case (a, b: java.lang.Boolean) => pyCompare0(a, java.lang.Long.valueOf(if (b) 1L else 0L), line, depth + 1)
    case (a: String, b: String) => a.compareTo(b)
    case (a: mutable.ArrayBuffer[Any @unchecked], b: mutable.ArrayBuffer[Any @unchecked]) =>
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        // identity skip mirrors pyEq: shared/cyclic elements are equal
        if (!(a(i).asInstanceOf[AnyRef] eq b(i).asInstanceOf[AnyRef])) {
          val c = pyCompare0(a(i), b(i), line, depth + 1)
          if (c != 0) return c
        }
        i += 1
      }
      Integer.compare(a.length, b.length)
    case _ => throw new PyLiteException(
      s"'<' not supported between instances of '${typeName(l)}' and '${typeName(r)}'", line)
  }

  def typeName(v: Any): String = v match {
    case null                 => "NoneType"
    case _: java.lang.Boolean => "bool"
    case _: java.lang.Long    => "int"
    case _: java.lang.Double  => "float"
    case _: String            => "str"
    case _: mutable.ArrayBuffer[Any @unchecked] => "list"
    case _: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => "dict"
    case _: Array[Byte] => "bytes"
    case _: PyFunc | _: PyBuiltin | _: PyLambda => "function"
    case _: PyType   => "type"
    case _: PyModule => "module"
    case _: PyHash   => "hash"
    case _: PyRange  => "range"
    case o => o.getClass.getSimpleName
  }

  /** python str(): no quotes on top-level strings. */
  def pyStr(v: Any): String = v match {
    case null                 => "None"
    case b: java.lang.Boolean => if (b) "True" else "False"
    case l: java.lang.Long    => l.toString
    case d: java.lang.Double  => formatDouble(d)
    case s: String            => s
    case _ => pyRepr(v) // containers/bytes/others: repr form, as python
  }

  /** python repr(): strings quoted, containers rendered recursively.
    * Every runtime type has an explicit arm here or in the scalar set
    * below — the default delegates only to scalars, never back to
    * pyStr (a type missed by both would otherwise recurse forever).
    * Self-referential containers render as python's `[...]`/`{...}`
    * instead of overflowing the stack. */
  def pyRepr(v: Any): String = v match {
    // scalar fast path: no seen-set allocation on the hot per-row
    // paths ('%r', error messages) unless a container is involved
    case _: mutable.ArrayBuffer[Any @unchecked] | _: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
      pyRepr0(v, java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]()), 0)
    case other => pyRepr0(other, null, 0)
  }

  private def pyRepr0(v: Any, seen: java.util.Set[AnyRef], depth: Int): String = {
    // depth cap besides the cycle set: 100k DISTINCT nested lists are
    // acyclic but would still blow the JVM stack
    if (depth > 200)
      throw new PyLiteException("maximum recursion depth exceeded in repr (deeply nested container)", 1)
    v match {
    case s: String =>
      // CPython repr: prefer single quotes, switch to double when the
      // string contains ' but no "; escape backslash/active-quote and
      // control characters (a raw newline inside quotes is NOT repr)
      val q = if (s.contains('\'') && !s.contains('"')) '"' else '\''
      val sb = new StringBuilder
      sb += q
      s.foreach {
        case '\\' => sb ++= "\\\\"
        case c if c == q => sb += '\\'; sb += q
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < 0x20 || c == 0x7f => sb ++= f"\\x${c.toInt}%02x"
        case c => sb += c
      }
      sb += q
      sb.toString
    case b: mutable.ArrayBuffer[Any @unchecked] =>
      if (!seen.add(b)) "[...]"
      else try b.map(pyRepr0(_, seen, depth + 1)).mkString("[", ", ", "]") finally seen.remove(b)
    case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
      if (!seen.add(m)) "{...}"
      else try m.map { case (k, x) => s"${pyRepr0(k, seen, depth + 1)}: ${pyRepr0(x, seen, depth + 1)}" }
        .mkString("{", ", ", "}") finally seen.remove(m)
    case b: Array[Byte] =>
      "b'" + b.map(c => if (c >= 0x20 && c < 0x7f && c != '\'' && c != '\\') c.toChar.toString
                        else f"\\x$c%02x").mkString + "'"
    case r: PyRange =>
      if (r.step == 1) s"range(${r.start}, ${r.stop})"
      else s"range(${r.start}, ${r.stop}, ${r.step})"
    case null | _: java.lang.Boolean | _: java.lang.Long | _: java.lang.Double => pyStr(v)
    case other => s"<${typeName(other)}>"
  } }

  private def formatDouble(d: Double): String = {
    if (d.isNaN) "nan"
    else if (d.isInfinite) { if (d > 0) "inf" else "-inf" }
    else if (d == math.rint(d) && math.abs(d) < 1e16) {
      // python renders integral floats as "3.0"
      val l = d.toLong
      s"$l.0"
    } else {
      // java's shortest repr, re-zoned to python's thresholds: python
      // prints positionally for 1e-4 <= |x| < 1e16 (java switches to
      // E-notation at 1e7 / 1e-3) and pads exponents to 2 digits with
      // an explicit sign ('1.5e+20', '1e-05')
      val s = d.toString
      val ei = s.indexOf('E')
      if (ei < 0) s
      else {
        val exp = s.substring(ei + 1).toInt
        if (exp >= -4 && exp < 16)
          // stripTrailingZeros: java's "1.0E-4" mantissa would otherwise
          // leak its placeholder zero into "0.00010"
          new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
        else {
          var mant = s.substring(0, ei)
          if (mant.endsWith(".0")) mant = mant.dropRight(2)
          val ae = math.abs(exp)
          val digits = if (ae < 10) s"0$ae" else ae.toString
          s"${mant}e${if (exp < 0) "-" else "+"}$digits"
        }
      }
    }
  }
}
