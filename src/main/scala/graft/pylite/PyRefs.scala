package graft.pylite

/** Static analysis over a compiled PyLite program: which constant string
  * keys does `method` subscript on its FIRST parameter (the row), and
  * does the row ever ESCAPE that discipline?
  *
  * Used by [[PyOps]] to prune the operator's input columns to the keys
  * the user code can actually observe — the pruning reaches the parquet
  * scan (ReadSchema) and, for reduce, shrinks the pre-group shuffle.
  * Pruning is only legal when every mention of the row parameter is a
  * subscript with a constant string key (`row["k"]` read or write):
  * then the function's behavior is a pure function of those keys.
  * Anything else — `return row`, `row.keys()`, `row[k]` with a dynamic
  * key, aliasing, rebinding, iteration, passing `row` to a call —
  * makes the full row observable, and the analysis answers None
  * (= don't prune). Writes count as references too: a conditional
  * `row["a"] = 1` followed by a read must still see the INPUT value of
  * `a` on the not-written path.
  */
object PyRefs {

  /** Some(keys) = safe to prune the input to `keys`; None = the row
    * parameter escapes (or the method/param doesn't exist) — keep every
    * column. */
  def referencedKeys(prog: PProgram, method: String): Option[Set[String]] = {
    val fd = prog.stmts.collectFirst {
      case f: PFuncDef if f.name == method => f
    } match {
      case Some(f) if f.params.nonEmpty => f
      case _ => return None
    }
    val p = fd.params.head
    val keys = Set.newBuilder[String]
    var escaped = false

    def expr(e: PExpr): Unit = if (!escaped) e match {
      case PSub(PName(`p`, _), PStr(k, _), _) => keys += k
      case PSub(PName(`p`, _), _, _) => escaped = true // dynamic key
      case PSliceE(PName(`p`, _), _, _, _) => escaped = true
      case PName(`p`, _) => escaped = true // bare use: alias/return/call/iter
      case _: PNum | _: PFlt | _: PStr | _: PBoolLit | _: PNone | _: PName => ()
      case PListLit(items, _) => items.foreach(expr)
      case PTupleLit(items, _) => items.foreach(expr)
      case PDictLit(items, _) => items.foreach { case (k, v) => expr(k); expr(v) }
      case PSub(o, i, _) => expr(o); expr(i)
      case PSliceE(o, lo, hi, _) => expr(o); lo.foreach(expr); hi.foreach(expr)
      case PAttr(o, _, _) => expr(o) // row.method() hits the PName case
      case PCall(fn, args, _) => expr(fn); args.foreach(expr)
      case PBin(_, l, r, _) => expr(l); expr(r)
      case PUn(_, x, _) => expr(x)
      case PCond(c, t, f, _) => expr(c); expr(t); expr(f)
      case PListComp(el, vars, it, cond, _) =>
        if (vars.contains(p)) escaped = true // comprehension shadows the row
        else { expr(el); expr(it); cond.foreach(expr) }
      case PDictComp(k, v, vars, it, cond, _) =>
        if (vars.contains(p)) escaped = true
        else { expr(k); expr(v); expr(it); cond.foreach(expr) }
      case PKwArg(_, v, _) => expr(v)
      case PKwSplat(v, _) => expr(v)
      case PLambda(params, body, _) =>
        // same conservative rule as comprehensions: a lambda param
        // shadowing the row name muddies the simple tracker — bail
        if (params.contains(p)) escaped = true else expr(body)
    }

    def stmts(ss: Vector[PStmt]): Unit = ss.foreach(stmt)

    def stmt(s: PStmt): Unit = if (!escaped) s match {
      // a subscript-store target goes through expr(): row[<const>] = v
      // records the key, row as a whole target escapes via PName
      case PAssign(t, _, v, _) => expr(t); expr(v)
      case PReturn(e, _) => e.foreach(expr)
      case PExprStmt(e, _) => expr(e)
      case PIf(branches, orelse, _) =>
        branches.foreach { case (c, b) => expr(c); stmts(b) }
        stmts(orelse)
      case PFor(vars, it, body, _) =>
        if (vars.contains(p)) escaped = true
        else { expr(it); stmts(body) }
      case PWhile(c, body, _) => expr(c); stmts(body)
      case PTry(body, handler, _) => stmts(body); stmts(handler)
      case inner: PFuncDef =>
        // nested def: its own param `p` shadows the row — skip; else the
        // closure could read the row, analyze with the same rules
        if (!inner.params.contains(p)) stmts(inner.body)
      case _: PPass | _: PBreak | _: PContinue | _: PImport => ()
    }

    // helper functions can only see the row if it is passed to them —
    // which is a bare-name use inside `method` and escapes there — so
    // analyzing the method body alone is sufficient
    stmts(fd.body)
    if (escaped) None else Some(keys.result())
  }
}
