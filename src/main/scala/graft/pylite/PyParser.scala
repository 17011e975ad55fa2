package graft.pylite

import PyLexer._

/** Recursive-descent parser for PyLite, precedence-climbing for
  * expressions (CPython's grammar order: or < and < not < comparison <
  * arith < term < unary < power < postfix < atom). Comparison chains
  * (`a < b < c`) are rejected rather than silently mis-parsed.
  */
object PyParser {

  def parse(src: String): PProgram = new PyParser(PyLexer.lex(src)).parseModule()

  def compile(src: String, method: String): PProgram = {
    val p = parse(src)
    if (!p.funcs.contains(method))
      throw new PyLiteException(s"method '$method' not defined in code block " +
        s"(defined: ${p.funcs.keys.toSeq.sorted.mkString(", ")})", 1)
    p
  }
}

private final class PyParser(toks: Vector[Tok]) {
  private var pos = 0
  private def cur: Tok = toks(pos)
  private def err(msg: String): Nothing = throw new PyLiteException(msg, cur.line)
  private def advance(): Tok = { val t = cur; pos += 1; t }

  private def at(kind: Kind, text: String = null): Boolean =
    cur.kind == kind && (text == null || cur.text == text)
  private def accept(kind: Kind, text: String = null): Boolean =
    if (at(kind, text)) { pos += 1; true } else false
  private def expect(kind: Kind, text: String = null): Tok =
    if (at(kind, text)) advance()
    else err(s"expected ${if (text != null) s"'$text'" else kind} but found '${cur.text}' (${cur.kind})")

  def parseModule(): PProgram = {
    val stmts = Vector.newBuilder[PStmt]
    while (!at(EOF)) {
      if (accept(NEWLINE)) ()
      else stmts += statement()
    }
    PProgram(stmts.result())
  }

  // ---- statements -------------------------------------------------------

  private def statement(): PStmt = {
    val line = cur.line
    // ('@' never reaches here — the lexer already rejects it with a
    // decorator-specific message)
    if (at(KW, "def")) funcDef()
    else if (at(KW, "if")) ifStmt()
    else if (at(KW, "for")) forStmt()
    else if (at(KW, "while")) whileStmt()
    else if (at(KW, "try")) tryStmt()
    else if (at(KW)) cur.text match {
      case "return" | "pass" | "break" | "continue" => smallStmt()
      case "import" =>
        // `import hashlib` appears in real sifter playbooks (cbio);
        // availability of a given module is the interpreter's call
        advance()
        val mods = Vector.newBuilder[String]
        mods += expect(NAME).text
        while (accept(OP, ",")) mods += expect(NAME).text
        expect(NEWLINE)
        PImport(mods.result(), line)
      case kw @ ("from" | "class" | "raise" | "with" |
                 "global" | "del" | "yield" | "assert" | "except" | "lambda") =>
        err(s"'$kw' is outside the PyLite subset (sifter playbook code blocks don't use it)")
      case other => err(s"unexpected keyword '$other'")
    }
    else simpleStmt()
  }

  /** One simple statement incl. the control keywords — shared by
    * statement() and single-line blocks (`if x: return y`). */
  private def smallStmt(): PStmt = {
    val line = cur.line
    if (at(KW)) cur.text match {
      case "return" =>
        advance()
        val e = if (at(NEWLINE)) None else Some(exprTop())
        expect(NEWLINE); PReturn(e, line)
      case "pass"     => advance(); expect(NEWLINE); PPass(line)
      case "break"    => advance(); expect(NEWLINE); PBreak(line)
      case "continue" => advance(); expect(NEWLINE); PContinue(line)
      case _          => simpleStmt()
    } else simpleStmt()
  }

  private def simpleStmt(): PStmt = {
    val line = cur.line
    val e = exprTop()
    if (at(OP, "=") || at(OP, "+=") || at(OP, "-=") || at(OP, "*=") || at(OP, "/=")) {
      val op = advance().text
      e match {
        case _: PName | _: PSub => ()
        case _ => err("assignment target must be a name or subscript")
      }
      val v = exprTop()
      expect(NEWLINE)
      PAssign(e, op, v, line)
    } else { expect(NEWLINE); PExprStmt(e, line) }
  }

  private def funcDef(): PStmt = {
    val line = cur.line
    expect(KW, "def")
    val name = expect(NAME).text
    expect(OP, "(")
    val params = Vector.newBuilder[String]
    if (!at(OP, ")")) {
      params += expect(NAME).text
      while (accept(OP, ",")) if (!at(OP, ")")) params += expect(NAME).text
    }
    expect(OP, ")")
    expect(OP, ":")
    PFuncDef(name, params.result(), block(), line)
  }

  private def block(): Vector[PStmt] = {
    if (accept(NEWLINE)) {
      expect(INDENT)
      val stmts = Vector.newBuilder[PStmt]
      while (!at(DEDENT)) {
        if (accept(NEWLINE)) () else stmts += statement()
      }
      expect(DEDENT)
      val r = stmts.result()
      if (r.isEmpty) err("empty block")
      r
    } else Vector(smallStmt()) // single-line body: `if x: return y`
  }

  private def ifStmt(): PStmt = {
    val line = cur.line
    expect(KW, "if")
    val branches = Vector.newBuilder[(PExpr, Vector[PStmt])]
    val c0 = exprTop(); expect(OP, ":")
    branches += ((c0, block()))
    var orelse = Vector.empty[PStmt]
    var done = false
    while (!done) {
      if (at(KW, "elif")) {
        advance(); val c = exprTop(); expect(OP, ":"); branches += ((c, block()))
      } else if (at(KW, "else")) {
        advance(); expect(OP, ":"); orelse = block(); done = true
      } else done = true
    }
    PIf(branches.result(), orelse, line)
  }

  private def forStmt(): PStmt = {
    val line = cur.line
    expect(KW, "for")
    val vars = Vector.newBuilder[String]
    vars += expect(NAME).text
    while (accept(OP, ",")) vars += expect(NAME).text
    expect(KW, "in")
    val it = exprTop()
    expect(OP, ":")
    val body = block()
    if (at(KW, "else"))
      err("`for ... else:` is outside the PyLite subset")
    PFor(vars.result(), it, body, line)
  }

  private def tryStmt(): PStmt = {
    val line = cur.line
    expect(KW, "try")
    expect(OP, ":")
    val body = block()
    expect(KW, "except")
    if (at(NAME)) {
      val n = advance().text
      if (n != "Exception")
        err(s"`except $n:` is outside the PyLite subset — a named filter would catch " +
          "everything here and silently diverge from python; use bare `except:`")
      if (at(NAME, "as") || at(KW, "as")) err("`except ... as name` is outside the PyLite subset")
    }
    expect(OP, ":")
    val handler = block()
    if (at(KW, "except") || at(NAME, "finally") || at(KW, "else"))
      err("multiple except clauses / else / finally are outside the PyLite subset")
    PTry(body, handler, line)
  }

  private def whileStmt(): PStmt = {
    val line = cur.line
    expect(KW, "while")
    val c = exprTop()
    expect(OP, ":")
    val body = block()
    if (at(KW, "else"))
      err("`while ... else:` is outside the PyLite subset")
    PWhile(c, body, line)
  }

  // ---- expressions ------------------------------------------------------

  /** conditional expression: `a if cond else b` */
  private def exprTop(): PExpr = {
    if (at(KW, "lambda")) return lambdaExpr()
    val line = cur.line
    val e = orExpr()
    if (at(KW, "if")) {
      advance()
      val c = orExpr()
      expect(KW, "else")
      val f = exprTop()
      PCond(c, e, f, line)
    } else e
  }

  private def orExpr(): PExpr = {
    var l = andExpr()
    while (at(KW, "or")) { val line = advance().line; l = PBin("or", l, andExpr(), line) }
    l
  }

  private def andExpr(): PExpr = {
    var l = notExpr()
    while (at(KW, "and")) { val line = advance().line; l = PBin("and", l, notExpr(), line) }
    l
  }

  private def notExpr(): PExpr =
    if (at(KW, "not")) { val line = advance().line; PUn("not", notExpr(), line) }
    else comparison()

  private def comparison(): PExpr = {
    val l = arith()
    val line = cur.line
    val op: Option[String] =
      if (at(OP, "==")) Some("==") else if (at(OP, "!=")) Some("!=")
      else if (at(OP, "<=")) Some("<=") else if (at(OP, ">=")) Some(">=")
      else if (at(OP, "<")) Some("<") else if (at(OP, ">")) Some(">")
      else if (at(KW, "in")) Some("in")
      else if (at(KW, "not")) { // `not in`
        advance(); expect(KW, "in"); Some("not in")
      }
      else if (at(KW, "is")) {
        advance()
        if (accept(KW, "not")) Some("is not") else Some("is")
      }
      else None
    op match {
      case None => l
      case Some(o) =>
        if (o != "not in" && o != "is" && o != "is not") advance()
        val r = arith()
        // Reject chains loudly instead of computing the wrong thing.
        if (at(OP, "==") || at(OP, "!=") || at(OP, "<") || at(OP, ">") ||
            at(OP, "<=") || at(OP, ">=") || at(KW, "in") || at(KW, "is"))
          err("chained comparisons are outside the PyLite subset; use 'and'")
        PBin(o, l, r, line)
    }
  }

  private def arith(): PExpr = {
    var l = term()
    while (at(OP, "+") || at(OP, "-")) {
      val t = advance(); l = PBin(t.text, l, term(), t.line)
    }
    l
  }

  private def term(): PExpr = {
    var l = unary()
    while (at(OP, "*") || at(OP, "/") || at(OP, "//") || at(OP, "%")) {
      val t = advance(); l = PBin(t.text, l, unary(), t.line)
    }
    l
  }

  private def unary(): PExpr =
    if (at(OP, "-")) { val line = advance().line; PUn("-", unary(), line) }
    else if (at(OP, "+")) { advance(); unary() }
    else power()

  private def power(): PExpr = {
    val l = postfix()
    if (at(OP, "**")) { val line = advance().line; PBin("**", l, unary(), line) }
    else l
  }

  /** One call argument: `name=value` (kwarg — NAME followed by a single
    * '=', which the lexer never merges with '==') or a plain expression. */
  private def callArg(): PExpr =
    if (at(OP, "**")) { val line = advance().line; PKwSplat(exprTop(), line) }
    else if (at(NAME) && pos + 1 < toks.length &&
      toks(pos + 1).kind == OP && toks(pos + 1).text == "=") {
      val n = advance()
      advance() // '='
      PKwArg(n.text, exprTop(), n.line)
    } else exprTop()

  /** `lambda a, b: expr` — body is a full expression (incl. conditional). */
  private def lambdaExpr(): PExpr = {
    val line = expect(KW, "lambda").line
    val params = Vector.newBuilder[String]
    if (!at(OP, ":")) {
      params += expect(NAME).text
      while (accept(OP, ",")) params += expect(NAME).text
    }
    expect(OP, ":")
    PLambda(params.result(), exprTop(), line)
  }

  private def postfix(): PExpr = {
    var e = atom()
    var done = false
    while (!done) {
      if (at(OP, "(")) {
        val line = advance().line
        val args = Vector.newBuilder[PExpr]
        if (!at(OP, ")")) {
          args += callArg()
          while (accept(OP, ",")) if (!at(OP, ")")) args += callArg()
        }
        expect(OP, ")")
        e = PCall(e, args.result(), line)
      } else if (at(OP, "[")) {
        val line = advance().line
        if (at(OP, ":")) { // x[:hi]
          advance()
          val hi = if (at(OP, "]")) None else Some(exprTop())
          expect(OP, "]")
          e = PSliceE(e, None, hi, line)
        } else {
          val lo = exprTop()
          if (accept(OP, ":")) {
            val hi = if (at(OP, "]")) None else Some(exprTop())
            expect(OP, "]")
            e = PSliceE(e, Some(lo), hi, line)
          } else { expect(OP, "]"); e = PSub(e, lo, line) }
        }
      } else if (at(OP, ".")) {
        val line = advance().line
        e = PAttr(e, expect(NAME).text, line)
      } else done = true
    }
    e
  }

  private def atom(): PExpr = {
    val t = cur
    if (t.kind == KW && t.text == "yield")
      err("generators (`yield`) are outside the PyLite subset " +
        "(sifter playbook code blocks return lists instead)")
    t.kind match {
      case NUM  =>
        advance()
        try PNum(java.lang.Long.parseLong(t.text), t.line)
        catch { case _: NumberFormatException =>
          throw new PyLiteException(
            s"integer literal '${t.text}' does not fit a 64-bit int (PyLite has no bignum)", t.line) }
      case FLT  =>
        advance()
        try PFlt(java.lang.Double.parseDouble(t.text), t.line)
        catch { case _: NumberFormatException =>
          throw new PyLiteException(s"malformed float literal '${t.text}'", t.line) }
      case STR  =>
        advance()
        // adjacent string literal concatenation: "a" "b"
        var s = t.text
        while (at(STR)) s += advance().text
        PStr(s, t.line)
      case NAME => advance(); PName(t.text, t.line)
      case KW if t.text == "None"  => advance(); PNone(t.line)
      case KW if t.text == "True"  => advance(); PBoolLit(true, t.line)
      case KW if t.text == "False" => advance(); PBoolLit(false, t.line)
      case OP if t.text == "(" =>
        advance()
        if (at(OP, ")")) { advance(); return PTupleLit(Vector.empty, t.line) } // ()
        val first = exprTop()
        if (at(OP, ",")) { // tuple
          val items = Vector.newBuilder[PExpr]
          items += first
          while (accept(OP, ",")) if (!at(OP, ")")) items += exprTop()
          expect(OP, ")")
          PTupleLit(items.result(), t.line)
        } else { expect(OP, ")"); first }
      case OP if t.text == "[" =>
        advance()
        if (at(OP, "]")) { advance(); PListLit(Vector.empty, t.line) }
        else {
          val first = exprTop()
          if (at(KW, "for")) { // list comprehension, single for-clause
            advance()
            val vars = Vector.newBuilder[String]
            vars += expect(NAME).text
            while (accept(OP, ",")) vars += expect(NAME).text
            expect(KW, "in")
            val iter = orExpr() // stop before a trailing `if`
            val cond = if (accept(KW, "if")) Some(exprTop()) else None
            if (at(KW, "for")) err("nested comprehension for-clauses are outside the PyLite subset")
            expect(OP, "]")
            PListComp(first, vars.result(), iter, cond, t.line)
          } else {
            val items = Vector.newBuilder[PExpr]
            items += first
            while (accept(OP, ",")) if (!at(OP, "]")) items += exprTop()
            expect(OP, "]")
            PListLit(items.result(), t.line)
          }
        }
      case OP if t.text == "{" =>
        advance()
        if (at(OP, "}")) { advance(); PDictLit(Vector.empty, t.line) }
        else {
          val k0 = exprTop(); expect(OP, ":"); val v0 = exprTop()
          if (at(KW, "for")) { // dict comprehension
            advance()
            val vars = Vector.newBuilder[String]
            vars += expect(NAME).text
            while (accept(OP, ",")) vars += expect(NAME).text
            expect(KW, "in")
            val iter = orExpr()
            val cond = if (accept(KW, "if")) Some(exprTop()) else None
            if (at(KW, "for")) err("nested comprehension for-clauses are outside the PyLite subset")
            expect(OP, "}")
            PDictComp(k0, v0, vars.result(), iter, cond, t.line)
          } else {
            val items = Vector.newBuilder[(PExpr, PExpr)]
            items += ((k0, v0))
            def kv(): Unit = { val k = exprTop(); expect(OP, ":"); items += ((k, exprTop())) }
            while (accept(OP, ",")) if (!at(OP, "}")) kv()
            expect(OP, "}")
            PDictLit(items.result(), t.line)
          }
        }
      case _ => err(s"unexpected token '${t.text}'")
    }
  }
}
