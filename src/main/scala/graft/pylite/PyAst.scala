package graft.pylite

/** AST for PyLite — a from-scratch interpreter for the small Python
  * subset sifter playbooks embed via `gpython:` code blocks
  * (/root/reference/evaluate/gpython.go:18-40 compiles a module and
  * calls one named function per row; the union of python actually
  * written in the reference's own playbooks — test/examples/code-ref,
  * test/examples/pfb/transform.yaml, pathwaycommons/gene_collect.yaml —
  * needs functions, dict/list literals, subscripts, assignment incl.
  * nested-subscript targets, if/elif/else, for, arithmetic,
  * comparisons, `is (not) None`, `in`, isinstance, str/int/len, method
  * calls like .items()/.append()/.split(), and recursion).
  *
  * Every node is a plain case class so a compiled program can be
  * broadcast to executors and interpreted per partition — compile once
  * on the driver, run anywhere, no reflection and no code generation.
  */
sealed trait PExpr extends Serializable { def line: Int }
final case class PNum(v: Long, line: Int) extends PExpr
final case class PFlt(v: Double, line: Int) extends PExpr
final case class PStr(v: String, line: Int) extends PExpr
final case class PBoolLit(v: Boolean, line: Int) extends PExpr
final case class PNone(line: Int) extends PExpr
final case class PName(n: String, line: Int) extends PExpr
final case class PListLit(items: Vector[PExpr], line: Int) extends PExpr
final case class PTupleLit(items: Vector[PExpr], line: Int) extends PExpr
final case class PDictLit(items: Vector[(PExpr, PExpr)], line: Int) extends PExpr
final case class PSub(obj: PExpr, idx: PExpr, line: Int) extends PExpr
final case class PSliceE(obj: PExpr, lo: Option[PExpr], hi: Option[PExpr], line: Int) extends PExpr
final case class PAttr(obj: PExpr, name: String, line: Int) extends PExpr
final case class PCall(fn: PExpr, args: Vector[PExpr], line: Int) extends PExpr
/** keyword argument inside a call's arg list: `f(name=value)` — only
  * ever produced by the parser inside PCall.args. */
final case class PKwArg(name: String, value: PExpr, line: Int) extends PExpr
/** `lambda a, b: expr` — closes over the defining environment (LEGB:
  * the body sees enclosing locals through the captured env chain). */
final case class PLambda(params: Vector[String], body: PExpr, line: Int) extends PExpr
/** `f(**mapping)` — keyword splat; only inside PCall.args. */
final case class PKwSplat(value: PExpr, line: Int) extends PExpr
final case class PBin(op: String, l: PExpr, r: PExpr, line: Int) extends PExpr
final case class PUn(op: String, e: PExpr, line: Int) extends PExpr
final case class PCond(c: PExpr, t: PExpr, f: PExpr, line: Int) extends PExpr
/** `[elem for v1[, v2] in iter if cond]` — one for-clause, optional if. */
final case class PListComp(elem: PExpr, vars: Vector[String], iter: PExpr,
    cond: Option[PExpr], line: Int) extends PExpr
/** `{k: v for v1[, v2] in iter if cond}` — one for-clause, optional if. */
final case class PDictComp(key: PExpr, value: PExpr, vars: Vector[String],
    iter: PExpr, cond: Option[PExpr], line: Int) extends PExpr

sealed trait PStmt extends Serializable { def line: Int }
final case class PAssign(target: PExpr, op: String, value: PExpr, line: Int) extends PStmt
final case class PReturn(e: Option[PExpr], line: Int) extends PStmt
final case class PExprStmt(e: PExpr, line: Int) extends PStmt
final case class PIf(branches: Vector[(PExpr, Vector[PStmt])], orelse: Vector[PStmt], line: Int) extends PStmt
final case class PFor(vars: Vector[String], iter: PExpr, body: Vector[PStmt], line: Int) extends PStmt
final case class PWhile(cond: PExpr, body: Vector[PStmt], line: Int) extends PStmt
final case class PPass(line: Int) extends PStmt
final case class PBreak(line: Int) extends PStmt
final case class PContinue(line: Int) extends PStmt
final case class PFuncDef(name: String, params: Vector[String], body: Vector[PStmt], line: Int) extends PStmt
final case class PImport(modules: Vector[String], line: Int) extends PStmt
/** `try: ... except[ Exception]: ...` — catch-all handler only (a named
  * specific exception would silently catch more than python does). */
final case class PTry(body: Vector[PStmt], handler: Vector[PStmt], line: Int) extends PStmt

/** A compiled module: named functions (callable from Spark tasks) plus
  * any top-level statements (run once per interpreter instantiation,
  * mirroring gpython's module-exec-then-call-Globals[method] shape,
  * evaluate/gpython.go:159-178). */
final case class PProgram(stmts: Vector[PStmt]) extends Serializable {
  lazy val funcs: Map[String, PFuncDef] =
    stmts.collect { case f: PFuncDef => f.name -> f }.toMap
}

/** Parse or runtime error, with the 1-based source line. Catchable by
  * a playbook's `except:` — like python exceptions. */
final class PyLiteException(msg: String, val pyLine: Int)
    extends RuntimeException(s"PyLite: $msg (line $pyLine)")

/** Step-budget exhaustion. Deliberately NOT a [[PyLiteException]]: an
  * `except:` handler must not be able to swallow it, or a runaway loop
  * inside try would wedge the executor the budget exists to protect. */
final class PyBudgetExceeded(msg: String, val pyLine: Int)
    extends RuntimeException(s"PyLite: $msg (line $pyLine)")
