package graft.pylite

import scala.collection.mutable.ArrayBuffer

/** Indentation-aware tokenizer for PyLite.
  *
  * Python's block structure lives in the lexer: each physical line's
  * leading whitespace is compared against an indent stack and emits
  * INDENT/DEDENT tokens; newlines inside (), [], {} are implicit
  * continuations and emit nothing. Tabs count as 8 columns (CPython's
  * tokenizer rule) so mixed files still parse deterministically.
  */
object PyLexer {

  sealed trait Kind
  case object NAME extends Kind
  case object NUM extends Kind      // integer literal
  case object FLT extends Kind      // float literal
  case object STR extends Kind
  case object OP extends Kind
  case object KW extends Kind
  case object NEWLINE extends Kind
  case object INDENT extends Kind
  case object DEDENT extends Kind
  case object EOF extends Kind

  final case class Tok(kind: Kind, text: String, line: Int)

  private val keywords = Set(
    "def", "return", "if", "elif", "else", "for", "while", "in", "is",
    "not", "and", "or", "None", "True", "False", "pass", "break",
    "continue", "lambda", "import", "from", "class", "try", "except",
    "raise", "with", "global", "del", "yield", "assert")

  // Longest-first so '**'/'//'/'<=' win over their prefixes.
  private val ops = Array(
    "**", "//", "==", "!=", "<=", ">=", "+=", "-=", "*=", "/=",
    "+", "-", "*", "/", "%", "<", ">", "=", "(", ")", "[", "]",
    "{", "}", ",", ":", ".", ";")

  def lex(src: String): Vector[Tok] = {
    val out = ArrayBuffer[Tok]()
    val indents = ArrayBuffer[Int](0)
    var i = 0
    var line = 1
    var depth = 0            // bracket nesting: >0 suppresses NEWLINE/indent
    var atLineStart = true
    val n = src.length

    def err(msg: String) = throw new PyLiteException(msg, line)

    while (i < n) {
      if (atLineStart && depth == 0) {
        // Measure indentation of this physical line.
        var col = 0
        var j = i
        var cont = true
        while (cont && j < n) src.charAt(j) match {
          case ' '  => col += 1; j += 1
          case '\t' => col = (col / 8 + 1) * 8; j += 1
          case _    => cont = false
        }
        if (j >= n || src.charAt(j) == '\n' || src.charAt(j) == '\r' || src.charAt(j) == '#') {
          // blank or comment-only line: no tokens, no indent change
          while (j < n && src.charAt(j) != '\n') j += 1
          if (j < n) { j += 1; line += 1 }
          i = j
        } else {
          if (col > indents.last) { indents += col; out += Tok(INDENT, "", line) }
          else while (col < indents.last) {
            indents.remove(indents.length - 1)
            out += Tok(DEDENT, "", line)
            if (col > indents.last) err("unindent does not match any outer indentation level")
          }
          i = j
          atLineStart = false
        }
      } else {
        val c = src.charAt(i)
        if (c == '\n') {
          line += 1; i += 1
          if (depth == 0) {
            // collapse runs of NEWLINE
            if (out.nonEmpty && out.last.kind != NEWLINE && out.last.kind != INDENT && out.last.kind != DEDENT)
              out += Tok(NEWLINE, "", line - 1)
            atLineStart = true
          }
        } else if (c == '\r') { i += 1 }
        else if (c == ' ' || c == '\t') { i += 1 }
        else if (c == '#') { while (i < n && src.charAt(i) != '\n') i += 1 }
        else if (c == '\\' && i + 1 < n && (src.charAt(i + 1) == '\n' || src.charAt(i + 1) == '\r')) {
          // explicit line continuation
          while (i < n && src.charAt(i) != '\n') i += 1
          if (i < n) { i += 1; line += 1 }
        } else if (c == '"' || c == '\'') {
          val (s, ni, nl) = lexString(src, i, line)
          out += Tok(STR, s, line); i = ni; line = nl
        } else if ((c == 'f' || c == 'F') && i + 1 < n &&
            (src.charAt(i + 1) == '"' || src.charAt(i + 1) == '\'')) {
          // f-string: desugared AT LEX TIME into "<fmt>".format(e1, ...)
          // — the format specs then go through the same CPython-golden
          // formatter as explicit .format() calls
          // RAW contents: fields are split before unescaping, so \x7b
          // is data (a literal '{'), never a field delimiter, and
          // escapes inside nested field literals re-lex intact
          val (s, ni, nl) = lexString(src, i + 1, line, raw = true)
          val (fmt, exprs) = splitFString(s, line)
          out += Tok(STR, fmt, line)
          out += Tok(OP, ".", line)
          out += Tok(NAME, "format", line)
          out += Tok(OP, "(", line)
          exprs.zipWithIndex.foreach { case (exprSrc, k) =>
            if (k > 0) out += Tok(OP, ",", line)
            val inner = lex(exprSrc).filter(t =>
              t.kind != NEWLINE && t.kind != INDENT && t.kind != DEDENT && t.kind != EOF)
            if (inner.isEmpty) err("empty expression in f-string")
            inner.foreach(t => out += Tok(t.kind, t.text, line))
          }
          out += Tok(OP, ")", line)
          i = ni; line = nl
        } else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
          var j = i
          var isFloat = false
          while (j < n && (src.charAt(j).isDigit || src.charAt(j) == '_')) j += 1
          if (j < n && src.charAt(j) == '.') { isFloat = true; j += 1
            while (j < n && src.charAt(j).isDigit) j += 1 }
          if (j < n && (src.charAt(j) == 'e' || src.charAt(j) == 'E')) {
            // only an exponent if digits follow — otherwise '1e' must
            // lex as NUM(1) NAME(e), not a malformed float
            var k = j + 1
            if (k < n && (src.charAt(k) == '+' || src.charAt(k) == '-')) k += 1
            var digits = 0
            while (k < n && src.charAt(k).isDigit) { k += 1; digits += 1 }
            if (digits > 0) { isFloat = true; j = k }
          }
          val raw = src.substring(i, j)
          // CPython's rule: underscores only singly, BETWEEN digits —
          // 1_0 lexes, but 1_, 1__0, 1_.5 are invalid decimal literals
          var k2 = 0
          while (k2 < raw.length) {
            if (raw.charAt(k2) == '_' &&
                (k2 == 0 || !raw.charAt(k2 - 1).isDigit ||
                  k2 + 1 >= raw.length || !raw.charAt(k2 + 1).isDigit))
              err(s"invalid decimal literal '$raw'")
            k2 += 1
          }
          val text = raw.replace("_", "")
          out += Tok(if (isFloat) FLT else NUM, text, line)
          i = j
        } else if (c.isLetter || c == '_') {
          var j = i
          while (j < n && (src.charAt(j).isLetterOrDigit || src.charAt(j) == '_')) j += 1
          val w = src.substring(i, j)
          out += Tok(if (keywords(w)) KW else NAME, w, line)
          i = j
        } else {
          val op = ops.find(o => src.startsWith(o, i)).getOrElse(err(c match {
            case '@' => "decorators are outside the PyLite subset ('@' is not a PyLite operator)"
            case _ => s"unexpected character '$c'"
          }))
          if (op == "(" || op == "[" || op == "{") depth += 1
          if (op == ")" || op == "]" || op == "}") depth = math.max(0, depth - 1)
          out += Tok(OP, op, line)
          i += op.length
        }
      }
    }
    if (out.nonEmpty && out.last.kind != NEWLINE) out += Tok(NEWLINE, "", line)
    while (indents.last > 0) { indents.remove(indents.length - 1); out += Tok(DEDENT, "", line) }
    out += Tok(EOF, "", line)
    out.toVector
  }

  /** Split an (already-unescaped) f-string body: returns the .format
    * template (replacement fields reduced to `{[:spec]}`, literal
    * braces kept as `{{`/`}}`) and the embedded expression sources in
    * order. Brace/bracket/paren depth tracking lets dict literals and
    * subscripts appear inside fields; a `:` at top depth starts the
    * format spec; `!r`-style conversions are outside the subset. */
  private def splitFString(s: String, line: Int): (String, Vector[String]) = {
    val fmt = new StringBuilder
    val exprs = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\') {
        // literal-context escape: decode HERE (the f-string was split
        // raw); a decoded brace is DATA — double it for format()
        val (t, adv) = decodeEscapeAt(s, i, line)
        t.foreach {
          case '{' => fmt ++= "{{"
          case '}' => fmt ++= "}}"
          case ch => fmt += ch
        }
        i += adv
      }
      else if (c == '{' && i + 1 < n && s.charAt(i + 1) == '{') { fmt ++= "{{"; i += 2 }
      else if (c == '}' && i + 1 < n && s.charAt(i + 1) == '}') { fmt ++= "}}"; i += 2 }
      else if (c == '{') {
        var j = i + 1
        var depth = 0
        var colon = -1
        var done = false
        while (!done) {
          if (j >= n) throw new PyLiteException("unterminated replacement field in f-string", line)
          s.charAt(j) match {
            case q @ ('\'' | '"') =>
              // skip string literals wholesale: a ':' or brace inside
              // f"{'a:b'}" is data, not a spec separator
              j += 1
              while (j < n && s.charAt(j) != q) {
                if (s.charAt(j) == '\\' && j + 1 < n) j += 2 else j += 1
              }
              if (j >= n) throw new PyLiteException("unterminated string inside f-string field", line)
              j += 1
            case '{' | '[' | '(' => depth += 1; j += 1
            case '}' if depth == 0 => done = true
            case '}' | ']' | ')' => depth -= 1; j += 1
            case ':' if depth == 0 && colon < 0 => colon = j; j += 1
            case '!' if depth == 0 && j + 2 < n && "rsa".contains(s.charAt(j + 1)) &&
                (s.charAt(j + 2) == '}' || s.charAt(j + 2) == ':') =>
              // a conversion (`!r}`), not the `!=` operator
              throw new PyLiteException("f-string conversions (!r/!s/!a) are outside the PyLite subset", line)
            case _ => j += 1
          }
        }
        val exprEnd = if (colon >= 0) colon else j
        val exprSrc = s.substring(i + 1, exprEnd).trim
        if (exprSrc.isEmpty) throw new PyLiteException("empty expression in f-string", line)
        exprs += exprSrc
        fmt += '{'
        if (colon >= 0) { fmt += ':'; fmt ++= unescapeAll(s.substring(colon + 1, j), line) }
        fmt += '}'
        i = j + 1
      } else if (c == '}') {
        throw new PyLiteException("single '}' in f-string", line)
      } else { fmt += c; i += 1 }
    }
    (fmt.toString, exprs.result())
  }

  /** Single- or triple-quoted string with the escape set the reference
    * playbooks use; returns (value, next index, next line). */
  /** Decode ONE escape sequence at `i` (where s(i) == '\\'); returns
    * (decoded text — empty for an escaped newline, (i-advance)).
    * \x/\u/\U hex escapes carry their own width (CPython rules:
    * exactly 2/4/8 hex digits, short runs are a SyntaxError). */
  private def decodeEscapeAt(s: String, i: Int, line: Int): (String, Int) = {
    val n = s.length
    def hexEscape(width: Int): (String, Int) = {
      val h = s.substring(i + 2, math.min(n, i + 2 + width))
      // ASCII hex only: Character.digit/parseInt accept non-ASCII
      // Unicode digits CPython rejects as SyntaxError
      def isHex(ch: Char) =
        (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')
      if (h.length < width || !h.forall(isHex))
        throw new PyLiteException(s"truncated \\${s.charAt(i + 1)}$h escape", line)
      val cp = java.lang.Integer.parseInt(h, 16)
      if (cp > 0x10FFFF)
        throw new PyLiteException(s"illegal Unicode character \\U$h", line)
      (new String(Character.toChars(cp)), 2 + width)
    }
    if (i + 1 >= n) ("\\", 1)
    else s.charAt(i + 1) match {
      case 'n'  => ("\n", 2)
      case 't'  => ("\t", 2)
      case 'r'  => ("\r", 2)
      case '\\' => ("\\", 2)
      case '\'' => ("'", 2)
      case '"'  => ("\"", 2)
      case 'x'  => hexEscape(2)
      case 'u'  => hexEscape(4)
      case 'U'  => hexEscape(8)
      case '\n' => ("", 2) // escaped newline: skip (caller bumps line)
      case other => ("\\" + other, 2)
    }
  }

  /** Decode every escape in `s` (used for f-string literal/spec parts,
    * which are split RAW first so escapes can never act as braces). */
  private[pylite] def unescapeAll(s: String, line: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 <= s.length) {
        val (t, adv) = decodeEscapeAt(s, i, line)
        sb ++= t; i += adv
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  /** Single- or triple-quoted string; `raw = true` returns the contents
    * VERBATIM (escapes intact — the f-string path splits fields on the
    * raw text and unescapes the literal parts afterwards, so \x7b can
    * never masquerade as a field brace and an escaped newline inside a
    * nested field literal survives re-lexing). */
  private def lexString(src: String, start: Int, startLine: Int,
      raw: Boolean = false): (String, Int, Int) = {
    val q = src.charAt(start)
    val n = src.length
    var line = startLine
    val triple = src.startsWith(s"$q$q$q", start)
    var i = start + (if (triple) 3 else 1)
    val sb = new StringBuilder
    while (i < n) {
      val c = src.charAt(i)
      if (c == '\\' && i + 1 < n) {
        if (src.charAt(i + 1) == '\n') line += 1
        if (raw) { sb += '\\' += src.charAt(i + 1); i += 2 }
        else {
          val (t, adv) = decodeEscapeAt(src, i, line)
          sb ++= t; i += adv
        }
      } else if (triple && src.startsWith(s"$q$q$q", i)) {
        return (sb.toString, i + 3, line)
      } else if (!triple && c == q) {
        return (sb.toString, i + 1, line)
      } else if (c == '\n') {
        if (!triple) throw new PyLiteException("unterminated string literal", line)
        line += 1; sb += c; i += 1
      } else { sb += c; i += 1 }
    }
    throw new PyLiteException("unterminated string literal", line)
  }
}
