package graft.pylite

import scala.collection.mutable
import PyInterp._

/** python string formatting for PyLite: the `%` operator and
  * `str.format()` — the two surfaces pre-f-string playbook code uses.
  * Subset: flags `-`/`0`/`+`/space, width, precision, conversions
  * s r d i f e x X o %% (percent) and auto/positional `{}` `{0}`
  * with `[[fill]align][sign][0][width][.prec][type]` specs (format);
  * `%g`/`#`/named fields raise (java's renderings diverge from
  * CPython's, and a wrong answer is worse than a loud one).
  * CPython-golden-tested; anything outside the subset raises, never
  * silently misformats.
  *
  * One modeling caveat, documented loudly: PyLite represents tuples
  * and lists both as ArrayBuffer, so `"%s" % someList` cannot be
  * distinguished from `"%s" % (a, b)` by type. The rule used: a
  * buffer is spread as the argument tuple when its length equals the
  * number of conversions; a single conversion with a buffer of any
  * other length formats the buffer as one value. Divergences from
  * CPython under this rule: calls CPython itself rejects (arg-count
  * TypeError), AND `"%s" % [x]` — CPython spreads only TUPLES, so it
  * prints the one-element list as "[x]" where this rule spreads it;
  * with list and tuple sharing one runtime type that case is
  * undecidable here. */
object PyFormat {

  // ---- the % operator ---------------------------------------------------

  private val pctSpec = "%([-+0 #]*)(\\d+)?(?:\\.(\\d+))?([srdifeExXo%])".r

  def percent(fmt: String, arg: Any, line: Int): String = {
    // every '%' must start a recognized conversion (or '%%') — a '%q'
    // left verbatim in output would be a silent misformat where CPython
    // raises ValueError
    locally {
      val starts = pctSpec.findAllMatchIn(fmt).map(_.start).toSet
      var i = fmt.indexOf('%')
      while (i >= 0) {
        if (!starts.contains(i))
          throw new PyLiteException(
            s"unsupported format character at index $i of ${pyRepr(fmt)}", line)
        // skip past this conversion before looking for the next '%'
        val m = pctSpec.findPrefixMatchOf(fmt.substring(i)).get
        i = fmt.indexOf('%', i + m.matched.length)
      }
    }
    val specs = pctSpec.findAllMatchIn(fmt).filter(_.group(4) != "%").length
    val args: IndexedSeq[Any] = arg match {
      case b: mutable.ArrayBuffer[Any @unchecked] =>
        if (b.length == specs) b.toIndexedSeq
        else if (specs == 1) IndexedSeq(b)
        else throw new PyLiteException(
          s"not enough arguments for format string ($specs conversions, ${b.length} values)", line)
      case single => IndexedSeq(single)
    }
    if (specs != args.length)
      throw new PyLiteException(
        s"format argument count mismatch ($specs conversions, ${args.length} values)", line)
    var i = -1
    val out = pctSpec.replaceAllIn(fmt, m => {
      val conv = m.group(4)
      val rep =
        if (conv == "%") "%"
        else {
          i += 1
          one(m.group(1), Option(m.group(2)).map(_.toInt),
            Option(m.group(3)).map(_.toInt), conv, args(i), line)
        }
      java.util.regex.Matcher.quoteReplacement(rep)
    })
    out
  }

  private def one(flags: String, width: Option[Int], prec: Option[Int],
      conv: String, v: Any, line: Int): String = {
    if (flags.contains('#'))
      throw new PyLiteException(s"'#' flag in %$conv is outside the PyLite subset", line)
    def asLong: Long = v match {
      case l: java.lang.Long => l.longValue
      case d: java.lang.Double =>
        // NaN.longValue is 0 and inf saturates to Long.MaxValue — both
        // are CPython errors (ValueError/OverflowError), never silent
        if (d.isNaN || d.isInfinite ||
          d.doubleValue < Long.MinValue.toDouble ||
          d.doubleValue >= Long.MaxValue.toDouble)
          throw new PyLiteException(
            s"cannot convert float ${pyStr(d)} to integer for formatting", line)
        d.longValue
      case b: java.lang.Boolean => if (b) 1L else 0L
      case o => throw new PyLiteException(s"%$conv format: a number is required, not ${typeName(o)}", line)
    }
    def asDouble: Double = v match {
      case l: java.lang.Long => l.doubleValue
      case d: java.lang.Double => d.doubleValue
      case b: java.lang.Boolean => if (b) 1.0 else 0.0
      case o => throw new PyLiteException(s"%$conv format: a number is required, not ${typeName(o)}", line)
    }
    val body = conv match {
      case "s" => val s = pyStr(v); prec.fold(s)(p => s.take(p))
      case "r" => val s = pyRepr(v); prec.fold(s)(p => s.take(p))
      case "d" | "i" => asLong.toString
      case "f" => fixed(asDouble, prec.getOrElse(6))
      case "e" | "E" =>
        // java's %e matches C/python's 2-digit-minimum exponent, but
        // renders non-finite as "Infinity"/"NaN" where python uses
        // inf/nan — route those through the same bodies %f uses
        val dv = asDouble
        if (dv.isNaN || dv.isInfinite) {
          val b = fixed(dv, 0)
          if (conv == "E") b.toUpperCase(java.util.Locale.ROOT) else b
        } else String.format(s"%.${prec.getOrElse(6)}${conv}", java.lang.Double.valueOf(dv))
      case "x" => radix(asLong, 16, upper = false)
      case "X" => radix(asLong, 16, upper = true)
      case "o" => radix(asLong, 8, upper = false)
    }
    pad(body, flags, width, numeric = conv != "s" && conv != "r")
  }

  private def fixed(d: Double, prec: Int): String =
    if (d.isNaN) "nan"
    else if (d.isInfinite) { if (d > 0) "inf" else "-inf" } // python '%f' % inf
    else new java.math.BigDecimal(d).setScale(prec, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** python renders negative ints in radix form as '-'+magnitude, not
    * two's complement; BigInteger also survives Long.MinValue. */
  private def radix(a: Long, base: Int, upper: Boolean): String = {
    val s = java.math.BigInteger.valueOf(a).toString(base)
    if (upper) s.toUpperCase(java.util.Locale.ROOT) else s
  }

  private def pad(body0: String, flags: String, width: Option[Int], numeric: Boolean): String = {
    var body = body0
    if (numeric && flags.contains('+') && !body.startsWith("-")) body = "+" + body
    else if (numeric && flags.contains(' ') && !body.startsWith("-")) body = " " + body
    width match {
      case Some(w) if body.length < w =>
        if (flags.contains('-')) body + (" " * (w - body.length))
        // NOTE: CPython's % operator zero-pads even nan/inf bodies
        // ('%010f' % inf == '0000000inf') — golden-verified; C printf
        // differs, python does not follow it here
        else if (flags.contains('0') && numeric) {
          val (sign, rest) =
            if (body.startsWith("-") || body.startsWith("+")) (body.take(1), body.drop(1))
            else ("", body)
          sign + ("0" * (w - body.length)) + rest
        } else (" " * (w - body.length)) + body
      case _ => body
    }
  }

  // ---- str.format() -----------------------------------------------------

  def format(fmt: String, args: IndexedSeq[Any], line: Int): String = {
    val sb = new StringBuilder
    var i = 0
    var auto = 0
    val n = fmt.length
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '{' && i + 1 < n && fmt.charAt(i + 1) == '{') { sb += '{'; i += 2 }
      else if (c == '}' && i + 1 < n && fmt.charAt(i + 1) == '}') { sb += '}'; i += 2 }
      else if (c == '{') {
        val close = fmt.indexOf('}', i)
        if (close < 0) throw new PyLiteException("Single '{' encountered in format string", line)
        val field = fmt.substring(i + 1, close)
        val (name, spec) = field.indexOf(':') match {
          case -1 => (field, "")
          case k  => (field.substring(0, k), field.substring(k + 1))
        }
        val v =
          if (name.isEmpty) {
            if (auto >= args.length) throw new PyLiteException("format index out of range", line)
            val x = args(auto); auto += 1; x
          } else if (name.forall(_.isDigit)) {
            val k = name.toInt
            if (k >= args.length) throw new PyLiteException("format index out of range", line)
            args(k)
          } else throw new PyLiteException(
            s"named format field '{$name}' is outside the PyLite subset (positional only)", line)
        sb ++= applySpec(v, spec, line)
        i = close + 1
      } else if (c == '}') throw new PyLiteException("Single '}' encountered in format string", line)
      else { sb += c; i += 1 }
    }
    sb.toString
  }

  private val fmtSpec = "(?:(.)?([<>^]))?([-+ ]?)(0?)(\\d+)?(?:\\.(\\d+))?([bdfsxXoe]?)".r

  private def applySpec(v: Any, spec: String, line: Int): String = spec match {
    case "" => pyStr(v)
    case fmtSpec(fill0, align, sign, zero, width0, prec0, typ) =>
      val prec = Option(prec0).map(_.toInt)
      def asDouble: Double = v match {
        case l: java.lang.Long => l.doubleValue
        case d: java.lang.Double => d.doubleValue
        case o => throw new PyLiteException(s"format spec '$spec' needs a number, got ${typeName(o)}", line)
      }
      def asLong: Long = v match {
        case l: java.lang.Long => l.longValue
        case b: java.lang.Boolean => if (b) 1L else 0L
        case o => throw new PyLiteException(s"format spec '$spec' needs an int, got ${typeName(o)}", line)
      }
      // an empty type behaves numerically for numeric VALUES (python:
      // '{:010}'.format(42) right-aligns and zero-pads like {:010d})
      val numeric = typ match {
        case ""  => v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Double]
        case "s" => false
        case _   => true
      }
      var body = typ match {
        case "" if prec.isDefined &&
            (v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Double]) =>
          // CPython: floats take 'g' presentation here, ints raise —
          // string-truncating the digits would be silently wrong either
          // way, so the whole shape is outside the subset, loudly
          throw new PyLiteException(
            s"precision with an empty format type on a number is outside the PyLite subset (spec '$spec')", line)
        case "" | "s" => val s = pyStr(v); prec.fold(s)(p => s.take(p))
        case "d" => asLong.toString
        case "f" => fixed(asDouble, prec.getOrElse(6))
        case "e" =>
          val dv = asDouble
          if (dv.isNaN || dv.isInfinite) fixed(dv, 0)
          else String.format(s"%.${prec.getOrElse(6)}e", java.lang.Double.valueOf(dv))
        case "x" => radix(asLong, 16, upper = false)
        case "X" => radix(asLong, 16, upper = true)
        case "o" => radix(asLong, 8, upper = false)
        case "b" => radix(asLong, 2, upper = false)
      }
      if (sign == "+" && numeric && !body.startsWith("-")) body = "+" + body
      else if (sign == " " && numeric && !body.startsWith("-")) body = " " + body
      if (zero == "0" && align == null && !numeric)
        throw new PyLiteException(
          s"'=' alignment (the bare '0' shorthand) is not allowed for ${typeName(v)} in format spec '$spec'", line)
      val width = Option(width0).map(_.toInt).getOrElse(0)
      if (body.length >= width) body
      else {
        val fill = Option(fill0).map(_.head).getOrElse(if (zero == "0") '0' else ' ')
        val padLen = width - body.length
        Option(align).getOrElse(if (numeric) ">" else "<") match {
          case "<" => body + fill.toString * padLen
          case ">" =>
            if (fill == '0' && (body.startsWith("-") || body.startsWith("+")))
              body.take(1) + fill.toString * padLen + body.drop(1)
            else fill.toString * padLen + body
          case "^" =>
            val left = padLen / 2
            fill.toString * left + body + fill.toString * (padLen - left)
        }
      }
    case other => throw new PyLiteException(s"format spec '$other' is outside the PyLite subset", line)
  }
}
