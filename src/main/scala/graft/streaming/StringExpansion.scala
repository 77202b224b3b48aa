package graft.streaming

/** The reference's alerting-template engine
  * (`/root/reference/src/RamenStringExpansion.ml`): `${var}` placeholders
  * over a dictionary, with `|`-chained filters —
  * `${yadayada|int|date}` — multi-variable groups (`${a,b|sum}`, `${*}`),
  * immediate numeric values (`${42}`), a ternary (`${flag|?yes:no}`),
  * scale arithmetic (`${v|*=100}`), and explicit escaping
  * (`|sql`, `|shell`, `|json`, `|json-dict`). Substitution runs to a
  * FIXPOINT, so nested `${a,${a}|sum}` resolves innermost-first (the
  * regex's char class cannot span a `$`).
  *
  * Undefined variables render as `null` (when given) or `??name??`.
  * Filter failures keep the unfiltered values, like the reference's
  * per-filter fallback; an unknown filter name also keeps the values
  * (the reference raises out of the whole expansion there — a typo in an
  * alert template shouldn't kill its delivery, so this is deliberately
  * softer).
  */
object StringExpansion {

  private val Re = """\$\{([-_a-zA-Z0-9|?:,.*/+= ]*)\}""".r

  /** OCaml `nice_string_of_float`: shortest-ish rendering, no trailing
    * zeros or dot ("1.234", "1", "31536000", "0"). */
  def niceFloat(v: Double): String = {
    if (v.isNaN) return "nan"
    if (v.isInfinite) return if (v > 0) "inf" else "-inf"
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) return v.toLong.toString
    val s = String.format(java.util.Locale.ROOT, "%.12g", Double.box(v))
    val (mant, exp) = s.indexOf('e') match {
      case -1 => (s, "")
      case i => (s.substring(0, i), s.substring(i))
    }
    val trimmed =
      if (mant.contains('.'))
        mant.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else mant
    trimmed + exp
  }

  /** `string_of_time` (RamenHelpersNoLog.ml:740): local-zone ISO-ish. */
  def stringOfTime(ts: Double): String = {
    val t = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli((ts * 1000).toLong),
      java.time.ZoneId.systemDefault())
    f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d" +
      f"T${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
  }

  def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"
  def shellQuote(s: String): String = "'" + s.replace("'", "'\\''") + "'"
  def jsonQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("/", "\\/")
      .replace("\b", "\\b").replace("\n", "\\n").replace("\r", "\\r")
      .replace("\t", "\\t").replace("\f", "\\f") + "\""

  private case class UndefVar(name: String) extends Exception(name)

  /** Substitute `${…}` groups in `text` against `dict` (ordered; first
    * binding of a name wins, like `List.assoc`). `nullStr`, when set, is
    * what undefined variables (and `|json-dict` nulls) render as. */
  def substDict(dict: Seq[(String, String)], text: String,
      nullStr: Option[String] = None): String = {

    def toValue(name: String): Option[String] =
      dict.collectFirst { case (n, v) if n == name => v }.orElse {
        val t = name.trim
        try { t.toDouble; Some(t) } catch { case _: NumberFormatException => None }
      }

    def isNull(v: Option[String]): Boolean = v match {
      case Some("") | Some("0") | Some("false") | None => true
      case n => n == nullStr
    }

    type Vars = List[(String, Option[String])]
    def foreach(f: String => String): Vars => Vars =
      _.map { case (n, v) => n -> v.map(f) }
    def binary(name: String, op: (Double, Double) => Double): Vars => Vars = {
      case List((_, Some(a)), (_, Some(b))) =>
        List(name -> Some(niceFloat(op(a.toDouble, b.toDouble))))
      case List(_, _) => List(name -> None)
      case _ => throw new IllegalArgumentException(s"bad arity for $name")
    }

    def filterOf(f: String): Vars => Vars = f match {
      case "int" => foreach(s => s.toDouble.toLong.toString) // trunc toward 0
      case "float" => foreach(s => niceFloat(s.toDouble))
      case "round" => foreach(s => { // half away from zero, like Float.round
        val v = s.toDouble
        niceFloat(math.signum(v) * math.floor(math.abs(v) + 0.5))
      })
      case "ceil" => foreach(s => niceFloat(math.ceil(s.toDouble)))
      case "floor" => foreach(s => niceFloat(math.floor(s.toDouble)))
      case "date" => foreach(s => stringOfTime(s.toDouble))
      case "trim" => foreach(_.trim)
      case "percent" => foreach(s => niceFloat(s.toDouble * 100))
      case "sum" => binary("sum", _ + _)
      case "diff" => binary("diff", _ - _)
      case "coalesce" => vars =>
        vars.find(v => !isNull(v._2)) match {
          case Some(kv) => List(kv)
          case None => throw new NoSuchElementException("all null")
        }
      case "sql" => foreach(sqlQuote)
      case "shell" => foreach(shellQuote)
      case "json" => foreach(jsonQuote)
      case "json-dict" => vars =>
        List("json" -> Some(vars.map { case (n, v) =>
          jsonQuote(n) + ":" + v.map(jsonQuote).getOrElse(
            nullStr.getOrElse(throw UndefVar(n)))
        }.mkString("{", ",", "}")))
      case t if t.length > 1 && t.charAt(0) == '?' =>
        t.indexOf(':') match {
          case -1 => throw new IllegalArgumentException(
            "ternary filter is \"?if_true:if_false\"")
          case i =>
            val (ifTrue, ifFalse) = (t.substring(1, i), t.substring(i + 1))
            _.map { case (n, v) =>
              n -> Some(if (isNull(v)) ifFalse else ifTrue)
            }
        }
      case a if a.length > 2 && a.charAt(1) == '=' &&
          "*/+-".indexOf(a.charAt(0).toInt) >= 0 =>
        val b = a.substring(2).toDouble
        val op: (Double, Double) => Double = a.charAt(0) match {
          case '*' => _ * _
          case '/' => _ / _
          case '+' => _ + _
          case _ => _ - _
        }
        foreach(s => niceFloat(op(s.toDouble, b)))
      case other => throw new IllegalArgumentException(s"unknown filter '$other'")
    }

    val missing = scala.collection.mutable.Set.empty[String]

    def substituteOnce(t: String): String =
      Re.replaceAllIn(t, m => {
        val parts = m.group(1).split("\\|", -1).toList
        val (namesSpec, filters) = (parts.head, parts.tail)
        val names =
          if (namesSpec == "*") dict.map(_._1).toList
          else namesSpec.split(",", -1).toList
        val out =
          try {
            val vars0: Vars = names.map(n => n -> toValue(n))
            val vars = filters.foldLeft(vars0) { (vs, fn) =>
              try filterOf(fn)(vs)
              catch {
                case u: UndefVar => throw u
                case _: Exception => vs // failed filter keeps its input
              }
            }
            vars.map { case (n, v) =>
              v.getOrElse(throw UndefVar(n))
            }.mkString(",")
          } catch {
            case UndefVar(n) =>
              missing += n
              nullStr.getOrElse("??" + n + "??")
          }
        java.util.regex.Matcher.quoteReplacement(out)
      })

    // Nesting is resolved by re-substitution, but dictionary VALUES are
    // data-controlled (notification params) — a value containing its own
    // placeholder ("x${text}") or a mutual pair would otherwise spin this
    // loop forever inside the alerter's lock. Templates humans write nest
    // a level or two; cap the passes. (The reference's substitute_inner
    // has the same unbounded recursion.)
    var cur = text
    var next = substituteOnce(cur)
    var passes = 1
    while (next != cur && passes < 10) { cur = next; next = substituteOnce(cur); passes += 1 }
    next
  }
}
