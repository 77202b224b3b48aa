package graft.raql

import scala.util.parsing.combinator.RegexParsers

import Ast._

/** Parser for the RaQL subset covering the common shapes in the reference's
  * test corpus (the .ramen programs under `/root/reference/tests/func`):
  * DEFINE programs with
  * SELECT/YIELD/READ CSV operations, the expression algebra with aggregate
  * calls and their modifier syntax, CASE, percentiles, vector literals,
  * `|?` coalesce, duration literals, and `--` comments.
  *
  * Grammar shapes follow the reference parser (`src/RamenOperation.ml`,
  * `src/RamenExpr.ml`) re-expressed with scala-parser-combinators.
  */
object RaqlParser extends RegexParsers {

  override protected val whiteSpace = """(\s|--[^\n]*)+""".r

  private def kw(s: String): Parser[String] =
    ("""(?i)\b""" + s + """\b""").r ^^ (_.toLowerCase)

  private val ident: Parser[String] = """[A-Za-z_][A-Za-z0-9_]*""".r
  private val qualName: Parser[String] = """[A-Za-z_][A-Za-z0-9_/.]*""".r

  private val keywords = Set("select", "from", "where", "group", "by",
    "commit", "after", "before", "every", "yield", "define", "as", "read",
    "file", "csv", "parameters", "defaults", "to", "and", "or", "not", "is",
    "null", "case", "when", "then", "else", "end", "like", "in", "if",
    "sort", "notify", "keep", "flush", "factors", "event")

  private val plainIdent: Parser[String] =
    ident.filter(i => !keywords.contains(i.toLowerCase))

  // --- literals ---------------------------------------------------------

  private val number: Parser[Expr] = {
    // suffixes: durations (0.1s, 1min, 1d), type tags (0u32, 1i8[?]); also
    // hex, trailing-dot floats (`0.`), and `_` digit separators (10_000 —
    // examples/generators/network/logs.ramen)
    val core = """-?(0x[0-9a-fA-F]+|\d[\d_]*(\.[\d_]*)?([eE]-?\d+)?)(ms|min|h|s|d|[ui](8|16|24|32|40|48|56|64|128)\??)?""".r
    val unitWord =
      kw("milliseconds") | kw("millisecond") | kw("seconds") | kw("second") |
      kw("minutes") | kw("minute") | kw("hours") | kw("hour") |
      kw("days") | kw("day")
    core ~ opt(unitWord) ^^ { case s1 ~ unit =>
      val s0 = s1.replace("_", "")
      val (num, mult) =
        if (s0.matches(""".*[ui]\d+\??$""")) (s0.replaceAll("[ui]\\d+\\??$", ""), 1.0)
        else if (s0.endsWith("ms")) (s0.dropRight(2), 0.001)
        else if (s0.endsWith("min")) (s0.dropRight(3), 60.0)
        else if (s0.endsWith("h")) (s0.dropRight(1), 3600.0)
        else if (s0.endsWith("s")) (s0.dropRight(1), 1.0)
        else if (s0.endsWith("d") && !s0.startsWith("0x"))
          (s0.dropRight(1), 86400.0)
        else (s0, 1.0)
      val wordMult = unit match {
        case Some(u) if u.startsWith("milli") => 0.001
        case Some(u) if u.startsWith("second") => 1.0
        case Some(u) if u.startsWith("minute") => 60.0
        case Some(u) if u.startsWith("hour") => 3600.0
        case Some(u) if u.startsWith("day") => 86400.0
        case _ => 1.0
      }
      val m = mult * wordMult
      val bare: Expr =
        if (num.startsWith("0x") || num.startsWith("-0x"))
          Lit(java.lang.Long.parseLong(num.replace("0x", ""), 16) * m.toLong)
        else if (m != 1.0 || unit.isDefined || num.contains('.') ||
            num.contains('e') || num.contains('E'))
          Lit(num.stripSuffix(".").toDouble * m)
        else num.toLongOption match {
          case Some(l) => Lit(l)
          case None => Lit(BigDecimal(num)) // beyond-i64 literals (u128 tests)
        }
      // keep the width tag (3u8 → u8(3)): PEEK over int vectors needs the
      // declared element width, and the cast itself is semantic
      """[ui]\d+\??$""".r.findFirstIn(s0) match {
        case Some(tag) => FunCall(tag, Seq(bare))
        case None => bare
      }
    }
  }

  /** Char literal `#\a`; compiled as a 1-char string. */
  private val charLit: Parser[Expr] =
    """#\\[!-~]""".r ^^ (s => Lit(s.substring(2)))

  /** `#start` / `#stop` event-time pseudo-fields. */
  private val eventTimeRef: Parser[Expr] =
    "#" ~> (kw("start") | kw("stop")) ^^ (n => Ref(Seq("#" + n)))

  // single token — split sub-parsers would skip whitespace inside the quotes
  private val stringLit: Parser[Expr] =
    """"(\\.|[^"\\])*"""".r ^^ { s =>
      val body = s.substring(1, s.length - 1)
      // unescape \xNN (peek.ramen byte strings), \n, \t, \", \\
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        if (body.charAt(i) == '\\' && i + 1 < body.length) body.charAt(i + 1) match {
          case 'x' if i + 3 < body.length =>
            sb.append(Integer.parseInt(body.substring(i + 2, i + 4), 16).toChar)
            i += 4
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case c => sb.append(c); i += 2
        } else { sb.append(body.charAt(i)); i += 1 }
      }
      Lit(sb.toString)
    }

  private val boolLit: Parser[Expr] =
    kw("true") ^^^ Lit(true) | kw("false") ^^^ Lit(false)

  private val nullLit: Parser[Expr] = kw("null") ^^^ Lit(null)

  // --- expressions ------------------------------------------------------

  def expr: Parser[Expr] = orExpr

  private def orExpr: Parser[Expr] =
    andExpr ~ rep(kw("or") ~> andExpr) ^^ { case h ~ t =>
      t.foldLeft(h)(Binop("or", _, _))
    }

  private def andExpr: Parser[Expr] =
    notExpr ~ rep(kw("and") ~> notExpr) ^^ { case h ~ t =>
      t.foldLeft(h)(Binop("and", _, _))
    }

  private def notExpr: Parser[Expr] =
    kw("not") ~> notExpr ^^ (Unop("not", _)) | cmpExpr

  private def cmpExpr: Parser[Expr] = {
    val isNullTail: Parser[Either[Boolean, (String, Expr)]] =
      kw("is") ~> opt(kw("not")) <~ kw("null") ^^ (n => Left(n.isDefined))
    val cmpTail: Parser[Either[Boolean, (String, Expr)]] =
      ("<=" | ">=" | "<>" | "!=" | "=" | kw("like") | kw("in") |
        (kw("not") ~ kw("in")) ^^^ "not_in" |
        (kw("not") ~ kw("case") ~ kw("sensitive") ~ kw("like")) ^^^
          "not_cs_like" |
        (kw("not") ~ kw("like")) ^^^ "not_like" |
        (kw("case") ~ kw("sensitive") ~ kw("like")) ^^^ "cs_like" |
        ((kw("starts") | kw("ends")) <~ kw("with")) ^^ (_ + "_with") |
        """<(?!<)""".r | """>(?!>)""".r) ~ bitExpr ^^ {
        case op ~ r => Right((op, r))
      }
    bitExpr ~ opt(isNullTail | cmpTail) ^^ {
      case l ~ None => l
      case l ~ Some(Left(neg)) => IsNull(l, negated = neg)
      case l ~ Some(Right(("not_in", r))) => Unop("not", Binop("in", l, r))
      case l ~ Some(Right(("not_like", r))) =>
        Unop("not", Binop("like", l, r))
      case l ~ Some(Right(("not_cs_like", r))) =>
        Unop("not", Binop("cs_like", l, r))
      case l ~ Some(Right((op, r))) => Binop(op, l, r)
    }
  }

  /** Bitwise `& | # << >>` (`#` is xor). `|` must not swallow `|?`/`||`. */
  private def bitExpr: Parser[Expr] =
    addExpr ~ rep(("<<" | ">>" | "&" | "#" | """\|(?![|?])""".r) ~ addExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (a, op ~ b) => Binop(op, a, b) }
    }

  // `|?` coalesce sits WITH + - || (reference mid_prec_left_assoc,
  // RamenExpr.ml:1119-1127): tighter than comparisons and AND/OR, so
  // `year = p |? 0 OR …` reads `(year = (p |? 0)) OR …` (params.ramen)
  private def addExpr: Parser[Expr] =
    mulExpr ~ rep(("+" | "-" | "||" | "|?") ~ mulExpr) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (a, "|?" ~ b) => FunCall("coalesce", Seq(a, b))
        case (a, op ~ b) => Binop(op, a, b)
      }
    }

  private def mulExpr: Parser[Expr] =
    unaryExpr ~ rep(("*" | "//" | "/" | "%") ~ unaryExpr) ^^ { case h ~ t =>
      t.foldLeft(h) { case (a, op ~ b) => Binop(op, a, b) }
    }

  private def unaryExpr: Parser[Expr] =
    "-" ~> unaryExpr ^^ (Unop("neg", _)) | powExpr

  private def powExpr: Parser[Expr] =
    primary ~ opt("^" ~> unaryExpr) ^^ {
      case b ~ Some(e) => Binop("^", b, e)
      case b ~ None => b
    }

  private val aggNames = Set("min", "max", "sum", "avg", "first", "last",
    "count", "bitor", "bitand", "bitxor", "group", "distinct", "lag",
    "smooth", "derive", "hysteresis", "remember", "recall", "sample", "all", "any",
    "latest", "oldest", "largest", "smallest", "changed", "past")

  /** Aggregate call: name, optional modifiers, then a unary operand (no
    * parens needed: `min horsepower`). `and`/`or` as prefix = bool aggs;
    * `count distinct x`; `latest 10 x`. */
  private def aggCall: Parser[Expr] = {
    val aggName =
      ident.filter(i => aggNames.contains(i.toLowerCase)) ^^ (_.toLowerCase) |
      (kw("and") | kw("or")) ^^ ("aggr_" + _)
    val modifier =
      (kw("keep") ~ (kw("nulls") | kw("null"))) ^^^ "keep_nulls" |
      (kw("skip") ~ (kw("nulls") | kw("null"))) ^^^ "skip_nulls" |
      kw("distinct") ^^^ "distinct" |
      kw("globally") ^^^ "globally" | kw("locally") ^^^ "locally" |
      kw("immediately") ^^^ "immediately"
    // `SAMPLE [OF SIZE] n OF THE PAST d OF x` windowed-reservoir form
    val samplePast =
      kw("sample") ~> opt(kw("of") ~ kw("size")) ~> number ~
        (kw("of") ~> kw("the") ~> kw("past") ~> number) ~
        (kw("of") ~> unaryExpr) ^^ {
        case Lit(n) ~ d ~ e =>
          AggCall("sample_past", e, Set(s"n=$n"), Seq(d))
        case _ ~ d ~ e => AggCall("sample_past", e, Set.empty, Seq(d))
      }
    // argument-tuple form: `sample (10, x)`, `remember globally (fpr, d, k, x)`
    val argsForm =
      aggName ~ rep1(modifier) ~ ("(" ~> rep1sep(expr, ",") <~ ")") ^^ {
        case fn ~ mods ~ args =>
          AggCall(fn, args.last, mods.toSet, args.dropRight(1))
      }
    // the count form must be a full alternative: opt() would not be
    // re-tried when the operand after a consumed count fails to parse
    val withCount =
      aggName ~ rep(modifier) ~ number ~ rep(modifier) ~ unaryExpr ^^ {
        case fn ~ m1 ~ Lit(k) ~ m2 ~ e =>
          AggCall(fn, e, (m1 ++ m2).toSet + s"n=$k")
        case fn ~ m1 ~ _ ~ m2 ~ e => AggCall(fn, e, (m1 ++ m2).toSet)
      }
    val simple = aggName ~ rep(modifier) ~ unaryExpr ^^ {
      case fn ~ mods ~ e => AggCall(fn, e, mods.toSet)
    }
    samplePast | argsForm | withCount | simple
  }

  /** `k-ma [locally|globally] x` / `k-moveavg x` moving-average shorthand
    * (`src/RamenExpr.ml:1682-1694`): the dash binds to the number, no
    * blanks (a spaced `5 - ma` stays a subtraction). */
  private def kMoveavg: Parser[Expr] = {
    val mod = kw("globally") ^^^ "globally" | kw("locally") ^^^ "locally" |
      (kw("skip") ~ (kw("nulls") | kw("null"))) ^^^ "skip_nulls"
    """\d+-(moveavg|ma)\b""".r ~ rep(mod) ~ unaryExpr ^^ {
      case s ~ mods ~ e =>
        val k = s.takeWhile(_.isDigit)
        AggCall("moveavg", e, mods.toSet + s"n=$k")
    }
  }

  /** `IS x IN TOP n [AT TIME t] [FOR d] [ABOVE s SIGMAS]` /
    * `RANK OF x IN TOP n` heavy-hitter membership. */
  private def topMembership: Parser[Expr] = {
    val topTail = kw("in") ~> kw("top") ~> number ~
      opt(kw("at") ~ kw("time") ~ expr) ~ opt(kw("for") ~ expr) ~
      opt(kw("above") ~ expr ~ opt(kw("sigmas") | kw("sigma")))
    def mk(fn: String)(x: Expr, tail: Any): Expr = tail match {
      case Lit(n) ~ _ ~ _ ~ _ => AggCall(fn, x, Set(s"n=$n"))
      case _ => AggCall(fn, x)
    }
    kw("is") ~> unaryExpr ~ topTail ^^ { case x ~ t => mk("is_in_top")(x, t) } |
    kw("rank") ~> kw("of") ~> unaryExpr ~ topTail ^^ {
      case x ~ t => mk("rank_in_top")(x, t) }
  }

  /** Bare unary function application (`length t4` — no parens needed). */
  private val prefixFunNames = Set("length", "abs", "exp", "log", "log10",
    "sqrt", "floor", "ceil", "round", "lower", "upper", "hash", "basename",
    "age", "chr", "string", "force", "uuid_of_u128", "sparkline",
    "countrycode", "ipfamily", "country_code", "ip_family", "sq", "square",
    "fit", "truncate", "parse_time")
  private def prefixFun: Parser[Expr] =
    ident.filter(i => prefixFunNames.contains(i.toLowerCase)) ~ unaryExpr ^^ {
      case f ~ e => FunCall(f.toLowerCase, Seq(e))
    }

  /** `95th percentile (e)` / `[10th; 95th] percentile (e)`. */
  private def percentileCall: Parser[Expr] = {
    val pct = """\d+(\.\d+)?""".r <~ ("th" | "st" | "nd" | "rd") ^^ (_.toDouble)
    val ps = pct ^^ (Seq(_)) | "[" ~> rep1sep(pct, ";") <~ "]"
    ps ~ (kw("percentile") ~> unaryExpr) ^^ { case p ~ e => PercentileCall(p, e) }
  }

  /** Ordinal tuple accessor: `1st t`, `2nd(x)` — 0-based GET
    * (constructed_types.ramen). Tried after percentileCall. */
  private def ordinalGet: Parser[Expr] =
    ("""\d+""".r <~ ("st" | "nd" | "rd" | "th")) ~ unaryExpr ^^ {
      case n ~ e => FunCall("get", Seq(Lit(n.toLong - 1), e))
    }

  /** Record literal `{ name: e ; … }` (constructed_types.ramen). */
  private def recordLit: Parser[Expr] =
    "{" ~> rep1sep(ident ~ (":" ~> expr), ";") <~ "}" ^^ { fs =>
      FunCall("record", fs.flatMap { case n ~ e => Seq(Lit(n), e) })
    }

  /** Vector/tuple cast application: `string[](x)`, `string[2](x)`,
    * `char?[1]?(x)`, `ip?[2](a; b)`, `(string; u32?)(1; 2)`,
    * `(u32; string)?(…)` (char.ramen, tuples.ramen). */
  private def typeCastApply: Parser[Expr] = {
    val vecCast =
      ident ~ opt("?") ~ ("[" ~> opt(number) <~ "]") ~ opt("?") ~
        ("(" ~> rep1sep(expr, ";" | ",") <~ ")") ^^ {
        case t ~ eq ~ _ ~ vq ~ args =>
          // ip?[2] = nullable ELEMENTS; ip[2]? = nullable VECTOR (a failed
          // element cast nulls the whole vector) — tuples.ramen t7/t8
          FunCall("cast_vec_" + t.toLowerCase + eq.getOrElse("") +
            vq.map(_ => "_vn").getOrElse(""), args)
      }
    val tupleCast =
      ("(" ~> rep1sep(ident ~ opt("?"), ";") <~ ")") ~ opt("?") ~
        ("(" ~> rep1sep(expr, ";") <~ ")") ^^ {
        case ts ~ _ ~ args =>
          val types = ts.map { case t ~ q => t.toLowerCase + q.getOrElse("") }
          FunCall("cast_tuple", Lit(types.mkString(";")) +: args)
      }
    vecCast | tupleCast
  }

  private def caseExpr: Parser[Expr] =
    kw("case") ~> rep1(kw("when") ~> expr ~ (kw("then") ~> expr)) ~
      opt(kw("else") ~> expr) <~ kw("end") ^^ { case br ~ el =>
      CaseExpr(br.map { case c ~ v => (c, v) }, el)
    }

  private def ifCall: Parser[Expr] =
    kw("if") ~> "(" ~> expr ~ ("," ~> expr) ~ opt("," ~> expr) <~ ")" ^^ {
      case c ~ t ~ e => CaseExpr(Seq((c, t)), e)
    } |
    // `IF cond THEN x [ELSE y]` prefix form
    kw("if") ~> expr ~ (kw("then") ~> expr) ~ opt(kw("else") ~> expr) ^^ {
      case c ~ t ~ e => CaseExpr(Seq((c, t)), e)
    }

  private def funCall: Parser[Expr] =
    plainIdent ~ opt("?") ~ ("(" ~> repsep(expr, ",") <~ ")") ^^ {
      case f ~ q ~ args =>
        FunCall(f.toLowerCase + (if (q.isDefined) "?" else ""), args)
    }

  /** Special bound variables may lead a path even though they are keywords
    * elsewhere (`in.start`, `out.stop`, `previous.x`, `param.p`). */
  private def varRef: Parser[Expr] =
    (kw("in") | kw("out") | kw("previous") | kw("param") | kw("env") |
      kw("group")) ~ ("." ~> rep1sep(plainIdent, ".")) ^^ {
      case v ~ rest => Ref(v +: rest)
    } |
    // sort-buffer variables: sort.first.x, sort.smallest.x, sort.#count
    kw("sort") ~ "." ~ "#" ~ kw("count") ^^^ Ref(Seq("sort", "#count")) |
    kw("sort") ~ ("." ~> rep1sep(plainIdent, ".")) ^^ {
      case v ~ rest => Ref(v +: rest)
    } |
    // bare tuple variable (`get("f", in)`, constructed_types.ramen)
    (kw("in") | kw("out") | kw("previous")) <~ guard(not("." | "(")) ^^ {
      v => Ref(Seq(v))
    }

  private def pathRef: Parser[Expr] =
    rep1sep(plainIdent, ".") ^^ (Ref(_))

  private def vectorLit: Parser[Expr] =
    "[" ~> repsep(expr, ";") <~ "]" ^^ (VectorLit(_))

  /** Positional tuple literal `(a; b; c)`. */
  private def tupleLit: Parser[Expr] =
    "(" ~> expr ~ rep1(";" ~> expr) <~ ")" ^^ {
      case h ~ t => FunCall("tuple", h +: t)
    }

  /** IPv4/IPv6/CIDR literals (`192.168.1.1`, `2001:db8::1`, `10.0.0.0/8`). */
  // ip/cidr literals normalize to canonical text at parse time so plain
  // string equality against formatted ip columns holds (v6 especially)
  private val ipLit: Parser[Expr] =
    """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}(/\d{1,2})?""".r ^^
      (s => Lit(graft.functions.NetExpressions.canonicalIp(s))) |
    """[0-9a-fA-F]{0,4}(:[0-9a-fA-F]{0,4}){2,7}(/\d{1,3})?""".r
      .filter(_.contains(":")) ^^
      (s => Lit(graft.functions.NetExpressions.canonicalIp(s)))

  private def castExpr: Parser[Expr] =
    kw("cast") ~> "(" ~> expr ~ (kw("as") ~> ident) ~ opt("[" ~ "]") <~
      opt("?") <~ ")" ^^ { case e ~ t ~ arr =>
      FunCall((if (arr.isDefined) "array_" else "") + t.toLowerCase, Seq(e))
    }

  /** `ONCE EVERY d [TUMBLING] x` time-sampling aggregate. */
  private def onceEvery: Parser[Expr] =
    kw("once") ~> kw("every") ~> number ~ opt(kw("tumbling")) ~ unaryExpr ^^ {
      case Lit(d) ~ _ ~ e => AggCall("once_every", e, Set(s"d=$d"))
      case _ ~ _ ~ e => AggCall("once_every", e, Set.empty)
    }

  /** `ONE OUT OF n x` decimation. */
  private def oneOutOf: Parser[Expr] =
    kw("one") ~> kw("out") ~> kw("of") ~> number ~ unaryExpr ^^ {
      case Lit(n) ~ e => AggCall("one_out_of", e, Set(s"n=$n"))
      case _ ~ e => AggCall("one_out_of", e, Set.empty)
    }

  /** `PAST d [SLIDING|TUMBLING] [SAMPLE SIZE n] OF x` time-window collect
    * with an expression (often a parameter) duration. */
  private def pastOf: Parser[Expr] =
    kw("past") ~> unaryExpr ~ opt(kw("sliding") | kw("tumbling")) ~
      opt(kw("sample") ~> kw("size") ~> number) ~ (kw("of") ~> unaryExpr) ^^ {
      case d ~ st ~ ss ~ x =>
        val mods = st.toSet ++ (ss match {
          case Some(Lit(n)) => Set(s"sample=$n"); case _ => Set.empty[String]
        })
        AggCall("past", x, mods, Seq(d))
    }

  /** `LIST TOP n x [BY w] [IN THE LAST d]` returning the top list. */
  private def listTop: Parser[Expr] =
    kw("list") ~> kw("top") ~> number ~ unaryExpr ~
      opt(kw("by") ~> unaryExpr) ~
      opt(kw("in") ~> kw("the") ~> kw("last") ~> unaryExpr) ^^ {
      case Lit(n) ~ x ~ by ~ _ => AggCall("top_list", x, Set(s"n=$n"), by.toSeq)
      case _ ~ x ~ by ~ _ => AggCall("top_list", x, Set.empty, by.toSeq)
    }

  /** `PEEK type [LITTLE|BIG ENDIAN] x`. */
  private def peekCall: Parser[Expr] =
    kw("peek") ~> ident ~ opt((kw("little") | kw("big")) <~ kw("endian")) ~
      unaryExpr ^^ { case t ~ endian ~ e =>
      FunCall("peek", Seq(Lit(t + endian.map("_" + _).getOrElse("")), e))
    }

  private def primary: Parser[Expr] = {
    val base =
      percentileCall | ordinalGet | ipLit | kMoveavg | number | charLit |
        eventTimeRef |
        stringLit |
        boolLit | nullLit | caseExpr | ifCall | castExpr | onceEvery |
        oneOutOf | peekCall | topMembership | pastOf | listTop |
        typeCastApply | aggCall |
        funCall | prefixFun | varRef | pathRef | tupleLit | vectorLit |
        recordLit | "(" ~> expr <~ ")"
    // postfix indexing `_ts[1]` = GET(1, _ts); units annotations ignored
    base ~ rep("[" ~> expr <~ "]") ~ opt("""\{[^}]*\}""".r) ^^ {
      case e ~ idxs ~ _ =>
        idxs.foldLeft(e)((acc, i) => FunCall("get", Seq(i, acc)))
    }
  }

  // --- operations -------------------------------------------------------

  private def selectField: Parser[SelectField] =
    ("*" ~ opt("-" ~> rep1sep(ident, ","))) ^^ {
      case _ ~ minus => SelectField(Ref(Seq("*")), minus.map(_.mkString("-")))
    } |
    // `expr [AS name ["doc"] | DOC "doc"] [AGGREGATE USING f]`
    // (`src/RamenOperation.ml:1201-1218`); the doc string and the
    // re-aggregation hint are parsed and dropped (batch plans never
    // re-aggregate archived outputs)
    expr ~ opt(kw("doc") ~ stringLit) ~
      opt((kw("as") ~> ident) ~ opt(stringLit)) <~
      opt(kw("aggregate") ~> kw("using") ~> ident) ^^ {
      case e ~ _ ~ a => SelectField(e, a.map(_._1))
    }

  /** FROM names may climb (`../prog#_/f`) and carry experiment suffixes. */
  private val fromName: Parser[String] =
    """(\.\./)*[A-Za-z_][A-Za-z0-9_/.#]*""".r

  private def fromRef: Parser[Either[String, Operation]] =
    fromName ^^ (Left(_)) |
    "(" ~> operation <~ ")" ^^ (Right(_)) |
    stringLit ^^ { case Lit(s: String) => Left(s); case _ => Left("") }

  private def fromClause: Parser[Seq[Either[String, Operation]]] =
    kw("from") ~> rep1sep(fromRef, ",")

  /** `EVENT STARTS AT e [WITH DURATION d | AND STOPS AT e]` — designates
    * the event-time expression; time-window operators use it instead of
    * the start/ts column convention. */
  /** Arithmetic-only expressions for EVENT clauses: a bare column named
    * `first`/`last` followed by AND must not parse as an aggregate of an
    * AND-aggregate (port_scan.ramen `EVENT STARTS AT first AND STOPS AT
    * last`). */
  private def eventExpr: Parser[Expr] = {
    val atom: Parser[Expr] = number | funCall | varRef | pathRef |
      "(" ~> expr <~ ")"
    val mul = atom ~ rep(("*" | "//" | "/" | "%") ~ atom) ^^ { case h ~ t =>
      t.foldLeft(h) { case (a, op ~ b) => Binop(op, a, b) } }
    mul ~ rep(("+" | "-") ~ mul) ^^ { case h ~ t =>
      t.foldLeft(h) { case (a, op ~ b) => Binop(op, a, b) } }
  }

  private def eventClause: Parser[(Expr, Option[Expr])] =
    kw("event") ~> (kw("starts") | kw("starting")) ~> kw("at") ~> eventExpr ~
      opt((kw("with") ~> kw("duration") ~> eventExpr) ^^ (Left(_): Either[Expr, Expr]) |
          (kw("and") ~> (kw("stops") | kw("stopping")) ~> kw("at") ~> eventExpr)
            ^^ (Right(_): Either[Expr, Expr])) ^^ {
      case start ~ tail => (start, tail.map {
        case Left(dur) => Binop("+", start, dur) // stop = start + duration
        case Right(stop) => stop
      })
    }

  // clause soup: the reference accepts its Aggregate clauses in any order
  private sealed trait Clause
  private case class CSelect(fs: Seq[SelectField]) extends Clause
  private case class CFrom(refs: Seq[Either[String, Operation]]) extends Clause
  private case class CWhere(e: Expr) extends Clause
  private case class CGroup(ks: Seq[Expr]) extends Clause
  private case class CCommit(before: Boolean, cond: Expr,
      keep: Boolean = false) extends Clause
  private case class CCommitN(commit: CCommit, ntf: Option[Expr])
      extends Clause
  private case class CEvery(e: Expr) extends Clause
  private case class CNotify(e: Expr) extends Clause
  private case class CSort(n: Int, until: Option[Expr], by: Seq[Expr])
      extends Clause
  private case class CEvent(start: Expr, stop: Option[Expr]) extends Clause
  private case class CFactors(fs: Seq[String]) extends Clause
  private case object CIgnored extends Clause

  def aggregateOp: Parser[Operation] = {
    val clause: Parser[Clause] =
      // the comma between fields is tolerated missing — the examples
      // corpus omits it between consecutive aliased fields
      // (examples/monitoring/network/hosts.ramen interface/disk blocks)
      (kw("select") | kw("yield")) ~> rep1(selectField <~ opt(",")) ^^ CSelect.apply |
      fromClause ^^ CFrom.apply |
      (kw("where") | kw("when")) ~> expr ^^ CWhere.apply |
      kw("group") ~> kw("by") ~> rep1sep(expr, ",") ^^ CGroup.apply |
      // [COMMIT] [AND] [KEEP ALL | FLUSH] (AFTER|BEFORE|WHEN) cond
      // [COMMIT] [,] [AND] [KEEP ALL | FLUSH] [[,] [AND] NOTIFY e]
      // (AFTER|BEFORE) cond — the NOTIFY may ride inside the commit
      // clause (traffic.ramen `COMMIT, KEEP ALL AND NOTIFY "Traffic"
      // AFTER …`, hosts.ramen `KEEP ALL AND NOTIFY "RAM is low" AFTER …`)
      opt(kw("commit")) ~ opt(",") ~ opt(kw("and")) ~
        opt((kw("keep") ~ opt(kw("all")) ^^^ true) | (kw("flush") ^^^ false)) ~
        opt(opt(",") ~> opt(kw("and")) ~> kw("notify") ~> expr) ~
        ((kw("after") ^^^ false) | (kw("before") ^^^ true)) ~ expr ^^ {
          case _ ~ _ ~ _ ~ keep ~ ntf ~ before ~ cond =>
            CCommitN(CCommit(before, cond, keep.getOrElse(false)), ntf)
        } |
      kw("commit") ~ kw("when") ~> expr ^^ (CCommit(false, _)) |
      kw("every") ~> expr ^^ CEvery.apply |
      eventClause ^^ { case (s, e) => CEvent(s, e) } |
      // factors separate with `,` OR `and` (list_sep_and,
      // `src/RamenParsing.ml:422-426`)
      (kw("factors") | kw("factor")) ~>
        rep1sep(ident, "," | kw("and")) ^^ CFactors.apply |
      // SORT LAST n [OR UNTIL cond] BY e…: bounded input reorder buffer
      // with optional early release (RamenOperation.ml:1280-1292)
      (kw("sort") ~> kw("last") ~> number) ~
        opt((opt(kw("or")) ~ kw("until")) ~> expr) ~
        opt(kw("by") ~> rep1sep(expr, ",")) ^^ {
          case Lit(n: Long) ~ until ~ by =>
            CSort(n.toInt, until, by.getOrElse(Nil))
          case _ ~ until ~ by => CSort(0, until, by.getOrElse(Nil))
        } |
      kw("notify") ~> expr ^^ CNotify.apply |
      (kw("keep") ~ opt(kw("all")) | kw("flush")) ^^^ CIgnored

    // SELECT may be absent when FROM is given (qps.ramen `alert`:
    // FROM + WHERE + NOTIFY): the implicit projection is `*`
    rep1(clause).filter(cs => cs.exists(_.isInstanceOf[CSelect]) ||
        cs.exists(_.isInstanceOf[CFrom])) ^^ { cs0 =>
      val cs = cs0.map {
        case CCommitN(c, _) => c
        case other => other
      }
      val fields0 = cs.collect { case CSelect(fs) => fs }.flatten
      val fields =
        if (fields0.nonEmpty) fields0 else Seq(SelectField(Ref(Seq("*")), None))
      val from = cs.collect { case CFrom(r) => r }.flatten
      val wheres = cs.collect { case CWhere(e) => e }
      Aggregate(fields,
        star = fields.exists(_.expr == Ref(Seq("*"))),
        from = from.collect { case Left(n) => n },
        fromSub = from.collect { case Right(op) => op },
        where = wheres.reduceOption(Binop("and", _, _)),
        groupBy = cs.collect { case CGroup(ks) => ks }.flatten,
        commitBefore = cs.collectFirst { case CCommit(b, _, _) => b }.getOrElse(false),
        commitCond = cs.collectFirst { case CCommit(_, c, _) => c },
        commitKeep = cs.collectFirst { case CCommit(_, _, k) => k }.getOrElse(false),
        every = cs.collectFirst { case CEvery(e) => e },
        notifyName = cs.collectFirst { case CNotify(e) => e }.orElse(
          cs0.collectFirst { case CCommitN(_, Some(e)) => e }),
        sortLast = cs.collectFirst { case CSort(n, _, by) if by.nonEmpty => (n, by) },
        sortUntil = cs.collectFirst {
          case CSort(_, Some(u), by) if by.nonEmpty => u },
        eventStart = cs.collectFirst { case CEvent(e, _) => e },
        eventStop = cs.collectFirst { case CEvent(_, Some(e)) => e },
        factors = cs.collect { case CFactors(fs) => fs }.flatten)
    }
  }

  /** `LISTEN [FOR] NETFLOW|COLLECTD|GRAPHITE [[ON] addr[:p] | [ON] PORT p]
    * [[PROTO] UDP|TCP]` — the reference grammar
    * (`RamenOperation.ml:1411-1438`); a missing port means the protocol's
    * well-known port (`:1346-1355`). The bind address is parsed and
    * discarded (the single-node listener binds the wildcard address, the
    * reference's default). */
  private def listenOp: Parser[Operation] = {
    val portOnly = kw("port") ~> number ^^ {
      case Lit(n: Long) => n.toInt
      case _ => -1
    }
    // `*`, `[*]` or an ipv4 literal, with an optional `:port`
    val hostPort: Parser[Int] =
      """(?:\*|\[\*\]|\d{1,3}(?:\.\d{1,3}){3})(?::\d{1,5})?""".r ^^ { s =>
        s.lastIndexOf(':') match {
          case -1 => -1
          case i => s.substring(i + 1).toInt
        }
      }
    kw("listen") ~> opt(kw("for")) ~> ident ~
      opt(opt(kw("on")) ~> (portOnly | hostPort)) ~
      opt(opt(kw("proto")) ~> (kw("udp") | kw("tcp"))) <~
      opt(kw("from") ~ ("*" | ident)) ^^ {
      case proto ~ port ~ ipProto =>
        val p = proto.toLowerCase
        val wellKnown = p match {
          case "graphite" => 2003
          case "collectd" => 25826
          case _ => 2055 // netflow
        }
        ListenFor(p, port.filter(_ >= 0).getOrElse(wellKnown),
          ipProto.getOrElse("udp"))
    }
  }

  private def rtype: Parser[RType] =
    ident ~ opt("?") ~ opt("""\{[^}]*\}""".r) ^^ { case t ~ n ~ u =>
      RType(t.toLowerCase, n.isDefined, u)
    }

  /** ClickHouse-syntax schema block: `columns format version: 1 / N
    * columns: / \`name\` Type …` (email.ramen, udp.ramen). */
  private def chSchema: Parser[Seq[(String, Ast.RType)]] = {
    def rtypeOfCh(t: String): Ast.RType = {
      def base(s: String): String = s match {
        case "String" => "string"
        case "Float32" | "Float64" => "float"
        case "DateTime" => "u32"
        case "Date" => "u16"
        case fs if fs.startsWith("FixedString(") =>
          "fs" + fs.drop(12).takeWhile(_.isDigit) // fixed n raw bytes
        case "UUID" => "uuid"
        case u if u.startsWith("UInt") => "u" + u.drop(4)
        case i if i.startsWith("Int") => "i" + i.drop(3)
        case other => other.toLowerCase
      }
      if (t.startsWith("Nullable(") && t.endsWith(")"))
        rtypeOfCh(t.drop(9).dropRight(1)).copy(nullable = true)
      else if (t.startsWith("Array(") && t.endsWith(")"))
        Ast.RType(base(t.drop(6).dropRight(1)) + "[]", nullable = false, None)
      else Ast.RType(base(t), nullable = false, None)
    }
    val chField = "`[^`]*`".r ~ """[A-Za-z0-9()]+""".r ^^ {
      case n ~ t => (n.stripPrefix("`").stripSuffix("`"), rtypeOfCh(t))
    }
    kw("columns") ~ kw("format") ~ kw("version") ~ ":" ~ number ~
      number ~ kw("columns") ~ ":" ~> rep1(chField)
  }

  private def readCsvOp: Parser[Operation] =
    kw("read") ~> kw("from") ~> kw("file") ~> stringLit ~
      opt(kw("preprocess") ~ kw("with") ~ stringLit) ~
      opt((kw("then") ~ kw("delete") ~ opt(kw("if") ~ expr)) |
          (kw("delete") ~ kw("if") ~ expr)) ~
      (kw("as") ~> kw("csv")) ~
      rep(kw("separator") ~> stringLit ^^ (("sep", _)) |
          (kw("no") ~ kw("quotes")) ^^^ (("noq", Lit(null))) |
          kw("null") ~> stringLit ^^ (("null", _)) |
          (kw("escape") ~> kw("with") ~> stringLit) ^^ (("esc", _)) |
          (kw("clickhouse") ~ kw("syntax")) ^^^ (("ch", Lit(null)))) ~
      ("(" ~> (chSchema | rep1sep(ident ~ rtype, ",") ^^
          (_.map { case n ~ t => (n, t) })) <~ ")") <~
      // FACTORS and EVENT follow the schema in either order (qps.ramen)
      rep(eventClause ^^^ (()) |
          (kw("factors") | kw("factor")) ~ rep1sep(ident, "," | kw("and"))
            ^^^ (())) ^^ {
      case Lit(path: String) ~ prep ~ _ ~ _ ~ opts ~ fields =>
        def optS(k: String, d: String): String =
          opts.collectFirst { case (`k`, Lit(s: String)) => s }.getOrElse(d)
        ReadCsv(path, fields, optS("sep", ","), optS("null", ""),
          quotes = !opts.exists(_._1 == "noq"),
          preprocessor = prep.collect { case _ ~ Lit(cmd: String) => cmd })
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  private def readRowBinaryOp: Parser[Operation] =
    kw("read") ~> kw("from") ~> kw("file") ~> stringLit ~
      (kw("as") ~> kw("rowbinary")) ~ ("(" ~> chSchema <~ ")") <~
      opt(eventClause) ^^ {
      case Lit(path: String) ~ _ ~ fields => Ast.ReadRowBinary(path, fields)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  /** `READ FROM KAFKA TOPIC "t" [PARTITIONS [0;1]] WITH OPTIONS "k"="v", …
    * AS CSV|ROWBINARY (schema)` (RamenOperation.ml:1528-1547). */
  private def readKafkaOp: Parser[Operation] = {
    val kafkaOption = stringLit ~ ("=" ~> (stringLit | number | boolLit)) ^^ {
      case Lit(k) ~ Lit(v) => (String.valueOf(k), String.valueOf(v))
      case k ~ v => (k.toString, v.toString)
    }
    kw("read") ~> kw("from") ~> kw("kafka") ~> kw("topic") ~> stringLit ~
      opt((kw("partitions") | kw("partition")) ~> "[" ~> rep1sep(number, ";") <~ "]") ~
      (kw("with") ~> kw("options") ~> rep1sep(kafkaOption, ",")) ~
      (kw("as") ~> (kw("csv") | kw("rowbinary"))) ~
      opt(kw("separator") ~> stringLit) ~
      opt(kw("no") ~ kw("quotes")) ~ opt(kw("null") ~ stringLit) ~
      ("(" ~> rep1sep(ident ~ rtype, ",") <~ ")") ^^ {
      case Lit(topic: String) ~ parts ~ opts ~ fmt ~ sep ~ _ ~ _ ~ fields =>
        val sepStr = sep match { case Some(Lit(s: String)) => s; case _ => "," }
        ReadKafka(topic,
          parts.getOrElse(Nil).collect { case Lit(n: Long) => n.toInt },
          opts.toMap, fmt,
          fields.map { case n ~ t => (n, t) }, sepStr)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  private def operation: Parser[Operation] =
    readKafkaOp | readRowBinaryOp | readCsvOp | listenOp | aggregateOp

  private def define: Parser[Func] =
    // modifiers may come before OR after the name: `DEFINE memory PERSIST
    // FOR 1d AS` (hosts.ramen) and `DEFINE PERSIST FOR 1h http AS`
    // (aggregated.ramen) are both accepted by the reference
    kw("define") ~> opt(kw("lazy")) ~>
      opt(kw("persist") ~> kw("for") ~> expr <~
        opt(kw("while") ~ kw("querying") ~ kw("every") ~ expr)) ~ ident ~
      opt(kw("persist") ~> kw("for") ~> expr <~
        opt(kw("while") ~ kw("querying") ~ kw("every") ~ expr)) ~
      opt(kw("best") ~> kw("after") ~> expr) ~
      (kw("as") ~> operation) <~ opt(";") ^^ {
      case pre ~ n ~ persist ~ best ~ op =>
        Func(n, op, persist.orElse(pre), best)
    }

  private def paramDecl: Parser[Param] =
    ident ~
      opt(ident.filter(i => !Set("defaults", "default").contains(i.toLowerCase)) ~
        opt("?") ~ opt("[" ~ opt(number) ~ "]") ~ opt("?")) ~
      opt("""\{[^}]*\}""".r) ~
      opt((kw("defaults") | kw("default")) ~> kw("to") ~> expr) ^^ {
      case n ~ _ ~ _ ~ d => Param(n, d)
    }

  private def parameters: Parser[Seq[Param]] =
    (kw("parameters") | kw("parameter")) ~> rep1sep(paramDecl, ",") <~ ";"

  /** `DECLARE [WITH x SCOPE] name type;` — registers a global variable name
    * (the map type is implied; the compiler backs it with a KV map). */
  private def declare: Parser[String] =
    kw("declare") ~> opt(kw("with") ~ ident ~ kw("scope")) ~> plainIdent <~
      """[^;]*""".r <~ ";"

  /** `RUN IF cond;` — deploy-time condition (experiments.feature). */
  private case class PRunIf(cond: Expr)
  private def runIf: Parser[PRunIf] =
    kw("run") ~> kw("if") ~> expr <~ ";" ^^ PRunIf.apply

  def program: Parser[Program] =
    rep(parameters | declare | runIf | define) ^^ { items =>
      val params = items.collect { case ps: Seq[_] => ps.asInstanceOf[Seq[Param]] }.flatten
      val funcs = items.collect { case f: Func => f }
      val globals = items.collect { case g: String => g }
      val cond = items.collectFirst { case PRunIf(c) => c }
      Program(params, funcs, globals, cond)
    }

  def parseProgram(src: String): Either[String, Program] =
    parseAll(program, src) match {
      case Success(p, _) => Right(p)
      case NoSuccess(msg, rest) =>
        Left(s"$msg at line ${rest.pos.line}:${rest.pos.column}")
      case other => Left(other.toString)
    }

  def parseExpr(src: String): Either[String, Expr] =
    parseAll(expr, src) match {
      case Success(e, _) => Right(e)
      case NoSuccess(msg, rest) =>
        Left(s"$msg at line ${rest.pos.line}:${rest.pos.column}")
      case other => Left(other.toString)
    }
}
