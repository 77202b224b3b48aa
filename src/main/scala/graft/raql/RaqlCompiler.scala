package graft.raql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Ast._

/** Batch compiler: RaQL AST → DataFrame plans.
  *
  * Covers the relational core of the reference's `Aggregate` operation
  * (`/root/reference/src/raql_operation.type:6-53`) under end-of-input
  * commit semantics — SELECT/WHERE/GROUP BY, aggregate functions with the
  * aggregate-of-array unification (`avg group x` ≡ `avg x`,
  * `src/raql_expr.type:209-215`), `keep null` (skip_nulls=false), the
  * `sum(distinct x)` counting idiom, percentiles, SPLIT generators
  * (cartesian explode), YIELD, and READ…AS CSV with the RaQL type algebra.
  *
  * Streaming commit conditions (`COMMIT BEFORE in.start >= out.stop`) and
  * feedback variables (`previous.*`) route to graft.streaming.CommitHarness
  * instead and are rejected here.
  */
final class RaqlCompiler(spark: SparkSession, baseDir: String) {

  /** Parsed programs by name (e.g. "fixtures/cars" → its Program). */
  private var programs = Map.empty[String, Program]
  private val compiled = scala.collection.mutable.Map.empty[String, DataFrame]

  def register(name: String, p: Program): Unit = programs += name -> p

  /** Expose an existing DataFrame as a parent (`FROM <key>`): how RaQL
    * programs read this engine's tables (parquet, Kafka, …). */
  def registerTable(key: String, df: DataFrame): Unit =
    compiled(key) = df

  def sparkType(t: RType): DataType = t.base match {
    case "bool" => BooleanType
    case "char" | "string" => StringType
    case "float" => DoubleType
    case "u8" => ShortType
    case "u16" => IntegerType
    case "u24" | "u32" | "u40" | "u48" | "u56" | "u64" => LongType
    case "u128" | "i128" => DecimalType(39, 0)
    case "i8" => ByteType
    case "i16" => ShortType
    case "i24" | "i32" => IntegerType
    case "i40" | "i48" | "i56" | "i64" => LongType
    case other => throw new UnsupportedOperationException(s"type $other")
  }

  private def castType(name: String): Option[String] = name match {
    case "u8" | "i8" => Some("smallint")
    case "u16" | "i16" => Some("int")
    case "u24" | "u32" | "i24" | "i32" => Some("bigint")
    case "u40" | "u48" | "u56" | "u64" | "i40" | "i48" | "i56" | "i64" => Some("bigint")
    case "u128" | "i128" => Some("decimal(39,0)")
    case "float" => Some("double")
    case "string" => Some("string")
    case "bool" => Some("boolean")
    case _ => None
  }

  /** Output column auto-name, following the reference's fn_operand shape
    * (`min horsepower` → `min_horsepower`). */
  def autoName(e: Expr): String = e match {
    case Ref(path) => path.last
    case AggCall("group", op, _) => autoName(op)
    case AggCall(fn, op, _) =>
      val f = fn.stripPrefix("aggr_")
      s"${f}_${autoName(op)}"
    case FunCall(name, args) if castType(name).isDefined && args.nonEmpty =>
      autoName(args.head)
    case FunCall(name, args) if args.nonEmpty => s"${name}_${autoName(args.head)}"
    case FunCall(name, _) => name
    case PercentileCall(_, op) => s"percentile_${autoName(op)}"
    case Unop(op, e0) => s"${op}_${autoName(e0)}"
    case Lit(v) => String.valueOf(v).replaceAll("[^A-Za-z0-9]", "_")
    case _ => "f"
  }

  private def unsupported(what: String) =
    throw new UnsupportedOperationException(what)

  /** Does this expression contain an aggregate call (after unification)? */
  private def hasAgg(e: Expr): Boolean = e match {
    case AggCall(_, _, _) | PercentileCall(_, _) => true
    case Binop(_, l, r) => hasAgg(l) || hasAgg(r)
    case Unop(_, x) => hasAgg(x)
    case FunCall(_, args) => args.exists(hasAgg)
    case CaseExpr(br, el) =>
      br.exists { case (c, v) => hasAgg(c) || hasAgg(v) } || el.exists(hasAgg)
    case IsNull(x, _) => hasAgg(x)
    case VectorLit(items) => items.exists(hasAgg)
    case _ => false
  }

  private def collectSplits(e: Expr, acc: scala.collection.mutable.ListBuffer[FunCall]): Unit =
    e match {
      case f @ FunCall("split", _) => acc += f
      case Binop(_, l, r) => collectSplits(l, acc); collectSplits(r, acc)
      case Unop(_, x) => collectSplits(x, acc)
      case FunCall(_, args) => args.foreach(collectSplits(_, acc))
      case CaseExpr(br, el) =>
        br.foreach { case (c, v) => collectSplits(c, acc); collectSplits(v, acc) }
        el.foreach(collectSplits(_, acc))
      case IsNull(x, _) => collectSplits(x, acc)
      case VectorLit(items) => items.foreach(collectSplits(_, acc))
      case _ => ()
    }

  /** Compile a scalar/aggregate expression to a Column. `splits` maps SPLIT
    * generator calls to their pre-exploded columns. */
  def compileExpr(e: Expr, params: Map[String, Expr],
      splits: Map[FunCall, Column] = Map.empty): Column = {
    def go(e: Expr): Column = e match {
      case f @ FunCall("split", _) if splits.contains(f.asInstanceOf[FunCall]) =>
        splits(f.asInstanceOf[FunCall])
      case Lit(null) => lit(null)
      case Lit(v: BigDecimal) => lit(v.bigDecimal)
      case Lit(v) => lit(v)
      case Ref(Seq("*")) => col("*")
      case Ref(Seq("in", rest @ _*)) => col(rest.mkString("."))
      case Ref(Seq("param", p)) if params.contains(p) =>
        go(params(p))
      case Ref(Seq(name)) if params.contains(name) => go(params(name))
      case Ref(Seq(name)) => col(name)
      case Ref(path) if path.head == "previous" || path.head == "out" =>
        unsupported(s"feedback variable ${path.mkString(".")} (streaming harness)")
      case Ref(path) => col(path.mkString("."))
      case Unop("not", x) => !go(x)
      case Unop("neg", x) => -go(x)
      case Unop(op, _) => unsupported(s"unop $op")
      case Binop(op, l, r) =>
        val (a, b) = (go(l), go(r))
        op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "/" => a / b
          case "//" => floor(a / b)
          case "%" => a % b
          case "^" => pow(a, b)
          case "=" => a === b
          case "<>" | "!=" => a =!= b
          case "<" => a < b
          case "<=" => a <= b
          case ">" => a > b
          case ">=" => a >= b
          case "and" => a && b
          case "or" => a || b
          case "||" => concat(a, b)
          case "like" => r match {
            case Lit(pat: String) => a.like(pat)
            case _ => unsupported("LIKE with non-literal pattern")
          }
          case "in" =>
            // item-in-vector, substring-in-string (reference doc expr.ml:626);
            // a NULL needle is NULL (SQL semantics)
            if (l == Lit(null)) lit(null).cast("boolean")
            else r match {
              case VectorLit(_) => array_contains(b, a)
              case Lit(_: String) => b.contains(a)
              case _ => array_contains(b, a)
            }
          case "starts_with" => a.startsWith(b)
          case "ends_with" => a.endsWith(b)
          case "&" => a.bitwiseAND(b)
          case "|" => a.bitwiseOR(b)
          case "#" => a.bitwiseXOR(b)
          case "<<" => call_function("shiftleft", a, b)
          case ">>" => call_function("shiftright", a, b)
          case other => unsupported(s"binop $other")
        }
      case IsNull(x, false) => go(x).isNull
      case IsNull(x, true) => go(x).isNotNull
      case CaseExpr(branches, el) =>
        val w = branches.tail.foldLeft(when(go(branches.head._1), go(branches.head._2))) {
          case (acc, (c, v)) => acc.when(go(c), go(v))
        }
        el.map(e0 => w.otherwise(go(e0))).getOrElse(w)
      case VectorLit(items) => array(items.map(go): _*)
      case FunCall(name, args) => compileFun(name, args, go)
      case agg: AggCall => compileAgg(agg, go)
      case PercentileCall(ps, op) => compilePercentile(ps, op, go)
    }
    go(e)
  }

  private def compileFun(name: String, args: Seq[Expr], go: Expr => Column): Column =
    (name, args) match {
      case (n, Seq(x)) if castType(n).isDefined => go(x).cast(castType(n).get)
      case (n, Seq(x)) if n.endsWith("?") && castType(n.dropRight(1)).isDefined =>
        go(x).try_cast(castType(n.dropRight(1)).get) // nullable cast: NULL on failure
      case ("coalesce", as) => coalesce(as.map(go): _*)
      case ("round", Seq(x)) => round(go(x), 0)
      case ("round", Seq(x, Lit(s: Long))) => round(go(x), s.toInt)
      case ("floor", Seq(x)) => floor(go(x))
      case ("ceil", Seq(x)) => ceil(go(x))
      case ("abs", Seq(x)) => abs(go(x))
      case ("sqrt", Seq(x)) => when(go(x) >= 0, sqrt(go(x)))
      case ("exp", Seq(x)) => exp(go(x))
      case ("log", Seq(x)) => when(go(x) > 0, log(go(x)))
      case ("log10", Seq(x)) => when(go(x) > 0, log10(go(x)))
      case ("random", Seq()) => rand()
      case ("now", Seq()) => unix_timestamp().cast("double")
      case ("age", Seq(x)) => unix_timestamp().cast("double") - go(x)
      case ("length", Seq(x)) => length(go(x)).cast("int")
      case ("lower", Seq(x)) => lower(go(x))
      case ("upper", Seq(x)) => upper(go(x))
      case ("basename", Seq(x)) => element_at(split(go(x), "/"), -1)
      case ("min", as) if as.size > 1 => least(as.map(go): _*)
      case ("max", as) if as.size > 1 => greatest(as.map(go): _*)
      case ("reldiff", Seq(a, b)) =>
        val (x, y) = (go(a), go(b))
        when(x === y, 0.0).otherwise(abs(x - y) / greatest(abs(x), abs(y)))
      case ("truncate", Seq(x)) => floor(go(x))
      case ("truncate", Seq(x, s)) => floor(go(x) / go(s)) * go(s)
      case ("hash", Seq(x)) => xxhash64(go(x))
      case ("sparkline", Seq(x)) => go(x).cast("string") // cosmetic
      case ("get", Seq(i, coll)) =>
        // RaQL GET is 0-based and NULL out of bounds; element_at is 1-based
        i match {
          case Lit(n: Long) => element_at(go(coll), n.toInt + 1)
          case _ => element_at(go(coll), (go(i) + 1).cast("int"))
        }
      case ("tuple", items) =>
        struct(items.zipWithIndex.map { case (e, i) => go(e).as(s"_${i + 1}") }: _*)
      case ("chr", Seq(x)) => chr(go(x))
      case ("index", Seq(s0, c)) => instr(go(s0), go(c).cast("string")) - 1
      case ("substring", Seq(s0, a, b)) =>
        // python-style slice with negative indices (doc expr.ml:702)
        (a, b) match {
          case (Lit(start: Long), Lit(stop: Long)) if start >= 0 && stop >= 0 =>
            substring(go(s0), start.toInt + 1, (stop - start).toInt)
          case _ => unsupported("SUBSTRING with dynamic/negative bounds")
        }
      case ("countrycode", Seq(x)) => lit(null).cast("string") // needs a geo table
      case ("format_time", Seq(Lit(fmt: String), t)) =>
        date_format(timestamp_seconds(go(t)), fmt)
      case ("split", _) =>
        unsupported("split generator outside SELECT field")
      case (other, _) => unsupported(s"function $other/${args.size}")
    }

  private def compileAgg(a: AggCall, go: Expr => Column): Column = {
    // aggregate-of-array unification: agg (group x) ≡ agg x
    val operand = a.operand match {
      case AggCall("group", inner, _) => inner
      case other => other
    }
    // sum (cast (distinct x)) — the RaQL count-distinct idiom
    (a.fn, operand) match {
      case ("sum", FunCall(c, Seq(AggCall("distinct", e, _)))) if castType(c).isDefined =>
        return count_distinct(go(e))
      case ("sum", AggCall("distinct", e, _)) =>
        return count_distinct(go(e))
      case _ => ()
    }
    val c = go(operand)
    val keepNulls = a.modifiers.contains("keep_nulls")
    def withKeepNulls(agg: Column): Column =
      if (!keepNulls) agg
      else when(max(when(c.isNull, 1).otherwise(0)) === 1, lit(null)).otherwise(agg)
    a.fn match {
      case "min" => withKeepNulls(min(c))
      case "max" => withKeepNulls(max(c))
      case "sum" => withKeepNulls(sum(c))
      case "avg" => withKeepNulls(avg(c))
      case "first" => first(c)
      case "last" => last(c)
      case "count" if a.modifiers.contains("distinct") => count_distinct(c)
      case "count" => count(c)
      case "aggr_and" | "all" => call_function("bool_and", c)
      case "aggr_or" | "any" => call_function("bool_or", c)
      case "bitor" => call_function("bit_or", c)
      case "bitand" => call_function("bit_and", c)
      case "bitxor" => call_function("bit_xor", c)
      case "group" => collect_list(c)
      case other => unsupported(s"aggregate $other (streaming harness)")
    }
  }

  /** Reference percentile: element at index floor(p/100·(n-1)) of the
    * sorted values (`/root/reference/src/CodeGenLib.ml:158-297`). */
  private def compilePercentile(ps: Seq[Double], op: Expr, go: Expr => Column): Column = {
    val inner = op match {
      case AggCall("group", e, _) => e
      case e => e
    }
    val sorted = sort_array(collect_list(go(inner)))
    def at(p: Double): Column =
      element_at(sorted, (floor(lit(p) / 100.0 * (size(sorted) - 1)) + 1).cast("int"))
    if (ps.size == 1) at(ps.head) else array(ps.map(at): _*)
  }

  /** Compile `prog/func` (and its parents) to a DataFrame. */
  def compile(key: String): DataFrame = compiled.getOrElseUpdate(key, {
    val (progName, funcName) = key.lastIndexOf('/') match {
      case -1 => ("", key)
      case i => (key.substring(0, i), key.substring(i + 1))
    }
    val prog = programs.getOrElse(progName,
      throw new NoSuchElementException(s"program $progName"))
    val func = prog.funcs.find(_.name == funcName).getOrElse(
      throw new NoSuchElementException(s"function $key"))
    val params: Map[String, Expr] =
      prog.params.flatMap(p => p.default.map(p.name -> _)).toMap
    compileOp(func.op, progName, params)
  })

  private def resolveFrom(ref: String, progName: String): DataFrame = {
    if (compiled.contains(ref)) return compiled(ref) // registered tables
    val candidates = Seq(
      ref,                                   // fully qualified prog/func
      s"$progName/$ref",                     // sibling function
      ref.split('/').toSeq match {           // relative program path
        case parts if parts.length > 1 =>
          (progName.split('/').dropRight(1) ++ parts).mkString("/")
        case _ => ref
      })
    candidates.collectFirst {
      case c if lookupable(c) => compile(c)
    }.getOrElse(throw new NoSuchElementException(s"FROM $ref (from $progName)"))
  }

  private def lookupable(key: String): Boolean = {
    val i = key.lastIndexOf('/')
    val (p, f) = if (i == -1) ("", key) else (key.substring(0, i), key.substring(i + 1))
    programs.get(p).exists(_.funcs.exists(_.name == f))
  }

  private def compileOp(op: Operation, progName: String,
      params: Map[String, Expr]): DataFrame = op match {
    case ReadCsv(path, fields, sep) =>
      val schema = StructType(fields.map { case (n, t) =>
        StructField(n, sparkType(t), nullable = t.nullable,
          metadata = t.units.map(u =>
            new MetadataBuilder().putString("units", u).build())
            .getOrElse(Metadata.empty))
      })
      // CSV paths are relative to the declaring program's directory
      val full = new java.io.File(new java.io.File(baseDir,
        progName).getParentFile, path).getPath
      // single partition: RaQL first/last/lag depend on file arrival order
      graft.sources.CsvSource.read(spark, full, schema,
        graft.sources.CsvSource.CsvSpec(separator = sep, nullStr = "")).coalesce(1)

    case agg: Aggregate =>
      val parents =
        agg.from.map(resolveFrom(_, progName)) ++
          agg.fromSub.map(compileOp(_, progName, params))
      val base: DataFrame = parents match {
        case Nil => spark.range(1).toDF("_unit") // YIELD / EVERY source
        case dfs => dfs.reduce(_.unionByName(_, allowMissingColumns = true))
      }
      val filtered = agg.where match {
        case Some(w) if !hasAgg(w) => base.filter(compileExpr(w, params))
        case Some(w) => unsupported(s"stateful WHERE (streaming harness): $w")
        case None => base
      }
      // SPLIT generators: explode each occurrence, cartesian when several
      val splitBuf = scala.collection.mutable.ListBuffer.empty[FunCall]
      agg.fields.foreach(f => collectSplits(f.expr, splitBuf))
      var src = filtered
      var splitCols = Map.empty[FunCall, Column]
      splitBuf.toList.distinct.zipWithIndex.foreach { case (fc, i) =>
        val FunCall(_, Seq(sepE, strE)) = fc: @unchecked
        val sepLit = sepE match {
          case Lit(s: String) => s
          case other => throw new UnsupportedOperationException(s"split sep $other")
        }
        val strCol = compileExpr(strE, params, splitCols)
        // escape regex metachars by hand (Spark's split chokes on \Q..\E)
        val sepRe = sepLit.replaceAll("""([.\[\]{}()*+?^$|\\])""", """\\$1""")
        src = src.select(col("*"),
          explode(split(strCol, sepRe)).as(s"_split_$i"))
        splitCols += fc -> col(s"_split_$i")
      }
      val named = agg.fields.map { f =>
        val name = f.alias.getOrElse(autoName(f.expr))
        (f.expr, name)
      }
      if (agg.fields.exists(f => hasAgg(f.expr))) {
        if (agg.groupBy.nonEmpty) {
          // grouping columns come back from groupBy() itself — only the
          // aggregate fields go through agg(), then project in field order
          val keys = agg.groupBy.map(k => compileExpr(k, params, splitCols))
          val aggCols = named.collect { case (e, n) if hasAgg(e) =>
            compileExpr(e, params, splitCols).as(n) }
          src.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
            .select(named.map { case (e, n) =>
              if (hasAgg(e)) col(n)
              else compileExpr(e, params, splitCols).as(n) }: _*)
        } else {
          val cols = named.map { case (e, n) =>
            compileExpr(e, params, splitCols).as(n) }
          src.agg(cols.head, cols.tail: _*)
        }
      } else {
        src.select(named.map { case (e, n) =>
          compileExpr(e, params, splitCols).as(n) }: _*)
      }
  }
}

object RaqlCompiler {
  /** Parse + register a set of .ramen sources rooted at `baseDir`; keys are
    * paths without the .ramen suffix (`fixtures/cars`). */
  def fromSources(spark: SparkSession, baseDir: String,
      sources: Map[String, String]): Either[String, RaqlCompiler] = {
    val c = new RaqlCompiler(spark, baseDir)
    val errs = sources.flatMap { case (name, src) =>
      RaqlParser.parseProgram(src) match {
        case Right(p) => c.register(name, p); None
        case Left(e) => Some(s"$name: $e")
      }
    }
    if (errs.isEmpty) Right(c) else Left(errs.mkString("; "))
  }
}
