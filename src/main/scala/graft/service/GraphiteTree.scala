package graft.service

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.raql.{Ast, RaqlCompiler}
import graft.raql.Ast.{Aggregate, ListenFor, ReadCsv, ReadKafka}

/** The graphite impersonator's VIRTUAL metrics tree over the REGISTERED
  * programs (`RamenGraphite.ml:95-193`): a metric path is the program
  * name's `/`-components, then the function name, then ONE component per
  * declared FACTOR (enumerating its distinct values over the queried
  * range), then each public numeric non-factor output field as a leaf.
  * Only batch-reachable functions with an event time (start/ts column
  * convention) appear.
  *
  * Components follow the reference's quoting protocol (`split_query` /
  * `fix_quote`, RamenGraphite.ml:51-60,206-245): a value containing `.`
  * is rendered double-quoted as ONE component, query/target strings are
  * split on dots OUTSIDE quotes, and globs match the unquoted value.
  *
  * `find` expands only down to the query's depth (the reference's
  * `end_of_filters` cut — never the full value product); `expandTarget`
  * expands fully, and `render` batches all series of one function into a
  * single scan (time filter + factor-value filters + one hash aggregation
  * on (bucket, factors…) — `RamenGraphite.ml:461-476`'s scan merging).
  *
  * Scale: the tree math is driver-side over the function graph; the only
  * data work is ONE distinct-values job per (function, factor) per
  * request (memoized across walk branches; factors are low-cardinality
  * by contract, capped at [[GraphiteTree.MaxFactorValues]]) and the
  * render scans, which aggregate map-side per (bucket, factors) before
  * the collect of ≤ maxDataPoints × Π|values| rows. */
object GraphiteTree {

  /** One `/metrics/find` entry (reference `metric` record,
    * RamenGraphite.ml:272-275: int flags, allowChildren = expandable). */
  final case class Node(id: String, leaf: Boolean, expandable: Boolean) {
    def text: String = splitQuery(id).last
  }

  /** One fully-expanded render target. `factorVals` holds RAW (unquoted)
    * values; `path` is the quoted rendering. */
  final case class Series(fq: String, factorVals: Seq[(String, String)],
      field: String, path: String)

  /** Factors are enumerable by contract; a runaway high-cardinality column
    * declared as a factor is capped rather than collected unbounded. */
  val MaxFactorValues = 1000

  // --- the reference's component quoting (RamenGraphite.ml:51-60,206-245)

  /** Split a query/target/id on dots OUTSIDE double quotes; quoted
    * components keep their quotes (the reference's `split_query`). */
  def splitQuery(s: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    var start = 0
    var inQuote = false
    while (i < n) {
      s.charAt(i) match {
        case '\\' if inQuote => i += 1 // escaped char inside quotes
        case '"' => inQuote = !inQuote
        case '.' if !inQuote =>
          out += s.substring(start, i)
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    if (inQuote)
      throw new AlertApi.BadRequest("bad quotes in graphite query")
    out += s.substring(start)
    out.result()
  }

  /** Strip surrounding double quotes and undo `\`-escapes
    * (`filter_of_query`'s unquote; the escapes are ours — [[fixQuote]]). */
  def unquote(s: String): String =
    if (s.length > 1 && s.head == '"' && s.last == '"') {
      val t = s.substring(1, s.length - 1)
      if (!t.contains('\\')) t
      else {
        val sb = new StringBuilder(t.length)
        var i = 0
        while (i < t.length) {
          val ch = t.charAt(i)
          if (ch == '\\' && i + 1 < t.length) { sb.append(t.charAt(i + 1)); i += 2 }
          else { sb.append(ch); i += 1 }
        }
        sb.toString
      }
    } else s

  /** Render a raw value as a path component: values containing `.`, `"` or
    * `\` are double-quoted with `\`-escaping ([[splitQuery]] honors the
    * escapes), already-quoted dot-less values unquoted (`fix_quote`).
    * Escaping goes beyond the reference (which leaves embedded quotes
    * bare, making its own ids unsplittable): every value round-trips as
    * ONE well-formed component, so one odd factor value can't poison a
    * whole find response. */
  def fixQuote(s: String): String = {
    val raw = unquote(s)
    if (raw.isEmpty) "\"\""
    else if (raw.exists(c => c == '.' || c == '"' || c == '\\'))
      "\"" + raw.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c => c.toString
      } + "\""
    else raw
  }

  private def matches(globComp: String, v: String): Boolean =
    v.matches(GraphiteApi.componentGlobToRegex(unquote(globComp)))

  private def joinComps(comps: Seq[String]): String =
    comps.map(fixQuote).mkString(".")

  // --- function enumeration ---------------------------------------------

  /** True when every ancestor of the op is a batch source — a static AST
    * walk so that a mere `/metrics/find` GET never compiles a LISTEN/Kafka
    * ancestor (compiling one binds its socket). FROM refs resolve through
    * the compiler's OWN static resolution ([[RaqlCompiler.staticFromTargets]],
    * same priority as compilation — relative `../`, sibling-directory,
    * `#`-suffix and `#_`-instance forms all reach their real target);
    * registered tables and unresolvable refs (whose compile fails loudly,
    * binding nothing) resolve to no functions and count as batch.
    * [[heads]] keeps a compile-time isStreaming belt regardless. */
  private def batchReachable(c: RaqlCompiler, progName: String,
      op: Ast.Operation,
      visiting: Set[String] = Set.empty): Boolean = op match {
    case _: ListenFor | _: ReadKafka => false
    case a: Aggregate =>
      a.fromSub.forall(batchReachable(c, progName, _, visiting)) &&
        a.from.forall { ref =>
          c.staticFromTargets(ref, progName).forall { case (pn, f) =>
            val key = s"$pn/${f.name}"
            visiting(key) || batchReachable(c, pn, f.op, visiting + key)
          }
        }
    case _ => true // ReadCsv / ReadRowBinary
  }

  /** Memo for [[heads]], keyed on the compiler's registry generation: a
    * `/metrics/find` burst against an unchanged registry walks and
    * compiles NOTHING after the first request; any register/unregister/
    * registerTable/environment change bumps the generation and the next
    * find re-walks once. Weak compiler key so a dropped compiler's plans
    * can be collected. */
  private val headsCache =
    new java.util.WeakHashMap[RaqlCompiler, (Long, Seq[(String, Ast.Func, Vector[String])])]()
  /** Uncached walk count — observability for the memo's spec. */
  private[graft] val headsWalks = new java.util.concurrent.atomic.AtomicLong

  /** (progName, func, path head = program components :+ function name) for
    * every table-like registered function with an event time. */
  private def heads(c: RaqlCompiler): Seq[(String, Ast.Func, Vector[String])] =
    headsCache.synchronized {
      val g = c.registryGeneration
      headsCache.get(c) match {
        case (`g`, cached) => cached
        case _ =>
          val walked = headsUncached(c)
          headsCache.put(c, (g, walked))
          walked
      }
    }

  private def headsUncached(c: RaqlCompiler): Seq[(String, Ast.Func, Vector[String])] = {
    headsWalks.incrementAndGet()
    c.registeredPrograms.toSeq.sortBy(_._1).flatMap { case (pn, prog) =>
      prog.funcs.collect {
        case f if (f.op match {
          case _: Aggregate | _: ReadCsv => true
          case _ => false
        }) && batchReachable(c, pn, f.op) =>
          (pn, f, pn.split("/").filterNot(_.isEmpty).toVector :+ f.name)
      }
    }.filter { case (pn, f, _) =>
      scala.util.Try(c.compile(s"$pn/${f.name}")).toOption
        .exists { df =>
          !df.isStreaming && {
            val cols = df.columns.toSet
            cols("start") || cols("ts")
          }
        }
    }
  }

  private def factorsOf(f: Ast.Func): Seq[String] = f.op match {
    case a: Aggregate => a.factors
    case _ => Nil
  }

  private def timeCol(df: DataFrame) = {
    val cols = df.columns.toSet
    if (cols("start")) Some(col("start").cast("double"))
    else if (cols("ts")) Some(unix_micros(col("ts")) / 1e6)
    else None
  }

  /** Distinct values of a factor over the (optional) time range — the
    * reference's `RamenTimeseries.possible_values`, computed from the
    * function's frame instead of a persisted tracking file. */
  def possibleValues(c: RaqlCompiler, fq: String, factor: String,
      since: Option[Double] = None, until: Option[Double] = None): Seq[String] = {
    val df = c.compile(fq)
    val ranged = timeCol(df) match {
      case Some(t) =>
        val s = since.map(v => t >= v).getOrElse(lit(true))
        val u = until.map(v => t < v).getOrElse(lit(true))
        df.filter(s && u)
      case None => df
    }
    ranged.select(col(factor).cast("string")).na.drop().distinct()
      .limit(MaxFactorValues).collect().map(_.getString(0)).sorted.toSeq
  }

  /** Per-request memo so factor N's distinct-scan runs ONCE, not once per
    * combination of earlier factors' matched values. */
  private final class ValueCache(c: RaqlCompiler,
      since: Option[Double], until: Option[Double]) {
    private val m = scala.collection.mutable.Map.empty[(String, String), Seq[String]]
    def apply(fq: String, factor: String): Seq[String] =
      m.getOrElseUpdate((fq, factor), possibleValues(c, fq, factor, since, until))
  }

  private def numericFields(df: DataFrame, factors: Set[String]): Seq[String] =
    df.schema.fields.toSeq
      .filterNot(_.name.startsWith("_"))
      .filter(f => f.dataType.isInstanceOf[NumericType] && !factors(f.name))
      .map(_.name)

  /** `/metrics/find?query=…`: tree nodes at the query's depth. Node ids
    * are the QUERY with only its LAST component completed — inner globs
    * stay verbatim (`id = prefix ^ text`, RamenGraphite.ml:281-309;
    * graphite_metrics.feature expects `"id":"*.*.*.f1.1"` for
    * `*.*.*.f1.*`) — Grafana re-queries with the id as its next prefix. */
  def find(c: RaqlCompiler, query: String,
      since: Option[Double] = None, until: Option[Double] = None): Seq[Node] = {
    val comps = splitQuery(query)
    // the raw query minus its last component, trailing dot kept
    // (the reference's String.rchop)
    val idPrefix = query.substring(0, query.length - comps.last.length)
    def node(completed: String, leaf: Boolean): Node =
      Node(idPrefix + fixQuote(completed), leaf = leaf, expandable = !leaf)
    val cache = new ValueCache(c, since, until)
    val nodes = heads(c).flatMap { case (pn, f, head) =>
      val fq = s"$pn/${f.name}"
      if (comps.length <= head.length) {
        // the query ends inside the program/function components
        if (comps.indices.forall(i => matches(comps(i), head(i))))
          Seq(node(head(comps.length - 1), leaf = false))
        else Nil
      } else if (!head.indices.forall(i => matches(comps(i), head(i)))) Nil
      else {
        val rest = comps.drop(head.length)
        val factors = factorsOf(f)
        lazy val fields = numericFields(c.compile(fq), factors.toSet)
        def walk(fi: Int, ri: Int): Seq[Node] = {
          val last = ri == rest.length - 1
          if (fi < factors.length) {
            val vals0 = cache(fq, factors(fi))
            // no values yet → one empty component so deeper levels stay
            // reachable (the reference's FactorAll, :130-140)
            val vals = if (vals0.isEmpty) Seq("") else vals0
            val m = vals.filter(matches(rest(ri), _))
            if (last) m.map(v => node(v, leaf = false))
            else if (m.nonEmpty) walk(fi + 1, ri + 1)
            else Nil
          } else if (last)
            fields.filter(matches(rest(ri), _)).map(fd =>
              node(fd, leaf = true))
          else Nil
        }
        walk(0, 0)
      }
    }
    nodes.groupBy(_.id).toSeq.sortBy(_._1).map { case (id, ns) =>
      Node(id, ns.exists(_.leaf), ns.exists(_.expandable))
    }
  }

  /** FULL expansion of a render target — every component expands, unlike
    * find (`RamenGraphite.ml:425-430`). A target reaches a function only
    * when its component count is exactly head + factors + field. */
  def expandTarget(c: RaqlCompiler, target: String,
      since: Option[Double] = None, until: Option[Double] = None): Seq[Series] =
    expandTarget(c, target, new ValueCache(c, since, until))

  private def expandTarget(c: RaqlCompiler, target: String,
      cache: ValueCache): Seq[Series] = {
    val comps = splitQuery(target)
    heads(c).flatMap { case (pn, f, head) =>
      val fq = s"$pn/${f.name}"
      val factors = factorsOf(f)
      if (comps.length != head.length + factors.length + 1) Nil
      else if (!head.indices.forall(i => matches(comps(i), head(i)))) Nil
      else {
        val fields = numericFields(c.compile(fq), factors.toSet)
          .filter(matches(comps.last, _))
        if (fields.isEmpty) Nil
        else {
          def walk(fi: Int, prefix: Vector[String]): Seq[Vector[String]] =
            if (fi == factors.length) Seq(prefix)
            else {
              val vals0 = cache(fq, factors(fi))
              val vals = if (vals0.isEmpty) Seq("") else vals0
              vals.filter(matches(comps(head.length + fi), _))
                .flatMap(v => walk(fi + 1, prefix :+ v))
            }
          for (fvals <- walk(0, Vector.empty); fd <- fields)
            yield Series(fq, factors.zip(fvals), fd,
              joinComps(head ++ fvals :+ fd))
        }
      }
    }
  }

  /** Graphite `/render` over the virtual tree: per series, `num` even
    * buckets over [since, until) with the bucket mean, None where no rows
    * landed (graphite's null points). One scan per FUNCTION covers all
    * its series; multiple targets expand together so a function shared by
    * several still scans once. */
  def render(c: RaqlCompiler, targets: Seq[String], since: Double,
      until: Double, maxDataPoints: Int = 100)
      : Seq[(String, Seq[(Long, Option[Double])])] = {
    require(until > since, "empty render range")
    val num = math.max(1, maxDataPoints)
    val step = (until - since) / num
    // ONE cache for the whole request: N targets over the same function
    // share each (function, factor) distinct-values job
    val cache = new ValueCache(c, Some(since), Some(until))
    val series = targets.flatMap(expandTarget(c, _, cache)).distinct
    series.groupBy(_.fq).toSeq.sortBy(_._1).flatMap { case (fq, ss) =>
      val df = c.compile(fq)
      val t = timeCol(df).getOrElse(
        throw new AlertApi.BadRequest(s"table $fq has no event time"))
      val factors = ss.head.factorVals.map(_._1)
      val fields = ss.map(_.field).distinct
      // filter to the factor values some series wants ("" = the FactorAll
      // placeholder of a valueless factor — no rows to filter anyway)
      val wanted: Map[String, Set[String]] =
        factors.map(fa => fa -> ss.map(_.factorVals.toMap.apply(fa)).toSet).toMap
      var filtered = df.filter(t >= since && t < until)
      for ((fa, vs) <- wanted if !vs.contains(""))
        filtered = filtered.filter(
          col(fa).cast("string").isin(vs.toSeq: _*))
      val bucket = floor((t - lit(since)) / step).cast("int").as("_bucket")
      val keys = bucket +: factors.map(fa => col(fa).cast("string").as(fa))
      val rows = filtered.groupBy(keys: _*)
        .agg(avg(col(fields.head)).as(fields.head),
          fields.tail.map(fd => avg(col(fd)).as(fd)): _*)
        .collect()
      ss.sortBy(_.path).map { s =>
        val pts = rows.iterator.filter { r =>
          val b = r.getInt(0)
          b >= 0 && b < num && s.factorVals.forall { case (fa, v) =>
            v == "" || String.valueOf(r.getAs[Any](fa)) == v }
        }.map { r =>
          val v = r.getAs[Any](s.field)
          r.getInt(0) -> Option(v).map(_.asInstanceOf[Number].doubleValue())
        }.toMap
        s.path -> (0 until num).map(b =>
          ((since + b * step).toLong, pts.getOrElse(b, None))).toSeq
      }
    }
  }
}
