package graft.service

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.raql.{Ast, RaqlCompiler, RaqlParser}
import graft.raql.Ast._

/** The reference's alerting API: the v1 alert description
  * (`/root/reference/src/RamenApi.ml:295-343`), its transpilation to a RaQL
  * program (`src/CodeGen_Alert2RaQL.ml`), and the JSON-RPC surface
  * (`version` / `get-tables` / `get-columns` / `set-alerts`,
  * `RamenApi.ml:715-759`) that the reference GUI drives.
  *
  * Spark-first shape: `set-alerts` transpiles each alert to RaQL text,
  * registers it with the [[RaqlCompiler]], and the resulting program
  * compiles to ordinary DataFrame plans — the alert pipeline is the same
  * declarative plan as any user query (filter → windowed hysteresis state →
  * transition-filtered NOTIFY), so it runs batch for replay and streaming
  * for live with no separate engine.
  *
  * Differences from the reference, by design:
  *  - thresholds are constants (the reference's v1 API likewise refuses to
  *    express baseline thresholds);
  *  - no time_step re-aggregation: our tables are already event-complete
  *    parquet/stream rows; a GROUP BY per alert group is emitted instead.
  */
object AlertApi {

  /** `{lhs, op, rhs}` simple filter (RamenApi.ml AlertInfoV1). */
  final case class SimpleFilter(lhs: String, rhs: String, op: String = "=")

  /** The v1 alert description. Field names mirror the JSON keys. */
  final case class AlertV1(
      enabled: Boolean = true,
      where: Seq[SimpleFilter] = Nil,
      having: Seq[SimpleFilter] = Nil,
      threshold: Double,
      recovery: Double,
      duration: Double = 0.0,
      ratio: Double = 1.0,
      timeStep: Double = 0.0,
      id: String = "",
      descTitle: String = "",
      descFiring: String = "",
      descRecovery: String = "")

  private val knownKeys = Set("enabled", "where", "having", "threshold",
    "recovery", "duration", "ratio", "time-step", "id", "desc-title",
    "desc-firing", "desc-recovery", "tops", "carry-fields", "carry-csts",
    "group-by")

  /** GROUP BY keys that are plainly forwarded output fields — the
    * reference's `group_keys_of_operation` (CodeGen_Alert2RaQL.ml:20-50). */
  def groupKeysOf(op: Operation): Seq[String] = op match {
    case a: Aggregate =>
      val simple = a.groupBy.collect {
        case Ref(Seq(n)) if n != "start" && n != "stop" => n
      }.toSet
      a.fields.collect {
        case SelectField(Ref(Seq(n)), alias) if simple(n) => alias.getOrElse(n)
      }
    case _ => Nil
  }

  private def fmt(d: Double): String =
    if (d == d.floor && d.abs < 1e15) d.toLong.toString else d.toString

  /** Transpile one alert into a RaQL program over `table` (mirrors
    * CodeGen_Alert2RaQL.generate's filtered → ok → alert chain; the commit
    * condition becomes a stateful WHERE on a final `notif` function since
    * batch mode commits end-of-input). Returns RaQL source text accepted by
    * [[graft.raql.RaqlParser]]. */
  def toRaql(table: String, column: String, a: AlertV1,
      schema: org.apache.spark.sql.types.StructType,
      groupKeys: Seq[String]): String = {
    val tableCols = schema.fieldNames.toSeq
    // typed WHERE/HAVING printing (the reference's Alert2RaQL shares
    // CodeGen_SimpleFilter2RaQL with the pivot transpiler — so do we)
    def filterRaql(fs: Seq[SimpleFilter]): String =
      PivotApi.printFilter(schema, fs)
    // one alert context per group not pinned by an equality filter
    val groupBy = groupKeys.filterNot(k =>
      a.where.exists(w => w.op == "=" && w.lhs == k))
    val carried = ((Seq(column) ++ groupBy ++ a.having.map(_.lhs)).distinct ++
      Seq("start", "stop").filter(tableCols.contains)).filterNot(_ == "value")
    val sb = new StringBuilder
    sb ++= s"-- Alert ${a.id} on $table/$column (graft transpiler)\n\n"
    sb ++= "DEFINE filtered AS\n"
    sb ++= s"  FROM $table\n"
    sb ++= s"  WHERE ${filterRaql(a.where)}\n"
    sb ++= "  SELECT " + (carried :+ s"$column AS value").mkString(", ") + ";\n\n"

    sb ++= "DEFINE ok AS\n"
    sb ++= "  FROM filtered\n"
    sb ++= "  SELECT *,\n"
    val havingGate =
      if (a.having.isEmpty) "value AS filtered_value"
      else s"IF ${filterRaql(a.having)} THEN value AS filtered_value"
    sb ++= s"    $havingGate,\n"
    // healthy (true) while filtered_value is NULL; hysteresis state holds
    sb ++= "    COALESCE(IF filtered_value IS NOT NULL THEN " +
      s"hysteresis(filtered_value, ${fmt(a.recovery)}, ${fmt(a.threshold)}), true) AS ok\n"
    if (groupBy.nonEmpty) sb ++= s"  GROUP BY ${groupBy.mkString(", ")}\n"
    sb.setLength(sb.length - 1); sb ++= ";\n\n"

    val firing =
      if (a.duration > 0)
        s"COALESCE(avg (past ${fmt(a.duration)}s of (float (not ok))) >= ${fmt(a.ratio)}, false)"
      else "not ok"
    val descFiring =
      if (a.descFiring.nonEmpty) a.descFiring
      else s"$column went above the configured threshold (${fmt(a.threshold)})."
    val descRecovery =
      if (a.descRecovery.nonEmpty) a.descRecovery
      else s"The value of $column recovered."
    sb ++= "DEFINE alert AS\n"
    sb ++= "  FROM ok\n"
    sb ++= "  SELECT *,\n"
    sb ++= s"    $firing AS firing,\n"
    sb ++= s"""    "${a.id}" AS id,\n"""
    sb ++= "    1 AS certainty,\n"
    sb ++= s"""    "$column" AS alert_column,\n"""
    sb ++= s"    ${fmt(a.threshold)} AS thresholds,\n"
    sb ++= s"    ${fmt(a.duration)} AS duration,\n"
    sb ++= s"""    (IF firing THEN "$descFiring" ELSE "$descRecovery") AS desc\n"""
    // GROUP BY only when firing itself is stateful (PAST ratio): a grouped
    // SELECT without running state batch-compiles to one row per group
    if (groupBy.nonEmpty && a.duration > 0)
      sb ++= s"  GROUP BY ${groupBy.mkString(", ")}\n"
    sb.setLength(sb.length - 1); sb ++= ";\n\n"

    val title =
      if (a.id.nonEmpty) a.id
      else if (a.descTitle.nonEmpty) a.descTitle
      else column
    val baseName = s""""$title on $column ($table) triggered""""
    val notifyName =
      if (groupBy.isEmpty) baseName
      else baseName + " || \" for \" || " +
        groupBy.map(f => s""""$f:" || string($f)""").mkString(" || \", \" || ")
    // the reference commits on AFTER CHANGED firing |? firing; batch mode
    // commits end-of-input, so the transition test runs as a stateful WHERE
    sb ++= "DEFINE notif AS\n"
    sb ++= "  FROM alert\n"
    sb ++= "  WHERE (changed firing) |? firing\n"
    sb ++= "  SELECT *\n"
    if (groupBy.nonEmpty) sb ++= s"  GROUP BY ${groupBy.mkString(", ")}\n"
    sb ++= s"  NOTIFY $notifyName;\n"
    sb.toString
  }

  // --- JSON-RPC ---------------------------------------------------------

  private val M = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  final class BadRequest(msg: String) extends Exception(msg)

  private[service] def parseFilters(n: JsonNode): Seq[SimpleFilter] =
    Option(n).toSeq.flatMap(_.elements().asScala).map { f =>
      SimpleFilter(
        Option(f.get("lhs")).map(_.asText).getOrElse(
          throw new BadRequest("filter missing lhs")),
        Option(f.get("rhs")).map(_.asText).getOrElse(""),
        Option(f.get("op")).map(_.asText).getOrElse("="))
    }

  private def parseAlert(n: JsonNode): AlertV1 = {
    n.fieldNames().asScala.foreach { k =>
      if (!knownKeys(k)) throw new BadRequest(s"unknown alert field '$k'")
    }
    def d(key: String, default: Double): Double =
      Option(n.get(key)).map(_.asDouble).getOrElse(default)
    def s(key: String): String = Option(n.get(key)).map(_.asText).getOrElse("")
    def filters(key: String): Seq[SimpleFilter] = parseFilters(n.get(key))
    if (n.get("threshold") == null) throw new BadRequest("missing threshold")
    AlertV1(
      enabled = Option(n.get("enabled")).forall(_.asBoolean),
      where = filters("where"),
      having = filters("having"),
      threshold = d("threshold", 0),
      recovery = d("recovery", d("threshold", 0)),
      duration = d("duration", 0),
      ratio = d("ratio", 1),
      timeStep = d("time-step", 0),
      id = s("id"),
      descTitle = s("desc-title"),
      descFiring = s("desc-firing"),
      descRecovery = s("desc-recovery"))
  }

  /** The API version string (reference: ramen's release tag). */
  val version = "graft-1.0"
}

/** Stateful API service bound to one compiler (= one "running instance"):
  * holds the registered alerts like the reference's confserver source tree
  * (`sources/api/alerts/...`). */
final class AlertApi(spark: SparkSession, compiler: RaqlCompiler) {
  import AlertApi._

  /** (table, column) -> alerts, plus the program key each transpiled to. */
  private val alerts =
    mutable.Map.empty[(String, String), Seq[(String, AlertV1)]]

  private def funcOf(table: String): Option[(String, Ast.Func)] = {
    // `prog#_/func` selects any program implementing `prog` (RamenApi.ml
    // func_of_table); we chop the suffix and match the base name
    val (progName, funcName) = table.lastIndexOf('/') match {
      case -1 => ("", table)
      case i => (table.substring(0, i), table.substring(i + 1))
    }
    val base = progName.stripSuffix("#_")
    compiler.registeredPrograms.collectFirst {
      case (pn, prog) if pn == base || pn.stripSuffix("#_") == base =>
        prog.funcs.find(_.name == funcName).map(f => (pn, f))
    }.flatten
  }

  def getTables(prefix: String): Map[String, String] =
    compiler.registeredPrograms.flatMap { case (pn, prog) =>
      prog.funcs
        // never compile LISTEN/Kafka funcs here (compiling one opens its
        // socket); tables are SELECTs and file reads
        .filter(f => f.op match {
          case _: Aggregate | _: ReadCsv => true
          case _ => false
        })
        .map(f => s"$pn/${f.name}")
        .filter(_.startsWith(prefix))
        // the reference lists only functions with an event time; ours is
        // the start/stop/ts column convention
        .filter { fq =>
          scala.util.Try(compiler.compile(fq).columns.toSet).toOption
            .exists(cols => cols("start") || cols("stop") || cols("ts"))
        }
        .map(_ -> "")
    }

  /** column -> (type, factor?, group-key?, alerts) for each table. */
  def getColumns(tables: Seq[String]): Map[String, Map[String, ObjectNode]] =
    tables.flatMap { t =>
      funcOf(t).map { case (pn, func) =>
        val keys = groupKeysOf(func.op).toSet
        val factors = func.op match {
          case a: Aggregate => a.factors.toSet
          case _ => Set.empty[String]
        }
        val df = compiler.compile(s"$pn/${func.name}")
        t -> df.schema.fields.filterNot(_.name.startsWith("_")).map { f =>
          val o = F.objectNode()
          o.put("type", f.dataType.simpleString)
          o.put("factor", factors(f.name))
          o.put("group-key", keys(f.name))
          val arr = o.putArray("alerts")
          alerts.getOrElse((t, f.name), Nil).foreach { case (_, a) =>
            val an = arr.addObject()
            an.put("enabled", a.enabled)
            an.put("threshold", a.threshold)
            an.put("recovery", a.recovery)
            an.put("id", a.id)
          }
          f.name -> o
        }.toMap
      }
    }.toMap

  /** Register the given alerts, dropping any previous ones for the same
    * (table, column); empty list = delete. Returns the program keys. */
  def setAlerts(table: String, column: String, as: Seq[AlertV1]): Seq[String] = {
    val (pn, func) = funcOf(table).getOrElse(
      throw new BadRequest(s"Program for table $table does not exist"))
    val fq = s"$pn/${func.name}"
    val schema = compiler.compile(fq).schema
    val cols = schema.fieldNames.toSeq
    if (!cols.contains(column))
      throw new BadRequest(s"No column $column in table $table")
    val bad = as.flatMap(a => a.where ++ a.having).map(_.lhs)
      .find(l => !cols.contains(l))
    bad.foreach(l => throw new BadRequest(s"No column $l in table $table"))
    // drop previous programs for this (table, column)
    alerts.getOrElse((table, column), Nil).foreach { case (key, _) =>
      compiler.unregister(key)
    }
    val keys = groupKeysOf(func.op)
    val registered = as.zipWithIndex.map { case (a, i) =>
      val progName = s"api/alerts/${if (a.id.nonEmpty) a.id else s"$fq/$column/$i"}"
      val src = toRaql(fq, column, a, schema, keys)
      RaqlParser.parseProgram(src) match {
        case Right(p) => compiler.register(progName, p)
        case Left(e) => throw new BadRequest(
          s"generated alert program does not parse: $e\n$src")
      }
      (progName, a)
    }
    alerts((table, column)) = registered
    registered.map(_._1)
  }

  /** Register (or replace) one pivot under `api/pivots/<name>`: transpile
    * to RaQL (the reference's `RamenMake.ml:149-170` "pivot" build rule
    * driving `CodeGen_Pivot2RaQL`) and register with the compiler; the
    * `pivot` function then compiles/runs like any user program. Returns the
    * program key. */
  def setPivot(name: String, p: PivotApi.Pivot): String = {
    val (pn, func) = funcOf(p.from).getOrElse(
      throw new BadRequest(s"Program for table ${p.from} does not exist"))
    val fq = s"$pn/${func.name}"
    val schema = compiler.compile(fq).schema
    if (!schema.fieldNames.contains("start"))
      throw new BadRequest(s"table ${p.from} has no start column")
    val src = PivotApi.toRaql(p.copy(from = fq), schema)
    val progName = s"api/pivots/$name"
    RaqlParser.parseProgram(src) match {
      case Right(prog) =>
        compiler.unregister(progName)
        compiler.register(progName, prog)
      case Left(e) => throw new BadRequest(
        s"generated pivot program does not parse: $e\n$src")
    }
    progName
  }

  /** The NOTIFY stream of a registered alert: compile + run its `notif`. */
  def notifications(progName: String): Option[DataFrame] =
    compiler.notifications(s"$progName/notif")

  /** Compiler-backed graphite tree (see [[GraphiteTree]]) — the httpd's
    * `/metrics/find` and `/render` when no external metrics frame is
    * bound. */
  def graphiteFind(query: String, since: Option[Double] = None,
      until: Option[Double] = None): Seq[GraphiteTree.Node] =
    GraphiteTree.find(compiler, query, since, until)

  def graphiteRender(targets: Seq[String], since: Double, until: Double,
      maxDataPoints: Int): Seq[(String, Seq[(Long, Option[Double])])] =
    GraphiteTree.render(compiler, targets, since, until, maxDataPoints)

  /** `get-timeseries` (RamenApi.ml:436-533): per table, the selected
    * fields bucketized over [since, until) with optional simple filters
    * and factor grouping. One hash aggregation per table — the q17
    * timeseries shape. Returns (times, per-table labels + values). */
  def getTimeseries(since: Double, until: Double, numPoints0: Int,
      timeStep: Double, bucketTime: String,
      data: Seq[(String, (Seq[String], Seq[SimpleFilter], Seq[String]))]):
      (Seq[Double], Seq[(String, (Seq[Seq[String]], Seq[Seq[Seq[Option[Double]]]]))]) = {
    if (since > until) throw new BadRequest("since must come before until")
    if (numPoints0 <= 0 && timeStep <= 0)
      throw new BadRequest("must set either num-points or time-step")
    if (numPoints0 > 0 && timeStep > 0)
      throw new BadRequest("must set only one of num-points or time-step")
    // compute_num_points (RamenTimeseries.ml:215-227): time-step aligns
    // the bucket grid; num-points uses the raw range
    val (num, s0, u0) =
      if (numPoints0 > 0) (numPoints0, since, until)
      else {
        val s = math.floor(since / timeStep) * timeStep
        val u = math.ceil(until / timeStep) * timeStep
        (math.max(1, math.round((u - s) / timeStep).toInt), s, u)
      }
    val step = (u0 - s0) / num
    val off = bucketTime.toLowerCase match {
      case "begin" => 0.0
      case "middle" => 0.5
      case "end" | "" => 1.0
      case other => throw new BadRequest(
        s"The only possible values for bucket_time are begin, middle and end (got $other)")
    }
    val times = (0 until num).map(i => s0 + (i + off) * step)
    import org.apache.spark.sql.functions._
    val values = data.map { case (table, (sel, where, factors)) =>
      val (pn, func) = funcOf(table).getOrElse(
        throw new BadRequest(s"Program for table $table does not exist"))
      val df = compiler.compile(s"$pn/${func.name}")
      val cols = df.columns.toSeq
      (sel ++ where.map(_.lhs) ++ factors).find(c => !cols.contains(c))
        .foreach(c => throw new BadRequest(
          s"No column $c in table $table (columns: ${cols.mkString(", ")})"))
      val t =
        if (cols.contains("start")) col("start").cast("double")
        else if (cols.contains("ts")) unix_micros(col("ts")) / 1e6
        else throw new BadRequest(s"table $table has no event time")
      val filtered = where.foldLeft(df.filter(t >= s0 && t < u0)) { (d, w) =>
        val c = col(w.lhs)
        w.op match {
          case "=" | "" => d.filter(c.cast("string") === w.rhs)
          case "!=" | "<>" => d.filter(c.cast("string") =!= w.rhs)
          case ">" => d.filter(c > w.rhs.toDouble)
          case ">=" => d.filter(c >= w.rhs.toDouble)
          case "<" => d.filter(c < w.rhs.toDouble)
          case "<=" => d.filter(c <= w.rhs.toDouble)
          case other => throw new BadRequest(s"unsupported filter op $other")
        }
      }
      val bucket = floor((t - lit(s0)) / step).cast("int").as("_bucket")
      val keys = bucket +: factors.map(col)
      val rows = filtered.groupBy(keys: _*)
        .agg(avg(col(sel.head)).as(sel.head),
          sel.tail.map(f => avg(col(f)).as(f)): _*)
        .collect()
      val labels: Seq[Seq[String]] = {
        val ls = rows.map(r => factors.map(f => String.valueOf(r.getAs[Any](f))).toList)
          .distinct.sortBy(_.mkString(" ")).map(_.toSeq).toSeq
        if (ls.isEmpty && factors.isEmpty) Seq(Seq.empty) else ls
      }
      val labelIdx = labels.zipWithIndex.toMap
      val grid = Array.fill(num, labels.size, sel.size)(Option.empty[Double])
      rows.foreach { r =>
        val b = r.getInt(0)
        if (b >= 0 && b < num) {
          val li = labelIdx(factors.map(f => String.valueOf(r.getAs[Any](f))).toSeq)
          sel.indices.foreach { fi =>
            val v = r.getAs[Any](sel(fi))
            grid(b)(li)(fi) =
              Option(v).map(_.asInstanceOf[Number].doubleValue())
          }
        }
      }
      table -> (labels, grid.map(_.map(_.toSeq).toSeq).toSeq)
    }
    (times, values)
  }

  // --- JSON-RPC dispatch ------------------------------------------------

  /** Handle one JSON-RPC request body; always returns a JSON response
    * (result or error) echoing the request id verbatim. */
  def handle(body: String): String = {
    var id: JsonNode = F.nullNode()
    try {
      val req = M.readTree(body)
      id = Option(req.get("id")).getOrElse(F.nullNode())
      val params = req.get("params")
      // method names dispatch case-insensitively — ASCII lowering like the
      // reference's lowercase_ascii (Locale.ROOT dodges the Turkish-I trap)
      val result: JsonNode = req.get("method").asText()
        .toLowerCase(java.util.Locale.ROOT) match {
        case "version" => F.textNode(AlertApi.version)
        case "get-tables" =>
          val prefix = Option(params).flatMap(p => Option(p.get("prefix")))
            .map(_.asText).getOrElse("")
          val o = F.objectNode()
          getTables(prefix).foreach { case (k, v) => o.put(k, v) }
          o
        case "get-columns" =>
          val names = Option(params).toSeq
            .flatMap(_.elements().asScala).map(_.asText)
          val o = F.objectNode()
          getColumns(names).foreach { case (t, colsMap) =>
            val to = o.putObject(t)
            colsMap.foreach { case (c, spec) => to.set[JsonNode](c, spec) }
          }
          o
        case "get-timeseries" =>
          val p = Option(params).getOrElse(throw new BadRequest("missing params"))
          def pd(k: String): Double =
            Option(p.get(k)).map(_.asDouble).getOrElse(0.0)
          val numPts = Option(p.get("num-points"))
            .orElse(Option(p.get("num_points"))).map(_.asInt).getOrElse(0)
          val data = Option(p.get("data")).toSeq
            .flatMap(_.properties().asScala).map { e =>
              val spec = e.getValue
              def strs(k: String): Seq[String] =
                Option(spec.get(k)).toSeq.flatMap(_.elements().asScala)
                  .map(_.asText).toSeq
              e.getKey -> ((strs("select"),
                parseFilters(spec.get("where")), strs("factors")))
            }
          val (times, values) = getTimeseries(pd("since"), pd("until"),
            numPts, pd("time-step"),
            Option(p.get("bucket-time")).map(_.asText).getOrElse("end"), data)
          val o = F.objectNode()
          val ta = o.putArray("times")
          times.foreach { t =>
            if (t == t.floor && t.abs < 1e15) ta.add(t.toLong) else ta.add(t)
          }
          val vo = o.putObject("values")
          values.foreach { case (tbl, (labels, grid)) =>
            val to = vo.putObject(tbl)
            val cl = to.putArray("column_labels")
            labels.foreach { l => val la = cl.addArray(); l.foreach(la.add) }
            val cv = to.putArray("column_values")
            grid.foreach { perLabel =>
              val ba = cv.addArray()
              perLabel.foreach { perField =>
                val fa = ba.addArray()
                perField.foreach {
                  case Some(v) => fa.add(v)
                  case None => fa.addNull()
                }
              }
            }
          }
          o
        case "set-pivots" =>
          // graft extension: the reference ships pivots as source files
          // through confserver (RamenMake's "pivot" rule); here the same
          // JSON payloads register through the RPC surface
          val o = F.objectNode()
          Option(params).foreach { p =>
            p.properties().asScala.foreach { e =>
              o.put(e.getKey, setPivot(e.getKey, PivotApi.parsePivot(e.getValue)))
            }
          }
          o
        case "set-alerts" =>
          Option(params).foreach { p =>
            p.properties().asScala.foreach { e =>
              val table = e.getKey
              e.getValue.properties().asScala.foreach { ce =>
                val column = ce.getKey
                val as = ce.getValue.asInstanceOf[ArrayNode]
                  .elements().asScala.map(parseAlert).toSeq
                setAlerts(table, column, as)
              }
            }
          }
          F.nullNode()
        case m => throw new BadRequest(s"unknown method $m")
      }
      val resp = F.objectNode()
      resp.set[JsonNode]("result", result)
      resp.set[JsonNode]("id", id)
      M.writeValueAsString(resp)
    } catch {
      case e: Exception =>
        val resp = F.objectNode()
        resp.put("error", Option(e.getMessage).getOrElse(e.toString))
        resp.set[JsonNode]("id", id)
        M.writeValueAsString(resp)
    }
  }
}
