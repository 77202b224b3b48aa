package graft.service

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.types.{DataType, NumericType, StringType, StructType}

/** The reference's pivot DSL: a high-level "pivot a (start, $type, $value)
  * stream into one column per selected type" operation, described as data
  * (`/root/reference/src/pivot.type:1-34`) and transpiled to a RaQL program
  * (`src/CodeGen_Pivot2RaQL.ml:14-124`) by the build rule
  * (`src/RamenMake.ml:149-170`). The shared WHERE printer for the
  * `{lhs, op, rhs}` simple filters is `src/CodeGen_SimpleFilter2RaQL.ml:15-40`:
  * the rhs string is parsed against the column's type, `in [x]` collapses to
  * `= x`, and a nullable lhs wraps in `COALESCE(…, false)`.
  *
  * Spark-first shape: the generated text is ordinary RaQL for
  * [[graft.raql.RaqlParser]]; registered through the compiler it becomes one
  * hash-aggregation plan — `TRUNCATE(start, duration)` plus the group-by
  * fields as grouping keys, each output column a conditional aggregate over
  * `IF type_field LIKE sel THEN value_field` — exactly the conditional-
  * aggregation shape Catalyst turns into a single-pass partial agg, so a
  * pivot over 100 TB is one map-combine shuffle on the (bucket, groups) key.
  */
object PivotApi {

  import AlertApi.{BadRequest, SimpleFilter}

  /** `top as { n; by }` (pivot.type:28). */
  final case class TopSpec(n: Int, by: Option[String] = None)

  /** One output field: which `$type` values feed it and which aggregates
    * to emit (pivot.type:15-29; avg defaults true like the reference). */
  final case class PivotField(
      name: String,
      types: Seq[String] = Nil,
      count: Boolean = false,
      first: Boolean = false,
      last: Boolean = false,
      min: Boolean = false,
      max: Boolean = false,
      sum: Boolean = false,
      avg: Boolean = true,
      percentiles: Seq[Double] = Nil,
      tops: Seq[TopSpec] = Nil)

  /** The pivot description (pivot.type:7-34). */
  final case class Pivot(
      from: String,
      where: Seq[SimpleFilter] = Nil,
      typeField: String,
      valueField: String,
      fields: Seq[PivotField],
      groupBy: Seq[String] = Nil,
      duration: Double,
      maxLateness: Double = 0.0)

  /** Comparison ops a simple filter may carry — anything else is rejected
    * rather than interpolated into the generated program. The LIKE family
    * matches the reference grammar (RamenExpr.ml:1078-1112): `like`,
    * `not like`, and the case-sensitive variants, whose canonical op
    * strings are `cs-like` / `not cs-like` but whose RaQL surface syntax
    * is `[NOT] CASE SENSITIVE LIKE`. */
  private[service] val FilterOps: Set[String] =
    Set("=", "!=", "<>", "<", "<=", ">", ">=",
      "like", "not like", "cs-like", "not cs-like")

  /** Canonical op → RaQL surface syntax (identity except the LIKE family,
    * whose canonical `cs-like` spellings are not themselves parseable). */
  private def opSurface(op: String): String = op match {
    case "like"        => "LIKE"
    case "not like"    => "NOT LIKE"
    case "cs-like"     => "CASE SENSITIVE LIKE"
    case "not cs-like" => "NOT CASE SENSITIVE LIKE"
    case o             => o.toUpperCase
  }

  private def fmt(d: Double): String =
    if (d == d.floor && d.abs < 1e15) d.toLong.toString else d.toString

  private def strLit(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def valueLit(t: DataType, s: String): String = t match {
    case StringType => strLit(s)
    case _: NumericType =>
      if (s.matches("""-?\d+(\.\d+)?([eE][-+]?\d+)?"""))
        s
      else throw new BadRequest(s"'$s' is not a numeric literal")
    case org.apache.spark.sql.types.BooleanType =>
      s.trim.toLowerCase match {
        case b @ ("true" | "false") => b
        case _ => throw new BadRequest(s"'$s' is not a boolean literal")
      }
    // anything else (timestamps, dates, …) is QUOTED — a raw passthrough
    // would let an rhs string inject arbitrary RaQL into the generated
    // program
    case _ => strLit(s)
  }

  /** The typed WHERE printer (CodeGen_SimpleFilter2RaQL.ml:15-40): rhs
    * literals take the lhs column's type, `in`/`not in` parse the rhs as a
    * `[a;b;…]` vector (a singleton collapses to `=`/`<>`), and a nullable
    * lhs wraps the test in `COALESCE(…, false)` so the filter is total. */
  def printFilter(schema: StructType, filters: Seq[SimpleFilter]): String =
    if (filters.isEmpty) "true"
    else filters.map { w =>
      val f = schema.fields.find(_.name == w.lhs).getOrElse(
        throw new BadRequest(s"no column ${w.lhs} in parent output"))
      // normalize internal whitespace BEFORE the in/not-in match so
      // "not  in" takes the vector-rhs branch like "not in" (and not the
      // general branch's scalar printer)
      val (op, rhs) = (w.op.toLowerCase.trim.replaceAll("\\s+", " "),
          w.rhs.trim) match {
        case (o @ ("in" | "not in"), r) =>
          val items =
            (if (r.startsWith("[") && r.endsWith("]"))
              r.substring(1, r.length - 1) else r)
              .split(";").map(_.trim).filter(_.nonEmpty).toSeq
          if (items.isEmpty)
            throw new BadRequest(s"empty IN list for ${w.lhs}")
          else if (items.sizeIs == 1)
            (if (o == "in") "=" else "<>", valueLit(f.dataType, items.head))
          else (o.toUpperCase,
            items.map(valueLit(f.dataType, _)).mkString("[", "; ", "]"))
        case (o, r) =>
          // the op string is interpolated into generated RaQL — anything
          // outside the comparison whitelist is an injection vector (the
          // rhs quoting above is bypassable via op = "= 0 OR 1 =")
          val safe = if (o.isEmpty) "=" else o
          if (!PivotApi.FilterOps.contains(safe))
            throw new BadRequest(s"unsupported filter op '${w.op}'")
          // LIKE patterns are string constants whatever the lhs type
          // (RamenExpr.ml:1067 rejects non-string patterns)
          val rhs =
            if (safe.endsWith("like")) strLit(r)
            else valueLit(f.dataType, r)
          (opSurface(safe), rhs)
      }
      val s = s"${w.lhs} $op $rhs"
      if (f.nullable) s"COALESCE($s, false)" else s
    }.mkString(" AND ")

  /** RaQL percentile spec: `95th` / `[90th; 99th]` (floats keep their
    * fraction: `97.5th`). */
  private def pctSpec(ps: Seq[Double]): String = {
    def one(p: Double) = s"${fmt(p)}th"
    if (ps.sizeIs == 1) one(ps.head) else ps.map(one).mkString("[", "; ", "]")
  }

  /** Transpile a pivot into RaQL source (CodeGen_Pivot2RaQL.generate,
    * `CodeGen_Pivot2RaQL.ml:34-124`): one private `_name` column holds the
    * value when the type selector matches, the requested aggregates read
    * it, the group key is `group_by + TRUNCATE(start, duration)`, and the
    * window commits once inputs pass `duration + max_lateness` beyond the
    * group's start. */
  def toRaql(p: Pivot, parentSchema: StructType): String = {
    if (p.fields.isEmpty) throw new BadRequest("pivot has no fields")
    if (p.duration <= 0) throw new BadRequest("pivot duration must be > 0")
    Seq(p.typeField, p.valueField).foreach { c =>
      if (!parentSchema.fieldNames.contains(c))
        throw new BadRequest(s"no column $c in parent output")
    }
    p.groupBy.foreach { c =>
      if (!parentSchema.fieldNames.contains(c))
        throw new BadRequest(s"no column $c in parent output")
    }
    val sb = new StringBuilder
    sb ++= "-- Pivot operation automatically generated by graft\n\n"
    sb ++= "DEFINE pivot AS\n"
    sb ++= s"  FROM ${p.from}\n"
    sb ++= s"  WHERE ${printFilter(parentSchema, p.where)}\n"
    sb ++= "  SELECT\n"
    sb ++= s"    TRUNCATE(start, ${fmt(p.duration)}) AS start,\n"
    p.groupBy.foreach { f => sb ++= s"    $f,\n" }
    p.fields.foreach { field =>
      // default selector: the output field's own name as the type value
      val types = if (field.types.isEmpty) Seq(field.name) else field.types
      val sel = types.map(t => s"${p.typeField} LIKE ${strLit(t)}")
        .mkString(" OR ")
      sb ++= s"    (IF $sel THEN ${p.valueField}) AS _${field.name},\n"
      val numAggrs = Seq(field.count, field.first, field.last, field.min,
        field.max, field.sum, field.avg, field.percentiles.nonEmpty,
        field.tops.nonEmpty).count(identity)
      if (numAggrs == 0)
        throw new BadRequest(s"pivot field ${field.name} has no aggregate")
      def alias(aggr: String): String =
        if (numAggrs == 1) field.name else s"${aggr}_${field.name}"
      def simple(op: String): Unit =
        sb ++= s"    $op(_${field.name}) AS ${alias(op.toLowerCase)},\n"
      if (field.count) simple("COUNT")
      if (field.first) simple("FIRST")
      if (field.last) simple("LAST")
      if (field.min) simple("MIN")
      if (field.max) simple("MAX")
      if (field.sum) simple("SUM")
      if (field.avg) simple("AVG")
      if (field.percentiles.nonEmpty)
        sb ++= s"    ${pctSpec(field.percentiles)} PERCENTILE " +
          s"(_${field.name}) AS ${alias("perc")},\n"
      field.tops.zipWithIndex.foreach { case (t, i) =>
        // the reference aliases every top `top_<field>` (colliding for 2+
        // tops on one field); keep its name for the first and suffix only
        // the 2nd+ so multiple tops stay distinct output columns
        val a = if (i == 0) alias("top") else s"${alias("top")}_$i"
        val by = t.by.map(b => s" BY $b").getOrElse("")
        sb ++= s"    LIST TOP ${t.n} (_${field.name})$by AS $a,\n"
      }
    }
    // stay clear from the last delimiter (the reference emits the same)
    sb ++= "    true AS _delim\n"
    val gb = p.groupBy :+ s"TRUNCATE(start, ${fmt(p.duration)})"
    sb ++= s"  GROUP BY ${gb.mkString(", ")}\n"
    sb ++= s"  COMMIT AFTER in.start > out.start + ${fmt(p.duration + p.maxLateness)};"
    sb.toString
  }

  // --- JSON decoding (pivot.type field names, kebab-case like the wire) --

  private def optD(n: JsonNode, k: String, default: Double): Double =
    Option(n.get(k)).map(_.asDouble).getOrElse(default)
  private def optB(n: JsonNode, k: String, default: Boolean): Boolean =
    Option(n.get(k)).map(_.asBoolean).getOrElse(default)
  private def strs(n: JsonNode, k: String): Seq[String] =
    Option(n.get(k)).toSeq.flatMap(_.elements().asScala).map(_.asText)

  def parsePivot(n: JsonNode): Pivot = {
    def req(k: String): JsonNode = Option(n.get(k)).getOrElse(
      throw new BadRequest(s"pivot missing $k"))
    val fields = Option(n.get("fields")).toSeq
      .flatMap(_.elements().asScala).map { f =>
        PivotField(
          name = Option(f.get("name")).map(_.asText).getOrElse(
            throw new BadRequest("pivot field missing name")),
          types = strs(f, "types"),
          count = optB(f, "count", default = false),
          first = optB(f, "first", default = false),
          last = optB(f, "last", default = false),
          min = optB(f, "min", default = false),
          max = optB(f, "max", default = false),
          sum = optB(f, "sum", default = false),
          avg = optB(f, "avg", default = true),
          percentiles = Option(f.get("percentiles")).toSeq
            .flatMap(_.elements().asScala).map(_.asDouble),
          tops = Option(f.get("tops")).toSeq
            .flatMap(_.elements().asScala).map { t =>
              TopSpec(
                Option(t.get("n")).map(_.asInt).getOrElse(
                  throw new BadRequest("top missing n")),
                Option(t.get("by")).filterNot(_.isNull).map(_.asText))
            })
      }
    Pivot(
      from = req("from").asText,
      where = AlertApi.parseFilters(n.get("where")),
      typeField = req("type-field").asText,
      valueField = req("value-field").asText,
      fields = fields,
      groupBy = strs(n, "group-by"),
      duration = Option(n.get("duration")).map(_.asDouble).getOrElse(
        throw new BadRequest("pivot missing duration")),
      maxLateness = optD(n, "max-lateness", 0.0))
  }
}
