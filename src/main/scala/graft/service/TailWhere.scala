package graft.service

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `ramen tail --where` filters over a table
  * (tailing.feature; `RamenSerialization.ml:238-274`'s `filter_tuple_by`):
  * each filter is `<field> <op> <value>` with ops `=`, `!=`/`<>`, `<=`,
  * `>=`, `<`, `>`, `in`, `not in`; `in`-lists are `[v;v;…]`; repeated
  * filters AND together, and an unknown field is a client error NAMING
  * the field (the feature asserts "ramen must mention z"). */
object TailWhere {

  // the \b before in/not-in keeps backtracking from carving an operator
  // out of the field name itself ("xin [1;2]" must be a parse error, not
  // a filter on column x)
  private val Rx =
    """(?i)^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\bnot\s+in\b|\bin\b|!=|<>|<=|>=|=|<|>)\s*(.+?)\s*$""".r

  /** Bare numbers type as numbers, `"…"` as strings, true/false/null as
    * themselves, anything else as a string — the reference enlarges the
    * parsed value to the column's type; Spark's comparison coercion does
    * the same job. */
  private def valueOf(s0: String): Any = {
    val s = s0.trim
    if (s.length > 1 && s.head == '"' && s.last == '"')
      s.substring(1, s.length - 1)
    else s.toLowerCase match {
      case "true" => true
      case "false" => false
      case "null" => null
      case _ => s.toLongOption.orElse(s.toDoubleOption).getOrElse(s)
    }
  }

  def apply(df: DataFrame, where: String): Column = where match {
    case Rx(f, op0, v) =>
      if (!df.columns.contains(f))
        throw new AlertApi.BadRequest(s"unknown field $f in where filter")
      val c = col(f)
      op0.toLowerCase.replaceAll("\\s+", " ") match {
        case "=" => valueOf(v) match {
          case null => c.isNull // structural null compare, like the CLI
          case x => c === lit(x)
        }
        case "!=" | "<>" => valueOf(v) match {
          case null => c.isNotNull
          case x => c =!= lit(x)
        }
        case "<=" => c <= lit(valueOf(v))
        case ">=" => c >= lit(valueOf(v))
        case "<" => c < lit(valueOf(v))
        case ">" => c > lit(valueOf(v))
        case inOp =>
          val body = v.trim
          if (!(body.startsWith("[") && body.endsWith("]")))
            throw new AlertApi.BadRequest(s"$inOp needs a [v;v;…] list")
          val vals = body.substring(1, body.length - 1).split(";").toSeq
            .map(valueOf)
          val in = c.isin(vals: _*)
          if (inOp == "in") in else !in
      }
    case _ =>
      throw new AlertApi.BadRequest(s"cannot parse where filter '$where'")
  }
}
