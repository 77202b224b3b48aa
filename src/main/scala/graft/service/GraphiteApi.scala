package graft.service

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graphite-protocol read API over a metrics Dataset — the reference's
  * `/metrics/find` and `/render` endpoints (`RamenGraphite.ml`,
  * `RamenApi.ml:139-160`) re-expressed as DataFrame transforms; an HTTP
  * layer would map straight onto these.
  *
  * Scale: `find` aggregates over distinct truncated paths (tiny), `render`
  * is a filter (target glob + time range, both pushdown-friendly) followed
  * by one hash aggregation on (path, bucket) — same two-scan-free shape as
  * the q17 timeseries read, no sort until the final per-series ordering.
  */
object GraphiteApi {

  /** Glob for ONE already-split path component: `*`/`?` may match dots —
    * the component boundary is established by quote-aware splitting
    * ([[GraphiteTree.splitQuery]]), and the reference matches generic
    * Globs against RAW factor values (which can contain dots, e.g. IPs). */
  def componentGlobToRegex(glob: String): String = buildGlobRegex(glob, ".")

  /** Graphite glob → anchored Java regex: `*` matches within a path
    * component, `?` one char, `{a,b}` alternation, `[...]` char class. */
  def globToRegex(glob: String): String = buildGlobRegex(glob, "[^.]")

  /** `one` is the regex for a single wildcard position — `[^.]` for whole
    * paths, `.` for one component; chosen during GENERATION so a
    * user-written `[^.]` char class (or a `[^.]` literal inside an
    * alternation's `\Q…\E` quoting) is never rewritten after the fact. */
  private def buildGlobRegex(glob: String, one: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(one).append('*')
        case '?' => sb.append(one)
        case '{' =>
          val close = glob.indexOf('}', i)
          val alts = glob.substring(i + 1, close).split(",")
          sb.append(alts.map(java.util.regex.Pattern.quote)
            .mkString("(", "|", ")"))
          i = close
        case '[' =>
          val close = glob.indexOf(']', i)
          sb.append(glob.substring(i, close + 1))
          i = close
        case c if ".\\+()^$|".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("$").toString
  }

  /** `/metrics/find?query=a.*.c`: the distinct tree nodes at the query's
    * depth whose path matches, with graphite's leaf/expandable flags. */
  def find(metrics: DataFrame, pathCol: String, query: String): DataFrame = {
    val depth = query.split("\\.").length
    val parts = split(col(pathCol), "\\.")
    val node = concat_ws(".", slice(parts, 1, depth))
    metrics
      .select(node.as("id"), (size(parts) > depth).as("deeper"))
      .filter(col("id").rlike(globToRegex(query)))
      .groupBy("id")
      .agg(max(not(col("deeper"))).as("leaf"),
        max(col("deeper")).as("expandable"))
      .orderBy("id")
  }

  /** `/render?target=…&from=…&until=…&maxDataPoints=n`: per matching
    * series, n even time buckets with the bucket mean (graphite's default
    * consolidation). Returns (path, bucket_start, value). */
  def render(points: DataFrame, pathCol: String, timeCol: String,
      valueCol: String, target: String, since: Double, until: Double,
      maxDataPoints: Int = 100): DataFrame = {
    require(until > since, "empty render range")
    val width = (until - since) / maxDataPoints
    val t = col(timeCol).cast("double")
    points
      .filter(col(pathCol).rlike(globToRegex(target)) &&
        t >= since && t < until)
      .withColumn("bucket", floor((t - lit(since)) / width).cast("int"))
      .groupBy(col(pathCol).as("path"), col("bucket"))
      .agg(avg(col(valueCol)).as("value"), count(lit(1)).as("n_points"))
      .select(col("path"), (lit(since) + col("bucket") * width).as("bucket_start"),
        col("value"), col("n_points"))
      .orderBy("path", "bucket_start")
  }
}
