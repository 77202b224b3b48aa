package graft

import graft.raql.{RaqlCompiler, RaqlParser}

/** Queries defined in RaQL source and compiled by the front-end — the
  * end-to-end path a reference user takes (RaQL text → DataFrame plan),
  * verified by the same DuckDB oracle as the native-API queries.
  */
object RaqlQueries {

  private def compileRaql(s: org.apache.spark.sql.SparkSession, dir: String,
      src: String): org.apache.spark.sql.DataFrame = {
    val c = new RaqlCompiler(s, dir)
    Tables.names.foreach { t =>
      try c.registerTable(s"tables/$t", Tables.load(s, dir, t))
      catch { case _: Throwable => () }
    }
    RaqlParser.parseProgram(src) match {
      case Right(p) => c.register("main", p); c.compile("main/q")
      case Left(e) => throw new IllegalArgumentException(s"RaQL parse: $e")
    }
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "r01_raql_agg",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_type,
                    COUNT 1 AS n,
                    sum u64(user_id) AS sum_uid,
                    min value AS min_value,
                    max value AS max_value
             GROUP BY event_type;""")
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(user_id) AS BIGINT) AS sum_uid,
          MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type"""),
      headline = true),

    QueryDef(
      "r02_raql_where",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/lineitem
             SELECT l_orderkey, l_linenumber,
                    l_quantity * 2 AS qty2,
                    l_extendedprice // 100 AS price_bucket,
                    l_returnflag || "/" || l_linestatus AS flags
             WHERE l_quantity >= 40 AND l_returnflag = "R";""")
        // Total order for the driver's order-sensitive hash (RaQL itself is
        // stream-ordered; batch verification needs a deterministic sort).
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity * 2 AS qty2,
          FLOOR(l_extendedprice / 100) AS price_bucket,
          l_returnflag || '/' || l_linestatus AS flags
        FROM lineitem WHERE l_quantity >= 40 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")),

    QueryDef(
      "r03_raql_case",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id,
                    CASE WHEN value < 10 THEN "low"
                         WHEN value < 100 THEN "mid"
                         ELSE "high" END AS bucket,
                    value IS NULL AS no_value,
                    round(value) AS value_round
             WHERE event_id % 10 = 0;""")
        .orderBy("event_id"),
      Some("""SELECT event_id,
          CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid'
               ELSE 'high' END AS bucket,
          value IS NULL AS no_value,
          ROUND(value) AS value_round
        FROM events WHERE event_id % 10 = 0 ORDER BY event_id"""))
  )
}
