package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._

/** Core relational translations of RaQL's `Aggregate` operation
  * (SELECT / WHERE / GROUP BY / commit-at-end-of-group) plus the stateless
  * scalar-function surface.
  *
  * Reference semantics: `/root/reference/src/raql_operation.type:6-53`
  * (Aggregate clauses) and `/root/reference/doc/raql/expr.ml` (scalar
  * functions). Execution is pure Catalyst: scans with pushed filters,
  * hash aggregates with partial (map-side) combine, broadcast joins for
  * small dims — nothing custom needed at this layer.
  */
object CoreQueries {

  val entries: Seq[QueryDef] = Seq(
    // ---- q01: the Swiss-army aggregate: GROUP BY + sum/avg/min/max/count
    // (RaQL: SELECT sum x, avg x, min x, max x GROUP BY k COMMIT AFTER ...)
    QueryDef(
      "q01_agg",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            davg(col("l_quantity")).as("avg_qty"),
            min(col("l_discount")).as("min_disc"),
            max(col("l_discount")).as("max_disc"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_price,
        ${davgSql("l_quantity")} AS avg_qty,
        MIN(l_discount) AS min_disc,
        MAX(l_discount) AS max_disc,
        COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    // ---- q02: WHERE + row-level projection (filter pushed to parquet scan)
    QueryDef(
      "q02_filter_project",
      (s, d) => {
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1996-07-01").cast(TimestampType) &&
            col("l_discount") > 0.05 && col("l_quantity") < 10)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1.0 - l_discount) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
          AND l_discount > 0.05 AND l_quantity < 10
        ORDER BY l_orderkey, l_linenumber"""),
      headline = true),

    // ---- q03: FROM p1, p2 = union of parents
    // (reference: multi-parent FROM is a union, raql_operation.type:33-46)
    QueryDef(
      "q03_union",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.filter(col("event_type") === "error")
          .unionByName(ev.filter(col("event_type") === "signup"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
        FROM (SELECT * FROM events WHERE event_type = 'error'
              UNION ALL SELECT * FROM events WHERE event_type = 'signup')
        GROUP BY event_type ORDER BY event_type""")),

    // ---- q04: FROM (subquery) + enrichment join (broadcast small dim)
    QueryDef(
      "q04_subquery_join",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(dsum(col("o_totalprice")).as("cust_total"))
        val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        perCust.join(broadcast(cust), perCust("o_custkey") === cust("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(davg(col("cust_total")).as("avg_cust_total"),
            count(lit(1)).as("n_cust"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment,
        ${dsumSql("cust_total")} / COUNT(cust_total) AS avg_cust_total,
        COUNT(*) AS n_cust
        FROM (SELECT o_custkey, ${dsumSql("o_totalprice")} AS cust_total
              FROM orders GROUP BY o_custkey) t
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      headline = true),

    // ---- q05: generator SPLIT → one tuple per substring
    // (reference: tests/func/word_split.ramen; explode(split) in Spark)
    QueryDef(
      "q05_split_words",
      (s, d) => {
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("word"))
          .limit(100)
      },
      Some("""SELECT word, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word ORDER BY n DESC, word LIMIT 100"""),
      headline = true),

    // ---- q06: CASE WHEN / conditional expressions
    QueryDef(
      "q06_case_when",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"),
            when(col("value") < 50, "low")
              .when(col("value") < 150, "mid")
              .otherwise("high").as("band"))
          .groupBy("event_type", "band").agg(count(lit(1)).as("n"))
          .orderBy("event_type", "band")
      },
      Some("""SELECT event_type,
        CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS band,
        COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- q07: NULL semantics: COALESCE / NULLIF / conditional counts
    // (RaQL `|?` operator, count of booleans — doc/raql/expr.ml:424,808)
    QueryDef(
      "q07_null_coalesce",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            sum(when(col("value") > 100, 1L).otherwise(0L)).as("n_big"),
            count(nullif(col("user_id"), lit(0L))).as("n_nonzero_user"),
            dsum(coalesce(nullif(col("value"), lit(0.0)), lit(-1.0))).as("sum_demo"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type,
        CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        COUNT(NULLIF(user_id, 0)) AS n_nonzero_user,
        ${dsumSql("COALESCE(NULLIF(value, 0.0), -1.0)")} AS sum_demo
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- q17: service read path — timeseries bucketization
    // (RamenTimeseries.ml:1-50: n even time buckets over [since, until],
    // per-bucket aggregates). Bounds from a 1-row agg broadcast to the
    // scan; bucket index in exact integer arithmetic; then a plain hash
    // aggregation — two scans, no sort, no skew sensitivity at 100 TB.
    QueryDef(
      "q17_timeseries",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("ts_ns"), col("value"))
        val bounds = ev.agg(min("ts_ns").as("lo"), max("ts_ns").as("hi"))
        ev.crossJoin(broadcast(bounds))
          // integer div: ns epochs exceed 2^53, double division would lose
          // exactness (`/` on Columns is always floating point)
          .withColumn("bucket", expr("(ts_ns - lo) * 48 div (hi - lo + 1)"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            min("value").as("min_v"), max("value").as("max_v"),
            dsum(col("value")).as("sum_v"))
          .orderBy("bucket")
      },
      Some(s"""SELECT (epoch_ns(ts) - lo) * 48 // (hi - lo + 1) AS bucket,
          COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v,
          ${dsumSql("value")} AS sum_v
        FROM events, (SELECT MIN(epoch_ns(ts)) AS lo, MAX(epoch_ns(ts)) AS hi
                      FROM events) b
        GROUP BY 1 ORDER BY 1"""),
      headline = true),

    // ---- q18: service read path — tail (RamenApi.ml tail endpoint): the
    // last n committed tuples. Sort pushes down to a TakeOrderedAndProject
    // (top-n heap per partition + merge), no full sort at scale.
    QueryDef(
      "q18_tail",
      (s, d) => {
        Tables.events(s, d)
          // µs resolution: DuckDB truncates the parquet ns timestamps on
          // read, so the comparable tail key is microseconds
          .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
            col("user_id"), col("event_type"), col("value"))
          .orderBy(desc("ts_us"), desc("event_id"))
          .limit(100)
      },
      Some("""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        FROM events ORDER BY ts_us DESC, event_id DESC LIMIT 100""")),

    // ---- q08: stateless scalar-function surface in one pass
    // AGE (vs fixed now), RELDIFF, TRUNCATE, LIKE-glob, INDEX, SUBSTRING,
    // FORMAT_TIME (doc/raql/expr.ml:64,511,500,310,666,702,640)
    QueryDef(
      "q08_scalars",
      (s, d) => {
        Tables.events(s, d)
          .select(
            col("event_id"),
            (lit(1706745600L) - unix_seconds(col("ts"))).as("age_s"),
            (abs(col("value") - 100.0) /
              greatest(abs(col("value")), lit(100.0))).as("rdiff"),
            (floor(col("value") / 5.0) * 5.0).as("trunc5"),
            col("event_type").like("err%").as("is_err_like"),
            (instr(col("event_type"), "u") - 1).as("idx_u"),
            substring(col("event_type"), 1, 3).as("pre3"),
            date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour_str"),
            upper(col("event_type")).as("et_upper"),
            length(col("event_type")).as("et_len"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        1706745600 - CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS age_s,
        abs(value - 100.0) / greatest(abs(value), 100.0) AS rdiff,
        floor(value / 5.0) * 5.0 AS trunc5,
        event_type LIKE 'err%' AS is_err_like,
        strpos(event_type, 'u') - 1 AS idx_u,
        substring(event_type, 1, 3) AS pre3,
        strftime(ts, '%Y-%m-%d %H:00') AS hour_str,
        upper(event_type) AS et_upper,
        length(event_type) AS et_len
        FROM events ORDER BY event_id""")),

    // ---- q09: HAVING (filter on aggregate = RaQL commit-cond over out.*)
    QueryDef(
      "q09_having",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .filter(col("n") > 50)
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id, COUNT(*) AS n, ${dsumSql("value")} AS total
        FROM events GROUP BY user_id HAVING COUNT(*) > 50 ORDER BY user_id""")),

    // ---- q10: percentile-of-group (RaQL `95th percentile (group x)`)
    QueryDef(
      "q10_percentile",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.9)").as("p90"),
            expr("percentile(l_quantity, 0.95)").as("p95"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.9) AS p90,
        quantile_cont(l_quantity, 0.95) AS p95
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q11: HISTOGRAM(x, min, max, n) with under/overflow buckets
    // (doc/raql/expr.ml:784; impl CodeGenLib.ml:515-540)
    QueryDef(
      "q11_histogram",
      (s, d) => {
        Tables.events(s, d)
          .select(
            when(col("value") < 0.0, -1L)
              .when(col("value") >= 200.0, 10L)
              .otherwise(floor(col("value") / 20.0).cast(LongType)).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""SELECT CASE WHEN value < 0.0 THEN -1
                     WHEN value >= 200.0 THEN 10
                     ELSE CAST(floor(value / 20.0) AS BIGINT) END AS bucket,
        COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- q12: FIRST/LAST by event time (order-sensitive aggregates)
    QueryDef(
      "q12_first_last",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            // (user_id, ts) is unique in the data, so ts alone is a total
            // order per group — DuckDB's arg_min can't take a tuple key.
            expr("min_by(event_type, ts)").as("first_type"),
            expr("max_by(value, ts)").as("last_value"),
            min(col("ts")).as("first_ts"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
        arg_min(event_type, ts) AS first_type,
        arg_max(value, ts) AS last_value,
        MIN(ts) AS first_ts
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- q13: GROUP (collect into array) — emitted as sorted joined string
    QueryDef(
      "q13_group_collect",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(concat_ws(",", array_sort(collect_set(col("event_type"))))
            .as("types"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
        array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- q14: boolean + bitwise aggregates (AND/OR/BITAND/BITOR/BITXOR)
    QueryDef(
      "q14_bool_bit_aggs",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            expr("bool_and(value > 0.0)").as("all_pos"),
            expr("bool_or(value > 190.0)").as("any_huge"),
            expr("bit_and(user_id)").as("band"),
            expr("bit_or(user_id)").as("bor"),
            expr("bit_xor(user_id)").as("bxor"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        bool_and(value > 0.0) AS all_pos,
        bool_or(value > 190.0) AS any_huge,
        bit_and(user_id) AS band,
        bit_or(user_id) AS bor,
        bit_xor(user_id) AS bxor
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- q15: exact DISTINCT cardinality (RaQL `sum u16(distinct x)`)
    QueryDef(
      "q15_count_distinct",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""),
      headline = true),

    // ---- q16: remaining scalar functions — BASENAME, python-style
    // SUBSTRING, string·int repetition, CHR, ^, %, bit shifts, div-or-null
    // (reference doc/raql/expr.ml:437-713)
    QueryDef(
      "q16_scalars2",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
          .select(
            col("event_id"),
            element_at(split(
              concat(lit("srv/"), col("event_type"), lit("/"), col("user_id")),
              "/"), -1).as("base"),
            expr("right(event_type, 3)").as("last3"),
            repeat(col("event_type"), 2).as("twice"),
            chr(lit(65) + col("event_id") % 26).as("letter"),
            pow(lit(2.0), (col("event_id") % 10).cast("double")).as("pow2"),
            call_function("shiftleft", col("event_id") % 16, lit(3)).as("shl3"),
            when(col("event_id") % 5 === 0, lit(null))
              .otherwise(col("value") / (col("event_id") % 5)).as("div_or_null"),
            least(col("value"), col("user_id").cast("double"), lit(500.0)).as("least3"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
          list_extract(string_split('srv/' || event_type || '/' || user_id, '/'), -1) AS base,
          right(event_type, 3) AS last3,
          repeat(event_type, 2) AS twice,
          chr(CAST(65 + event_id % 26 AS INT)) AS letter,
          pow(2.0, CAST(event_id % 10 AS DOUBLE)) AS pow2,
          (event_id % 16) << 3 AS shl3,
          CASE WHEN event_id % 5 = 0 THEN NULL
               ELSE value / (event_id % 5) END AS div_or_null,
          least(value, CAST(user_id AS DOUBLE), 500.0) AS least3
        FROM events ORDER BY event_id"""))
  )
}
