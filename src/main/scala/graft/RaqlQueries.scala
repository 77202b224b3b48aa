package graft

import graft.raql.{RaqlCompiler, RaqlParser}
import org.apache.spark.sql.functions.{concat_ws, expr}

/** Queries defined in RaQL source and compiled by the front-end — the
  * end-to-end path a reference user takes (RaQL text → DataFrame plan),
  * verified by the same DuckDB oracle as the native-API queries.
  */
object RaqlQueries {

  private def compileRaql(s: org.apache.spark.sql.SparkSession, dir: String,
      src: String): org.apache.spark.sql.DataFrame = {
    val c = new RaqlCompiler(s, dir)
    // a registration failure (missing/renamed fixture parquet, schema
    // drift) must fail HERE with the table named — swallowing it would
    // resurface later as a confusing unresolved-relation error inside
    // whatever program happens to reference the table first
    def register(name: String, df: => org.apache.spark.sql.DataFrame): Unit =
      try c.registerTable(name, df)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[raql] registerTable $name failed: $e")
        throw e
      }
    Tables.names.foreach { t =>
      // events goes through the nanos→micros normalization so RaQL sees a
      // proper TimestampType ts (time windows cast it to epoch seconds)
      register(s"tables/$t",
        if (t == "events") Tables.events(s, dir) else Tables.load(s, dir, t))
    }
    // an epoch-seconds view of events for time-window programs (the
    // reference's sources carry numeric start columns)
    register("tables/events_ets",
      Tables.events(s, dir).withColumn("ets",
        org.apache.spark.sql.functions.col("ts").cast("double")))
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
          CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS price_bucket,
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
          CASE WHEN value IS NULL THEN NULL
               WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid'
               ELSE 'high' END AS bucket,
          value IS NULL AS no_value,
          ROUND(value) AS value_round
        FROM events WHERE event_id % 10 = 0 ORDER BY event_id""")),

    // ---- running (commit-every-tuple) stateful functions through the RaQL
    // front-end. The events parquet is written in event_id order and the
    // registered table is a single scan partition, so the arrival order the
    // compiler windows over (`_graft_seq`) IS event_id order — the oracle
    // mirrors it with ORDER BY event_id windows.

    QueryDef(
      "r04_raql_lag_changed",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id, value, lag value AS prev,
                    lag (2, value) AS prev2,
                    CHANGED event_type AS type_changed;""")
        .orderBy("event_id"),
      Some("""SELECT event_id, value,
          lag(value, 1) OVER w AS prev, lag(value, 2) OVER w AS prev2,
          NOT (event_type IS NOT DISTINCT FROM lag(event_type, 1) OVER w)
            AS type_changed
        FROM events WINDOW w AS (ORDER BY event_id) ORDER BY event_id""")),

    QueryDef(
      "r05_raql_running_aggs",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id, sum 1 AS running_n,
                    min value AS running_min, max value AS running_max,
                    lag value AS prev;""")
        .orderBy("event_id"),
      Some("""SELECT event_id,
          CAST(SUM(1) OVER w AS BIGINT) AS running_n,
          MIN(value) OVER w AS running_min, MAX(value) OVER w AS running_max,
          lag(value, 1) OVER w AS prev
        FROM events
        WINDOW w AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
        ORDER BY event_id""")),

    QueryDef(
      "r06_raql_moveavg_latest",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id, moveavg (4, user_id) AS mavg4,
                    latest 3 user_id AS last3,
                    one out of 10 value AS sampled;""")
        // The driver's pandas compare can't hash raw array cells — ship the
        // LATEST list as a comma-joined string on both sides.
        .withColumn("last3",
          concat_ws(",", expr("transform(last3, x -> CAST(x AS STRING))")))
        .orderBy("event_id"),
      Some("""SELECT event_id,
          AVG(user_id) OVER (ORDER BY event_id ROWS BETWEEN 4 PRECEDING
                             AND 1 PRECEDING) AS mavg4,
          array_to_string(list(user_id) OVER (ORDER BY event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                          ',') AS last3,
          CASE WHEN (row_number() OVER (ORDER BY event_id) - 1) % 10 = 0
               THEN value END AS sampled
        FROM events ORDER BY event_id""")),

    QueryDef(
      "r07_raql_remember_distinct",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id,
                    remember (0.01, 3600, user_id, ts) AS seen_1h,
                    distinct user_id AS novel_user;""")
        .orderBy("event_id"),
      Some("""SELECT event_id,
          COALESCE(epoch(ts) - lag(epoch(ts), 1)
              OVER (PARTITION BY user_id ORDER BY event_id) <= 3600, FALSE)
            AS seen_1h,
          row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1
            AS novel_user
        FROM events ORDER BY event_id""")),

    // ---- r08: scalar stragglers — trig (round 9 to absorb libm last-ulp
    // differences), python-slice SUBSTRING with negative bounds,
    // UUID_OF_U128, PEEK big/little endian, FORMAT_TIME token substitution
    // + PARSE_TIME round-trip. Oracle derives everything independently.
    QueryDef(
      "r08_raql_scalars",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id,
                    round(cos(value / 100), 9) AS cos9,
                    round(sin(value / 100), 9) AS sin9,
                    round(atan(value), 9) AS atan9,
                    substring(event_type, 1, -1) AS etype_mid,
                    uuid_of_u128(u128(event_id * 7919 + 13)) AS uid,
                    peek u16 big endian (chr(event_id % 127 + 1) || chr(event_id % 126 + 1)) AS be16,
                    peek u16 little endian (chr(event_id % 127 + 1) || chr(event_id % 126 + 1)) AS le16,
                    format_time("%Y-%m-%d %H:%M", float(ts)) AS ft,
                    parse_time(format_time("%Y-%m-%d %H:%M", float(ts))) AS pt;""")
        .orderBy("event_id"),
      Some("""SELECT event_id,
          round(cos(value / 100), 9) AS cos9,
          round(sin(value / 100), 9) AS sin9,
          round(atan(value), 9) AS atan9,
          CASE WHEN length(event_type) < 2 THEN ''
               ELSE substr(event_type, 2, length(event_type) - 2) END AS etype_mid,
          substr(printf('%032x', event_id * 7919 + 13), 1, 8) || '-' ||
            substr(printf('%032x', event_id * 7919 + 13), 9, 4) || '-' ||
            substr(printf('%032x', event_id * 7919 + 13), 13, 4) || '-' ||
            substr(printf('%032x', event_id * 7919 + 13), 17, 4) || '-' ||
            substr(printf('%032x', event_id * 7919 + 13), 21, 12) AS uid,
          CAST(256 * (event_id % 127 + 1) + (event_id % 126 + 1) AS BIGINT) AS be16,
          CAST(256 * (event_id % 126 + 1) + (event_id % 127 + 1) AS BIGINT) AS le16,
          strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS ft,
          CAST(epoch(date_trunc('minute', ts)) AS DOUBLE) AS pt
        FROM events ORDER BY event_id""")),

    // ---- r09: GROUP BY + commit-every-tuple — per-group running state.
    // Every window partitions by the group key, so the plan distributes by
    // key (one shuffle) instead of a single-partition global WindowExec.
    QueryDef(
      "r09_raql_grouped_running",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id, user_id,
                    lag value AS prev_value,
                    min value AS running_min,
                    count value AS n_seen,
                    moveavg (4, event_id) AS mavg4
             GROUP BY user_id;""")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
          lag(value, 1) OVER w AS prev_value,
          MIN(value) OVER w AS running_min,
          CAST(COUNT(value) OVER w AS BIGINT) AS n_seen,
          AVG(event_id) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS mavg4
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ---- r10: HYSTERESIS + SMOOTH + SMOOTH_DAMPED_HOLT running scans —
    // all three UNGROUPED (running mode over the whole table), so this
    // row is the driver-oracled proof that the chunk-distributed scan
    // family (affine carries, no whole-input WindowExec — PlanSpec pins
    // it) matches the reference's sequential fold. Oracled independently:
    // hysteresis as a last-deciding-value window, smooth and the Holt
    // recurrence as one recursive CTE replaying CodeGenLib.ml's folds
    // (smooth :343-347 first-value seed, holt :350-358 zero seed); the
    // round(6) absorbs the chunked carries' float re-association (the
    // equality specs hold at 1e-9 relative). Restricted to the first 2k
    // events because the CTE's self-join recursion is quadratic in DuckDB.
    QueryDef(
      "r10_raql_hysteresis_holt",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id,
                    hysteresis(value, 50, 150) AS ok,
                    round(smooth(0.5, value), 6) AS sm6,
                    round(smooth_damped_holt(0.5, 0.3, 0.9, value), 6) AS holt6
             WHERE event_id < 2000;""")
        .orderBy("event_id"),
      Some("""WITH RECURSIVE ev AS (
          SELECT event_id, value, row_number() OVER (ORDER BY event_id) AS rn
          FROM events WHERE event_id < 2000
        ), fold AS (
          SELECT 0 AS rn, CAST(0 AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS t,
            CAST(NULL AS DOUBLE) AS sm
          UNION ALL
          SELECT e.rn,
            CASE WHEN e.value IS NULL THEN f.l
                 ELSE 0.5*e.value + (1-0.5)*(f.l + 0.9*f.t) END,
            CASE WHEN e.value IS NULL THEN f.t
                 ELSE 0.3*((0.5*e.value + (1-0.5)*(f.l + 0.9*f.t)) - f.l)
                      + (1-0.3)*0.9*f.t END,
            CASE WHEN e.value IS NULL THEN f.sm
                 WHEN f.sm IS NULL THEN CAST(e.value AS DOUBLE)
                 ELSE 0.5*e.value + (1-0.5)*f.sm END
          FROM ev e JOIN fold f ON e.rn = f.rn + 1
        )
        SELECT e.event_id,
          COALESCE(last_value(CASE WHEN e.value > 150 THEN FALSE
                                   WHEN e.value <= 50 THEN TRUE END
                              IGNORE NULLS)
            OVER (ORDER BY e.event_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW), TRUE) AS ok,
          round(f.sm, 6) AS sm6,
          round(f.l + 0.9*f.t, 6) AS holt6
        FROM ev e JOIN fold f ON f.rn = e.rn
        ORDER BY e.event_id""")),

    QueryDef(
      "r11_raql_tumbling_commit",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events_ets
             SELECT TRUNCATE(MIN ets, 3600) AS wstart,
                    out.wstart + 3600 AS wstop,
                    event_type, SUM 1 AS n
             GROUP BY event_type
             COMMIT BEFORE in.ets >= out.wstop;""")
        .orderBy("event_type", "wstart"),
      Some("""SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS wstart,
          CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS wstop,
          event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2, 3 ORDER BY event_type, wstart""")),

    QueryDef(
      "r12_raql_horizon_remember",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events_ets
             GROUP BY ets // 3600
             COMMIT AFTER in.ets > out.wstart + 7200
             SELECT TRUNCATE(ets, 3600) AS wstart,
                    SUM (float (NOT REMEMBER (0.01, 900, user_id)))
                      AS new_users;""")
        .orderBy("wstart"),
      // REMEMBER is LOCAL under GROUP BY: per (hour slice, user) the lag
      // of event time decides novelty; the horizon commit emits each
      // slice's final (total) row
      Some("""SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS wstart,
          SUM(CASE WHEN prev IS NULL OR epoch(ts) - prev > 900
              THEN 1.0 ELSE 0.0 END) AS new_users
        FROM (SELECT ts,
                lag(epoch(ts)) OVER (
                  PARTITION BY FLOOR(epoch(ts) / 3600), user_id
                  ORDER BY event_id) AS prev
              FROM events)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef(
      "r13_raql_pivot",
      // the PRODUCTION pivot path end-to-end: a Pivot description
      // (`/root/reference/src/pivot.type`) transpiles to RaQL
      // (graft.service.PivotApi mirroring CodeGen_Pivot2RaQL.ml),
      // registers through the API, and compiles to one hash-agg plan.
      // The value column is integerized (u64(floor(value*100))) so
      // SUM/MIN/MAX are exact on both engines (a double SUM is
      // order-dependent); FLOOR is bit-stable where ROUND's
      // double-vs-decimal boundary is not.
      (s, d) => {
        import graft.service.{AlertApi, PivotApi}
        import graft.service.AlertApi.SimpleFilter
        import graft.service.PivotApi.{Pivot, PivotField}
        val c = new RaqlCompiler(s, d)
        c.registerTable("tables/events", Tables.events(s, d))
        RaqlParser.parseProgram("""DEFINE events AS
            FROM tables/events
            SELECT user_id, event_type,
                   u64(floor(value * 100)) AS cval,
                   float(ts) AS start;""") match {
          case Right(p) => c.register("base", p)
          case Left(e) => throw new IllegalArgumentException(s"parse: $e")
        }
        new AlertApi(s, c).setPivot("bench", Pivot(
          from = "base/events",
          where = Seq(SimpleFilter("event_type", "[signup]", "not in")),
          typeField = "event_type", valueField = "cval",
          fields = Seq(
            PivotField("click", avg = false, count = true, sum = true),
            PivotField("purchase", avg = false, sum = true, max = true),
            PivotField("errv", types = Seq("error"), avg = false,
              min = true, max = true)),
          groupBy = Seq("user_id"),
          duration = 86400))
        c.compile("api/pivots/bench/pivot").orderBy("user_id", "start")
      },
      Some("""SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) * 86400 AS start,
          user_id,
          COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS count_click,
          CAST(SUM(CASE WHEN event_type = 'click'
            THEN CAST(FLOOR(value * 100) AS BIGINT) END) AS BIGINT) AS sum_click,
          CAST(SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(FLOOR(value * 100) AS BIGINT) END) AS BIGINT) AS sum_purchase,
          MAX(CASE WHEN event_type = 'purchase'
            THEN CAST(FLOOR(value * 100) AS BIGINT) END) AS max_purchase,
          MIN(CASE WHEN event_type = 'error'
            THEN CAST(FLOOR(value * 100) AS BIGINT) END) AS min_errv,
          MAX(CASE WHEN event_type = 'error'
            THEN CAST(FLOOR(value * 100) AS BIGINT) END) AS max_errv
        FROM events WHERE event_type <> 'signup'
        GROUP BY 1, 2 ORDER BY user_id, start""")),

    // ---- r14: ungrouped HOLT WINTERS in running mode — the seasonal
    // member of the chunk-distributed scan family. smooth/damped-holt/
    // hysteresis have their ungrouped driver oracles in r10; this row
    // closes the last one, with the CHUNKED path active by default
    // (HoltWinterAffineScan carry — the oracle replays the sequential
    // fold, so a wrong carry composition or ring-phase rotation turns
    // this row red, not just the 1e-9 unit equality spec). Zero-seeded
    // state per the reference (CodeGenLib.ml:343-359 via
    // aggs.HoltWinterScan): l=t=0, seasons=0, cycle advances only on
    // non-null inputs; each row emits l + phi*t + seasons[cycle] AFTER
    // its update. round(…,6) absorbs the chunked re-association (same
    // accepted tolerance as r10's smooth/holt columns).
    QueryDef(
      "r14_raql_holt_winters",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id,
                    round(smooth_damped_holt_winter(0.5, 0.3, 0.2, 4, 0.9,
                                                    value), 6) AS hw6
             WHERE event_id < 2000;""")
        .orderBy("event_id"),
      Some("""WITH RECURSIVE ev AS (
          SELECT event_id, CAST(value AS DOUBLE) AS value,
                 row_number() OVER (ORDER BY event_id) AS rn
          FROM events WHERE event_id < 2000
        ), fold AS (
          SELECT 0 AS rn, 0.0e0 AS l, 0.0e0 AS t,
                 0.0e0 AS s0, 0.0e0 AS s1, 0.0e0 AS s2, 0.0e0 AS s3, 0 AS cyc
          UNION ALL
          SELECT rn,
            CASE WHEN x IS NULL THEN l ELSE lnew END,
            CASE WHEN x IS NULL THEN t
                 ELSE 0.3e0*(lnew - l) + 0.7e0*0.9e0*t END,
            CASE WHEN x IS NOT NULL AND cyc = 0
                 THEN 0.2e0*(x - l - 0.9e0*t) + 0.8e0*si ELSE s0 END,
            CASE WHEN x IS NOT NULL AND cyc = 1
                 THEN 0.2e0*(x - l - 0.9e0*t) + 0.8e0*si ELSE s1 END,
            CASE WHEN x IS NOT NULL AND cyc = 2
                 THEN 0.2e0*(x - l - 0.9e0*t) + 0.8e0*si ELSE s2 END,
            CASE WHEN x IS NOT NULL AND cyc = 3
                 THEN 0.2e0*(x - l - 0.9e0*t) + 0.8e0*si ELSE s3 END,
            CASE WHEN x IS NULL THEN cyc ELSE (cyc + 1) % 4 END
          FROM (
            SELECT q1.*,
              0.5e0*(x - si) + 0.5e0*(l + 0.9e0*t) AS lnew
            FROM (
              SELECT e.rn, f.l, f.t, f.s0, f.s1, f.s2, f.s3, f.cyc,
                     e.value AS x,
                     CASE f.cyc WHEN 0 THEN f.s0 WHEN 1 THEN f.s1
                                WHEN 2 THEN f.s2 ELSE f.s3 END AS si
              FROM ev e JOIN fold f ON e.rn = f.rn + 1
            ) q1
          ) q2
        )
        SELECT e.event_id,
          round(f.l + 0.9e0*f.t +
            CASE f.cyc WHEN 0 THEN f.s0 WHEN 1 THEN f.s1
                       WHEN 2 THEN f.s2 ELSE f.s3 END, 6) AS hw6
        FROM ev e JOIN fold f ON f.rn = e.rn
        ORDER BY e.event_id""")),

    // ---- r15: ungrouped sliding PAST in a MIXED operation — the lag
    // alongside it rejects the whole-plan double-bucket union rewrite, so
    // this runs the r15 bucket-JOIN form of PAST (time-bucket partitioned
    // range window + previous-bucket ghost array; RaqlCompiler
    // pastSlidingArray) in chunked mode, value-oracled: the trailing-30-
    // minute window CONTENTS are md5-pinned per row as scaled-integer
    // strings in the operator's deterministic (t, value) sort order, and
    // DuckDB replays the window, the sort, and the pin.
    QueryDef(
      "r15_raql_past_sliding",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id, past 1800 of value AS win, lag value AS prev
             WHERE event_id < 3000;""")
        .select(org.apache.spark.sql.functions.col("event_id"),
          expr("""md5(cast(array_join(transform(win,
              x -> cast(cast(round(x * 10000) as long) as string)), ',')
            as binary))""").as("win_md5"),
          expr("size(win)").as("n_win"),
          org.apache.spark.sql.functions.col("prev"))
        .orderBy("event_id"),
      Some("""WITH e AS (
          SELECT event_id, value, epoch_us(ts) AS tus
          FROM events WHERE event_id < 3000),
        w AS (
          SELECT event_id, value, tus,
            list({'t': tus, 'v': value}) OVER (ORDER BY tus
              RANGE BETWEEN 1799999999 PRECEDING AND CURRENT ROW) AS raw
          FROM e)
        SELECT event_id,
          md5(array_to_string(list_transform(list_sort(raw),
            s -> CAST(CAST(round(s.v * 10000) AS BIGINT) AS VARCHAR)), ',')) AS win_md5,
          len(raw) AS n_win,
          lag(value, 1) OVER (ORDER BY event_id) AS prev
        FROM w ORDER BY event_id""")),

    // ---- r16: the once_every/f2 composition — a NULL-SPARSE stateful
    // operand (ONCE EVERY yields its operand on the first row of each
    // clock bucket, NULL otherwise) under a sliding PAST in a MIXED
    // operation (the lag rejects the whole-plan rewrite, so this runs the
    // chunked bucket-join pastSlidingArray). Guards the r15 regression
    // (reference tests/func/once_every.test f2): the window CONTENTS must
    // hold ONLY the non-null marks — collect_list's null-skip — and the
    // f2-style GET arithmetic over the array must see real values, not
    // (t, null) ghosts. Window contents md5-pinned in the operator's
    // deterministic (t, value) order; DuckDB replays the clock buckets,
    // the null-skip, the sort, and the pin.
    QueryDef(
      "r16_raql_once_every_past",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id,
                    once every 3600 value AS mark,
                    past 14400 of mark AS win,
                    win[1] - win[0] AS delta,
                    lag value AS prev
             WHERE event_id < 3000;""")
        .select(org.apache.spark.sql.functions.col("event_id"),
          expr("""md5(cast(array_join(transform(win,
              x -> cast(cast(round(x * 10000) as long) as string)), ',')
            as binary))""").as("win_md5"),
          expr("size(win)").as("n_win"),
          expr("round(delta, 6)").as("delta6"),
          org.apache.spark.sql.functions.col("prev"))
        .orderBy("event_id"),
      Some("""WITH e AS (
          SELECT event_id, value, epoch_us(ts) AS tus
          FROM events WHERE event_id < 3000),
        m AS (
          SELECT event_id, value, tus,
            CASE WHEN lag(CAST(floor(tus/1e6/3600) AS BIGINT)) OVER (ORDER BY tus)
                      IS DISTINCT FROM CAST(floor(tus/1e6/3600) AS BIGINT)
                 THEN value END AS mark
          FROM e),
        w AS (
          SELECT event_id, value, tus,
            list_transform(list_sort(list_filter(
              list({'t': tus, 'v': mark}) OVER (ORDER BY tus
                RANGE BETWEEN 14399999999 PRECEDING AND CURRENT ROW),
              s -> s.v IS NOT NULL)), s -> s.v) AS vs
          FROM m)
        SELECT event_id,
          md5(array_to_string(list_transform(vs,
            x -> CAST(CAST(round(x * 10000) AS BIGINT) AS VARCHAR)), ',')) AS win_md5,
          len(vs) AS n_win,
          round(vs[2] - vs[1], 6) AS delta6,
          lag(value, 1) OVER (ORDER BY event_id) AS prev
        FROM w ORDER BY event_id"""))
  ,

    // ---- r17: UNGROUPED running GROUP — the last sequentialWindow site,
    // now chunk-distributed (r15 verdict task 7): the per-row value is the
    // whole value prefix in arrival order, computed as a within-chunk
    // prefix collect_list plus a concatenated cross-chunk carry
    // (RaqlCompiler.chunkedGroupPrefix). The prefix list is md5-hashed
    // per row (the d12/t18 wide-content trick) so the driver compares
    // every element of every prefix without shipping O(n²) values.
    QueryDef(
      "r17_raql_running_group",
      (s, d) => compileRaql(s, d,
        """DEFINE q AS
             FROM tables/events
             SELECT event_id,
                    group value AS vals,
                    sum 1 AS running_n
             WHERE event_id < 1200;""")
        .select(org.apache.spark.sql.functions.col("event_id"),
          expr("size(vals)").as("n_vals"),
          expr("""md5(cast(array_join(transform(vals,
              x -> cast(cast(round(x * 10000) as long) as string)), ',')
            as binary))""").as("grp_md5"),
          org.apache.spark.sql.functions.col("running_n"))
        .orderBy("event_id"),
      Some("""WITH w AS (
          SELECT event_id,
            -- DuckDB's list() keeps nulls, Spark's collect_list skips them
            list_filter(
              list(value) OVER (ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              x -> x IS NOT NULL) AS vs,
            CAST(SUM(1) OVER (ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS running_n
          FROM events WHERE event_id < 1200)
        SELECT event_id, len(vs) AS n_vals,
          md5(array_to_string(list_transform(vs,
            x -> CAST(CAST(round(x * 10000) AS BIGINT) AS VARCHAR)), ','))
            AS grp_md5,
          running_n
        FROM w ORDER BY event_id"""))
  )
}
