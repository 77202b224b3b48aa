package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._

/** Batch translations of RaQL's sequence/windowed stateful functions.
  *
  * In the reference these run as per-group mutable state inside a worker's
  * event loop (`/root/reference/src/CodeGenLib.ml`: Seasonal for LAG/MOVEAVG
  * :808-903, ExpSmooth :343-347, past :600-680). Spark-first translation:
  * `Window.partitionBy(groupKeys).orderBy(eventTime)` — the shuffle
  * partitions by group exactly like the reference partitions state by group,
  * and rows/range frames replace the ring buffers. Time windows
  * (tumbling/hopping commits, `tests/func/tumbling.ramen`) map to
  * `window(ts, ...)` bucketing, which at scale is a plain hash aggregation —
  * no per-key state store needed in batch.
  *
  * Ordering note: (user_id, ts) is unique in the events table, so `ts` is a
  * total order per partition key and Spark/DuckDB sort identically.
  */
object WindowQueries {

  private def byUser = Window.partitionBy("user_id").orderBy("ts")

  val entries: Seq[QueryDef] = Seq(
    // ---- w01: tumbling window commit (COMMIT BEFORE in.start >= out.stop)
    QueryDef(
      "w01_tumbling",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .select(unix_seconds(col("window.start")).as("wstart_s"),
            col("event_type"), col("n"), col("total"))
          .orderBy("wstart_s", "event_type")
      },
      Some(s"""SELECT CAST(floor(extract(epoch FROM ts) / 3600) AS BIGINT) * 3600 AS wstart_s,
        event_type, COUNT(*) AS n, ${dsumSql("value")} AS total
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
      headline = true),

    // ---- w02: hopping (sliding) window: 1h length, 30min slide
    QueryDef(
      "w02_hopping",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .select(unix_seconds(col("window.start")).as("wstart_s"),
            col("n"), col("total"))
          .orderBy("wstart_s")
      },
      Some(s"""SELECT CAST(floor(extract(epoch FROM ts) / 1800) AS BIGINT) * 1800 - 1800 * i.i AS wstart_s,
        COUNT(*) AS n, ${dsumSql("value")} AS total
        FROM events CROSS JOIN (VALUES (0), (1)) AS i(i)
        GROUP BY 1 ORDER BY 1""")),

    // ---- w03: LAG k, x (doc/raql/expr.ml:837)
    QueryDef(
      "w03_lag",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("prev2", lag(col("value"), 2).over(byUser))
          .select("event_id", "user_id", "value", "prev2")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
        lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS prev2
        FROM events ORDER BY event_id"""),
      headline = true),

    // ---- w04: DERIVE x (dv/dt vs previous point, CodeGenLib.ml:443-466)
    QueryDef(
      "w04_derive",
      (s, d) => {
        val tUs = unix_micros(col("ts"))
        Tables.events(s, d)
          .withColumn("dv", col("value") - lag(col("value"), 1).over(byUser))
          .withColumn("dt_us", tUs - lag(tUs, 1).over(byUser))
          .select(col("event_id"),
            (col("dv") / (col("dt_us") / 1e6)).as("rate"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        (value - lag(value, 1) OVER w)
          / ((epoch_us(ts) - lag(epoch_us(ts), 1) OVER w) / 1e6) AS rate
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ORDER BY event_id""")),

    // ---- w05: MOVEAVG over last 4 points (doc/raql/expr.ml:888)
    // decimal window sum / window count so both engines are exact
    QueryDef(
      "w05_moveavg",
      (s, d) => {
        val frame = byUser.rowsBetween(-3, 0)
        Tables.events(s, d)
          .select(col("event_id"),
            (sum(col("value").cast(DecimalType(18, 4))).over(frame)
              .cast(DoubleType) / count(col("value")).over(frame)).as("mavg4"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
          / COUNT(value) OVER w AS mavg4
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ---- w06: ONE OUT OF n (keep every n-th, else NULL; CodeGenLib.ml:1092)
    QueryDef(
      "w06_one_out_of",
      (s, d) => {
        Tables.events(s, d)
          .withColumn("rn", row_number().over(byUser))
          .select(col("event_id"),
            when(pmod(col("rn"), lit(10)) === 1, col("value")).as("sampled"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts) % 10 = 1
             THEN value END AS sampled
        FROM events ORDER BY event_id""")),

    // ---- w07: PAST 1h OF x (time-range window; CodeGenLib.ml:600-680)
    QueryDef(
      "w07_past_range",
      (s, d) => {
        val frame = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000000L, 0L)
        Tables.events(s, d)
          .select(col("event_id"),
            count(lit(1)).over(frame).as("n_1h"),
            max(col("value")).over(frame).as("max_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        COUNT(*) OVER w AS n_1h, MAX(value) OVER w AS max_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ---- w08: LARGEST 3 x BY e (top-n per group; CodeGenLib.ml:541-599)
    QueryDef(
      "w08_largest",
      (s, d) => {
        val byVal = Window.partitionBy("user_id")
          .orderBy(desc("value"), asc("ts"))
        Tables.events(s, d)
          .withColumn("rk", row_number().over(byVal))
          .filter(col("rk") <= 3)
          .select("user_id", "rk", "value")
          .orderBy("user_id", "rk")
      },
      Some("""SELECT user_id, rk, value FROM (
        SELECT user_id, value,
          row_number() OVER (PARTITION BY user_id ORDER BY value DESC, ts) AS rk
        FROM events) WHERE rk <= 3 ORDER BY user_id, rk""")),

    // ---- w09: SMOOTH alpha, x (exponential smoothing; CodeGenLib.ml:343-347)
    // Sequential fold over the time-ordered series — same fold order on both
    // engines, so doubles are bit-identical. Final smoothed value per user.
    QueryDef(
      "w09_smooth",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(expr("transform(array_sort(collect_list(struct(ts, value))), p -> p.value)")
            .as("vals"))
          .select(col("user_id"),
            expr("aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)), " +
              "element_at(vals, 1), (acc, x) -> acc * 0.7d + x * 0.3d)")
              .as("smoothed"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
        list_reduce(list(value ORDER BY ts), (acc, x) -> acc * 0.7 + x * 0.3) AS smoothed
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- w10: sessionization (gap > 30 min starts a new session)
    QueryDef(
      "w10_session",
      (s, d) => {
        val tUs = unix_micros(col("ts"))
        Tables.events(s, d)
          .withColumn("is_new",
            when(tUs - lag(tUs, 1).over(byUser) > 1800L * 1000000L ||
              lag(tUs, 1).over(byUser).isNull, 1L).otherwise(0L))
          .withColumn("session_idx",
            sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .select("event_id", "user_id", "session_idx")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        FROM (
          SELECT event_id, user_id, ts,
            CASE WHEN lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts)
                      > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events)
        ORDER BY event_id"""),
      headline = true)
  )
}
