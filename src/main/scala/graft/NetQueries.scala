package graft

import org.apache.spark.sql.functions._

import graft.functions.NetFunctions._

/** Network-function queries. The test tables carry no address columns, so
  * addresses are derived deterministically from user_id (the arithmetic is
  * mirrored in the oracle); what's verified is the address algebra itself:
  * formatting, CIDR membership, range bounds, MAC formatting.
  */
object NetQueries {

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "n01_ip_functions",
      (s, d) => {
        // synthesize: ip in 10.0.0.0/12 space, mac from user_id
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"))
          // single-row-group local file ⇒ spread the formatting work
          .repartition(s.sparkContext.defaultParallelism)
          .withColumn("ip", lit(167772160L) + (col("user_id") * 7919L) % 1048576L)
          .withColumn("mac", col("user_id") * 1099511627L % 281474976710656L)
          .select(
            col("event_id"),
            ip4ToString(col("ip")).as("ip_str"),
            inCidr4(col("ip"), lit(167772160L), lit(16)).as("in_10_0_0_0_16"),
            beginOfRange4(col("ip"), lit(20)).as("range_begin"),
            endOfRange4(col("ip"), lit(20)).as("range_end"),
            ethToString(col("mac")).as("mac_str"),
            col("ip"))
          // parse the ALREADY-RENDERED ip_str (multi-ref non-cheap alias —
          // CollapseProject keeps it staged, so the quad renders once)
          .withColumn("roundtrip", ip4FromString(col("ip_str")) === col("ip"))
          .drop("ip")
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
        CAST((ip >> 24) & 255 AS VARCHAR) || '.' || CAST((ip >> 16) & 255 AS VARCHAR)
          || '.' || CAST((ip >> 8) & 255 AS VARCHAR) || '.' || CAST(ip & 255 AS VARCHAR) AS ip_str,
        (ip & 4294901760) = (167772160 & 4294901760) AS in_10_0_0_0_16,
        ip & 4294963200 AS range_begin,
        (ip & 4294963200) | 4095 AS range_end,
        lpad(lower(hex((mac >> 40) & 255)), 2, '0') || ':' ||
          lpad(lower(hex((mac >> 32) & 255)), 2, '0') || ':' ||
          lpad(lower(hex((mac >> 24) & 255)), 2, '0') || ':' ||
          lpad(lower(hex((mac >> 16) & 255)), 2, '0') || ':' ||
          lpad(lower(hex((mac >> 8) & 255)), 2, '0') || ':' ||
          lpad(lower(hex(mac & 255)), 2, '0') AS mac_str,
        TRUE AS roundtrip
        FROM (SELECT event_id,
            167772160 + (user_id * 7919) % 1048576 AS ip,
            (user_id * 1099511627) % 281474976710656 AS mac
          FROM events) t
        ORDER BY event_id"""),
      headline = true),

    // ---- n02: COUNTRYCODE — GeoIP-style range lookup. The reference embeds
    // an ip→country CSV and resolves per tuple (src/CountryOfIp.ml); the
    // Spark-first shape is a broadcast range join against the lookup table,
    // which at corpus scale stays a map-side probe (no shuffle of events).
    QueryDef(
      "n02_countrycode",
      (s, d) => {
        import s.implicits._
        val ranges = broadcast(Seq(
          (167772160L, 167837695L, "AA"),   // 10.0.0.0/16
          (167837696L, 167903231L, "BB"),   // 10.1.0.0/16
          (167903232L, 168034303L, "CC"),   // 10.2.0.0/15
          (168034304L, 184549375L, "DD"))   // rest of 10/8
          .toDF("r_begin", "r_end", "country"))
        Tables.events(s, d)
          .select(col("event_id"),
            (lit(167772160L) + (col("user_id") * 7919L) % 1048576L).as("ip"))
          .join(ranges, col("ip") >= col("r_begin") && col("ip") <= col("r_end"),
            "left")
          .select(col("event_id"), col("ip"),
            coalesce(col("country"), lit("??")).as("country"))
          .orderBy("event_id")
      },
      Some("""WITH ips AS (SELECT event_id,
          167772160 + (user_id * 7919) % 1048576 AS ip FROM events),
        ranges(r_begin, r_end, country) AS (VALUES
          (167772160, 167837695, 'AA'), (167837696, 167903231, 'BB'),
          (167903232, 168034303, 'CC'), (168034304, 184549375, 'DD'))
        SELECT event_id, ip, COALESCE(country, '??') AS country
        FROM ips LEFT JOIN ranges ON ip >= r_begin AND ip <= r_end
        ORDER BY event_id"""))
  )
}
