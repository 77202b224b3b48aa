package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Instrumentation

/** Sustained streaming-throughput benchmark, shaped after the reference's
  * own harness (`/root/reference/examples/benchmarks/comms.ramen:1-48`):
  * three producers → two consumers (one behind a `SORT LAST 100` reorder
  * buffer), the sink's `max_r - min_r` folded into the consumer
  * aggregates, and the measurement taken the way the reference's
  * `benchmark` function takes it — from the republished instrumentation
  * stream (`LISTEN FOR INSTRUMENTATION FROM *` ≙ [[Instrumentation]]),
  * as Δtuples/Δtime per worker over the steady-state window.
  *
  * Spark-native translation notes:
  *   - The reference's producers are separate processes feeding ring
  *     buffers; Spark fuses producer→consumer into one codegen'd stage
  *     (that fusion IS the engine's design — there is no handoff to
  *     measure). Producers are a `rate-micro-batch` source plus two
  *     offset/union branches, so every consumer ingests 3× rowsPerBatch
  *     tuples per trigger.
  *   - `rate-micro-batch` (not `rate`): each trigger delivers EXACTLY
  *     rowsPerBatch rows with no wall-clock pacing, so the measured rate
  *     is the engine's ceiling, not the source's offered rate.
  *   - consumer1 ≙ running min/max + count-commit → 1-second event-time
  *     tumbling windows (advanceMillisPerBatch drives the watermark, so
  *     state flushes every trigger and stays bounded).
  *   - consumer2 adds the `SORT LAST 100 BY s` bounded reorder buffer
  *     ([[graft.ops.SortBuffer]]) in front of the same aggregate.
  *
  * Reported metric: per-consumer Δtot_in_tuples/Δstats_time after a
  * warmup prefix, summed — the same per-worker `avg_tuples_per_secs`
  * aggregation comms.ramen's `benchmark` computes, against BASELINE.md's
  * ~0.5 M tuples/s/node sustained figure.
  */
object StreamBench {

  final case class Result(
      tuplesPerS: Double,
      perWorker: Map[String, Double],
      rows: Long,
      seconds: Double)

  def run(spark: SparkSession,
      rowsPerBatch: Long = 1000000L,
      batches: Int = 10,
      warmupBatches: Int = 2): Result = {
    val instr = Instrumentation(spark)
    val par = spark.sparkContext.defaultParallelism

    def source() = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("numPartitions", par.toString)
      .option("advanceMillisPerBatch", "1000")
      .load()

    // three producers: YIELD seq AS s, random AS r (comms.ramen:5-12) —
    // same sequence spine, distinct offsets, distinct rand seeds
    def producers() = {
      val src = source()
      def producer(off: Long, seed: Long) = src.select(
        (col("value") + off).as("s"), rand(seed).as("r"), col("timestamp"))
      producer(0L, 1L)
        .unionByName(producer(100L, 2L))
        .unionByName(producer(1000L, 3L))
    }

    // consumer aggregate: min/max s, min/max r per (1 s window, lane) —
    // the reference's running min/max with the every-10th-tuple commit
    // becomes an event-time tumbling window (the Spark-native commit),
    // lanes keep the aggregation parallel; the sink's r_range
    // (comms.ramen:25-27) is folded into the final select
    def consume(df: org.apache.spark.sql.DataFrame) = df
      .withWatermark("timestamp", "0 seconds")
      .groupBy(window(col("timestamp"), "1 second"), (col("s") % 32).as("lane"))
      .agg(count(lit(1)).as("n"), min("s").as("min_s"), max("s").as("max_s"),
        min("r").as("min_r"), max("r").as("max_r"))
      .select(col("lane"), col("n"), col("min_s"), col("max_s"),
        (col("max_r") - col("min_r")).as("r_range"))

    val q1 = consume(producers())
      .writeStream.format("noop").outputMode("append")
      .queryName("consumer1").start()
    val q2 = consume(
      graft.ops.SortBuffer(producers(), 100, Seq(col("s"))))
      .writeStream.format("noop").outputMode("append")
      .queryName("consumer2").start()

    // run a fixed number of triggers per query, then stop
    val deadline = System.nanoTime() + 600L * 1000000000L
    def done(q: org.apache.spark.sql.streaming.StreamingQuery): Boolean =
      Option(q.lastProgress).exists(_.batchId >= batches.toLong)
    while (!(done(q1) && done(q2)) && System.nanoTime() < deadline)
      Thread.sleep(200)
    q1.stop(); q2.stop()

    // read the measurement off the instrumentation STREAM — the same
    // LISTEN FOR INSTRUMENTATION surface comms.ramen's benchmark reads
    val sq = instr.df.writeStream.format("memory").queryName("_sb_stats")
      .outputMode("append").start()
    sq.processAllAvailable(); sq.stop()
    val stats = spark.table("_sb_stats")
      .filter(col("worker").startsWith("consumer"))
      .select("worker", "stats_time", "tot_in_tuples")
      .collect()
      .groupBy(_.getString(0))
    // per-worker MEDIAN of per-batch rates (Δtuples/Δtime between
    // consecutive stats rows): one GC-paused trigger skews an
    // endpoint-delta rate by its full duration but moves a median not at
    // all — same reasoning as the query medians above it in Bench
    val perWorker = stats.flatMap { case (w, rows0) =>
      val rows = rows0.sortBy(_.getDouble(1)).drop(warmupBatches)
      val rates = rows.sliding(2).flatMap {
        case Array(a, b) =>
          val dt = b.getDouble(1) - a.getDouble(1)
          val dn = b.getLong(2) - a.getLong(2)
          if (dt > 0 && dn > 0) Some(dn / dt) else None
        case _ => None
      }.toIndexedSeq.sorted
      if (rates.isEmpty) None else Some(w -> rates(rates.size / 2))
    }
    val totRows = stats.values.flatten
      .map(_.getLong(2)).maxOption.getOrElse(0L)
    val secs = {
      val ts = stats.values.flatten.map(_.getDouble(1))
      if (ts.isEmpty) 0.0 else ts.max - ts.min
    }
    spark.sql("DROP TABLE IF EXISTS _sb_stats")
    Result(perWorker.values.sum, perWorker.toMap, totRows, secs)
  }

  /** Standalone entry: prints one JSON line (local profiling). */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val rows = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_ROWS", "1000000").toLong
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_BATCHES", "10").toInt
    val r = run(spark, rows, batches)
    val json = jsonLine(r)
    Bench.writeArtifact("SPARK_GRAFT_STREAMBENCH_OUT", "streambench_out.json", json)
    println(json)
    spark.stop()
  }

  def jsonLine(r: Result): String = {
    val pw = r.perWorker.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + math.round(v) }.mkString("{", ",", "}")
    s"""{"metric":"streaming_tuples_per_s","value":${math.round(r.tuplesPerS)},"unit":"tuples/s","per_worker":$pw,"rows":${r.rows},"seconds":${Bench.jnum(r.seconds)}}"""
  }
}
