package graft

/** Benchmark main (driver contract): runs the headline query set on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully materialized through the noop sink — `count()` would
  * let column pruning skip the projection work being measured. A warmup
  * action runs untimed so JVM/session startup isn't billed to the first
  * query.
  *
  * Reported time is the MEDIAN over the round-robin reps (min kept as the
  * secondary `queries_min`/`isolated_min` fields): a min-of-3 is an
  * order statistic of the machine's BEST coincidence, so cross-round
  * deltas on sub-second queries were dominated by whether one lucky rep
  * landed — the round-10 "+9 % total drift" on untouched queries was
  * exactly that artifact. Medians of ≥5 are stable against one stall AND
  * one lucky rep.
  *
  * Args (local profiling only): `all` → every registered query;
  * `name1,name2` → just those.
  */
object Bench {

  /** Median of a non-empty sample: middle element, or mean of the two
    * middles on even sizes. */
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Seconds with 4 decimals (0.1 ms — far below run-to-run noise), the
    * -1 sentinel untouched: full-precision doubles made the one-line JSON
    * ~3 KB and the driver's bounded tail capture clipped it mid-object
    * (BENCH_r11.json landed with `parsed: null`). */
  private[graft] def jnum(v: Double): String =
    if (v == -1.0) "-1"
    else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  /** Belt AND suspenders for the same truncation: persist the artifact to
    * a file the driver (and the next round's comparison) can always read,
    * whatever a stdout capture does to the printed line. */
  private[graft] def writeArtifact(envVar: String, default: String,
      json: String): Unit = {
    val path = sys.env.getOrElse(envVar, default)
    try java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] artifact write to $path failed: $e")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    val selected: Seq[QueryDef] = args.headOption match {
      case Some("all") => Queries.all
      case Some(names) =>
        val want = names.split(",").toSet
        Queries.all.filter(q => want(q.name))
      case None => Queries.all.filter(_.headline)
    }

    // environment fingerprint FIRST, before any warmup touches the data:
    // cached_gb then reflects whether the testdata/shuffle dirs are page-
    // cache-resident from a previous run — the r14 cross-session gap the
    // CPU canary could not see (same-HEAD 9.88 s vs 13.22 s at equal
    // canary). io_* measure the tmp disk the shuffles spill to.
    val envFields = EnvProbe.jsonFields()

    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    // machine-speed canary: a fixed pure-CPU codegen'd job, unrelated to
    // any operator under test. Cross-round artifacts kept drifting ±20 %
    // on sub-second queries purely from machine conditions (r10 "+9 %",
    // r12 back-to-back 11.5 vs 10.1 s totals at identical code); the
    // canary lets a reader NORMALIZE a round's numbers before calling
    // anything a regression. Median of 3.
    // bit_xor, not sum: ANSI mode (Spark 4 default) makes a long-sum
    // overflow a job-killing error; xor can't overflow
    val canary = median((1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(2000000000L).selectExpr("bit_xor(id * 2654435761)").collect()
      (System.nanoTime() - t0) / 1e9
    })

    // ≥5 reps per query, run ROUND-ROBIN (rep 1 of every query, then rep
    // 2, …) so a contention window mid-suite cannot hit all of one query's
    // reps at once — the round-4 d01/d02 "regressions" were exactly that
    // artifact.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val failed = scala.collection.mutable.Set.empty[String]
    // a rep that throws (analysis error, missing input) must NOT count as a
    // timing sample — a fast failure would otherwise report a tiny sample
    // with only a stderr note (round-6 advisory)
    def timeRep(q: QueryDef, tag: String): Option[Double] = {
      System.gc() // don't bill query N for query N-1's garbage
      // r18 (additive, disclosed): snapshot the persisted-RDD set so the
      // blocks a rep leaves behind can be released DETERMINISTICALLY after
      // its sink returns. The heavy queries (p04/p05/d14/d15*) return an
      // eager localCheckpoint — the only way a QueryDef can hand back a
      // frame whose internal caches are already scope-released — and those
      // final blocks used to wait for GC + ContextCleaner; five reps of
      // residue measurably poisoned later queries and cut the driver's
      // 32-core streaming phase to ~1/3 of the same binary's fresh-JVM
      // rate (r17 verdict item 1). The purge sits OUTSIDE the timed
      // region's endpoints (after the nanoTime diff) and releases only
      // blocks created by THIS rep, so per-query timings and methodology
      // are unchanged; no cross-rep reuse was possible anyway (each rep
      // rebuilds from parquet).
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      try {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name}$tag failed: ${e.getMessage}")
        failed += q.name
        None
      } finally {
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!preexisting(id)) rdd.unpersist(blocking = false)
        }
      }
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // per-query budget: a QueryDef may cap its reps (benchReps) — the
    // round-robin still interleaves whatever reps it does run
    def budget(q: QueryDef, suite: Int): Int =
      if (q.benchReps > 0) math.min(q.benchReps, suite) else suite
    (1 to reps).foreach { r =>
      selected.foreach { q =>
        if (r <= budget(q, reps))
          timeRep(q, "").foreach(t => times(q.name) = t :: times(q.name))
      }
    }
    // a query with zero successful reps reports -1 (never a plausible time)
    def stat(f: Seq[Double] => Double)(ts: Seq[Double]): Double =
      if (ts.isEmpty) -1.0 else f(ts)
    val results = selected.map(q => q.name -> stat(median)(times(q.name)))
    val mins = selected.map(q => q.name -> stat(_.min)(times(q.name)))
    // isolated pass: back-to-back reps per query AFTER the round-robin
    // suite, so each query also gets a warm, contention-free sample.
    // Round-robin medians absorb suite-order effects; isolated medians are
    // the number to bisect against when a query drifts across rounds
    // (round-5 verdict: q01/n01/r01 swung ±20% between same-day suites).
    val isoReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATED", "3").toInt
    val isoTimes = selected.map { q =>
      q.name -> (1 to budget(q, isoReps)).flatMap(_ => timeRep(q, " isolated"))
    }
    val isolated = isoTimes.map { case (n, ts) => n -> stat(median)(ts) }
    val isolatedMin = isoTimes.map { case (n, ts) => n -> stat(_.min)(ts) }
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val failedArr = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // sustained streaming throughput vs BASELINE.md's ~0.5M tuples/s —
    // the comms.ramen-shaped harness (see StreamBench); skippable via env
    val streaming =
      if (sys.env.get("SPARK_GRAFT_STREAMBENCH").contains("0")) ""
      else try {
        // same hygiene as timeRep's per-rep System.gc(), applied to the
        // streaming phase: the query suite leaves checkpoint/broadcast
        // blocks that only ContextCleaner (triggered by GC) releases, and
        // r17 measured the in-bench streaming rate at ~1/3 of the same
        // code's fresh-JVM rate purely from that residue. r18: the
        // gc+sleep alone was NOT deterministic (it recovered the rate on
        // the builder's box but not the driver's — r17 verdict item 1), so
        // first drop every still-persisted RDD block explicitly and
        // BLOCKING (timeRep's per-rep purge should leave none, but the
        // warmup entry and any future leak path are covered), then let the
        // gc passes clear broadcast residue, which has no public explicit
        // release.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
        val r = StreamBench.run(spark)
        val pw = r.perWorker.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + math.round(v) }.mkString("{", ",", "}")
        s""","streaming_tuples_per_s":${math.round(r.tuplesPerS)},"streaming":{"per_worker":$pw,"rows":${r.rows},"seconds":${jnum(r.seconds)}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] streaming failed: ${e.getMessage}")
        ""","streaming_tuples_per_s":-1"""
      }
    val json = s"""{"metric":"total","value":${jnum(total)},"unit":"sec","stat":"median","reps":$reps,"canary_sec":${jnum(canary)}$envFields,"queries":${obj(results)},"queries_min":${obj(mins)},"isolated":${obj(isolated)},"isolated_min":${obj(isolatedMin)},"failed":$failedArr$streaming,"sf":"$sfDir"}"""
    // the streaming headline number alone (the per-worker breakdown stays
    // in the full artifact)
    val streamShort = ""","streaming_tuples_per_s":(-?\d+)""".r
      .findFirstIn(streaming).getOrElse("")
    writeArtifact("SPARK_GRAFT_BENCH_OUT", "bench_out.json", json)
    println(json)
    // The driver's stdout capture keeps a bounded TAIL: the full line
    // above head-truncated in BENCH_r11/r12 ("parsed": null — the capture
    // began mid-queries dict). Repeat just the headline essentials as a
    // SHORT final line (~0.7 kB) so the captured tail always ends with
    // one complete parseable JSON object; the complete artifact is
    // committed as bench_out.json either way. Stop Spark FIRST so this is
    // the JVM's last stdout write (shutdown logs go to stderr), and tag
    // the line "abridged" so tooling holding both lines — they share
    // metric:total — can tell them apart.
    // finally: a shutdown exception must not eat the one line the
    // driver's bounded tail capture parses
    try spark.stop()
    finally {
      println(s"""{"metric":"total","abridged":true,"value":${jnum(total)},"unit":"sec","stat":"median","reps":$reps,"canary_sec":${jnum(canary)}$envFields,"queries":${obj(results)}$streamShort,"sf":"$sfDir"}""")
      System.out.flush()
    }
  }
}
