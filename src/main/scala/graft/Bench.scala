package graft

/** Benchmark main (driver contract): runs the headline query set on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully materialized through the noop sink — `count()` would
  * let column pruning skip the projection work being measured. A warmup
  * action runs untimed so JVM/session startup isn't billed to the first
  * query.
  *
  * Args (local profiling only): `all` → every registered query;
  * `name1,name2` → just those.
  */
object Bench {
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

    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    // min-of-3 per query — one environmental stall (page cache, CPU
    // contention, JIT) must not be recorded as the query's cost. Reps run
    // ROUND-ROBIN (rep 1 of every query, then rep 2, …) so a contention
    // window mid-suite cannot hit all of one query's reps at once — the
    // round-4 d01/d02 "regressions" were exactly that artifact.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val failed = scala.collection.mutable.Set.empty[String]
    // a rep that throws (analysis error, missing input) must NOT count as a
    // timing sample — a fast failure would otherwise report a tiny min with
    // only a stderr note (round-6 advisory)
    def timeRep(q: QueryDef, tag: String): Option[Double] = {
      System.gc() // don't bill query N for query N-1's garbage
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name}$tag failed: ${e.getMessage}")
        failed += q.name
        None
      }
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      selected.foreach { q =>
        timeRep(q, "").foreach(t => times(q.name) = t :: times(q.name))
      }
    }
    // a query with zero successful reps reports -1 (never a plausible time)
    val results = selected.map(q =>
      q.name -> times(q.name).minOption.getOrElse(-1.0))
    // isolated pass: back-to-back reps per query AFTER the round-robin
    // suite, so each query also gets a warm, contention-free minimum.
    // Round-robin minima absorb suite-order effects; isolated minima are
    // the number to bisect against when a query drifts across rounds
    // (round-5 verdict: q01/n01/r01 swung ±20% between same-day suites).
    val isoReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATED", "2").toInt
    val isolated = selected.map { q =>
      val ts = (1 to isoReps).flatMap(_ => timeRep(q, " isolated"))
      q.name -> ts.minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedArr = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // sustained streaming throughput vs BASELINE.md's ~0.5M tuples/s —
    // the comms.ramen-shaped harness (see StreamBench); skippable via env
    val streaming =
      if (sys.env.get("SPARK_GRAFT_STREAMBENCH").contains("0")) ""
      else try {
        val r = StreamBench.run(spark)
        val pw = r.perWorker.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        s""","streaming_tuples_per_s":${r.tuplesPerS},"streaming":{"per_worker":$pw,"rows":${r.rows},"seconds":${r.seconds}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] streaming failed: ${e.getMessage}")
        ""","streaming_tuples_per_s":-1"""
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"isolated":$iso,"failed":$failedArr$streaming,"sf":"$sfDir"}""")
    spark.stop()
  }
}
