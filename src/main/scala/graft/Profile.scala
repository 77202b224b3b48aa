package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Scratch profiling main: stage-level timings for the heavy operators.
  * Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    println(s"[profile] cores=${spark.sparkContext.defaultParallelism}")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        stages.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=${wall / 1e3}%6.2fs run=${m.executorRunTime / 1e3}%7.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2fs gc=${m.jvmGCTime / 1e3}%6.2fs " +
          f"deserT=${m.executorDeserializeTime / 1e3}%6.2fs " +
          si.name.takeWhile(_ != '\n').take(60))
      }
    })

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    spark.range(1000).selectExpr("sum(id)").collect()
    stages.clear()

    if (args.headOption.contains("explain")) {
      for (q <- args.drop(1)) {
        println(s"===== $q")
        Queries.byName(q).run(spark, d).explain("formatted")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("plan")) {
      // EXECUTED plan (post-AQE): shows whether self-join sides reused
      // one exchange or each recomputed their upstream. Must run THIS
      // queryExecution (toRdd), not a noop write (separate execution
      // whose adaptive plan would stay isFinalPlan=false)
      for (q <- args.drop(1)) {
        val df = Queries.byName(q).run(spark, d)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val s = df.queryExecution.executedPlan.toString
        println(s"===== $q executed plan")
        println(s)
        println(s"[reuse] ReusedExchange=${"ReusedExchange".r.findAllIn(s).length} " +
          s"Exchange=${"Exchange".r.findAllIn(s).length}")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("infergen")) {
      // A/B: InferFiltersFromGenerate duplicates the signature kernel
      // into a pre-exchange filter — measure with and without
      for (q <- args.drop(1); pass <- Seq("on", "off", "on2", "off2")) {
        if (pass.startsWith("off"))
          spark.conf.set("spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        else spark.conf.unset("spark.sql.optimizer.excludedRules")
        val df = Queries.byName(q).run(spark, d)
        time(s"$q infer=$pass")(mat(df))
      }
      spark.stop(); return
    }
    if (args.headOption.contains("raqlsplit")) {
      // where does r01's wall go: table registration, RaQL compile, or
      // plan execution?
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val c = new graft.raql.RaqlCompiler(spark, d)
        Tables.names.foreach { t =>
          try c.registerTable(s"tables/$t",
            if (t == "events") Tables.events(spark, d)
            else Tables.load(spark, d, t))
          catch { case _: Throwable => () }
        }
        val t1 = System.nanoTime()
        graft.raql.RaqlParser.parseProgram(
          """DEFINE q AS
               FROM tables/events
               SELECT event_type, COUNT 1 AS n, sum u64(user_id) AS sum_uid,
                      min value AS min_value, max value AS max_value
               GROUP BY event_type;""") match {
          case Right(p) => c.register("main", p)
          case Left(e) => throw new IllegalArgumentException(e.toString)
        }
        val df = c.compile("main/q").orderBy("event_type")
        val t2 = System.nanoTime()
        mat(df)
        val t3 = System.nanoTime()
        println(f"[raqlsplit $i] register=${(t1 - t0) / 1e9}%.3f " +
          f"compile=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f s")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("probe")) {
      // why doesn't the bucket self-join reuse one exchange?
      println("exchange.reuse=" + spark.conf.getOption("spark.sql.exchange.reuse"))
      val base = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), expr("length(text) % 64").as("k"))
      def reuse(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val s = df.queryExecution.executedPlan.toString
        println(s"[$tag] ReusedExchange=${"ReusedExchange".r.findAllIn(s).length} " +
          s"Exchange=${"Exchange".r.findAllIn(s).length}")
      }
      val plain = base.repartition(32, col("k"))
      val pj = plain.as("a").join(plain.as("b"), Seq("k")).groupBy("k").count()
      reuse("plain-self-join")(pj)
      println(pj.queryExecution.executedPlan.toString)
      val pinned = base.repartition(32, col("k")).hint("shuffle_hash")
      reuse("pinned-self-join")(pinned.as("a").join(pinned.as("b"), Seq("k"))
        .groupBy("k").count())
      val rr = base.repartition(32).repartition(32, col("k")).hint("shuffle_hash")
      reuse("rr-then-keyed")(rr.as("a").join(rr.as("b"), Seq("k"))
        .groupBy("k").count())
      spark.stop(); return
    }
    if (args.headOption.contains("stages")) {
      for (q <- args.drop(1)) {
        stages.clear()
        time(q)(mat(Queries.byName(q).run(spark, d))) // cold
        stages.clear()
        time(s"$q warm")(mat(Queries.byName(q).run(spark, d)))
        Thread.sleep(300)
        stages.forEach(println)
      }
      spark.stop(); return
    }
    if (args.headOption.contains("q01x")) {
      import graft.Det.{dsum, davg}
      val q = Queries.byName("q01_agg")
      for (i <- 1 to 4) time(s"q01 asis rep$i")(mat(q.run(spark, d)))
      def repart = Tables.lineitem(spark, d).repartition(32)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          davg(col("l_quantity")).as("avg_qty"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
      for (i <- 1 to 4) time(s"q01 repart rep$i")(mat(repart))
      stages.forEach(println)
      spark.stop(); return
    }
    if (args.headOption.contains("a02raw")) {
      // raw bucket-join pair count for the LSH parameterization
      import graft.ops.Similarity
      val embs = Tables.embeddings(spark, d)
      val dim = Similarity.vecDim(embs, "embedding")
      val planes = Similarity.hyperplanes(dim, 12, 4)
      import spark.implicits._
      val planeElems = broadcast(planes.zipWithIndex
        .flatMap { case (p, pid) => p.zipWithIndex.map { case (w, i) => (pid, i, w) } }
        .toDF("plane_id", "pos", "w"))
      val buckets = embs.select(col("vec_id").as("id"), col("embedding").as("v"))
        .repartition(32)
        .select(col("id"), posexplode(col("v")))
        .join(planeElems, "pos")
        .groupBy(col("id"), col("plane_id"))
        .agg(sum(col("col") * col("w")).as("dot"))
        .groupBy(col("id"), (col("plane_id") / 4).cast("int").as("band"))
        .agg(sum(when(col("dot") >= 0,
          call_function("shiftleft", lit(1L), lit(3) - col("plane_id") % 4))
          .otherwise(0L)).as("bucket"))
      time("rawpairs")(println("  raw=" + buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id")).count()))
      spark.stop(); return
    }
    if (args.headOption.contains("scanfold")) {
      // linearity of the incremental scan aggregates: time a single-group
      // running SMOOTH at doubling sizes — linear means ~2× per doubling
      // (the old collect_list-prefix HOF fold was ~4×)
      import org.apache.spark.sql.expressions.Window
      import graft.functions.GraftFunctions.expSmoothScan
      val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
      for (n <- Seq(25000, 50000, 100000, 200000)) {
        val df = spark.range(n.toLong).select(col("id"),
          (col("id") % 97).cast("double").as("v"))
        time(s"scan_n$n")(mat(df.select(expSmoothScan(col("v"), 0.3).over(w))))
      }
      spark.stop(); return
    }
    if (args.headOption.contains("micro")) {
      import graft.functions.TextFunctions._
      val docs = Tables.documents(spark, d).cache()
      docs.count()
      val t = col("text")
      time("normalize")(mat(docs.select(normalize(t))))
      time("tokens")(mat(docs.select(tokens(t))))
      time("size_toks")(mat(docs.select(size(tokens(t)))))
      time("shingles")(mat(docs.select(wordShingles(tokens(t), 3))))
      time("shingles2")(mat(docs.select(wordShingles(tokens(t), 3))))
      val toksDf = docs.select(col("doc_id"), tokens(t).as("toks")).cache()
      toksDf.count()
      time("shingles_pre")(mat(toksDf.select(wordShingles(col("toks"), 3))))
      time("distinct_only")(mat(toksDf.select(array_distinct(col("toks")))))
      time("explode_count")(toksDf.select(explode(col("toks"))).count())
      // does a two-step projection (uncached) keep tokens evaluated once,
      // or does CollapseProject re-inline the split into every element_at?
      val twoStep = docs.select(col("doc_id"), tokens(t).as("toks"))
        .select(wordShingles(col("toks"), 3).as("sh"))
      time("shingles_2step")(mat(twoStep))
      twoStep.explain("formatted")
    } else {
      val q = args.headOption.getOrElse("d02_minhash_lsh")
      time(q)(mat(Queries.byName(q).run(spark, d)))
    }
    stages.forEach(println)
    spark.stop()
  }
}
