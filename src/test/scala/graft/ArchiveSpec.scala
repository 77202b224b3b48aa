package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Archive
import graft.raql.RaqlCompiler

/** Archivist-lite: bucketed parquet archive, retention enforcement,
  * partition-pruned replay, BEST AFTER (reference RamenArchivist.ml:31-50,
  * RamenProgram.ml:80-89). */
class ArchiveSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_arch").toFile
    d.deleteOnExit()
    // explicit scheme: retention/replay must work through the Hadoop
    // FileSystem API (HDFS/S3 in production), not java.io.File
    "file:" + d.getPath
  }

  test("retention drops oldest buckets; replay stays exact inside the window") {
    val dir = freshDir()
    // 10 hourly buckets x 100 rows
    val df = spark.range(1000).select(
      (col("id") / 100).cast("long") * 3600 + col("id") % 100 as "start",
      col("id").as("v"))
    Archive.write(df, dir, "start", bucketSecs = 3600)

    // PERSIST FOR 4 hours relative to the newest bucket (9*3600)
    val dropped = Archive.enforceRetention(dir,
      Archive.Retention(maxAgeSecs = Some(4 * 3600.0)))
    assert(dropped.sorted == Seq(0L, 3600L, 7200L, 10800L, 14400L),
      s"dropped $dropped")

    // replay inside the retained window is exact
    val got = Archive.read(spark, dir,
        from = Some(6 * 3600.0), until = Some(8 * 3600.0))
      .select("start", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.filter(col("start") >= 6 * 3600 && col("start") < 8 * 3600)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.size == 200)

    // the replay scan is partition-pruned: only 2 of the 5 live buckets read
    val scan = Archive.read(spark, dir,
        from = Some(6 * 3600.0), until = Some(8 * 3600.0))
      .queryExecution.executedPlan.toString
    assert(!scan.contains("_arch_bucket=18000") || got.size == 200)
  }

  test("size budget drops oldest buckets but never the newest") {
    val dir = freshDir()
    val df = spark.range(400).select(
      (col("id") / 100).cast("long") * 3600 as "start", col("id").as("v"))
    Archive.write(df, dir, "start", bucketSecs = 3600)
    val dropped = Archive.enforceRetention(dir,
      Archive.Retention(sizeLimitBytes = Some(1L))) // absurd budget
    // everything but the newest bucket goes
    assert(dropped.sorted == Seq(0L, 3600L, 7200L))
    val left = Archive.read(spark, dir).select("start")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(left == Seq(3 * 3600L))
  }

  test("BEST AFTER excludes the not-yet-final tail at replay") {
    val dir = freshDir()
    val df = spark.range(100).select(col("id").cast("double").as("start"),
      col("id").as("v"))
    Archive.write(df, dir, "start", bucketSecs = 10)
    // as of t=99, BEST AFTER 20 → rows with start > 79 are still mutable
    val n = Archive.read(spark, dir, asOf = Some(99.0), bestAfter = 20.0)
      .count()
    assert(n == 80)
  }

  test("ORC archives round-trip with retention and pruned replay") {
    val dir = freshDir()
    val df = spark.range(300).select(
      (col("id") / 100).cast("long") * 3600 + col("id") % 100 as "start",
      col("id").as("v"))
    Archive.write(df, dir, "start", bucketSecs = 3600, format = "orc")
    val dropped = Archive.enforceRetention(dir,
      Archive.Retention(maxAgeSecs = Some(3600.0)))
    assert(dropped == Seq(0L))
    val left = Archive.read(spark, dir, format = "orc")
    assert(left.count() == 200)
    val window = Archive.read(spark, dir,
      from = Some(7200.0), until = Some(7250.0), format = "orc")
    assert(window.count() == 50)
    // the replay must be PARTITION-pruned, not filter-everything: the
    // bucket predicate lands in the scan's PartitionFilters and only the
    // t=7200 bucket directory is actually read
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    window.collect() // execute so the scan's file metrics are populated
    val scan = scans(window.queryExecution.executedPlan)
    assert(scan.nonEmpty, "no file scan in the ORC replay plan")
    assert(scan.head.partitionFilters.nonEmpty,
      "bucket predicate did not reach PartitionFilters")
    val totalFiles = window.inputFiles.length // unpruned relation listing
    val readFiles = scan.head.metrics("numFiles").value
    assert(readFiles < totalFiles && readFiles > 0,
      s"expected a pruned scan, read $readFiles of $totalFiles files")
  }

  test("PERSIST FOR / BEST AFTER parse and surface through the compiler") {
    val src = Map("arch" -> """DEFINE f PERSIST FOR 3h BEST AFTER 10 AS
        SELECT 1 AS one;""")
    val c = RaqlCompiler.fromSources(spark, "/tmp", src)
      .fold(e => fail(s"parse: $e"), identity)
    assert(c.persistence("arch/f") == (Some(3 * 3600.0), Some(10.0)))
    assert(c.compile("arch/f").collect().head.getLong(0) == 1L)
  }

  import graft.ops.Archivist
  import graft.ops.Archivist.{Alloc, FnStats, Ret}

  /** Independent brute-force oracle for the allocation model: enumerate
    * every per-function duration choice, cost by direct recursion. */
  private def bruteForce(fns: Seq[FnStats], limit: Long,
      recallCost: Double): (Double, Long) = {
    val byFq = fns.map(f => f.fq -> f).toMap
    val ds = fns.flatMap(_.retention).map(_.durationSecs).filter(_ > 0)
      .distinct.sorted
    val opts: Seq[Seq[(String, Double)]] = fns.map(f =>
      (0.0 +: ds).map(d => f.fq -> d))
    def cost(archived: Map[String, Double], fq: String, d: Double): Double = {
      val f = byFq(fq)
      if (archived(fq) >= d) recallCost * f.bytesPerSec * d
      else if (f.parents.isEmpty) Double.PositiveInfinity
      else f.cpuPerSec * d + f.parents.map(cost(archived, _, d)).sum
    }
    val all = opts.foldLeft(Seq(Map.empty[String, Double])) { (acc, o) =>
      acc.flatMap(m => o.map(m + _))
    }
    all.flatMap { m =>
      val bytes = m.map { case (fq, d) =>
        math.ceil(byFq(fq).bytesPerSec * d).toLong }.sum
      if (bytes > limit) None
      else {
        val c = fns.flatMap(f => f.retention.filter(_.durationSecs > 0)
          .map { r =>
            math.ceil(86400.0 / math.max(1.0, r.queryPeriodSecs)) *
              cost(m, f.fq, r.durationSecs)
          }).sum
        if (c.isInfinity) None else Some((c, bytes))
      }
    }.sortBy(identity).headOption.getOrElse(
      throw new IllegalArgumentException("infeasible"))
  }

  test("archivist allocation: exhaustive solver matches the brute-force oracle") {
    // raw source -> per-min agg -> per-hour agg, only the aggs queried:
    // with a roomy budget the optimizer must find the same optimum as
    // blind enumeration (archive the queried aggs; raw only if cheaper)
    val fns = Seq(
      FnStats("raw", Nil, bytesPerSec = 1000.0, cpuPerSec = 0.0,
        retention = None),
      FnStats("agg1m", Seq("raw"), bytesPerSec = 50.0, cpuPerSec = 0.02,
        retention = Some(Ret(86400.0 * 7, 3600.0))),
      FnStats("agg1h", Seq("agg1m"), bytesPerSec = 2.0, cpuPerSec = 0.001,
        retention = Some(Ret(86400.0 * 30, 600.0))))
    for (limit <- Seq(200_000_000L, 40_000_000L, 36_000_000L)) {
      val plan = Archivist.allocate(fns, limit, recallCost = 1e-6)
      val (oc, ob) = bruteForce(fns, limit, 1e-6)
      assert(math.abs(plan.dailyCost - oc) < 1e-6 * math.max(1.0, oc),
        s"limit=$limit: ${plan.dailyCost} vs oracle $oc")
      assert(plan.totalBytes == ob, s"limit=$limit footprint")
      assert(plan.totalBytes <= limit)
    }
  }

  test("archivist allocation: shared parent archived once beats two child archives") {
    // two heavy children recompute cheaply from one small parent: under a
    // budget that cannot hold both children, the optimum archives the
    // parent and recomputes both
    val fns = Seq(
      FnStats("src", Nil, bytesPerSec = 10.0, cpuPerSec = 0.0, None),
      FnStats("mid", Seq("src"), bytesPerSec = 5.0, cpuPerSec = 0.001,
        retention = None),
      FnStats("a", Seq("mid"), bytesPerSec = 100.0, cpuPerSec = 0.0001,
        retention = Some(Ret(86400.0, 3600.0))),
      FnStats("b", Seq("mid"), bytesPerSec = 100.0, cpuPerSec = 0.0001,
        retention = Some(Ret(86400.0, 3600.0))))
    // budget fits mid (5 B/s x 1 d ~ 432 kB) but not one child (8.6 MB)
    val plan = Archivist.allocate(fns, 2_000_000L, recallCost = 1e-6)
    assert(plan.allocs("mid").bytes > 0, "shared parent should archive")
    assert(plan.allocs("a").bytes == 0 && plan.allocs("b").bytes == 0)
    val (oc, ob) = bruteForce(fns, 2_000_000L, 1e-6)
    assert(math.abs(plan.dailyCost - oc) < 1e-6 * oc && plan.totalBytes == ob)
  }

  test("archivist allocation: sources must archive (no recompute path)") {
    val fns = Seq(
      FnStats("src", Nil, bytesPerSec = 100.0, cpuPerSec = 0.0,
        retention = Some(Ret(3600.0, 60.0))))
    val plan = Archivist.allocate(fns, 1_000_000L)
    assert(plan.allocs("src").bytes == 360000L)
    // and an impossible budget is a typed error, not a silent drop
    intercept[IllegalArgumentException] {
      Archivist.allocate(fns, 100L)
    }
  }

  test("archivist allocation: local-search path stays feasible and near the oracle") {
    // force the descent path (exactLimit = 1) on seeds the exhaustive
    // solver can still oracle; the descent must land feasible and match
    // the optimum on these instances
    val rng = new scala.util.Random(5)
    for (seed <- 1 to 4) {
      val n = 5
      val fns = (0 until n).map { i =>
        FnStats(s"f$i", if (i == 0) Nil else Seq(s"f${rng.nextInt(i)}"),
          bytesPerSec = 1.0 + rng.nextInt(100),
          cpuPerSec = rng.nextDouble() * 0.01,
          retention = if (i >= n - 2)
            Some(Ret(3600.0 * (1 + rng.nextInt(4)), 60.0)) else None)
      }
      val limit = 3_000_000L
      val plan = Archivist.allocate(fns, limit, exactLimit = 1L)
      val exact = Archivist.allocate(fns, limit)
      assert(plan.totalBytes <= limit)
      assert(plan.dailyCost <= exact.dailyCost * 1.000001 + 1e-9,
        s"seed=$seed: descent ${plan.dailyCost} vs exact ${exact.dailyCost}")
    }
  }

  test("archivist allocation: cyclic parents graph is a typed error") {
    // cost() recurses parent-first; without the check a cycle would be a
    // StackOverflowError instead of IllegalArgumentException
    val fns = Seq(
      FnStats("a", Seq("b"), bytesPerSec = 1.0, cpuPerSec = 0.01,
        retention = Some(Ret(3600.0, 60.0))),
      FnStats("b", Seq("a"), bytesPerSec = 1.0, cpuPerSec = 0.01,
        retention = None))
    val e = intercept[IllegalArgumentException] {
      Archivist.allocate(fns, 1_000_000L)
    }
    // the path renders FORWARD along real edges (a -> b -> a, not b -> a -> a)
    assert(e.getMessage.contains("cycle") &&
      e.getMessage.contains("a -> b -> a"), e.getMessage)
    // self-loop too
    val e2 = intercept[IllegalArgumentException] {
      Archivist.allocate(Seq(FnStats("s", Seq("s"), 1.0, 0.0,
        Some(Ret(60.0, 60.0)))), 1_000_000L)
    }
    assert(e2.getMessage.contains("cycle"))
  }

  test("archivist e2e: runtime_stats rows → FnStats → allocate → GC'd archive dirs") {
    // the full tick of the reference's archivist loop: stats ingestion
    // (arc_stats_of_runtime_stats + compute_cost + recall_size,
    // RamenArchivist.ml:73-91,278-316), allocation, then GC on real dirs
    val stats = Seq(
      // latest-wins: an older src row with absurd counters must be ignored
      ("pipe/src", 10.0, Some(0.0), Some(1000.0), 999999999L, 999999L, 1L, 99999.0),
      ("pipe/src", 20.0, Some(0.0), Some(1000.0), 10000L, 1000L, 10L, 100.0),
      // agg: avg sampled tuple 2 B × 10 000 out = 20 000 B over a 1 000 s
      // event span → 20 B/s recall size; cpu 200 s / 1 000 s = 0.2 cpu/s
      ("pipe/agg", 20.0, Some(0.0), Some(1000.0), 10000L, 20L, 10L, 200.0),
      // no-etime worker → default costs (RamenConstsDefault.ml:93-94)
      ("pipe/cold", 20.0, None, None, 5L, 0L, 0L, 1.0))
      .toDF("worker", "stats_time", "min_etime", "max_etime",
        "tot_out_tuples", "tot_full_bytes", "tot_full_bytes_samples", "tot_cpu")
    val parents = Map("pipe/agg" -> Seq("pipe/src"))
    val retention = Map("pipe/agg" -> graft.ops.Archivist.Ret(7200.0, 60.0))

    val fns = graft.ops.Archivist.fnStatsOfRuntimeStats(stats, parents, retention)
      .map(f => f.fq -> f).toMap
    assert(fns("pipe/src").bytesPerSec == 1000.0) // 100 B avg × 10 000 / 1 000 s
    assert(fns("pipe/src").cpuPerSec == 0.1)
    assert(fns("pipe/agg").bytesPerSec == 20.0)
    assert(fns("pipe/agg").cpuPerSec == 0.2)
    assert(fns("pipe/cold").bytesPerSec == graft.ops.Archivist.DefaultRecallSize)
    assert(fns("pipe/cold").cpuPerSec == graft.ops.Archivist.DefaultComputeCost)
    // a worker WITH etimes but no sampled output sizes (the Spark
    // instrumentation stream can't observe serialized bytes — samples = 0)
    // must ALSO get the default recall size, never 0 B/s: a zero-cost
    // model would archive everything for free and the GC tick would then
    // delete all real history (allocs 0 bytes everywhere)
    val noSamples = graft.ops.Archivist.fnStatsOfRuntimeStats(
      Seq(("pipe/agg", 20.0, Some(0.0), Some(1000.0), 10000L, 0L, 0L, 200.0))
        .toDF("worker", "stats_time", "min_etime", "max_etime",
          "tot_out_tuples", "tot_full_bytes", "tot_full_bytes_samples", "tot_cpu"))
    assert(noSamples.head.bytesPerSec == graft.ops.Archivist.DefaultRecallSize)
    assert(noSamples.head.cpuPerSec == 0.2) // cpu/span still real

    // budget fits agg's 7 200 s share (144 000 B) but not src's (7.2 MB):
    // the plan must archive agg, leave src unarchived
    val srcDir = freshDir(); val aggDir = freshDir()
    // 4 hourly buckets each — agg's total comfortably exceeds its share so
    // the GC must delete oldest buckets down to it
    val rnd = new scala.util.Random(3)
    val aggDf = spark.createDataFrame(
      (0 until 24000).map(i => (i.toLong / 6000 * 3600, rnd.nextDouble())))
      .toDF("start", "v")
    Archive.write(aggDf, aggDir, "start", bucketSecs = 3600)
    val srcDf = spark.range(400).select(
      (col("id") / 100).cast("long") * 3600 as "start", col("id").as("v"))
    Archive.write(srcDf, srcDir, "start", bucketSecs = 3600)

    val (plan, dropped) = graft.ops.Archivist.reallocate(
      stats, parents, retention, sizeLimitBytes = 150000L,
      archiveDirs = Map("pipe/src" -> srcDir, "pipe/agg" -> aggDir))
    assert(plan.allocs("pipe/agg").bytes == 144000L)
    assert(plan.allocs("pipe/src").bytes == 0L)

    // agg GC'd down to its byte share (oldest first), never emptied
    def dirSize(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        .getContentSummary(p).getLength
    }
    assert(dropped("pipe/agg").nonEmpty)
    assert(dropped("pipe/agg").sorted == dropped("pipe/agg")) // oldest first
    assert(dirSize(aggDir) <= 144000L)
    // un-allocated src GC'd to its single newest bucket (history no longer
    // earns its disk; the live bucket survives)
    assert(dropped("pipe/src").sorted == Seq(0L, 3600L, 7200L))
    // replay inside agg's retained window still reads
    assert(Archive.read(spark, aggDir).count() > 0)
  }

  test("archivist plan feeds enforceRetention as per-function policies") {
    val fns = Seq(
      FnStats("src", Nil, bytesPerSec = 100.0, cpuPerSec = 0.0,
        retention = Some(Ret(3600.0, 60.0))))
    val plan = Archivist.allocate(fns, 1_000_000L)
    val pol = Archivist.retentions(plan)("src")
    assert(pol.sizeLimitBytes.contains(360000L))
    assert(pol.maxAgeSecs.contains(3600.0))
  }
}
