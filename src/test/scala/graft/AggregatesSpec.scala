package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.aggs.SlicedBloom
import graft.functions.GraftFunctions._

class AggregatesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  test("SpaceSaving topk is exact when capacity covers the key space") {
    val df = Seq.tabulate(1000)(i => ("k" + (i % 7), 1L)).toDF("k", "w")
    val out = df.agg(topK(col("k"), col("w"), capacity = 64, k = 3).as("t"))
      .select(explode(col("t"))).select("col.key", "col.cnt")
      .as[(String, Long)].collect()
    // 1000 rows over 7 keys: k0..k5 get 143, k6 gets 142 → ties break by key
    assert(out.toSeq == Seq(("k0", 143L), ("k1", 143L), ("k2", 143L)))
  }

  test("SpaceSaving topk finds heavy hitters in the lossy regime") {
    // 2 heavy keys + 500 singletons, capacity far below cardinality
    val rows = Seq.fill(400)("heavy1") ++ Seq.fill(300)("heavy2") ++
      (1 to 500).map("rare" + _)
    val df = rows.toDF("k")
    val out = df.agg(topK(col("k"), lit(1L), capacity = 32, k = 2).as("t"))
      .select(explode(col("t"))).select("col.key").as[String].collect()
    assert(out.toSet == Set("heavy1", "heavy2"))
  }

  test("decayed topk favors recent keys (half-life weighting)") {
    import graft.aggs.DecayedTopState
    // "old": weight 100 at t=0; "new": weight 30 spread around t=10_000.
    // Half-life 1000s → decay = ln2/500 ≈ 0.0014: old is inflated away.
    val st = new DecayedTopState(capacity = 8, decay = math.log(2) / 500, sigmas = 0)
    (1 to 100).foreach(_ => st.observe("old", 1.0, 0.0))
    (1 to 30).foreach(i => st.observe("new", 1.0, 10000.0 + i))
    val top = st.top(1)
    assert(top.head._1 == "new", s"expected 'new' first, got $top")
    // without decay the heavy early key wins
    val st0 = new DecayedTopState(8, 0.0, 0)
    (1 to 100).foreach(_ => st0.observe("old", 1.0, 0.0))
    (1 to 30).foreach(i => st0.observe("new", 1.0, 10000.0 + i))
    assert(st0.top(1).head._1 == "old")
  }

  test("decayed topk rebase keeps relative order across large time spans") {
    import graft.aggs.DecayedTopState
    // inflation exceeds 1e6 several times over this span
    val st = new DecayedTopState(16, math.log(2) / 100, sigmas = 0)
    (0 to 200).foreach { i =>
      st.observe("steady", 1.0, i * 50.0)
      if (i % 2 == 0) st.observe("half", 1.0, i * 50.0)
    }
    val keys = st.top(2).map(_._1)
    assert(keys == Seq("steady", "half"))
  }

  test("sigma filter keeps only outlier keys") {
    import graft.aggs.DecayedTopState
    val st = new DecayedTopState(128, 0.0, sigmas = 2.0)
    (1 to 50).foreach(i => st.observe("noise" + i, 1.0, 0.0))
    (1 to 60).foreach(_ => st.observe("heavy", 5.0, 0.0))
    val keys = st.top(10).map(_._1)
    assert(keys == Seq("heavy"), s"expected only the outlier, got $keys")
  }

  test("decayed topk merge normalizes time origins") {
    import graft.aggs.DecayedTopState
    val decay = math.log(2) / 500
    // one-shot state over the full stream
    val whole = new DecayedTopState(16, decay, 0)
    // two partial states with different first-seen times (origins)
    val a = new DecayedTopState(16, decay, 0)
    val b = new DecayedTopState(16, decay, 0)
    (0 to 100).foreach { i =>
      val t = i * 20.0
      whole.observe("k" + (i % 5), 1.0, t)
      if (i < 50) a.observe("k" + (i % 5), 1.0, t)
      else b.observe("k" + (i % 5), 1.0, t)
    }
    a.mergeIn(b)
    val got = a.top(5).map(_._1)
    val want = whole.top(5).map(_._1)
    assert(got == want, s"merged $got vs whole $want")
    // inflated weights are relative to each state's own origin; the
    // meaningful invariant is the RATIO between keys, which must agree
    val wa0 = a.top(5).head._2
    val ww0 = whole.top(5).head._2
    a.top(5).zip(whole.top(5)).foreach { case ((_, wa), (_, ww)) =>
      assert(math.abs(wa / wa0 - ww / ww0) < 1e-9,
        s"ratio ${wa / wa0} vs ${ww / ww0}")
    }
  }

  test("decayed topk as a Spark aggregate is partition-count invariant") {
    val df = Seq.tabulate(2000) { i =>
      ("u" + (i % 20), 1.0 + (i % 3), i * 10.0)
    }.toDF("k", "w", "t")
    def run(parts: Int): Seq[String] =
      df.repartition(parts)
        .agg(topKDecayed(col("k"), col("w"), col("t"),
          capacity = 64, k = 5, decay = math.log(2) / 5000).as("top"))
        .select(explode(col("top"))).select("col.key").as[String].collect().toSeq
    assert(run(1) == run(8))
  }

  test("reservoir sample has the right size and only observed values") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val out = df.agg(reservoir(col("x"), n = 50).as("s"))
      .select(explode(col("s"))).as[Double].collect()
    assert(out.length == 50)
    assert(out.forall(v => v >= 1.0 && v <= 1000.0))
    // small group: keeps everything
    val small = (1 to 10).map(_.toDouble).toDF("x")
      .agg(reservoir(col("x"), 50).as("s"))
      .select(size(col("s"))).as[Int].head()
    assert(small == 10)
  }

  test("reservoir merge never duplicates items (without replacement)") {
    import graft.aggs.ReservoirState
    (0 until 200).foreach { seed =>
      val a = new ReservoirState(50, seed)
      val b = new ReservoirState(50, seed + 10000)
      (1 to 500).foreach(i => a.observe(i.toDouble))
      (501 to 1000).foreach(i => b.observe(i.toDouble))
      a.mergeIn(b)
      assert(a.items.size == 50)
      assert(a.items.distinct.size == 50,
        s"seed $seed: merged reservoir has duplicate items")
    }
  }

  test("reservoir merge keeps inclusion probability uniform across partitions") {
    import graft.aggs.ReservoirState
    // 1000 values split over 32 uneven partitions, merged pairwise as Spark
    // would; each value must land in the n=50 sample w.p. 0.05.
    val trials = 2000
    val hits = new Array[Int](1001)
    (0 until trials).foreach { t =>
      val parts = (1 to 1000).groupBy(i => i % 32).values.toSeq
      val states = parts.zipWithIndex.map { case (vs, pi) =>
        val st = new ReservoirState(50, t * 100L + pi)
        vs.foreach(v => st.observe(v.toDouble))
        st
      }
      val merged = states.reduce { (x, y) => x.mergeIn(y); x }
      merged.items.foreach(v => hits(v.toInt) += 1)
    }
    val freqs = (1 to 1000).map(i => hits(i).toDouble / trials)
    // Binomial(2000, .05): 3σ ≈ 0.0146 — allow 0.02, and check the mean too.
    assert(math.abs(freqs.sum / 1000 - 0.05) < 0.002)
    val worst = freqs.maxBy(f => math.abs(f - 0.05))
    assert(math.abs(worst - 0.05) < 0.02, s"worst inclusion freq $worst vs 0.05")
  }

  test("holtDampedArr matches a plain-Scala fold") {
    val series = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0)
    val (alpha, beta, phi) = (0.5, 0.3, 0.9)
    var l = series.head; var b = 0.0
    series.tail.foreach { x =>
      val lNew = alpha * x + (1 - alpha) * (l + phi * b)
      val bNew = beta * (lNew - l) + (1 - beta) * phi * b
      l = lNew; b = bNew
    }
    val expected = l + phi * b
    val got = Seq(series).toDF("vals")
      .select(holtDampedArr(col("vals"), alpha, beta, phi)).as[Double].head()
    assert(math.abs(got - expected) < 1e-12, s"got $got expected $expected")
  }

  test("holtWintersArr matches a plain-Scala fold (seasonal reference recurrence)") {
    val series = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 17.0, 21.0, 20.0)
    val (alpha, beta, gamma, phi, period) = (0.5, 0.3, 0.2, 0.9, 4)
    var l = series.head; var b = 0.0
    val s = Array.fill(period)(0.0)
    var i = 1
    series.tail.foreach { x =>
      val si = s(i % period)
      val lNew = alpha * (x - si) + (1 - alpha) * (l + phi * b)
      val bNew = beta * (lNew - l) + (1 - beta) * phi * b
      s(i % period) = gamma * (x - lNew) + (1 - gamma) * si
      l = lNew; b = bNew; i += 1
    }
    val expected = l + phi * b + s(i % period)
    val got = Seq(series).toDF("vals")
      .select(holtWintersArr(col("vals"), alpha, beta, gamma, phi, period))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-12, s"got $got expected $expected")
  }

  test("expSmoothArr matches a plain-Scala fold") {
    val series = Seq(1.0, 5.0, 3.0, 9.0)
    val expected = series.tail.foldLeft(series.head)((acc, x) => 0.3 * x + 0.7 * acc)
    val got = Seq(series).toDF("vals")
      .select(expSmoothArr(col("vals"), 0.3)).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("sparklineArr renders min→max onto the 8-bar ramp") {
    def run(series: Seq[Double]): String =
      Seq(series).toDF("vals")
        .select(sparklineArr(col("vals"))).as[String].head()
    // reference quantization (RamenHelpersNoLog.ml:1026-1041):
    // c = int((v - min) * 7 / (max - min)); flat series → ratio 0 → all ▁
    assert(run(Seq(0.0, 7.0)) == "▁█")
    assert(run(Seq(0, 1, 2, 3, 4, 5, 6, 7).map(_.toDouble)) == "▁▂▃▄▅▆▇█")
    assert(run(Seq(0.0, 0.5, 1.0)) == "▁▄█") // int(0.5·7) = 3 → 4th bar
    assert(run(Seq(3.0, 3.0, 3.0)) == "▁▁▁") // flat: reference ratio = 0
  }

  test("hysteresisArr flips at maximum and recovers at acceptable") {
    def run(series: Seq[Double]): Boolean =
      Seq(series).toDF("vals")
        .select(hysteresisArr(col("vals"), acceptable = 50, maximum = 150))
        .as[Boolean].head()
    assert(run(Seq(10, 20, 30)))               // never exceeded
    assert(!run(Seq(10, 200, 100)))            // tripped, not recovered
    assert(run(Seq(10, 200, 40)))              // tripped then recovered
    assert(!run(Seq(10, 200, 40, 160)))        // re-tripped
  }

  test("incremental scan aggregates match the array folds over a running window") {
    import org.apache.spark.sql.expressions.Window
    val series = Seq(10.0, 200.0, 40.0, 9.0, 160.0, 30.0)
    val df = series.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("seq", "v")
    val w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    val got = df.select(col("seq"),
      expSmoothScan(col("v"), 0.3).over(w).as("s"),
      hysteresisScan(col("v"), acceptable = 50, maximum = 150).over(w).as("h"))
      .orderBy("seq").as[(Long, Double, Boolean)].collect()
    // per-prefix expected values via the plain-Scala fold
    series.indices.foreach { i =>
      val prefix = series.take(i + 1)
      val smooth = prefix.tail.foldLeft(prefix.head)((a, x) => 0.3 * x + 0.7 * a)
      val hyst = prefix.foldLeft(true)((a, x) =>
        if (x > 150) false else if (x <= 50) true else a)
      assert(math.abs(got(i)._2 - smooth) < 1e-12, s"smooth at $i")
      assert(got(i)._3 == hyst, s"hysteresis at $i")
    }
  }

  test("SlicedBloom remembers within the window, forgets after, no false negatives") {
    val bloom = new SlicedBloom(fpr = 0.001, expectedPerSlice = 1000,
      sliceDur = 10.0, nSlices = 10)
    assert(!bloom.rememberAndAdd(0.0, "a"))
    assert(bloom.rememberAndAdd(5.0, "a"))     // within 100 s window
    assert(bloom.rememberAndAdd(99.0, "a"))
    assert(!bloom.rememberAndAdd(300.0, "b"))  // fresh key
    assert(!bloom.rememberAndAdd(500.0, "a"))  // "a" expired (last at 99)
    // FP rate sanity: query 10k keys never inserted
    val bloom2 = new SlicedBloom(0.001, 10000, 10.0, 10)
    (1 to 10000).foreach(i => bloom2.rememberAndAdd(1.0, "in" + i))
    val fps = (1 to 10000).count { i =>
      // query via a different key space at the same time
      val seen = bloom2.rememberAndAdd(2.0, "out" + i)
      seen
    }
    assert(fps < 200, s"false-positive count $fps too high")
  }

  test("dsum quantizes .00005-boundary values exactly like DECIMAL(18,4)") {
    // values whose shortest decimal rendering sits ON a .5 boundary:
    // 2.00005's nearest binary64 is 2.0000499999999999545…, so a double
    // round(x*1e4) lands at 20000 — but BOTH engines' double→DECIMAL cast
    // quantizes the SHORTEST decimal representation ("2.00005", Spark via
    // BigDecimal.valueOf/Double.toString, DuckDB verified by probe) and
    // HALF_UP gives 20001. dsum must take the cast path to match the
    // oracle's CAST(x AS DECIMAL(18,4)).
    val vals = Seq(2.00005, 1.00015, 0.00005, -2.00005, 7.33335, 123.45675)
    val expected = vals.map(v => java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP))
      .reduce(_ add _)
    val got = vals.toDF("x").agg(Det.dsum(col("x")).as("s")).head().getDouble(0)
    assert(got == expected.doubleValue,
      s"dsum=$got expected=${expected.doubleValue}")
    // the single boundary value lands UP like the oracle (DuckDB probe:
    // CAST(CAST(2.00005 AS DOUBLE) AS DECIMAL(18,4)) = 2.0001), where
    // round(x*1e4) in doubles would have landed DOWN at 2.0
    val one = Seq(2.00005).toDF("x").agg(Det.dsum(col("x"))).head().getDouble(0)
    assert(one == 2.0001, s"boundary value quantized to $one")
  }

  test("events table exposes both ts (micros) and ts_ns (exact nanos)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val row = ev.select(unix_micros(col("ts")).as("us"), col("ts_ns")).head()
    assert(row.getLong(0) == row.getLong(1) / 1000)
  }
}
