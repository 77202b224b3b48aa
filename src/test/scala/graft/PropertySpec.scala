package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Property tests for the round-8 algorithmic cores: randomized inputs
  * against independently-computed ground truth (a driver-side union-find
  * for connected components; exhaustive pair enumeration for the triangle
  * blocking). Spark actions per case are expensive, so the case counts
  * stay small — the point is shape coverage (random graphs / random cell
  * sizes), not volume. */
class PropertySpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("pointer-doubling components equal union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(2, 24)
      nEdges <- Gen.choose(0, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(1, n); b <- Gen.choose(1, n) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield (n, edges.distinct)
    check("cc", Prop.forAll(gen) { case (n, edges) =>
      // driver-side union-find ground truth
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (1 to n).map { v =>
        // the component label is the MINIMUM member; path-compress by
        // re-finding after all unions
        v.toLong -> (1 to n).filter(u => find(u) == find(v)).min.toLong
      }.toMap
      val labels = Dedup.connectedComponents(
        (1L to n.toLong).toDF("id"),
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b"))
      val got = labels.as[(Long, Long)].collect().toMap
      labels.unpersist()
      got == want
    }, n = 12)
  }

  test("triangle blocking covers every within-cell pair exactly once (random sizes)") {
    val gen = for {
      size <- Gen.choose(1, 60)
      cap <- Gen.choose(1, 20)
    } yield (size, cap)
    check("blocking", Prop.forAll(gen) { case (size, cap) =>
      val assigned = (1L to size.toLong).toDF("id").withColumn("cell", lit(1))
      val blocked = Dedup.blockCells(assigned, 4, cap)
      val pairs = blocked.as("a").join(blocked.as("b"),
          col("a.cell") === col("b.cell") && col("a.kx") === col("b.kx") &&
            col("a.ky") === col("b.ky") && col("a.id") < col("b.id") &&
            (col("a.blk") =!= col("b.blk") || col("a.kx") === col("a.ky")))
        .select(col("a.id"), col("b.id"))
        .as[(Long, Long)].collect()
      pairs.length == size * (size - 1) / 2 &&
        pairs.distinct.length == pairs.length
    }, n = 12)
  }

  test("FirstSharedBand equals the naive first-agreeing index") {
    import graft.functions.FirstSharedBand
    import org.apache.spark.sql.GraftShims
    val gen = for {
      n <- Gen.choose(0, 10)
      a <- Gen.listOfN(n, Gen.choose(0L, 3L)) // small range forces agreements
      b <- Gen.listOfN(n, Gen.choose(0L, 3L))
    } yield (a, b)
    check("fsb", Prop.forAll(gen) { case (a, b) =>
      val want = a.zip(b).indexWhere { case (x, y) => x == y }
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(GraftShims.column(FirstSharedBand(
        GraftShims.expression(col("a")), GraftShims.expression(col("b")))))
        .head().getInt(0)
      got == want // indexWhere returns -1 on no agreement, same convention
    }, n = 30)
  }

  test("pair joins emit every multi-band-sharing pair exactly once") {
    // near-identical docs share ALL bands; the first-shared-band predicate
    // must still yield each pair once (previously distinct() cleaned up
    // bands-many duplicates). Same check for the simhash chunk join,
    // where identical fingerprints share all 4 chunks.
    val docs = (1L to 30L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa" +
        (if (i % 3 == 0) " lambda" else ""))).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
    assert(cands.nonEmpty)
    assert(cands.distinct.length == cands.length,
      "a pair sharing several bands must emit exactly once")
    val fps = Dedup.simhashFps(docs, "doc_id", "text")
    val pairs = Dedup.simhashPairsOfFps(fps)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.distinct.length == pairs.length,
      "a pair sharing several chunks must emit exactly once")
  }

  test("ip4/eth kernels: render round-trips, parse is total") {
    import graft.functions.NetFunctions.{ethToString, ip4FromString, ip4ToString}
    // random u32s round-trip through the one-pass render + parse kernels,
    // and the renders match the independent JDK/format ground truth
    val rng = new scala.util.Random(7)
    val ips = Seq(0L, 1L, 255L, 256L, 0xFFFFFFFFL, 0x0A000001L) ++
      Seq.fill(2000)(rng.nextLong() & 0xFFFFFFFFL)
    val df = ips.toDF("ip")
      .withColumn("s", ip4ToString(col("ip")))
      .withColumn("back", ip4FromString(col("s")))
      .withColumn("mac", col("ip") * 65537L % 281474976710656L)
      .withColumn("mac_s", ethToString(col("mac")))
    val rows = df.collect()
    rows.foreach { r =>
      val ip = r.getLong(0)
      val want = s"${(ip >> 24) & 255}.${(ip >> 16) & 255}.${(ip >> 8) & 255}.${ip & 255}"
      assert(r.getString(1) == want, s"render $ip")
      assert(r.getLong(2) == ip, s"roundtrip $ip")
      val mac = r.getLong(3)
      val wantMac = (5 to 0 by -1)
        .map(i => f"${(mac >> (i * 8)) & 255}%02x").mkString(":")
      assert(r.getString(4) == wantMac, s"mac $mac")
    }
    // the parse is total: malformed text → NULL, never an error
    val bad = Seq("", "1.2.3", "1.2.3.4.5", "1..2.3", "256.1.1.1",
      "a.b.c.d", "1.2.3.x", ".1.2.3", "1.2.3.", "999999999999.1.1.1",
      "1.2.3.4 ", " 1.2.3.4", "-1.2.3.4", "1,2,3,4",
      // 1-3 digits per octet is ENFORCED, not just value-bounded — a
      // 4-digit zero-padded octet is rejected even though its value fits
      "0001.2.3.4", "1.2.3.0004")
    val parsed = bad.toDF("s").withColumn("v", ip4FromString(col("s")))
      .collect()
    parsed.foreach(r => assert(r.isNullAt(1), s"'${r.getString(0)}' parsed"))
    // valid edge shapes parse to the right value (≤3-digit leading zeros
    // allowed, as with the former cast chain)
    val ok = Seq(("0.0.0.0", 0L), ("255.255.255.255", 0xFFFFFFFFL),
      ("010.001.000.009", 0x0A010009L))
    ok.foreach { case (s, want) =>
      val got = Seq(s).toDF("s").select(ip4FromString(col("s"))).head()
      assert(!got.isNullAt(0) && got.getLong(0) == want, s"parse $s")
    }
  }

  test("QuantizeE4 is bit-identical to the DECIMAL(18,4) cast chain") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    // adversarial set: exact .00005 boundaries at many magnitudes and
    // signs (the case that forced the decimal cast in the first place),
    // the nearest doubles on either side of them, huge values near the
    // fast-path cutoff and past DECIMAL(18,4) capacity, NaN/Inf
    val planted: Seq[Double] = (for {
      k <- -40L to 40L
      base = k / 2.0 * 1e-4
      d <- Seq(base, Math.nextUp(base), Math.nextDown(base))
    } yield d) ++
      Seq(0.0, -0.0, 1.00005, -1.00005, 123.45675, -123.45675,
        0.00004999999999, 9.999e11, 1.0001e12, 9.99e13, 1.0e14, -1.0e14,
        1.0e15, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MinPositiveValue)
    val rng = new scala.util.Random(11)
    val random = Seq.fill(4000) {
      val mag = math.pow(10.0, rng.nextInt(18) - 6)
      (rng.nextDouble() - 0.5) * mag
    }
    // compare under non-ANSI casts: QuantizeE4 nulls on NaN/Inf/overflow
    // like the non-ANSI cast chain (ANSI mode makes the chain THROW on
    // those inputs instead — outside dsum's green domain either way)
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = (planted ++ random).toDF("x")
        .withColumn("dec", (col("x").cast(DecimalType(18, 4)) * 10000)
          .cast(LongType))
        .withColumn("fast", org.apache.spark.sql.GraftShims.column(
          graft.functions.QuantizeE4(org.apache.spark.sql.GraftShims
            .expression(col("x").cast(DoubleType)))))
      val bad = df.filter(!(col("dec") <=> col("fast"))).collect()
      assert(bad.isEmpty,
        s"quantization divergence on: ${bad.take(10).mkString(", ")}")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
  }
}
