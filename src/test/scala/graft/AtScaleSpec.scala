package graft

import org.scalatest.funsuite.AnyFunSuite

/** The at-scale differential queries (a02b/d07b) exist to value-oracle
  * the code paths the pinned-floor queries never reach — these specs pin
  * that they actually DO reach them, and that running them at a corpus
  * size other than the one their generated SQL encodes fails with a
  * named config error instead of a confusing value diff. */
class AtScaleSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  // embeddings are 500 rows at sf0.001 AND sf0.01 (TESTDATA), so the
  // generated-oracle configs hold here; sf0.1 (2000 rows) is the
  // "wrong SF" case the pin must catch
  private val sf = "/root/testdata/sf0.001"

  test("a02b/d07b derive configs ABOVE the pinned floors") {
    assert(AtScaleQueries.RepR == 10, "a02b derived banding width")
    assert(AtScaleQueries.RepR > 4, "must exceed the rMin floor")
    assert(AtScaleQueries.RepNlist == 68, "d07b derived cell count")
    assert(AtScaleQueries.RepNlist > 64,
      "must exceed twoLevelAbove: the two-level kernel is the point")
    assert(AtScaleQueries.RepNCoarse == 9)
  }

  test("d07b's executed plan assigns through the two-level kernel") {
    val df = Queries.byName("d07b_semantic_dedup_scaled").run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("two_level_argmax"),
      "d07b must exercise TwoLevelArgmax, not the single-level argmax " +
        "every floor-pinned query already oracles")
  }

  test("a02b at a different corpus size fails with the named pin, not a value diff") {
    val e = intercept[IllegalArgumentException] {
      // sf0.1 has 2000 base embeddings -> derived r = 12 != the generated
      // oracle's 10
      Queries.byName("a02b_ann_lsh_scaled").run(spark, "/root/testdata/sf0.1")
    }
    assert(e.getMessage.contains("a02b_ann_lsh_scaled"))
    assert(e.getMessage.contains("pins r=10"))
  }

  test("oracle pins: graft.oraclePin=off waives (the scale probe's contract), unset throws") {
    // the waiver exists ONLY for callers that run pinned queries at
    // diverged configs without comparing to the static SQL; verify/bench
    // never set it, so drift must keep failing fast by default
    spark.conf.set(OraclePin.OffKey, "off")
    try OraclePin.assertPinned("spec_query", "nlist", 1600, 16) // must not throw
    finally spark.conf.unset(OraclePin.OffKey)
    val e = intercept[IllegalArgumentException] {
      OraclePin.assertPinned("spec_query", "nlist", 1600, 16)
    }
    assert(e.getMessage.contains("spec_query"))
    assert(e.getMessage.contains("pins nlist=16"))
  }
}
