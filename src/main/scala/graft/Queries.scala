package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Central registry of operator-demonstrating queries.
  *
  * Each [[QueryDef]] pairs a Spark (DataFrame-API) implementation with an
  * equivalent ANSI-SQL oracle that the driver runs in DuckDB over the same
  * parquet tables (CORRECTNESS gate, see the builder contract). Column names
  * must match exactly between the two; the driver sorts columns by name and
  * hashes values.
  *
  * Float determinism: a `sum(double)` is order-dependent, and Spark and
  * DuckDB will not add in the same order. Queries therefore aggregate
  * through exact decimals ([[Det.dsum]]) and cast back to double, which is
  * bit-reproducible on both engines.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in the Bench headline set */
    headline: Boolean = false,
    /** timed by Bench but NOT registered for the correctness dump — for a
      * production variant whose VALUES are not SQL-expressible while an
      * identically-coded, fully-oracled sibling certifies the operator
      * (d04's xxh64 fingerprints vs d04b's md5 family) */
    benchOnly: Boolean = false,
    /** per-query cap on Bench reps (0 = the suite default). For headline
      * queries an order of magnitude slower than the rest (p04's composed
      * pipeline at ~20 s/rep): the suite's 5+3 reps exist to stabilize
      * SUB-SECOND medians against scheduler noise; on a 20 s query the
      * noise is proportionally small and 8 reps would triple the bench
      * wall for nothing. */
    benchReps: Int = 0)

/** Guard for queries whose static DuckDB oracle embeds an auto-derived
  * config constant (LSH band width r, IVF cell count nlist). The
  * auto-sizing returns the pinned floor at every verify/bench SF today; if
  * a larger SF directory ever joins the verify matrix, the derivation
  * would silently flip the plan (wider banding, two-level assignment)
  * while the static SQL still encodes the floor — producing confusing
  * value diffs instead of a clear config error. Fail fast, naming the pin.
  * The at-scale code paths themselves are value-oracled separately by the
  * replication checks (a02b/d07b), whose oracle SQL is GENERATED from the
  * derived config instead of pinned. */
object OraclePin {
  /** `spark.conf.set(OffKey, "off")` waives the pins for callers that RUN
    * pinned queries at scales where the derived config legitimately
    * diverges from the static SQL but never compare to that SQL — the
    * scale probe is the one such caller. Verify/bench never set it, so
    * the correctness gate keeps failing fast. */
  val OffKey = "graft.oraclePin"
  private def waived: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.conf.getOption(OffKey).contains("off"))
  def assertPinned(query: String, what: String, derived: Int, pinned: Int): Unit =
    if (derived != pinned) {
      if (waived)
        System.err.println(s"[oraclepin] $query: $what derived $derived " +
          s"(static oracle pins $pinned) — waived by $OffKey=off")
      else throw new IllegalArgumentException(
        s"$query: the static oracle SQL pins $what=$pinned but the auto-sizing " +
          s"derived $what=$derived at this corpus size — regenerate the oracle " +
          "from the derived config (see the a02b/d07b parameterized oracles) " +
          "or keep this SF out of the static-oracle matrix")
    }
}

/** Shared DuckDB-oracle SQL fragments. One canonical spelling of the
  * sequential-fold embedding dot product — the fold convention (prepend
  * 0.0, left fold, per-element DOUBLE casts) must be identical everywhere
  * an oracle re-scores cosines, or a drift in one copy shows up as a
  * confusing value diff instead of a compile error. */
object OracleSql {
  def dot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b),
        q -> CAST(struct_extract(q, 1) AS DOUBLE) * CAST(struct_extract(q, 2) AS DOUBLE))),
        (acc, x) -> acc + x)"""

  /** Fine→coarse grouping of centroid CTE `c` (coarse = its first
    * `nCoarse` rows) — the KMeans.assignWithFrame replay fragment shared
    * by the a11b and d15 oracles (one spelling, no drift). */
  def twoLevelGrp(c: String, g: String, nCoarse: Int): String = s"""$g AS (
          SELECT fidx, coidx AS g FROM (
            SELECT f.cidx AS fidx, co.cidx AS coidx,
              row_number() OVER (PARTITION BY f.cidx
                ORDER BY ${dot("f.cv", "co.cv")} DESC, co.cidx) AS rk
            FROM $c f JOIN $c co ON co.cidx <= $nCoarse) zg$g WHERE rk = 1)"""

  /** Two-level corpus assignment against centroid CTE `c` with grouping
    * `g` (non-empty coarse groups only — the kernel's empty-group skip):
    * emits `$cell` rows (vec_id, cell) over source CTE `v` (vec_id, v). */
  def twoLevelAssign(c: String, g: String, cw: String, cell: String,
      nCoarse: Int): String = s"""$cw AS (
          SELECT vec_id, cidx AS w FROM (
            SELECT v.vec_id, c.cidx,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${dot("v.v", "c.cv")} DESC, c.cidx) AS rk
            FROM v JOIN $c c ON c.cidx <= $nCoarse
              AND c.cidx IN (SELECT DISTINCT g FROM $g)) zw$cw WHERE rk = 1),
        $cell AS (
          SELECT vec_id, cidx AS cell FROM (
            SELECT v.vec_id, c.cidx,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${dot("v.v", "c.cv")} DESC, c.cidx) AS rk
            FROM v JOIN $cw ON $cw.vec_id = v.vec_id
              JOIN $g ON $g.g = $cw.w
              JOIN $c c ON c.cidx = $g.fidx) zc$cell WHERE rk = 1)"""
}

/** Deterministic-aggregation helpers (shared Spark side). */
object Det {
  /** Exact sum of a double column — order-free, engine-portable.
    *
    * Implementation: each value quantizes to 1e-4 units as a LONG with
    * the SAME semantics as the oracle's `CAST(x AS DECIMAL(18,4))`
    * (shortest-rendering parse, HALF_UP — a plain `round(x·10⁴)` in
    * doubles can quantize a value sitting within 1 ulp of a .5 boundary
    * differently than the decimal cast). The quantizer is the codegen'd
    * [[graft.functions.QuantizeE4]]: primitive multiply-floor outside the
    * provable boundary band, exact BigDecimal only inside it — decimal-
    * cast-identical output without per-row decimal objects. Longs sum
    * exactly; the aggregation buffer stays a PRIMITIVE long inside
    * whole-stage codegen — a decimal SUM's buffer is DecimalType(28,4),
    * which exceeds Spark's 18-digit compact-long representation and
    * falls back to BigDecimal objects in the hot loop. Capacity is the
    * same class as the decimal it replaces (~9.2e14 units vs
    * DECIMAL(18,4)'s 1e14).
    *
    * Invalid-domain semantics are the NON-ANSI cast's: NaN, ±Infinity,
    * and DECIMAL(18,4) overflow (|x| ≥ 1e14) quantize to NULL and the
    * row silently drops from the sum — matching DuckDB's and Spark's
    * default-mode cast chain. Under `spark.sql.ansi.enabled=true` the
    * decimal cast this replaces would instead THROW on those inputs;
    * QuantizeE4 stays null-on-invalid, so dsum's behavior is independent
    * of the ANSI flag. Callers needing ANSI-style failure must validate
    * the domain upstream. */
  def dsum(c: Column): Column =
    (sum(org.apache.spark.sql.GraftShims.column(graft.functions.QuantizeE4(
        org.apache.spark.sql.GraftShims.expression(c.cast(DoubleType)))))
      .cast(DoubleType) / 10000.0)
  /** Deterministic mean: exact decimal sum divided by count, in doubles. */
  def davg(c: Column): Column = dsum(c) / count(c)
  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  /** Oracle-side SQL for [[davg]]. */
  def davgSql(x: String): String = s"${dsumSql(x)} / COUNT($x)"
}

object Queries {
  /** All registered queries, in presentation order. */
  def all: Seq[QueryDef] =
    CoreQueries.entries ++
      WindowQueries.entries ++
      SketchQueries.entries ++
      DedupQueries.entries ++
      TextQueries.entries ++
      SimilarityQueries.entries ++
      AtScaleQueries.entries ++
      NetQueries.entries ++
      MultimodalQueries.entries ++
      PipelineQueries.entries ++
      RaqlQueries.entries

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
