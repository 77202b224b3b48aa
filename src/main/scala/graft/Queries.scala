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
    headline: Boolean = false)

/** Deterministic-aggregation helpers (shared Spark side). */
object Det {
  /** Exact sum of a double column — order-free, engine-portable.
    *
    * Implementation: each value quantizes to 1e-4 units as a LONG via the
    * SAME `CAST(x AS DECIMAL(18,4))` the oracle performs (decimal HALF_UP
    * — a plain `round(x·10⁴)` in doubles can quantize a value sitting
    * within 1 ulp of a .5 boundary differently than the decimal cast),
    * then `·10⁴` in exact decimal arithmetic yields the integral unit
    * count, longs sum exactly, and the total scales back. The per-row
    * decimal work is projection-side only; the aggregation buffer stays a
    * PRIMITIVE long inside whole-stage codegen — a decimal SUM's buffer
    * is DecimalType(28,4), which exceeds Spark's 18-digit compact-long
    * representation and falls back to BigDecimal objects in the hot loop.
    * Capacity is the same class as the decimal it replaces (~9.2e14 units
    * vs DECIMAL(18,4)'s 1e14). */
  def dsum(c: Column): Column =
    (sum((c.cast(DecimalType(18, 4)) * 10000).cast(LongType))
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
      NetQueries.entries ++
      MultimodalQueries.entries ++
      PipelineQueries.entries ++
      RaqlQueries.entries

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
