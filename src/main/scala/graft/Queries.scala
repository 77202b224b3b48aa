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
  /** Exact sum of a double column: cast to decimal, sum, cast back. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
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
