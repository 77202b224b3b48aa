package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes `(spark, sfDir)` and reads
  * parquet through here, so filters/projections written against these frames
  * are pushed into the parquet scan by Catalyst (check `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader only accepts as a raw long (`spark.sql.legacy.parquet.nanosAsLong`
    * — set by [[GraftSession]]). Expose both:
    *   - `ts_ns`: exact int64 nanos (total order; use for ordering/tie-breaks
    *     so Spark and the DuckDB oracle sort identically)
    *   - `ts`: microsecond TimestampType (floor of ns) for time windows.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Defensive runtime set: the driver may call entry() on a session that
    // was not built by GraftSession.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw
      .withColumn("ts_ns", col("ts").cast("long"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
