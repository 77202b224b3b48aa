package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A RaQL-style monitoring aggregation: filter → group → windowed stats.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.events(spark, d)
      .filter(col("value") > 0)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))
      .orderBy("wstart", "event_type")
  }

  /** One entry per implemented operator from SURVEY.md §2. Bench-only
    * timing variants (oracle-less by nature, operator certified by an
    * oracled sibling — see [[QueryDef.benchOnly]]) are not registered. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.filterNot(_.benchOnly).map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
