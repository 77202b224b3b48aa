package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the ETL-side answer to
  * repeated big-to-big joins at 100 TB: write both fact tables bucketed
  * (and sorted) by the join key ONCE, and every subsequent join between
  * them is exchange-free — each task zips bucket i with bucket i, no
  * shuffle of either side, ever. `repartition()` co-locates a single
  * query plan; bucketing persists the co-location across queries and
  * sessions, which is what a nightly 100 TB join pipeline actually wants.
  *
  * Spark specifics: bucket metadata lives in the catalog, so bucketed
  * writes go through `saveAsTable` (a path-based `save` silently drops
  * the bucket spec); the reader must keep
  * `spark.sql.sources.bucketing.enabled` on (default). Matching bucket
  * counts avoid the one-side re-bucketing Spark 3.1+ would otherwise
  * insert.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed (and sorted) by `keyCol` into
    * `buckets` files per partition. Overwrites any existing table. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      buckets: Int): Unit =
    writeBucketedBy(df, table, Seq(keyCol), buckets)

  /** Multi-column variant — e.g. the near-dup signature ledger's
    * (band, bucket) key ([[graft.streaming.LedgerStream]] compaction). */
  def writeBucketedBy(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "at least one bucket key")
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }
}
