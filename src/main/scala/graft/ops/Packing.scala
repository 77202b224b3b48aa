package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus-assembly operators for training-data preparation: sequence
  * packing and benchmark decontamination.
  */
object Packing {

  /** GPT-style sequence packing layout: documents concatenate in id order
    * into fixed `capacity`-token context windows; each doc's placement is
    * determined by the exclusive prefix sum of token counts — `bin` =
    * which window its first token lands in, `offset_in_bin` = where.
    * (Documents longer than the remaining window spill into the next one,
    * as in standard packed-LM training.)
    *
    * Scale shape: a global ordered prefix sum WITHOUT a global
    * single-partition window — the classic two-phase scan. Phase 1 sums
    * token counts per id-range bucket (one narrow aggregate of
    * #buckets rows); the tiny bucket-totals frame takes its own ordered
    * scan and broadcasts back as per-bucket base offsets. Phase 2 windows
    * ONLY within a bucket (partitioned by the bucket key — parallel
    * across buckets) and adds the broadcast base. Deterministic: the
    * order is the id order, not a partitioning artifact.
    *
    * Returns (id, n_tokens, cum_before, bin, offset_in_bin). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      capacity: Long, bucketWidth: Long = 500L): DataFrame = {
    val t = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), size(tokens(col(textCol))).as("n_tokens"))
      .withColumn("bucket", expr(s"id div $bucketWidth"))
    // phase 1: per-bucket totals → exclusive running base per bucket.
    // The totals frame is #buckets rows; its single-partition ordered
    // window is the broadcast-carry pattern (same as the chunked running
    // aggregates), not a data-volume scan.
    val bases = t.groupBy("bucket").agg(sum("n_tokens").as("bsum"))
      .withColumn("base",
        coalesce(sum("bsum").over(
          Window.partitionBy(Windows.oneGroup(col("bucket")))
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("bsum")
    // phase 2: within-bucket exclusive prefix (parallel across buckets)
    val local = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(bases), Seq("bucket"))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(local), lit(0L)) + col("base"))
      .select(col("id"), col("n_tokens"), col("cum_before"),
        expr(s"cum_before div $capacity").as("bin"),
        expr(s"cum_before % $capacity").as("offset_in_bin"))
  }

  /** Materialized packing segments: [[packSequences]] gives each doc its
    * starting (bin, offset); here a doc that spills across context
    * windows emits ONE ROW PER WINDOW it touches — (bin, offset_in_bin,
    * doc_offset, seg_len) — i.e. the copy plan a packed-dataset writer
    * executes. Pure integer interval math on top of the two-phase prefix
    * scan; the explode emits ≤ ⌈n/capacity⌉+1 narrow rows per doc in
    * place, no extra shuffle. Invariants (spec'd): per-doc seg_len sums
    * to n_tokens; per-bin seg_len sums to ≤ capacity. */
  def packSegments(docs: DataFrame, idCol: String, textCol: String,
      capacity: Long, bucketWidth: Long = 500L): DataFrame =
    packSequences(docs, idCol, textCol, capacity, bucketWidth)
      // a NULL/empty doc would make `sequence(bin, bin_last)` descend
      // (bin_last < bin) and emit bogus segments — zero-token docs have no
      // segments by definition, so drop them before the interval math
      .filter(col("n_tokens") > 0)
      .withColumn("bin_last",
        expr(s"(cum_before + n_tokens - 1) div $capacity"))
      .select(col("id"), col("cum_before"), col("n_tokens"),
        explode(expr("sequence(bin, bin_last)")).as("seg_bin"))
      .select(col("id"), col("seg_bin").as("bin"),
        (greatest(col("seg_bin") * capacity, col("cum_before")) -
          col("seg_bin") * capacity).as("offset_in_bin"),
        (greatest(col("seg_bin") * capacity, col("cum_before")) -
          col("cum_before")).as("doc_offset"),
        (least((col("seg_bin") + 1) * capacity, col("cum_before") + col("n_tokens")) -
          greatest(col("seg_bin") * capacity, col("cum_before"))).as("seg_len"))

  /** Benchmark decontamination flagging: a document is CONTAMINATED when
    * it shares any word `shingleN`-gram with the probe set (in real use,
    * the n-grams of an eval benchmark). Returns one row per doc:
    * (id, n_hits, contaminated).
    *
    * Scale shape: benchmark n-gram sets are tiny next to a 100 TB corpus
    * — the probe set BROADCASTS and the check is a map-side semi-join of
    * each doc's distinct shingles against it; the corpus never shuffles
    * on content. Per-doc hit counts aggregate on the doc key only. */
  def decontaminate(docs: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 5): DataFrame = {
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(wordShingles(col("toks"), shingleN)).as("g"))
    val hits = sh
      .join(broadcast(probes.select(col("g")).distinct()), Seq("g"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    // `hits` is corpus-derived (one row per contaminated doc) — on a
    // contamination-heavy corpus it is UNBOUNDED, so it must NOT
    // broadcast; the narrow id-key shuffle join scales with the corpus.
    // Pin shuffle-hash: hits' stats come from a join pipeline and would
    // otherwise plan a pointless sort-merge.
    docs.select(col(idCol).as("id"))
      .join(hits.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_hits").isNotNull.as("contaminated"))
  }

  /** Distinct word `shingleN`-gram spans of a probe document set — the
    * "benchmark n-grams" input to [[decontaminate]]. */
  def probeShingles(probeDocs: DataFrame, textCol: String,
      shingleN: Int = 5): DataFrame =
    probeDocs
      .select(explode(wordShingles(tokens(col(textCol)), shingleN)).as("g"))
      .distinct()
}
