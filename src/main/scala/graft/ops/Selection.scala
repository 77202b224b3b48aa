package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions._

/** Data-selection scoring for training-corpus assembly. */
object Selection {

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw document
    * by how much more likely its hashed n-gram features are under a
    * TARGET corpus distribution than under the raw corpus's own —
    * `log w(d) = Σ_f  log p_target(bucket(f)) − log p_raw(bucket(f))`
    * over every unigram/bigram OCCURRENCE f of the document. Documents
    * with positive log-weight look more target-like than raw-like;
    * importance resampling keeps a weighted sample (here surfaced as the
    * weight plus the sign flag — the sampling policy is the caller's).
    *
    * Scale shape (the reason hashed n-grams beat vocabularies at 100 TB):
    *  - features are a MAP-ONLY explode of the codegen'd n-gram kernel
    *    ([[graft.functions.WordShingles]] non-distinct) — no vocabulary
    *    build, no content shuffle wider than (id, bucket);
    *  - both bucket distributions are `buckets`-row frames (bounded by
    *    construction, like the LSH hyperplanes) and BROADCAST;
    *  - the per-doc sum partial-aggregates map-side on (id, bucket).
    *
    * Determinism: the bucket hash is md5-prefix (engine-portable, the
    * t05 trick); per-bucket `ln` is ROUND-6 then DECIMAL-summed (the t12
    * trick), so weights are bit-identical across engines/partitionings.
    * Laplace smoothing (`smooth`) covers buckets absent from either
    * corpus — the log-ratio table enumerates ALL buckets, so no feature
    * row is dropped by the join.
    *
    * Returns one row per raw document with ≥ 1 feature:
    * (id, n_feats, log_weight, target_like). */
  def dsirWeights(docs: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024, smooth: Double = 1.0): DataFrame = {
    require(buckets >= 2 && smooth > 0.0, "dsir: buckets >= 2, smooth > 0")
    val spark = docs.sparkSession

    // (id, bucket) with MULTIPLICITY: every unigram and bigram occurrence,
    // hashed by the portable md5-prefix bucket
    def feats(df: DataFrame): DataFrame = {
      val toks = tokens(col(textCol))
      Dedup.spreadInput(df, GraftPar.of(df))
        .select(col(idCol).as("id"),
          explode(concat(wordShinglesAll(toks, 1), wordShinglesAll(toks, 2)))
            .as("f"))
        .filter(length(col("f")) > 0)
        .select(col("id"),
          pmod(conv(substring(md5(col("f")), 1, 15), 16, 10).cast("long"),
            lit(buckets.toLong)).as("b"))
    }

    val rawFeats = feats(docs)
    // Laplace-smoothed per-bucket log-probability over ALL buckets (a
    // bucket unseen in one corpus but present in a doc must still score)
    def logp(counts: DataFrame, name: String): DataFrame = {
      val tot = counts.agg(coalesce(sum("c"), lit(0L)).as("t"))
      spark.range(buckets).select(col("id").as("b"))
        .join(counts, Seq("b"), "left")
        .crossJoin(broadcast(tot))
        .select(col("b"),
          round(log((coalesce(col("c"), lit(0L)) + lit(smooth)) /
            (col("t") + lit(smooth * buckets))), 6)
            .cast(DecimalType(18, 6)).as(name))
    }
    // the per-doc counts feed BOTH consumers: the raw bucket distribution
    // aggregates FROM the (id, b, tf) frame, so its plan subtree reuses
    // the per-doc aggregation's exchange instead of running the shingle
    // explode over the whole corpus a second time (verified: one Generate
    // for the raw corpus in the executed plan, rc under a ReusedExchange)
    val fb = rawFeats.groupBy("id", "b").agg(count(lit(1)).as("tf"))
    val rawCounts = fb.groupBy("b").agg(sum("tf").as("c"))
    val lr = logp(feats(target).groupBy("b").agg(count(lit(1)).as("c")), "lpt")
      .join(logp(rawCounts, "lpr"), Seq("b"))
      .select(col("b"), (col("lpt") - col("lpr")).as("lr")) // decimal-exact

    fb
      .join(broadcast(lr), Seq("b"))
      .groupBy("id")
      .agg(sum("tf").as("n_feats"),
        sum(col("lr") * col("tf")).as("_lw")) // decimal × long: exact, order-free
      .select(col("id"), col("n_feats"),
        round(col("_lw").cast("double"), 6).as("log_weight"),
        (col("_lw") > 0).as("target_like"))
  }

  /** Cell-stratified diversity sample over an embedding column —
    * SemDeDup's companion SELECTION op (the SemDeDup paper dedups WITHIN
    * semantic clusters; per-cluster quotas then flatten what remains
    * toward uniform semantic coverage instead of letting one dense topic
    * dominate the kept set). Every vector coarse-assigns to its
    * argmax-dot cell around the seeded centroids (exactly d07/a04's
    * assignment — [[Dedup.autoNlist]]-sized by default, two-level above
    * 64 cells), and at most `perCell` vectors per cell survive, chosen
    * by the deterministic md5(id) order (the t05 stable-sample trick:
    * reruns, partitionings, and the SQL oracle all pick the same rows).
    *
    * Scale shape: assignment is map-only over broadcast-literal
    * centroids; the ONLY shuffle is the per-cell rank window, partitioned
    * by the cell key (E[cell] is held constant by the auto sizing, so no
    * window partition outgrows a task at any corpus size).
    *
    * Returns the kept rows: (id, cell, cell_rank) with cell_rank 1-based
    * in hash order. */
  def cellDiverseSample(embs: DataFrame, idCol: String, vecCol: String,
      perCell: Int, targetCell: Int = 125, twoLevelAbove: Int = 64): DataFrame = {
    require(perCell >= 1, "cellDiverseSample: perCell >= 1")
    import org.apache.spark.sql.expressions.Window
    val nlist = Dedup.autoNlist(Similarity.sizingCount(embs), targetCell)
    val cents = Similarity.seedCentroids(embs, idCol, vecCol, nlist)
    require(cents.nonEmpty,
      "cellDiverseSample: empty corpus — no seed centroids")
    val assign: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (nlist <= twoLevelAbove) Similarity.cellArgmax(_, cents)
      else Similarity.cellArgmaxTwoLevel(_, cents)
    val h = conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    Dedup.spreadInput(
        embs.select(col(idCol).as("id"), col(vecCol).as("v")), GraftPar.of(embs))
      .select(col("id"), assign(col("v")).as("cell"))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy(col("cell")).orderBy(h, col("id"))))
      .filter(col("cell_rank") <= perCell)
      .select(col("id"), col("cell"), col("cell_rank"))
  }
}
