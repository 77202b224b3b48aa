package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-mix construction.
  *
  * A 100 TB corpus is never used whole: pipelines downsample per language
  * / source / quality stratum to hit a target mixture. Doing that with
  * `rand()` makes every rerun a different dataset; doing it with a HASH of
  * the document id makes the sample a pure function of the data — stable
  * across reruns, engines, partitionings, and cluster sizes, and cheap
  * (map-only filter, pushes down past column pruning, no shuffle, no
  * state). The hash fraction is md5-derived (not xxhash) so any SQL engine
  * can reproduce the exact membership — the same engine-portability trick
  * as [[Dedup.simhashFpsMd5]].
  */
object Sampling {

  /** Uniform-ish u ∈ [0,1): the first 60 bits of md5(id) as a fraction.
    * Both engines convert the SAME 60-bit integer to double (IEEE
    * round-to-nearest), so membership tests agree bit-for-bit. */
  def hashFraction(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1152921504606846976.0) // 2^60

  /** Keep each row iff its hash fraction falls under its stratum's rate —
    * per-stratum Bernoulli sampling with deterministic membership.
    * Rows in strata absent from `rates` use `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashFraction(col(idCol)) < rateCol)
  }

  /** Token-BUDGET mixing: per-stratum keep rates computed from a token
    * budget instead of fixed fractions — rate = min(1, budget/tokens) —
    * then the same deterministic hash-fraction membership as
    * [[stratifiedSample]]. Under-budget strata keep everything;
    * over-budget strata downsample to the budget IN EXPECTATION while
    * membership stays a pure function of the data (stable across reruns
    * and cluster sizes — the curriculum-mixing step of a training
    * pipeline). Strata absent from `budgets` use `defaultBudget`
    * (< 0 ⇒ unlimited).
    *
    * Scale shape: the per-stratum totals frame is one row per domain —
    * bounded, hence the explicit broadcast — and the membership test is
    * a map-only filter. `df` must carry an integer `nTokensCol`.
    * Returns the kept rows plus (stratum_tokens, keep_rate). */
  def tokenBudgetMix(df: DataFrame, idCol: String, stratumCol: String,
      nTokensCol: String, budgets: Map[String, Long],
      defaultBudget: Long = -1L): DataFrame = {
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val rates = df.groupBy(stratumCol)
      .agg(sum(nTokensCol).as("stratum_tokens"))
      .withColumn("keep_rate",
        when(budgetCol < 0 || col("stratum_tokens") <= budgetCol, lit(1.0))
          .otherwise(budgetCol.cast("double") / col("stratum_tokens")))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(hashFraction(col(idCol)) < col("keep_rate"))
  }
}
