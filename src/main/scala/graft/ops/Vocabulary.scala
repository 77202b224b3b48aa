package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Frequency-based vocabulary construction and coverage scoring — the
  * tokenizer-prep step of a training-data pipeline (what fraction of a
  * corpus a fixed vocabulary covers, and which documents are OOV-heavy
  * enough to resample or drop).
  */
object Vocabulary {

  private def par(df: DataFrame): Int =
    GraftPar.of(df)

  /** Top-`vocabSize` token vocabulary by corpus frequency (deterministic:
    * ties break on the token itself). Returns (token, cnt, rank).
    *
    * Scale shape: the token count is one hash aggregation with map-side
    * partial combine (hot stopwords combine per task, never in one
    * partition); the top-k is a TakeOrdered over the (distinct-token)
    * count frame — a vocabulary is bounded by definition (≤ ~1e6 rows),
    * so the global ordered selection is metadata-cheap next to the scan. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Dedup.spreadInput(docs, par(docs)) // single-file local input ⇒ force map parallelism
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(vocabSize)
      // rank over the ≤ vocabSize selected rows (tiny frame): one-group
      // key declares the intentional single partition (Windows.oneGroup)
      .withColumn("rank", row_number().over(
        Window.partitionBy(Windows.oneGroup(col("token")))
          .orderBy(desc("cnt"), asc("token"))))
  }

  /** Per-document coverage against a `vocab` frame (any frame with a
    * `token` column): (id, n_tokens, n_oov, oov_rate). The vocabulary
    * BROADCASTS — it is bounded by construction, unlike the corpus-derived
    * frames that must not ([[Packing.decontaminate]]'s hits) — so the
    * check is a map-side join plus one per-doc aggregation. */
  def oovStats(docs: DataFrame, vocab: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Dedup.spreadInput(docs, par(docs))
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(true).as("_inv"))),
        Seq("token"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 9).as("oov_rate"))
}
