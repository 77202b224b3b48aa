package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.ops.{Packing, Sampling}

/** The end-to-end corpus-curation pipeline as ONE composed query — the
  * user story the individual operators exist for: rule-gate quality
  * (t07's signals) → exact-dedup survivors (d01's bag fingerprint) →
  * deterministic training-mix downsampling (t05's hash fraction) →
  * GPT-style sequence packing (t10's two-phase prefix scan). Every stage
  * is deterministic, so the whole chain is value-oracled in DuckDB.
  *
  * Scale shape is the stages' own: map-only gating and fingerprints, one
  * (16-byte, id) dedup shuffle, a pushdown-friendly sampling filter, and
  * the bucketed prefix scan — composing them adds NO new shuffles beyond
  * the keep-id semi-join (narrow ids, AQE-broadcast when small).
  */
object PipelineQueries {

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "p01_curation",
      (s, d) => {
        val n = col("n_tokens")
        val meanW = (col("n_norm") - (n - lit(1))).cast("double") / n
        val sigs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("text"), col("lang"),
            tokens(col("text")).as("toks"),
            length(normalize(col("text"))).as("n_norm"))
          .select(col("doc_id"), col("text"), col("lang"), col("n_norm"),
            size(col("toks")).as("n_tokens"), langScore(col("toks"), "en").as("sw"))
        val gated = sigs.filter(n >= 20 && n <= 1000 &&
          meanW >= 2.0 && meanW <= 12.0 && col("sw") >= 1)
        // exact-dedup survivors among the gated docs (min id per bag fp)
        val keepIds = gated
          .select(col("doc_id"), bagFingerprint(col("text")).as("fp"))
          .groupBy("fp").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val kept = gated.join(keepIds, Seq("doc_id"))
        val sampled = Sampling.stratifiedSample(kept, "doc_id", "lang",
          rates = Map("en" -> 0.5), defaultRate = 1.0)
        Packing.packSequences(sampled.select("doc_id", "text"),
            "doc_id", "text", capacity = 256L)
          .select(col("id").as("doc_id"), col("n_tokens"),
            col("bin"), col("offset_in_bin"))
          .join(sampled.select("doc_id", "lang"), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("bin"), col("offset_in_bin"))
          .orderBy("doc_id")
      },
      Some {
        val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
        val swSql = graft.functions.TextFunctions.stopwordProfiles.toMap
          .apply("en").map(w => s"'$w'").mkString("(", ", ", ")")
        s"""WITH sig AS (SELECT doc_id, lang, norm, len(toks) AS n,
            CAST(length(norm) - (len(toks) - 1) AS DOUBLE) / len(toks) AS mw,
            len(list_filter(toks, t -> t IN $swSql)) AS sw
          FROM (SELECT doc_id, lang, $normSql AS norm,
              string_split($normSql, ' ') AS toks FROM documents) a),
        gated AS (SELECT * FROM sig
          WHERE n BETWEEN 20 AND 1000 AND mw BETWEEN 2.0 AND 12.0 AND sw >= 1),
        keep AS (SELECT MIN(doc_id) AS doc_id FROM (
            SELECT doc_id, md5(array_to_string(list_sort(string_split(norm, ' ')), ' ')) AS fp
            FROM gated) z GROUP BY fp),
        kept AS (SELECT g.* FROM gated g JOIN keep USING (doc_id)),
        samp AS (SELECT * FROM kept
          WHERE CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
              / 1152921504606846976.0 <
            CASE lang WHEN 'en' THEN 0.5 ELSE 1.0 END),
        c AS (SELECT doc_id, lang, n,
          CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum FROM samp)
        SELECT doc_id, lang, n AS n_tokens,
          cum // 256 AS bin, cum % 256 AS offset_in_bin
        FROM c ORDER BY doc_id"""
      })
  )
}
