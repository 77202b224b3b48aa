package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table: token statistics,
  * quality scoring, language ID, content fingerprinting. All map-only
  * passes (string + array HOFs inside whole-stage codegen).
  */
object TextQueries {

  /** Documents spread across the cores: these are CPU-heavy map-only
    * passes, and the local single-row-group parquet gives one input split —
    * without a rebalance they run on one core. (At corpus scale the scan
    * has thousands of splits and AQE rebalancing covers skew instead.) */
  private def docsPar(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).repartition(s.sparkContext.defaultParallelism)

  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val toksSql = s"string_split($normSql, ' ')"

  private def inList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("(", ", ", ")")
  private def scoreSql(lang: String) = {
    val words = stopwordProfiles.toMap.apply(lang)
    s"len(list_filter(toks, t -> t IN ${inList(words)}))"
  }

  val entries: Seq[QueryDef] = Seq(
    // ---- t01: token statistics
    QueryDef(
      "t01_tokstats",
      (s, d) => {
        // project the token array once; an inline tokens(text) referenced
        // from several expressions (and per-element inside the shingle HOF)
        // re-runs the regex split each time
        val toks = col("toks")
        docsPar(s, d)
          .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            length(col("text")).as("n_chars_txt"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_distinct"),
            size(wordShingles(toks, 3)).as("n_shingles3"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        length(text) AS n_chars_txt,
        len(toks) AS n_tokens,
        len(list_distinct(toks)) AS n_distinct,
        len(list_distinct([array_to_string(toks[i:i+2], ' ')
          for i in range(1, greatest(len(toks) - 1, 1))])) AS n_shingles3
        FROM (SELECT doc_id, text, $toksSql AS toks FROM documents)
        ORDER BY doc_id"""),
      headline = true),

    // ---- t02: quality scoring from length/stopword/digit signals
    QueryDef(
      "t02_quality",
      (s, d) => {
        val toks = col("toks")
        val n = size(toks).cast("double")
        val stopRatio = langScore(toks, "en").cast("double") / n
        val digitRatio = (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))).cast("double") /
          length(col("text"))
        docsPar(s, d)
          .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            round(stopRatio, 9).as("stopword_ratio"),
            round(digitRatio, 9).as("digit_ratio"),
            round(least(n / 100.0, lit(1.0)) * 0.4 +
              least(stopRatio * 5.0, lit(1.0)) * 0.3 +
              (lit(1.0) - digitRatio) * 0.3, 9).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        ROUND(sw / n, 9) AS stopword_ratio,
        ROUND(dig, 9) AS digit_ratio,
        ROUND(least(n / 100.0, 1.0) * 0.4 + least(sw / n * 5.0, 1.0) * 0.3
              + (1.0 - dig) * 0.3, 9) AS quality
        FROM (SELECT doc_id,
            CAST(len(toks) AS DOUBLE) AS n,
            CAST(${scoreSql("en")} AS DOUBLE) AS sw,
            CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
              / length(text) AS dig
          FROM (SELECT doc_id, text, $toksSql AS toks FROM documents) a) b
        ORDER BY doc_id""")),

    // ---- t03: language ID by stopword-profile scoring
    QueryDef(
      "t03_langid",
      (s, d) => docsPar(s, d)
        // stepwise projections (toks → scores → best → verdict) so each
        // stopword scan runs once per row, mirroring the oracle's shape
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id") +: stopwordProfiles.map { case (l, _) =>
          langScore(col("toks"), l).as(s"s_$l") }: _*)
        .select((col("doc_id") +:
          stopwordProfiles.map { case (l, _) => col(s"s_$l") }
            .reduce(greatest(_, _)).as("best") +:
          stopwordProfiles.map { case (l, _) => col(s"s_$l") }): _*)
        .select(col("doc_id"),
          stopwordProfiles.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
            case (acc, (l, _)) =>
              val hit = col(s"s_$l") === col("best") && col("best") > 0
              Some(acc.fold(when(hit, lit(l)))(_.when(hit, lit(l))))
          }.get.otherwise(lit("und")).as("pred_lang"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CASE WHEN best > 0 AND s_en = best THEN 'en'
             WHEN best > 0 AND s_es = best THEN 'es'
             WHEN best > 0 AND s_de = best THEN 'de'
             WHEN best > 0 AND s_fr = best THEN 'fr'
             ELSE 'und' END AS pred_lang
        FROM (SELECT doc_id, s_en, s_es, s_de, s_fr,
            greatest(s_en, s_es, s_de, s_fr) AS best
          FROM (SELECT doc_id,
              ${scoreSql("en")} AS s_en, ${scoreSql("es")} AS s_es,
              ${scoreSql("de")} AS s_de, ${scoreSql("fr")} AS s_fr
            FROM (SELECT doc_id, $toksSql AS toks FROM documents) a) b) c
        ORDER BY doc_id""")),

    // ---- t04: order-sensitive content fingerprint (md5 of normalized text)
    QueryDef(
      "t04_fingerprint",
      (s, d) => docsPar(s, d)
        .select(col("doc_id"), md5(normalize(col("text")).cast("binary")).as("fp"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, md5($normSql) AS fp FROM documents ORDER BY doc_id""")),

    // ---- t05: deterministic per-language stratified sampling — the
    // training-mix downsampling op (see graft.ops.Sampling): membership is
    // a pure function of md5(doc_id), so the sample is stable across
    // reruns/partitionings and exactly reproducible by the oracle. Rates
    // deliberately uneven (downsample the dominant language).
    QueryDef(
      "t05_stratified_sample",
      (s, d) => graft.ops.Sampling.stratifiedSample(
        Tables.documents(s, d), "doc_id", "lang",
        rates = Map("en" -> 0.25, "zh" -> 0.8), defaultRate = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source FROM documents
        WHERE CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
              / 1152921504606846976.0 <
          CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.8 ELSE 0.5 END
        ORDER BY doc_id"""))
  )
}
