package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
        ORDER BY doc_id"""),
      headline = false),

    // ---- t06: within-doc repetition signals (the Gopher repetition
    // filters, Rae et al. 2021 §A1.1, adapted to token level): top2_frac =
    // fraction of the doc's tokens covered by occurrences of its most
    // frequent 2-gram; dup3_frac = fraction of 3-gram occurrences whose
    // gram repeats within the doc. Scale shape: the signals are ROW-LOCAL
    // (a doc's repetition depends only on its own tokens), so this is ONE
    // map pass — the native [[graft.functions.RepetitionStats]] kernel
    // counts every 2-/3-gram occurrence in one O(n) hash-map loop per
    // row, no explode, no aggregation exchange, nothing shuffles but the
    // presentation sort. (Two earlier formulations were strictly worse:
    // explode + double groupBy paid two exchanges and evaluated the gram
    // arrays three times; the per-position HOF scan was interpreted and
    // O(n²).) Integer-ratio math ⇒ bit-exact across engines.
    QueryDef(
      "t06_repetition",
      (s, d) => docsPar(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          repetitionStats(col("toks")).as("rs"))
        .select(col("doc_id"),
          round(col("rs.mx2") * lit(2.0) / col("n_tokens"), 9).as("top2_frac"),
          round(col("rs.dup3").cast("double") / col("rs.tot3"), 9).as("dup3_frac"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        g2 AS (SELECT doc_id, unnest([array_to_string(toks[i:i+1], ' ')
            for i in range(1, greatest(len(toks), 1))]) AS g FROM t),
        s2 AS (SELECT doc_id, MAX(c) AS mx2 FROM (
            SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2) z GROUP BY 1),
        g3 AS (SELECT doc_id, unnest([array_to_string(toks[i:i+2], ' ')
            for i in range(1, greatest(len(toks) - 1, 1))]) AS g FROM t),
        s3 AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3,
            SUM(c) AS tot3 FROM (
            SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2) z GROUP BY 1)
        SELECT t.doc_id,
          ROUND(s2.mx2 * 2.0 / len(t.toks), 9) AS top2_frac,
          ROUND(CAST(s3.dup3 AS DOUBLE) / s3.tot3, 9) AS dup3_frac
        FROM t LEFT JOIN s2 ON s2.doc_id = t.doc_id
        LEFT JOIN s3 ON s3.doc_id = t.doc_id
        ORDER BY t.doc_id"""),
      headline = true),

    // ---- t07: rule-based quality gate (Gopher-style heuristics, Rae et
    // al. 2021 §A1.1, adapted to this corpus's token vocabulary): token
    // count bounds, mean token length bounds, minimum stopword presence.
    // Pure map-only pass — every signal derives from the normalized text
    // row-locally, integer/length arithmetic only ⇒ bit-exact.
    QueryDef(
      "t07_quality_gate",
      (s, d) => {
        val n = col("n_tokens")
        // normalized text = tokens joined by single spaces, so total token
        // chars = length(norm) - (n_tokens - 1) — no second array pass
        val meanW = (col("n_norm") - (n - lit(1))).cast("double") / n
        docsPar(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"),
            length(normalize(col("text"))).as("n_norm"))
          .select(col("doc_id"), col("n_norm"), size(col("toks")).as("n_tokens"),
            langScore(col("toks"), "en").as("sw"))
          .select(col("doc_id"), n,
            round(meanW, 9).as("mean_wlen"),
            (n >= 20 && n <= 1000).as("wc_ok"),
            (meanW >= 2.0 && meanW <= 12.0).as("wlen_ok"),
            (col("sw") >= 1).as("stop_ok"),
            (n >= 20 && n <= 1000 && meanW >= 2.0 && meanW <= 12.0 &&
              col("sw") >= 1).as("pass"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_tokens,
        ROUND(mean_wlen, 9) AS mean_wlen,
        n_tokens BETWEEN 20 AND 1000 AS wc_ok,
        mean_wlen BETWEEN 2.0 AND 12.0 AS wlen_ok,
        sw >= 1 AS stop_ok,
        (n_tokens BETWEEN 20 AND 1000) AND (mean_wlen BETWEEN 2.0 AND 12.0)
          AND sw >= 1 AS pass
        FROM (SELECT doc_id, len(toks) AS n_tokens,
            CAST(length(norm) - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_wlen,
            ${scoreSql("en")} AS sw
          FROM (SELECT doc_id, $normSql AS norm, $toksSql AS toks
            FROM documents) a) b
        ORDER BY doc_id""")),

    // ---- t08: BPE-ish regex token counting next to the whitespace count
    // — the pre-tokenizer pass (GPT-2-style alternation: letter runs,
    // single digits, punctuation marks; first-char-disjoint alternatives,
    // so Java and RE2 agree exactly). Map-only regex scan in codegen.
    QueryDef(
      "t08_bpe_tokens",
      // sort FIRST, project AFTER: orderBy's range partitioner runs the
      // sort's child once more as its key-sample pass, so a projection
      // below the sort evaluates TWICE — profiled at the r13 ×100 probe
      // as 2 × ~118 s of regex CPU (the whole t08 cost). Sorting the raw
      // (doc_id, text) rows first moves the regex above the exchange:
      // one evaluation, at the price of shuffling text bytes instead of
      // two ints — ~1 kB/row vs ~115 s of saved regex CPU at ×100.
      (s, d) => docsPar(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"),
          expr("""size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0))""")
            .as("n_bpe"),
          size(tokens(col("text"))).as("n_ws")),
      Some(s"""SELECT doc_id,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe,
        len($toksSql) AS n_ws
        FROM documents ORDER BY doc_id""")),

    // ---- t09: benchmark decontamination — flag docs sharing any 5-gram
    // span with the probe set (docs 0–4 stand in for an eval benchmark;
    // they flag themselves by construction, a built-in sanity check).
    // The probe set BROADCASTS — the corpus never shuffles on content.
    QueryDef(
      "t09_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ops.Packing.decontaminate(docs,
          graft.ops.Packing.probeShingles(docs.filter(col("doc_id") < 5), "text"),
          "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
        SELECT doc_id, list_distinct([array_to_string(toks[i:i+4], ' ')
            for i in range(1, greatest(len(toks) - 3, 1))]) AS sh
        FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
        p AS (SELECT DISTINCT unnest(sh) AS g FROM t WHERE doc_id < 5),
        e AS (SELECT doc_id, unnest(sh) AS g FROM t),
        h AS (SELECT e.doc_id, COUNT(*) AS n_hits FROM e JOIN p USING (g)
          GROUP BY 1)
        SELECT t.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
          h.n_hits IS NOT NULL AS contaminated
        FROM t LEFT JOIN h USING (doc_id) ORDER BY t.doc_id""")),

    // ---- t10: sequence-packing layout — docs concatenate in id order
    // into 256-token context windows; placement = exclusive token prefix
    // sum, computed as a distributed two-phase scan (per-bucket totals →
    // broadcast base offsets → within-bucket windows), never a global
    // single-partition window. Integer math ⇒ bit-exact.
    QueryDef(
      "t10_pack_sequences",
      (s, d) => graft.ops.Packing.packSequences(Tables.documents(s, d),
        "doc_id", "text", capacity = 256L)
        .select(col("id").as("doc_id"), col("n_tokens"), col("cum_before"),
          col("bin"), col("offset_in_bin"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, len(toks) AS n_tokens
          FROM (SELECT doc_id, $toksSql AS toks FROM documents) a),
        c AS (SELECT doc_id, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum_before FROM t)
        SELECT doc_id, n_tokens, cum_before,
          cum_before // 256 AS bin, cum_before % 256 AS offset_in_bin
        FROM c ORDER BY doc_id""")),

    // ---- t13: packed-segment materialization — one row per (doc,
    // context window) with the in-window placement, i.e. the copy plan a
    // packed-dataset writer executes when docs spill across windows.
    // Integer interval math over t10's two-phase prefix scan; the explode
    // emits ≤ ⌈n/C⌉+1 narrow rows per doc in place.
    QueryDef(
      "t13_pack_segments",
      (s, d) => graft.ops.Packing.packSegments(Tables.documents(s, d),
        "doc_id", "text", capacity = 256L)
        .select(col("id").as("doc_id"), col("bin"), col("offset_in_bin"),
          col("doc_offset"), col("seg_len"))
        .orderBy("doc_id", "bin"),
      Some(s"""WITH t AS (SELECT doc_id, len(toks) AS n
          FROM (SELECT doc_id, $toksSql AS toks FROM documents) a),
        c AS (SELECT doc_id, n,
          CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum FROM t),
        seg AS (SELECT doc_id, n, cum,
          unnest(generate_series(cum // 256, (cum + n - 1) // 256)) AS bin
          FROM c WHERE n > 0)
        SELECT doc_id, bin,
          greatest(bin * 256, cum) - bin * 256 AS offset_in_bin,
          greatest(bin * 256, cum) - cum AS doc_offset,
          least((bin + 1) * 256, cum + n) - greatest(bin * 256, cum) AS seg_len
        FROM seg ORDER BY doc_id, bin""")),

    // ---- t11: per-doc top TF-IDF terms — term frequency from the token
    // explode, document frequency from the per-(doc, token) frame, corpus
    // size from a broadcast 1-row frame. Ranking uses the ROUND-6 score
    // (then token) on BOTH engines: mathematically-tied scores (e.g.
    // 2·ln(N/a) vs ln(N/a²·N⁻¹)) can differ in the last ulp between
    // engines, and ranking on rounded scores makes the order immune to
    // that while the tie-break stays deterministic.
    QueryDef(
      "t11_tfidf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = docsPar(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val nDocs = Tables.documents(s, d)
          .agg(count(lit(1)).as("n_docs"))
        val sc = tf.join(dfreq, Seq("token"))
          .crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("token"),
            round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
              .as("score"))
        sc.withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy(desc("score"), asc("token"))))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("token"), col("score"))
          .orderBy("doc_id", "rk")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(toks) AS token
          FROM (SELECT doc_id, $toksSql AS toks FROM documents) a),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        sc AS (SELECT tf.doc_id, tf.token,
            ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score
          FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        SELECT doc_id, rk, token, score FROM (
          SELECT doc_id, token, score, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, token) AS rk FROM sc) z
        WHERE rk <= 3 ORDER BY doc_id, rk""")),

    // ---- t12: unigram log-probability scoring — the perplexity-filter
    // proxy (KenLM-style quality gates rank docs by LM logprob; the
    // unigram model needs only corpus token counts). Per-token
    // ln P(token) is ROUND-6 then DECIMAL-summed (exact, order-free — the
    // Det.dsum trick), so the per-doc mean is bit-identical across
    // engines and partitionings.
    QueryDef(
      "t12_unigram_logprob",
      (s, d) => {
        val tf = docsPar(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val cnt = tf.groupBy("token").agg(sum("tf").as("cnt"))
        val total = cnt.agg(sum("cnt").as("total"))
        tf.join(cnt, Seq("token"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("tf"),
            (round(log(col("cnt").cast("double") / col("total")), 6)
              .cast(DecimalType(18, 6)) * col("tf")).as("contrib"))
          .groupBy("doc_id")
          .agg(sum("tf").as("n_tokens"),
            (sum(col("contrib")).cast("double") / sum("tf"))
              .as("avg_logprob"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("avg_logprob"), 6).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(toks) AS token
          FROM (SELECT doc_id, $toksSql AS toks FROM documents) a),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        cnt AS (SELECT token, SUM(tf) AS cnt FROM tf GROUP BY 1),
        n AS (SELECT SUM(cnt) AS total FROM cnt),
        c AS (SELECT tf.doc_id, tf.tf,
            CAST(ROUND(ln(CAST(cnt.cnt AS DOUBLE) / n.total), 6)
              AS DECIMAL(18,6)) * tf.tf AS contrib
          FROM tf JOIN cnt USING (token) CROSS JOIN n)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          ROUND(CAST(SUM(contrib) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
        FROM c GROUP BY doc_id ORDER BY doc_id""")),

    // ---- t14: vocabulary build + OOV coverage — the tokenizer-prep step:
    // top-200 corpus-frequency vocabulary (ties on the token itself, so
    // both engines select identically), then per-doc OOV counts against
    // the broadcast vocab. Token counts partial-combine map-side; the
    // top-k is a TakeOrdered over the bounded distinct-token frame.
    QueryDef(
      "t14_vocab_oov",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val vocab = graft.ops.Vocabulary.build(docs, "doc_id", "text", 200)
        graft.ops.Vocabulary.oovStats(docs, vocab, "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_tokens"), col("n_oov"),
            col("oov_rate"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(toks) AS token
          FROM (SELECT doc_id, $toksSql AS toks FROM documents) a),
        cnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
        v AS (SELECT token FROM cnt ORDER BY cnt DESC, token LIMIT 200)
        SELECT tok.doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          ROUND(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*), 9) AS oov_rate
        FROM tok LEFT JOIN v USING (token)
        GROUP BY tok.doc_id ORDER BY tok.doc_id""")),

    // ---- t15: PII scrubbing — the safety-filter pass of a training
    // pipeline: count and mask email addresses and dotted-quad IPs.
    // Map-only regex (codegen'd regexp_replace/regexp_count); the
    // patterns avoid every Java-vs-RE2 divergence (no backrefs, no
    // lookaround, explicit classes) so DuckDB replays them verbatim. The
    // synthetic corpus is PII-free, so the query PLANTS deterministic PII
    // on every 5th/7th doc (pure string concat both engines reproduce) —
    // the oracle checks detection, counts, and the scrubbed text hash.
    QueryDef(
      "t15_pii_scrub",
      (s, d) => {
        val emailRe = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+"
        val ipRe = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"
        Tables.documents(s, d)
          .withColumn("t", concat(col("text"),
            when(col("doc_id") % 5 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com now"))).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
                lit(".42 logged"))).otherwise(lit(""))))
          .select(col("doc_id"),
            regexp_count(col("t"), lit(emailRe)).cast("long").as("n_emails"),
            regexp_count(col("t"), lit(ipRe)).cast("long").as("n_ips"),
            md5(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
              ipRe, "<IP>")).as("scrubbed_hash"))
          .orderBy("doc_id")
      },
      Some("""WITH t0 AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 5 = 0
            THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
          CASE WHEN doc_id % 7 = 0
            THEN ' from 10.0.' || (doc_id % 256) || '.42 logged' ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t,
            '[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(t,
            '[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+')) AS BIGINT) AS n_ips,
          md5(regexp_replace(regexp_replace(t,
            '[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+', '<EMAIL>', 'g'),
            '[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+', '<IP>', 'g')) AS scrubbed_hash
        FROM t0 ORDER BY doc_id""")),

    // ---- t16: token-budget mixing — per-domain keep rates COMPUTED from
    // a token budget (rate = min(1, budget/tokens), 'en' capped at 10k
    // tokens here) instead of t05's fixed fractions; membership stays the
    // deterministic md5 hash fraction, so both engines agree on every
    // kept row. The per-domain totals frame broadcasts (bounded).
    QueryDef(
      "t16_token_budget_mix",
      (s, d) => {
        val docs = docsPar(s, d)
          .select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).cast("long").as("n_tokens"))
        graft.ops.Sampling.tokenBudgetMix(docs, "doc_id", "lang",
            "n_tokens", budgets = Map("en" -> 10000L))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("stratum_tokens"), round(col("keep_rate"), 9).as("keep_rate"))
          .orderBy("doc_id")
      },
      Some(s"""WITH dcs AS (SELECT doc_id, lang,
          CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
        t AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS stratum_tokens
          FROM dcs GROUP BY 1),
        r AS (SELECT lang, stratum_tokens,
          CASE WHEN lang = 'en' AND stratum_tokens > 10000
            THEN CAST(10000 AS DOUBLE) / stratum_tokens ELSE 1.0 END AS rate
          FROM t)
        SELECT dcs.doc_id, dcs.lang, dcs.n_tokens, r.stratum_tokens,
          ROUND(r.rate, 9) AS keep_rate
        FROM dcs JOIN r USING (lang)
        WHERE CAST(CAST(concat('0x', substring(md5(CAST(dcs.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
            / 1152921504606846976.0 < r.rate
        ORDER BY dcs.doc_id""")),

    // ---- t17: DSIR importance weights (Xie et al. 2023) — score raw
    // docs by hashed-n-gram likelihood ratio against a target corpus
    // (docs 0-49 stand in for the target, like t09's probe set). The
    // 100 TB path for data selection: no vocabulary, both distributions
    // are bounded 1024-bucket frames that broadcast, features shuffle
    // only as (id, bucket). Fully value-oracled: the md5-prefix bucket
    // (t05's portable hash) and round-6-then-decimal-sum ln (t12's
    // trick) make every weight bit-identical in DuckDB.
    QueryDef(
      "t17_dsir_weights",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ops.Selection.dsirWeights(docs,
          docs.filter(col("doc_id") < 50), "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_feats"),
            col("log_weight"), col("target_like"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
        uni AS (SELECT doc_id, unnest(toks) AS f FROM tok),
        bi AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS f
          FROM tok, unnest(generate_series(1, len(toks) - 1)) AS g(i)),
        feats AS (SELECT doc_id,
            CAST(concat('0x', substring(md5(f), 1, 15)) AS BIGINT) % 1024 AS b
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) z
          WHERE len(f) > 0),
        allb AS (SELECT unnest(generate_series(0, 1023)) AS b),
        tc AS (SELECT b, COUNT(*) AS c FROM feats WHERE doc_id < 50 GROUP BY 1),
        rc AS (SELECT b, COUNT(*) AS c FROM feats GROUP BY 1),
        lpt AS (SELECT allb.b,
            CAST(ROUND(ln((COALESCE(tc.c, 0) + 1.0) /
              ((SELECT COALESCE(SUM(c), 0) FROM tc) + 1024.0)), 6)
              AS DECIMAL(18,6)) AS lpt
          FROM allb LEFT JOIN tc USING (b)),
        lpr AS (SELECT allb.b,
            CAST(ROUND(ln((COALESCE(rc.c, 0) + 1.0) /
              ((SELECT COALESCE(SUM(c), 0) FROM rc) + 1024.0)), 6)
              AS DECIMAL(18,6)) AS lpr
          FROM allb LEFT JOIN rc USING (b)),
        lr AS (SELECT lpt.b, lpt.lpt - lpr.lpr AS lr
          FROM lpt JOIN lpr USING (b)),
        fb AS (SELECT doc_id, b, COUNT(*) AS tf FROM feats GROUP BY 1, 2),
        w AS (SELECT fb.doc_id, CAST(SUM(fb.tf) AS BIGINT) AS n_feats,
            SUM(lr.lr * fb.tf) AS lw
          FROM fb JOIN lr USING (b) GROUP BY 1)
        SELECT doc_id, n_feats, ROUND(CAST(lw AS DOUBLE), 6) AS log_weight,
          lw > 0 AS target_like
        FROM w ORDER BY doc_id""")),

    // ---- t18: overlapping token-window chunking — split each document
    // into fixed-size token windows (64 tokens, stride 48 = 16-token
    // overlap), the canonical pre-embedding step of a retrieval/embedding
    // pipeline (t10/t13 PACK tokens into training sequences; this op
    // SEGMENTS text into windows, a different contract). Map-only: one
    // tokens() projection, starts via sequence(), windows via slice() —
    // all inside whole-stage codegen, no shuffle beyond the input spread;
    // at corpus scale the plan is embarrassingly parallel. Chunk CONTENT
    // is oracled by md5 so the dump stays narrow while the differential
    // check still pins every token of every window (same trick as t04).
    QueryDef(
      "t18_chunk_windows",
      (s, d) => docsPar(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0),
            greatest(size(col("toks")) - 1, lit(0)), lit(48))).as("st"))
        .select(col("doc_id"), (col("st") / 48).cast("long").as("chunk_id"),
          slice(col("toks"), col("st") + 1, lit(64)).as("ck"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("ck")).cast("long").as("n_toks"),
          md5(concat_ws(" ", col("ck")).cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        st AS (SELECT doc_id, toks,
          unnest(range(0, greatest(len(toks), 1), 48)) AS s FROM t),
        w AS (SELECT doc_id, s // 48 AS chunk_id, toks[s+1:s+64] AS ck
          FROM st)
        SELECT doc_id, chunk_id, CAST(len(ck) AS BIGINT) AS n_toks,
          md5(array_to_string(ck, ' ')) AS chunk_md5
        FROM w ORDER BY doc_id, chunk_id""")),

    // ---- t19: span-level benchmark decontamination — the REWRITE
    // counterpart of t09 (which flags whole docs): every 13-token span a
    // training doc shares with the probe set (docs 0–4 stand in for the
    // benchmark; 13-gram collision scrub à la Brown et al. 2020) is
    // excised via d12's interval-merge + slice-rebuild machinery
    // (Dedup.decontaminateSpans), so a leaked passage no longer costs the
    // document. The probe gram set BROADCASTS (8-byte keys, bounded by
    // benchmark tokens) — the training corpus is never shuffled on
    // content, strictly cheaper than d12's corpus-wide exchange. A
    // planted fixture guarantees real work at every SF: training docs
    // with doc_id % 53 = 7 get the 26-token prefix of probe doc
    // (doc_id % 5) appended — exactly that block must come out (the
    // cleaned text md5-pinned, the t04/t18 trick). The whole pipeline —
    // probe grams, span occurrences, interval merge, rebuild — is
    // replayed in SQL value-for-value.
    QueryDef(
      "t19_decontaminate_spans",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val probes = docs.filter(col("doc_id") < 5)
        val psrc = probes
          .select(col("doc_id").as("pd"),
            slice(tokens(col("text")), 1, 26).as("ptk"))
          .filter(size(col("ptk")) === 26)
        val aug = docs.filter(col("doc_id") >= 5)
          .withColumn("pd",
            when(col("doc_id") % 53 === 7, col("doc_id") % 5))
          .join(psrc, Seq("pd"), "left")
          .select(col("doc_id"),
            when(col("ptk").isNotNull,
              concat_ws(" ", col("text"), array_join(col("ptk"), " ")))
              .otherwise(col("text")).as("text"))
        graft.ops.Dedup.decontaminateSpans(aug, probes,
          "doc_id", "text", spanLen = 13)
          .select(col("id").as("doc_id"), col("n_spans"), col("n_removed"),
            col("clean_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ps AS (
          SELECT doc_id AS pd, toks[1:26] AS ptk
          FROM (SELECT doc_id, $toksSql AS toks FROM documents)
          WHERE doc_id < 5 AND len(toks) >= 26),
        aug AS (
          SELECT t.doc_id,
            CASE WHEN p.pd IS NOT NULL
              THEN t.text || ' ' || array_to_string(p.ptk, ' ')
              ELSE t.text END AS text
          FROM (SELECT doc_id, text FROM documents WHERE doc_id >= 5) t
          LEFT JOIN ps p ON t.doc_id % 53 = 7 AND p.pd = t.doc_id % 5),
        pg AS (
          SELECT DISTINCT g FROM (
            SELECT unnest([CAST(concat('0x',
                substring(md5(array_to_string(toks[i:i+12], ' ')), 1, 15))
                AS BIGINT)
              for i in range(1, greatest(len(toks) - 11, 1))]) AS g
            FROM (SELECT $toksSql AS toks FROM documents WHERE doc_id < 5) p0) z),
        tk AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
          FROM aug),
        occ AS (
          SELECT doc_id, u.pos AS pos, u.g AS g FROM (
            SELECT doc_id, unnest([{'pos': i - 1,
                'g': CAST(concat('0x',
                  substring(md5(array_to_string(toks[i:i+12], ' ')), 1, 15))
                  AS BIGINT)}
              for i in range(1, greatest(len(toks) - 11, 1))]) AS u
            FROM tk) z),
        rem AS (SELECT o.doc_id, o.pos FROM occ o JOIN pg USING (g)),
        isl AS (
          SELECT doc_id, pos,
            CASE WHEN pos <= COALESCE(MAX(pos + 13) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 0 ELSE 1 END AS brk
          FROM rem),
        isl2 AS (
          SELECT doc_id, pos,
            SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM isl),
        iv AS (
          SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 13 AS e
          FROM isl2 GROUP BY 1, 2),
        agg AS (
          SELECT doc_id, list({'s': s, 'e': e} ORDER BY s) AS ivl,
            COUNT(*) AS n_spans, CAST(SUM(e - s) AS BIGINT) AS n_removed
          FROM iv GROUP BY 1)
        SELECT t.doc_id, COALESCE(a.n_spans, 0) AS n_spans,
          COALESCE(a.n_removed, 0) AS n_removed,
          CASE WHEN a.doc_id IS NULL THEN md5(array_to_string(toks, ' '))
            ELSE md5(COALESCE(array_to_string(
              list_transform(
                list_filter(range(1, len(toks) + 1),
                  i -> len(list_filter(a.ivl,
                    v -> i - 1 >= v.s AND i - 1 < v.e)) = 0),
                i -> toks[i]), ' '), '')) END AS clean_md5
        FROM tk t LEFT JOIN agg a USING (doc_id)
        ORDER BY t.doc_id"""))
  )
}
