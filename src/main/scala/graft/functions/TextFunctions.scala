package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline operators:
  * tokenization, shingling, fingerprinting, language-ID, quality scoring.
  *
  * All pure Catalyst expressions (string functions + array higher-order
  * functions) so they stay inside whole-stage codegen — no UDFs. At 100 TB
  * these run as a map-only pass over the corpus; everything downstream
  * (dedup joins, LSH buckets) groups on their small fixed-size outputs.
  */
object TextFunctions {

  /** Lowercase, collapse whitespace runs, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup —
    * a native codegen'd expression ([[WordShingles]]); the earlier HOF form
    * was interpreted per token and the dominant, high-variance cost of
    * t01/d02/d03. */
  def wordShingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      WordShingles(org.apache.spark.sql.GraftShims.expression(toks), n))

  /** Every n-gram OCCURRENCE in order (no dedup) — the unit for
    * count-weighted hashed features (DSIR importance weights), where
    * multiplicity is the signal the distinct form throws away. Same
    * codegen kernel as [[wordShingles]], ArrayList instead of the set. */
  def wordShinglesAll(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      WordShingles(org.apache.spark.sql.GraftShims.expression(toks), n,
        distinct = false))

  /** Order-insensitive content fingerprint: md5 of the sorted token
    * MULTISET (true bag semantics — multiplicity counts, so "the the cat"
    * and "the cat" fingerprint differently). Collapses word-order
    * permutations only; exact-dedup key. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))).cast("binary"))

  /** MinHash signature: k minimums of the `xxhash64(shingle, i)` hash
    * family over the shingles — native one-pass expression
    * ([[MinHashSig]]); NULL when the doc has no shingles. */
  def minhashSignature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      MinHashSig(org.apache.spark.sql.GraftShims.expression(shingles), k))

  /** LSH bucket keys: one hash per band of `r` consecutive signature
    * slots. One kernel call ([[graft.functions.BandBuckets]], bit-identical
    * to the previous `transform(…, b -> xxhash64(slice(sig…), b))` Column
    * form) so the signature child evaluates ONCE per row — the lambda form
    * re-evaluated an optimizer-inlined signature once per band. */
  def lshBuckets(sig: Column, bands: Int, r: Int, bits: Int = 64): Column =
    org.apache.spark.sql.GraftShims.column(BandBuckets(
      org.apache.spark.sql.GraftShims.expression(sig), bands, r, bits))

  // --- language ID ------------------------------------------------------
  // Stopword-profile scoring over the most frequent function words of each
  // language (the classic cheap heuristic; the reference has no langid —
  // this is part of the beyond-parity training-data surface).
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"))

  /** Per-language stopword hit count over the token array. */
  def langScore(toks: Column, lang: String): Column = {
    val words = stopwordProfiles.toMap.apply(lang)
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Predicted language code, ties broken by profile order ("en" first);
    * "und" (undetermined) when no stopword hits at all. */
  def langId(toks: Column): Column = {
    val scores = stopwordProfiles.map { case (l, _) => l -> langScore(toks, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(Option.empty[Column]) { case (acc, (l, s)) =>
      Some(acc match {
        case None => when(s === best && best > 0, lit(l))
        case Some(c) => c.when(s === best && best > 0, lit(l))
      })
    }.get.otherwise(lit("und"))
  }

  /** SimHash64 over tokens: per-token 64-bit hash, bitwise majority vote.
    * Near-identical texts differ in few bits (Hamming distance). Native
    * codegen'd single pass ([[SimHash64]]) — map-only, no shuffle. */
  def simhash64(toks: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      SimHash64(org.apache.spark.sql.GraftShims.expression(toks)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** One-pass within-doc repetition stats `struct(mx2, dup3, tot3)` —
    * native O(n) hash-map kernel ([[RepetitionStats]]); the HOF form was
    * interpreted and O(n²). */
  def repetitionStats(toks: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      RepetitionStats(org.apache.spark.sql.GraftShims.expression(toks)))
}
