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

  /** Order-insensitive content fingerprint: md5 of the sorted token
    * MULTISET (true bag semantics — multiplicity counts, so "the the cat"
    * and "the cat" fingerprint differently). Collapses word-order
    * permutations only; exact-dedup key. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))).cast("binary"))

  /** MinHash signature: k minimums of per-seed 64-bit hashes over shingles.
    * (k × |shingles| xxhash64 calls, all codegen'd.) */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, t => xxhash64(t, i))))

  /** LSH bucket keys: one hash per band of `r` consecutive signature slots. */
  def lshBuckets(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * lit(r) + 1, lit(r)), b))

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
    * Near-identical texts differ in few bits (Hamming distance). */
  def simhash64(toks: Column): Column = {
    // fold: acc = 64-int array of bit votes; expressed as a single pass via
    // aggregate over tokens with an array accumulator
    val votes = aggregate(
      toks,
      transform(sequence(lit(0), lit(63)), _ => lit(0)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (v, b) => v + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
