package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

class PackingSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("8").getOrCreate()
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("two-phase packing prefix equals the global-window prefix") {
    val docs = Tables.documents(spark, sf)
    // tiny bucket width ⇒ many buckets ⇒ the cross-bucket base path is
    // genuinely exercised (500 docs / width 7 ≈ 72 buckets)
    val got = Packing.packSequences(docs, "doc_id", "text",
      capacity = 100L, bucketWidth = 7L)
      .select("id", "cum_before", "bin", "offset_in_bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val naive = docs
      .select(col("doc_id").as("id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .withColumn("cum", coalesce(sum("n").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("id"), col("cum"), expr("cum div 100"), expr("cum % 100"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
  }

  test("packing/decontamination/quantization edge cases: empty and tiny inputs") {
    // doc shorter than the 5-gram window ⇒ no probe shingles, nothing flags
    val tiny = Seq((1L, "just three words"), (2L, "a b")).toDF("doc_id", "text")
    val dec = Packing.decontaminate(tiny,
      Packing.probeShingles(tiny.filter(col("doc_id") === 2), "text"),
      "doc_id", "text")
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(dec == Map(1L -> false, 2L -> false))
    // packing a doc with empty text: split("") = [""], so the empty doc
    // counts ONE (empty) token — the tokenizer's documented behavior,
    // identical in the DuckDB oracle (string_split('', ' ') = [''])
    val withEmpty = Seq((1L, "one two three"), (2L, ""), (3L, "four five"))
      .toDF("doc_id", "text")
    val packed = Packing.packSequences(withEmpty, "doc_id", "text", capacity = 4L)
      .select("id", "n_tokens", "cum_before", "bin")
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == Seq((1L, 3, 0L, 0L), (2L, 1, 3L, 0L), (3L, 2, 4L, 1L)))
    // quantizing a zero vector: guarded scale, all-zero codes
    val zeroVec = Seq((1L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val q = graft.ops.Similarity.quantizeInt8(zeroVec, "vec_id", "embedding")
      .select("q_sum", "q_l1", "q_max").as[(Long, Long, Long)].head()
    assert(q == ((0L, 0L, 0L)))
  }

  test("pack segments: per-doc lengths sum to n_tokens, bins never overflow") {
    val docs = Tables.documents(spark, sf)
    val segs = Packing.packSegments(docs, "doc_id", "text", capacity = 100L,
      bucketWidth = 7L)
    val perDoc = segs.groupBy("id").agg(sum("seg_len").as("tot"))
      .join(Packing.packSequences(docs, "doc_id", "text", 100L, 7L)
        .select(col("id"), col("n_tokens")), Seq("id"))
      .filter(col("tot") =!= col("n_tokens")).count()
    assert(perDoc == 0, "per-doc segment lengths must sum to the token count")
    val overflow = segs.groupBy("bin").agg(sum("seg_len").as("fill"))
      .filter(col("fill") > 100L).count()
    assert(overflow == 0, "a window must never exceed its capacity")
    // windows are DENSE except the last: every bin but max(bin) is full
    val dense = segs.groupBy("bin").agg(sum("seg_len").as("fill"))
    val maxBin = dense.agg(max("bin")).head().getLong(0)
    assert(dense.filter(col("bin") < maxBin && col("fill") =!= 100L).count() == 0,
      "interior windows must be exactly full (concatenation packing)")
  }

  test("vocabulary build ranks by frequency then token; OOV stats are exact") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "b c d d"),
      (3L, "z z z z")
    ).toDF("doc_id", "text")
    // counts: a=3, b=3, c=2, d=2, z=4 → top-3 = z(4), a(3), b(3)
    val vocab = graft.ops.Vocabulary.build(docs, "doc_id", "text", 3)
      .select("token", "rank").as[(String, Int)].collect().toMap
    assert(vocab == Map("z" -> 1, "a" -> 2, "b" -> 3), vocab)
    val oov = graft.ops.Vocabulary.oovStats(docs,
        graft.ops.Vocabulary.build(docs, "doc_id", "text", 3),
        "doc_id", "text")
      .select("id", "n_tokens", "n_oov")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(oov == Map(1L -> ((6L, 1L)), 2L -> ((4L, 3L)), 3L -> ((4L, 0L))), oov)
  }

  test("decontamination flags exactly the docs sharing a probe shingle") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),   // probe
      (1L, "something entirely different with no overlap at all"),
      (2L, "he said the quick brown fox jumps far away"),    // shares 5-gram
      (3L, "quick brown fox sleeps here now")                // 5-grams differ
    ).toDF("doc_id", "text")
    val out = Packing.decontaminate(docs,
      Packing.probeShingles(docs.filter(col("doc_id") === 0), "text"),
      "doc_id", "text")
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
  }

  test("DSIR weights: target-like docs outscore noise; features count occurrences") {
    import graft.ops.Selection
    // two styles of doc: "code-ish" (the target) and "prose-ish" noise.
    // DSIR's hashed unigram+bigram ratio must rank held-out code-ish docs
    // above prose docs even though they share no doc ids with the target.
    val code = Seq("def", "return", "if", "else", "val", "import")
    val prose = Seq("the", "cat", "sat", "on", "a", "mat", "and", "dog")
    val rng = new scala.util.Random(3)
    def doc(words: Seq[String], n: Int): String =
      Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" ")
    val rows =
      (0L until 30L).map(i => (i, doc(code, 40))) ++        // target ids
      (100L until 130L).map(i => (i, doc(code, 40))) ++     // held-out code
      (200L until 260L).map(i => (i, doc(prose, 40)))       // noise
    val docs = rows.toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") < 30)
    val w = Selection.dsirWeights(docs, target, "doc_id", "text",
        buckets = 256)
      .select("id", "n_feats", "log_weight", "target_like")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(w.length == rows.length)
    // n tokens -> n unigrams + (n-1) bigrams
    assert(w.forall(_._2 == 40 + 39))
    val heldOut = w.filter(r => r._1 >= 100 && r._1 < 130)
    val noise = w.filter(_._1 >= 200)
    assert(heldOut.forall(_._4), "held-out code-ish docs must score target-like")
    assert(noise.forall(!_._4), "prose noise must not score target-like")
    assert(heldOut.map(_._3).min > noise.map(_._3).max,
      "weights must separate the styles")
  }
}
