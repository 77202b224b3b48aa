package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, first-occurrence order —
  * the unit of Jaccard/MinHash dedup.
  *
  * Why a custom Catalyst expression: the HOF form
  * (`array_distinct(transform(sequence(...), i => concat_ws(...)))`) is
  * interpreted — per-token lambda dispatch dominates t01/d02/d03 and its
  * megamorphic call sites give multi-× run-to-run swings. This expression
  * is one tight generated loop over the token array (UTF8String concat +
  * LinkedHashSet) and stays inside whole-stage codegen. Same output as the
  * HOF form: distinct space-joined n-grams, empty array when there are
  * fewer than n tokens.
  */
case class WordShingles(child: Expression, n: Int,
    distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  @transient private lazy val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // distinct=false keeps every OCCURRENCE in order — the unit for
    // count-weighted features (DSIR hashed n-grams); a LinkedHashSet is
    // the dedup the Jaccard/MinHash consumers want
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](len - n + 1)
    var i = 0
    while (i + n <= len) {
      var s = arr.getUTF8String(i)
      var j = 1
      while (j < n) { s = UTF8String.concatWs(space, s, arr.getUTF8String(i + j)); j += 1 }
      out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", space, classOf[UTF8String].getName)
    val utf8 = classOf[UTF8String].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val coll =
        if (distinct) s"new java.util.LinkedHashSet<$utf8>()"
        else s"new java.util.ArrayList<$utf8>($len - $n + 1)"
      s"""
         |int $len = $a.numElements();
         |if ($len < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  java.util.Collection<$utf8> $set = $coll;
         |  for (int $i = 0; $i + $n <= $len; $i++) {
         |    $utf8 $s = $a.getUTF8String($i);
         |    for (int $j = 1; $j < $n; $j++) {
         |      $s = $utf8.concatWs($sepRef, $s, $a.getUTF8String($i + $j));
         |    }
         |    $set.add($s);
         |  }
         |  ${ev.value} = new $gad($set.toArray());
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Within-doc repetition statistics of a token array in ONE pass — the
  * Gopher repetition signals' kernel (t06): counts every 2-gram and
  * 3-gram occurrence in two hash maps and returns
  * `struct(mx2, dup3, tot3)`:
  *   - mx2  = occurrence count of the most frequent 2-gram (NULL if < 2 tokens)
  *   - dup3 = number of 3-gram occurrences whose gram repeats (NULL if < 3)
  *   - tot3 = total 3-gram occurrences (NULL if < 3 tokens)
  *
  * Why a custom expression: the HOF form (per-position
  * `size(filter(grams, _ == x))`) is interpreted AND O(n²); this is one
  * generated O(n) loop with hash-map counts that stays inside whole-stage
  * codegen — the row-local map-only shape this signal deserves. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("mx2", LongType, nullable = true),
    StructField("dup3", LongType, nullable = true),
    StructField("tot3", LongType, nullable = true)))

  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  @transient private lazy val space = UTF8String.fromString(" ")

  /** Shared by eval and the generated code (the loop is all object ops —
    * generating it inline would win nothing over one static-shaped call). */
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val len = arr.numElements()
    val out = new Array[Any](3)
    if (len >= 2) {
      val c2 = new java.util.HashMap[UTF8String, Long]()
      var mx = 0L
      var i = 0
      while (i + 2 <= len) {
        val g = UTF8String.concatWs(space, arr.getUTF8String(i), arr.getUTF8String(i + 1))
        val c = c2.merge(g, 1L, (a, b) => a + b)
        if (c > mx) mx = c
        i += 1
      }
      out(0) = mx
    }
    if (len >= 3) {
      val c3 = new java.util.HashMap[UTF8String, Long]()
      var i = 0
      while (i + 3 <= len) {
        val g = UTF8String.concatWs(space, arr.getUTF8String(i),
          arr.getUTF8String(i + 1), arr.getUTF8String(i + 2))
        c3.merge(g, 1L, (a, b) => a + b)
        i += 1
      }
      var dup = 0L
      c3.values.forEach(c => if (c > 1) dup += c)
      out(1) = dup
      out(2) = (len - 2).toLong
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // stays codegen-compatible (no interpreted-projection fallback for the
    // whole stage); the kernel itself is one static-shaped call
    val self = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** Product-quantization encoder: for each of `books.length` subspaces,
  * the (1-based, first-wins) argmax-dot codeword index and its raw dot —
  * `array<struct<code:int, score:double>>`, one entry per subspace.
  *
  * Why a custom expression: the Column formulation spells out
  * subs×codes literal-vector dots (128 `VecDot(slice(...), typedlit)`
  * nodes for 8×16) — a plan tree whose task-deserialization and codegen
  * compile time dwarfed the actual math at bench scale. Here the
  * codebooks ride ONE reference object and the whole encode is one
  * static-shaped kernel call; each dot accumulates over ascending dims
  * exactly like [[graft.functions.VecDot]] (and the SQL oracle's
  * list_reduce), so codes and scores are bit-identical to the
  * spelled-out form. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.head.nonEmpty, "empty codebooks")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("code", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val flat: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val w = books.head.head.length

  def compute(arr: ArrayData): ArrayData = {
    val subs = flat.length
    val out = new Array[Any](subs)
    var s = 0
    while (s < subs) {
      val cws = flat(s)
      var bestJ = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < cws.length) {
        val cw = cws(j)
        var acc = 0.0
        var d = 0
        val off = s * w
        while (d < w) {
          val x = if (isFloat) arr.getFloat(off + d).toDouble
                  else arr.getDouble(off + d)
          acc += x * cw(d)
          d += 1
        }
        if (acc > bestScore) { bestScore = acc; bestJ = j }
        j += 1
      }
      out(s) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestJ + 1, bestScore))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Multi-probe IVF cell assignment: the top-`nprobe` coarse cells by dot
  * (rank order, strict-> first-wins like every argmax kernel here), then
  * the argmax fine centroid within EACH selected coarse group — one probe
  * cell per coarse group, 1-based global fine indices, no duplicates
  * (groups are disjoint). With `coarse == fine` and `group(j) = j` this
  * is the EXACT global top-nprobe (single-level regime, SQL-replayable as
  * `row_number() OVER (ORDER BY dt DESC, cidx) <= nprobe`); in the
  * two-level regime it is the standard IVF multi-probe — neighboring
  * coarse cells are searched instead of trusting the single coarse
  * winner. nprobe is the RECALL DIAL for probe-side assignment
  * (a paraphrase sitting near a cell boundary lands in a different
  * argmax cell than its source ~45 % of the time on the audit corpus;
  * probing 2 cells recovers it). EMPTY coarse groups (duplicate seed
  * vectors tie-break every fine mate to an earlier identical coarse) are
  * skipped — the selection advances to the next-best non-empty coarse;
  * a vector whose coarse scores are all NaN probes nothing (empty
  * array). Map-only: O(nprobe·(#coarse + group))
  * dots per row, no shuffle, same scale shape as the argmax kernels. */
case class CellProbes(child: Expression, coarse: Seq[Seq[Double]],
    fine: Seq[Seq[Double]], group: Seq[Int], nprobe: Int)
    extends UnaryExpression {

  require(coarse.nonEmpty && fine.nonEmpty && group.length == fine.length,
    "cell_probes: empty centroids or group/fine length mismatch")
  require(group.forall(g => g >= 0 && g < coarse.length),
    "cell_probes: group index out of coarse range")
  require(nprobe >= 1, "cell_probes: nprobe >= 1")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cell_probes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val coarseFlat: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val fineFlat: Array[Array[Double]] =
    fine.map(_.toArray).toArray
  @transient private lazy val members: Array[Array[Int]] = {
    val m = Array.fill(coarse.length)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    group.zipWithIndex.foreach { case (g, j) => m(g) += j }
    m.map(_.toArray)
  }

  def compute(arr: ArrayData): ArrayData = {
    val dim = coarseFlat(0).length
    def dot(cw: Array[Double]): Double = {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += x * cw(d)
        d += 1
      }
      acc
    }
    val nc = coarseFlat.length
    val scores = new Array[Double](nc)
    var c = 0
    while (c < nc) { scores(c) = dot(coarseFlat(c)); c += 1 }
    val k = math.min(nprobe, nc)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val taken = new Array[Boolean](nc)
    // an EMPTY coarse group (duplicate seed vectors tie-break every fine
    // mate to an earlier identical coarse) has no cell to contribute —
    // mark it taken upfront so the selection advances to the next-best
    // NON-empty coarse instead of fabricating fine cell 1
    var e = 0
    while (e < nc) { if (members(e).isEmpty) taken(e) = true; e += 1 }
    var exhausted = false
    while (!exhausted && out.length < k) {
      // selection pass: strict > keeps the EARLIEST index on ties —
      // rank order identical to (score DESC, index ASC)
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < nc) {
        if (!taken(i) && scores(i) > bestScore) { bestScore = scores(i); best = i }
        i += 1
      }
      if (best < 0) exhausted = true // candidates spent, or all-NaN scores
      else {
        taken(best) = true
        val ms = members(best)
        var bestJ = ms(0)
        var bestFine = Double.NegativeInfinity
        var j = 0
        while (j < ms.length) {
          val s = dot(fineFlat(ms(j)))
          if (s > bestFine) { bestFine = s; bestJ = ms(j) }
          j += 1
        }
        out += (bestJ + 1)
      }
    }
    // a vector whose coarse scores are all NaN probes NOTHING (empty
    // array → explode drops the row) — matching nothing beats matching
    // an arbitrary cell; sibling argmax kernels must return one cell and
    // pick a defined fallback instead
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cellProbes", this,
      classOf[CellProbes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): CellProbes =
    copy(child = c)
}

/** Two-level IVF cell assignment: argmax-dot over `coarse` centroids,
  * then argmax-dot over only the `fine` centroids grouped under that
  * coarse winner (`group(j)` = 0-based coarse index of fine centroid j).
  * Returns the 1-based GLOBAL fine index — the same cell-id space as the
  * single-level [[PqEncode]] argmax.
  *
  * Why: single-level assignment is O(nlist) dots per row, and a
  * corpus-scaled nlist (the sizing that keeps SemDeDup's Σ|cell|² pair
  * cost linear) makes that O(n·nlist) — the quadratic that excluded the
  * scaled-nlist probe at ×1000. Two-level probes ~2·√nlist centroids per
  * row instead. APPROXIMATE by construction: the true argmax fine
  * centroid may live under a different coarse winner (standard IVF
  * coarse-probe behavior; for dedup the cells are a heuristic partition
  * either way). Ties first-wins on ascending index at both levels,
  * matching the single-level kernel's semantics.
  */
case class TwoLevelArgmax(child: Expression, coarse: Seq[Seq[Double]],
    fine: Seq[Seq[Double]], group: Seq[Int])
    extends UnaryExpression {

  require(coarse.nonEmpty && fine.nonEmpty && group.length == fine.length,
    "two_level_argmax: empty centroids or group/fine length mismatch")
  require(group.forall(g => g >= 0 && g < coarse.length),
    "two_level_argmax: group index out of coarse range")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "two_level_argmax"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val coarseFlat: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val fineFlat: Array[Array[Double]] =
    fine.map(_.toArray).toArray
  // members(c) = ascending global fine indices under coarse cell c —
  // ascending order is what makes the fine tie-break first-wins GLOBAL
  @transient private lazy val members: Array[Array[Int]] = {
    val m = Array.fill(coarse.length)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    group.zipWithIndex.foreach { case (g, j) => m(g) += j }
    m.map(_.toArray)
  }

  def compute(arr: ArrayData): Int = {
    val dim = coarseFlat(0).length
    def dot(cw: Array[Double]): Double = {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += x * cw(d)
        d += 1
      }
      acc
    }
    // consider only coarse cells with fine mates: duplicate seed vectors
    // tie-break every mate to the earliest identical coarse, and an empty
    // winner would fabricate fine cell 1. Every fine belongs to some
    // group, so a non-empty coarse always exists; if all scores are NaN
    // the first non-empty group is the defined fallback (this kernel must
    // return ONE cell — the multi-probe kernel returns none instead).
    var bestC = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < coarseFlat.length) {
      if (members(c).nonEmpty) {
        val s = dot(coarseFlat(c))
        if (s > bestScore) { bestScore = s; bestC = c }
      }
      c += 1
    }
    if (bestC < 0) { bestC = 0; while (members(bestC).isEmpty) bestC += 1 }
    val ms = members(bestC)
    var bestJ = ms(0)
    bestScore = Double.NegativeInfinity
    var i = 0
    while (i < ms.length) {
      val s = dot(fineFlat(ms(i)))
      if (s > bestScore) { bestScore = s; bestJ = ms(i) }
      i += 1
    }
    bestJ + 1
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("twoLevelArgmax", this,
      classOf[TwoLevelArgmax].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): TwoLevelArgmax =
    copy(child = c)
}

/** SimHash-64 of a token array in one pass: per-token xxhash64 (seed 42,
  * identical to Spark's `xxhash64(tok)`), ±1 vote per bit, bit set when
  * votes > 0. Replaces both the interpreted HOF fold and d04's
  * explode + 64-vote-column aggregation — the fingerprint becomes a
  * map-only projection with NO shuffle, which is the shape that matters at
  * corpus scale. Empty array → 0L (the HOF fold's value). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < len) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int $len = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $len; $i++) {
         |  long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((( $h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** MinHash signature in one pass: k minimums over the shingles of the
  * seeded hash family `hashInt(i, hashUTF8String(shingle, 42))` — exactly
  * `xxhash64(shingle, i)`'s composition, so signatures match the previous
  * flat-column formulation bit-for-bit. Map-only: replaces
  * explode + k-column min aggregation (and its per-doc shuffle). NULL for
  * an empty array (the doc has no shingles and drops out of LSH, like the
  * explode formulation). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "signature size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < len) {
      val h1 = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var s = 0
      while (s < k) {
        val h = XXH64.hashInt(s, h1)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h = ctx.freshName("h")
      s"""
         |int $len = $a.numElements();
         |if ($len == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $len; $i++) {
         |    long $h1 = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $s = 0; $s < $k; $s++) {
         |      long $h = $xxh.hashInt($s, $h1);
         |      if ($h < $mins[$s]) $mins[$s] = $h;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Banded LSH bucket keys from a minhash signature, one kernel call:
  * `bands` values, band b = XXH64-fold of signature slots
  * [b·r, b·r+r) seeded with b — bit-identical to the Column form
  * `xxhash64(slice(sig, b*r+1, r), b)` (Spark's xxhash64 folds array
  * elements through `XXH64.hashLong`).
  *
  * Why an expression and not the transform/slice Column form: the bucket
  * frame must carry BOTH the whole bucket array (for first-shared-band
  * pair suppression) and its explosion, which takes two projections —
  * and CollapseProject inlines a 1-ref signature INTO the transform's
  * lambda, where it re-evaluates once PER BAND (a 6× minhash recompute
  * measured as ~2× on d02's wall). A unary expression evaluates its
  * child exactly once per row, whatever the optimizer does around it. */
case class BandBuckets(child: Expression, bands: Int, r: Int,
    bits: Int = 64)
    extends UnaryExpression {

  require(bands >= 1 && r >= 1, "bands and r must be >= 1")
  require(bits >= 1 && bits <= 64, s"bits must be 1..64, got $bits")

  /** `bits` < 64 keeps only the low bits of each band hash (the Column
    * form `xxhash64(...) & mask`): with the bucket space sized to the
    * corpus ([[graft.ops.Dedup.autoBucketBits]]) the narrowed value is
    * both the join key and the packed tie-break payload
    * ([[PackBandBits]]). Narrowing can only MERGE buckets (a pair with
    * equal full hashes has equal masked hashes), so banding recall is
    * preserved exactly; the rare random collision adds a false candidate
    * pair that the downstream exact-verify filter removes. */
  private val mask: Long = if (bits == 64) -1L else (1L << bits) - 1L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  def compute(sig: ArrayData): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var i = 0
      val base = b * r
      val n = math.min(r, math.max(0, sig.numElements() - base))
      while (i < n) {
        acc = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(sig.getLong(base + i), acc)
        i += 1
      }
      out(b) = acc & mask
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bandBuckets", this, classOf[BandBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): BandBuckets =
    copy(child = c)
}
