package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double elements),
  * summing left-to-right in element order.
  *
  * Why a custom Catalyst expression: the embedding similarity operators need
  * a per-row dot product over fixed-dimension vectors. The higher-order
  * function form (`aggregate(zip_with(...))`) has no codegen and its
  * interpreted eval measured ~70 µs/pair on 64-dim vectors; an unrolled
  * `element_at` chain blows past codegen size limits at realistic
  * dimensions. This expression generates a tight loop (~0.1 µs/pair) and
  * stays inside whole-stage codegen.
  *
  * Null handling: NULL if either array is NULL; array ELEMENTS are assumed
  * non-null (embedding columns), matching the behavior of the HOF form on
  * such data.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { s += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, dt: DataType, i: String): String = dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, elemType(left), i)} * ${get(b, elemType(right), i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** All of a random-hyperplane LSH family's band buckets in ONE kernel:
  * for each of `bands`×`r` literal hyperplanes, the sign of the plane·x
  * dot (accumulated left-to-right in element order, exactly like
  * [[VecDot]] and the SQL oracle's list_reduce — the sign compare `>= 0`
  * therefore sees bit-identical doubles), packed big-endian into one
  * bucket long per band.
  *
  * Why a custom expression (the a08/t06 lesson): the Column formulation
  * spells out bands×r separate `VecDot(v, typedlit(plane))` nodes — 96
  * literal-array expressions for the 12×8 family — whose task
  * deserialization and codegen compile time dwarf the actual math. Here
  * the planes ride one reference object and the whole signature is one
  * static-shaped call that stays inside whole-stage codegen. */
case class LshSignBuckets(child: Expression, planes: Seq[Seq[Double]],
    bands: Int, r: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.length == bands * r, "need bands*r hyperplanes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sign_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName requires array<float|double>, got ${other.sql}")
    }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val flat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  def compute(arr: ArrayData): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var off = 0
      while (off < r) {
        val p = flat(b * r + off)
        val n = math.min(arr.numElements(), p.length)
        var acc = 0.0
        var d = 0
        while (d < n) {
          val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          acc += x * p(d)
          d += 1
        }
        if (acc >= 0.0) bucket |= 1L << (r - 1 - off)
        off += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBuckets", this, classOf[LshSignBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): LshSignBuckets =
    copy(child = c)
}

/** Index of the FIRST band where two LSH bucket arrays agree, −1 if none.
  *
  * The duplicate-suppression primitive of banded LSH pair generation: a
  * candidate pair sharing m of the `bands` buckets would otherwise be
  * emitted m times and deduplicated by a full `distinct()` exchange over
  * the (quadratic) raw pair stream — the measured dominant cost of the
  * hot-bucket joins (each reduce task wrote ~2M pair rows for ~5k inputs).
  * With every bucket row carrying its full bucket array, the join adds
  * `band === first_shared_band(a.bkts, b.bkts)` and each pair survives in
  * EXACTLY one band's bucket group: no duplicate emissions, no distinct,
  * cosine/verify evaluated once per pair.
  *
  * A higher-order-function form (`exists(zip_with(slice…)))`) allocates
  * per evaluation; this is a tight codegen'd loop over the two ArrayData
  * (bands ≈ 6–8 longs), a few ns per combo. */
case class FirstSharedBand(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_shared_band"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      ${ev.value} = -1;
      for (int $i = 0; $i < $n; $i++) {
        if ($a.getLong($i) == $b.getLong($i)) { ${ev.value} = $i; break; }
      }
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FirstSharedBand = copy(left = l, right = r)
}

/** Pack an array of band-bucket values into one BinaryType blob:
  * `bytesPer` big-endian low bytes per element, concatenated in band
  * order — the shuffle-payload form of the bucket array a pair join's
  * first-shared-band tie-break carries ([[SharesBandSlice]]).
  *
  * Why: the d02 ×10000 probe measured the per-occurrence bucket shuffle
  * at ~90 GB, a large slice of which was the full `bands` longs of
  * bucket array riding EVERY exploded bucket row (plus UnsafeArrayData's
  * header/null-bits overhead). With [[graft.functions.BandBuckets]]
  * narrowing buckets to `bits` bits, the tie-break needs only those bits
  * per band: 6 bands × 4 bytes = 24 bytes of binary replace 6 longs + 16
  * bytes of array framing — and the caller carries only the PREFIX of
  * bands before the exploded one, halving the average again. */
case class PackBandBits(child: Expression, bytesPer: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bytesPer >= 1 && bytesPer <= 8, s"bytesPer must be 1..8, got $bytesPer")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_band_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName requires array<bigint>, got ${other.sql}")
    }

  def compute(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n * bytesPer)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      var b = 0
      while (b < bytesPer) {
        out(i * bytesPer + b) = (v >>> ((bytesPer - 1 - b) * 8)).toByte
        b += 1
      }
      i += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("packBandBits", this, classOf[PackBandBits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): PackBandBits =
    copy(child = c)
}

/** TRUE iff any aligned `bytesPer`-byte group of the two packed
  * band-prefix blobs ([[PackBandBits]]) is equal — i.e. the two docs
  * already shared a band BEFORE the one whose bucket group the join is
  * evaluating. The banded pair joins emit a pair only when this is
  * false, so each pair survives in exactly one (its first) shared-bucket
  * band group: same duplicate suppression as [[FirstSharedBand]], with
  * the payload cut from the full bucket array to the packed prefix. */
case class SharesBandSlice(left: Expression, right: Expression, bytesPer: Int)
    extends BinaryExpression {

  require(bytesPer >= 1 && bytesPer <= 8, s"bytesPer must be 1..8, got $bytesPer")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "shares_band_slice"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == BinaryType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  def compute(a: Array[Byte], b: Array[Byte]): Boolean = {
    val groups = math.min(a.length, b.length) / bytesPer
    var g = 0
    while (g < groups) {
      var eq = true
      var i = g * bytesPer
      val end = i + bytesPer
      while (eq && i < end) {
        if (a(i) != b(i)) eq = false
        i += 1
      }
      if (eq) return true
      g += 1
    }
    false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sharesBandSlice", this, classOf[SharesBandSlice].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SharesBandSlice = copy(left = l, right = r)
}
