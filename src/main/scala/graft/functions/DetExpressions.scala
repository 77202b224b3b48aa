package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `x → round(x·10⁴)` as a LONG with `CAST(x AS DECIMAL(18,4))` semantics —
  * the per-row quantization under [[graft.Det.dsum]]'s order-free exact sum.
  *
  * Why a custom expression: the semantics both engines agree on (Spark cast
  * and DuckDB cast alike) are "parse the SHORTEST decimal rendering of the
  * double, round HALF_UP to 4 places" — `java.math.BigDecimal` on
  * `Double.toString`. Running that per row costs three object allocations
  * per value and dominated q01's six-aggregate scan. But the decimal result
  * can differ from plain `(long) floor(x·10⁴ + 0.5)` ONLY when `x·10⁴`
  * lands within ~2·10⁻¹⁶·|y| of a half-integer (the shortest rendering and
  * the float product each move the value by ≤ 1 ulp): outside that band the
  * two roundings provably agree, so this expression takes the primitive
  * fast path there and calls the exact BigDecimal routine only inside the
  * band (width 10⁻⁹ + 10⁻¹⁴·|y| — vastly wider than the error, vanishingly
  * rare on real data) or when |y| ≥ 10¹² (where float error approaches the
  * rounding step). The accept set is bit-identical to the decimal cast —
  * property-checked against it including planted `.00005` boundaries.
  *
  * Null semantics mirror the cast chain it replaces: NULL in, NaN/Infinity,
  * and DECIMAL(18,4) overflow (|x| ≥ 10¹⁴) are NULL out.
  */
case class QuantizeE4(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_e4"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double input, got ${t.sql}")
    }

  protected override def nullSafeEval(input: Any): Any =
    QuantizeE4.quantize(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val y = ctx.freshName("y")
      val fl = ctx.freshName("fl")
      val ay = ctx.freshName("ay")
      val q = ctx.freshName("q")
      s"""
      if (Double.isNaN($c) || Double.isInfinite($c)) {
        ${ev.isNull} = true;
      } else {
        double $y = $c * 1.0E4;
        double $fl = Math.floor($y);
        double $ay = Math.abs($y);
        if ($ay < 1.0E12 && Math.abs($y - $fl - 0.5) > 1.0E-9 + 1.0E-14 * $ay) {
          ${ev.value} = (long) Math.floor($y + 0.5);
        } else {
          java.lang.Long $q = graft.functions.QuantizeE4.slow($c);
          if ($q == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $q.longValue(); }
        }
      }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeE4 =
    copy(child = newChild)
}

object QuantizeE4 {
  /** DECIMAL(18,4) capacity: 18 significant digits ⇒ |unscaled| < 10¹⁸. */
  private val Overflow = java.math.BigInteger.TEN.pow(18)

  /** The exact semantics: shortest-rendering parse, HALF_UP at scale 4;
    * null on NaN/Infinity/overflow — identical to
    * `CAST(CAST(x AS DECIMAL(18,4)) * 10000 AS BIGINT)`. */
  def slow(x: Double): java.lang.Long =
    if (x.isNaN || x.isInfinite) null
    else {
      val bi = new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(4, java.math.RoundingMode.HALF_UP)
        .unscaledValue()
      if (bi.abs.compareTo(Overflow) >= 0) null
      else java.lang.Long.valueOf(bi.longValue())
    }

  /** Interpreted mirror of the generated code. */
  def quantize(x: Double): Any =
    if (x.isNaN || x.isInfinite) null
    else {
      val y = x * 1.0e4
      val fl = math.floor(y)
      val ay = math.abs(y)
      if (ay < 1.0e12 && math.abs(y - fl - 0.5) > 1.0e-9 + 1.0e-14 * ay)
        math.floor(y + 0.5).toLong
      else slow(x)
    }
}
