package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IP/CIDR support for the reference's `ip` / `cidr` column types
  * (`/root/reference/src/RamenIp.ml`): values travel as canonical text
  * (v4 dotted quad; v6 uncompressed lowercase groups, no leading zeros —
  * the form `InetAddress.getHostAddress` produces, which the parser also
  * normalizes ip literals to), and the net operators are native
  * expressions calling the static helpers below — one JVM call per row,
  * inside whole-stage codegen. */
object NetExpressions {

  /** (version, numeric address) → canonical text. version 4 unless 6. */
  def formatIp(version: Int, num: Decimal): UTF8String = {
    val bi = num.toJavaBigDecimal.toBigInteger
    val s =
      if (version != 6) {
        val v = bi.longValue()
        s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}"
      } else {
        val groups = new Array[String](8)
        var i = 0
        while (i < 8) {
          groups(i) = bi.shiftRight(16 * (7 - i))
            .and(BigInteger.valueOf(0xffffL)).longValue().toHexString
          i += 1
        }
        groups.mkString(":")
      }
    UTF8String.fromString(s)
  }

  /** Canonical text of an ip (or ip/len cidr) literal; unparseable input
    * is returned verbatim. */
  def canonicalIp(s: String): String = try {
    val slash = s.indexOf('/')
    if (slash >= 0)
      java.net.InetAddress.getByName(s.substring(0, slash)).getHostAddress +
        s.substring(slash)
    else java.net.InetAddress.getByName(s).getHostAddress
  } catch { case _: Exception => s }

  /** `ip IN cidr` over canonical text: parse both, compare masked bytes.
    * NULL-safe at the expression layer; family mismatch → false. */
  def ipInCidr(ip: UTF8String, cidr: UTF8String): Boolean = try {
    val c = cidr.toString
    val slash = c.indexOf('/')
    val netS = if (slash >= 0) c.substring(0, slash) else c
    val len = if (slash >= 0) c.substring(slash + 1).toInt else -1
    val a = java.net.InetAddress.getByName(ip.toString).getAddress
    val n = java.net.InetAddress.getByName(netS).getAddress
    if (a.length != n.length) return false
    val bits = if (len < 0) a.length * 8 else len
    var i = 0
    var remaining = bits
    while (remaining > 0 && i < a.length) {
      val take = math.min(8, remaining)
      val mask = (0xff << (8 - take)) & 0xff
      if ((a(i) & mask) != (n(i) & mask)) return false
      remaining -= take
      i += 1
    }
    true
  } catch { case _: Exception => false }
}

/** Codegen'd `ip IN cidr` membership over canonical-text columns. */
case class IpInCidr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "ip_in_cidr"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NetExpressions.ipInCidr(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NetExpressions.ipInCidr($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IpInCidr = copy(left = l, right = r)
}

/** Codegen'd (version, numeric) → canonical ip text. */
case class FormatIp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "format_ip"

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a decimal address, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any, n: Any): Any =
    NetExpressions.formatIp(v.asInstanceOf[Number].intValue(),
      n.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = graft.functions.NetExpressions.formatIp((int) $v, $n);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FormatIp = copy(left = l, right = r)
}
