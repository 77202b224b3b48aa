package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IP/CIDR support for the reference's `ip` / `cidr` column types
  * (`/root/reference/src/RamenIp.ml`): values travel as canonical text
  * (v4 dotted quad; v6 RFC-5952 — lowercase, no leading zeros, longest
  * zero-run ≥ 2 compressed to `::`, matching the reference's printer
  * `src/RamenIpv6.ml:52-83`), and the net operators are native
  * expressions calling the static helpers below — one JVM call per row,
  * inside whole-stage codegen. The parser normalizes ip literals through
  * [[canonicalIp]] so text equality is value equality. */
object NetExpressions {

  /** RFC-5952 rendering of a 128-bit address. Single zero groups stay
    * `0` (peek.test expects `…:33:0:252:2`); on equal-length runs the
    * leftmost is compressed. */
  def formatV6(bi: BigInteger): String = {
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) {
      g(i) = bi.shiftRight(16 * (7 - i)).and(BigInteger.valueOf(0xffffL)).intValue()
      i += 1
    }
    // longest run of zero groups, length ≥ 2
    var bestStart = -1; var bestLen = 0
    var s = 0
    while (s < 8) {
      if (g(s) == 0) {
        var e = s
        while (e < 8 && g(e) == 0) e += 1
        if (e - s > bestLen) { bestStart = s; bestLen = e - s }
        s = e
      } else s += 1
    }
    if (bestLen < 2) bestStart = -1
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    i = 0
    while (i < 8) {
      if (i == bestStart) { parts += ""; i += bestLen }
      else { parts += java.lang.Integer.toHexString(g(i)); i += 1 }
    }
    var out = parts.mkString(":")
    if (bestStart == 0) out = ":" + out
    if (bestStart >= 0 && bestStart + bestLen == 8) out = out + ":"
    out
  }

  /** (family, numeric address) → canonical text. Family 6 — or the
    * reference's `Ip` sum-type tag 1 (`src/RamenTypes.ml:43-49`, which is
    * how mixed ip CSV fixtures encode v6) — selects v6; anything else v4. */
  def formatIp(version: Int, num: Decimal): UTF8String = {
    val bi = num.toJavaBigDecimal.toBigInteger
    val s =
      if (version != 6 && version != 1) {
        val v = bi.longValue()
        s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}"
      } else formatV6(bi)
    UTF8String.fromString(s)
  }

  /** Canonical text of an ip (or ip/len cidr) literal; unparseable input
    * is returned verbatim. v6 goes through [[formatV6]] so literals
    * compare equal to column text. */
  def canonicalIp(s: String): String = try {
    val slash = s.indexOf('/')
    val host = if (slash >= 0) s.substring(0, slash) else s
    val addr = java.net.InetAddress.getByName(host)
    val canon = addr match {
      case v6: java.net.Inet6Address => formatV6(new BigInteger(1, v6.getAddress))
      case v4 => v4.getHostAddress
    }
    if (slash >= 0) canon + s.substring(slash) else canon
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

  /** String → bytes, one byte per char (code point & 0xFF). RaQL strings
    * are BYTE strings (`"\xC8"` is the single byte 0xC8,
    * `tests/func/peek.ramen`), but `cast(binary)` re-encodes code points
    * ≥ 0x80 as two UTF-8 bytes, scrambling PEEK. */
  def latin1Bytes(s: UTF8String): Array[Byte] = {
    val str = s.toString
    val out = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) { out(i) = (str.charAt(i) & 0xFF).toByte; i += 1 }
    out
  }
}

/** Codegen'd byte-string decode for PEEK — see [[NetExpressions.latin1Bytes]]. */
case class Latin1Bytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "latin1_bytes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(s: Any): Any =
    NetExpressions.latin1Bytes(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NetExpressions.latin1Bytes($s)")

  override protected def withNewChildInternal(c: Expression): Latin1Bytes =
    copy(child = c)
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
