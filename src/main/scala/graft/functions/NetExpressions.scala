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

  /** Dotted quad → u32 in [0, 2³²), or -1 when malformed (the sentinel is
    * safe: no valid address is negative). One pass over the bytes — no
    * split/array allocation. Strict per-octet syntax: 1-3 digits, value ≤
    * 255; no signs or whitespace (the former cast-chain trimmed octets —
    * a laxness nothing relied on). */
  def parseIp4(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var octets = 0
    var digits = 0
    var acc = -1L
    var ip = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b >= '0' && b <= '9') {
        digits += 1
        // the value bound alone would admit unbounded leading zeros
        // ("0001.2.3.4") — enforce the documented 1-3 digit octet syntax
        if (digits > 3) return -1L
        acc = (if (acc < 0) 0L else acc) * 10 + (b - '0')
        if (acc > 255) return -1L
      } else if (b == '.') {
        if (acc < 0 || octets == 3) return -1L
        ip = (ip << 8) | acc
        octets += 1
        digits = 0
        acc = -1L
      } else return -1L
      i += 1
    }
    if (acc < 0 || octets != 3) -1L
    else (ip << 8) | acc
  }

  /** u32 → dotted quad, one pass into a byte buffer (≤ 15 bytes) — no
    * per-octet casts/concat. Octet arithmetic identical to the former
    * column composition: `(ip >> shift) & 255`. */
  def formatIp4(ip: Long): UTF8String = {
    val out = new Array[Byte](15)
    var n = 0
    var shift = 24
    while (shift >= 0) {
      val o = ((ip >> shift) & 255L).toInt
      if (o >= 100) { out(n) = ('0' + o / 100).toByte; n += 1 }
      if (o >= 10) { out(n) = ('0' + (o / 10) % 10).toByte; n += 1 }
      out(n) = ('0' + o % 10).toByte; n += 1
      if (shift > 0) { out(n) = '.'; n += 1 }
      shift -= 8
    }
    UTF8String.fromBytes(out, 0, n)
  }

  private val hexDigits = "0123456789abcdef".getBytes

  /** u48 MAC → "aa:bb:cc:dd:ee:ff", one pass (was 6 × hex/lower/lpad). */
  def formatEth(mac: Long): UTF8String = {
    val out = new Array[Byte](17)
    var i = 0
    var shift = 40
    while (shift >= 0) {
      val o = ((mac >> shift) & 255L).toInt
      out(i) = hexDigits(o >> 4); i += 1
      out(i) = hexDigits(o & 15); i += 1
      if (shift > 0) { out(i) = ':'; i += 1 }
      shift -= 8
    }
    UTF8String.fromBytes(out, 0, 17)
  }

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

/** Codegen'd dotted-quad parse — see [[NetExpressions.parseIp4]]. NULL on
  * malformed text (total under ANSI mode, like the try_cast chain it
  * replaces — which re-evaluated its input ~13× per row through the
  * split/element_at/try_cast composition; this is one pass). */
case class Ip4Parse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ip4_parse"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(s: Any): Any = {
    val v = NetExpressions.parseIp4(s.asInstanceOf[UTF8String])
    if (v < 0) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.NetExpressions.parseIp4($s);
      if (${ev.value} < 0) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): Ip4Parse =
    copy(child = c)
}

/** Codegen'd u32 → dotted quad — see [[NetExpressions.formatIp4]]. */
case class Ip4Format(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "ip4_format"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    NetExpressions.formatIp4(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.NetExpressions.formatIp4($v)")

  override protected def withNewChildInternal(c: Expression): Ip4Format =
    copy(child = c)
}

/** Codegen'd u48 MAC → colon-hex — see [[NetExpressions.formatEth]]. */
case class EthFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "eth_format"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    NetExpressions.formatEth(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.NetExpressions.formatEth($v)")

  override protected def withNewChildInternal(c: Expression): EthFormat =
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
