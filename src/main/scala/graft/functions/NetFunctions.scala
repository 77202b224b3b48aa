package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Network address types and functions.
  *
  * The reference models Eth (u48 MAC), Ipv4 (u32), Ipv6 (u128), and
  * Cidr as first-class scalar types with printing/parsing and range
  * operations (`/root/reference/src/RamenIpv4.ml`, `RamenEthAddr.ml`,
  * `RamenIp.ml`; BEGINOFRANGE/ENDOFRANGE `src/CodeGenLib.ml:1085-1090`;
  * `ip IN cidr` membership `doc/raql/expr.ml:626`).
  *
  * Spark-first mapping: IPv4 as LongType (u32 fits), Eth as LongType (u48),
  * IPv6 as 16-byte BinaryType, Cidr as struct(ip, maskLen). Everything
  * below is integer/bit arithmetic — codegen'd Column expressions, no UDFs.
  */
object NetFunctions {

  /** u32 → dotted quad. */
  def ip4ToString(ip: Column): Column =
    concat_ws(".",
      shiftright(ip, 24).bitwiseAND(255).cast("string"),
      shiftright(ip, 16).bitwiseAND(255).cast("string"),
      shiftright(ip, 8).bitwiseAND(255).cast("string"),
      ip.bitwiseAND(255).cast("string"))

  /** dotted quad → u32; malformed text → NULL (total under ANSI mode). */
  def ip4FromString(s: Column): Column = {
    val p = split(s, "\\.")
    def part(i: Int): Column = {
      val v = try_element_at(p, lit(i)).try_cast("long")
      when(v >= 0 && v <= 255, v)
    }
    when(size(p) === 4,
      part(1) * 16777216L + part(2) * 65536L + part(3) * 256L + part(4))
  }

  /** Network mask of a /len prefix, as u32. */
  def cidr4Mask(len: Column): Column =
    when(len <= 0, 0L).otherwise(
      call_function("shiftleft", lit(4294967295L), lit(32) - len.cast("int"))
        .bitwiseAND(lit(4294967295L)))

  /** RaQL `ip IN cidr`: prefix membership. */
  def inCidr4(ip: Column, net: Column, len: Column): Column =
    ip.bitwiseAND(cidr4Mask(len)) === net.bitwiseAND(cidr4Mask(len))

  /** BEGINOFRANGE cidr — first address of the prefix. */
  def beginOfRange4(net: Column, len: Column): Column =
    net.bitwiseAND(cidr4Mask(len))

  /** ENDOFRANGE cidr — last address of the prefix. */
  def endOfRange4(net: Column, len: Column): Column =
    net.bitwiseAND(cidr4Mask(len))
      .bitwiseOR(cidr4Mask(len).bitwiseXOR(lit(4294967295L)))

  /** u48 MAC → "aa:bb:cc:dd:ee:ff". */
  def ethToString(mac: Column): Column =
    concat_ws(":", (5 to 0 by -1).map(i =>
      lpad(lower(hex(shiftright(mac, i * 8).bitwiseAND(255))), 2, "0")): _*)

  /** IPFAMILY for the sum-typed ip struct{family, addr4, addr6}. */
  def ipFamily(ip: Column): Column = ip.getField("family")
}
