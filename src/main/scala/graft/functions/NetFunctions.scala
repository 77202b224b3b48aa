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

  /** u32 → dotted quad (one-pass codegen kernel, [[Ip4Format]]). */
  def ip4ToString(ip: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      Ip4Format(org.apache.spark.sql.GraftShims.expression(ip.cast("long"))))

  /** dotted quad → u32; malformed text → NULL (total under ANSI mode).
    * A single-pass codegen kernel ([[Ip4Parse]]) — the previous
    * split/try_element_at/try_cast composition textually duplicated its
    * input into every octet access (~13 evaluations per row, explosive
    * when the input is itself an expression). */
  def ip4FromString(s: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      Ip4Parse(org.apache.spark.sql.GraftShims.expression(s.cast("string"))))

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

  /** u48 MAC → "aa:bb:cc:dd:ee:ff" (one-pass codegen kernel,
    * [[EthFormat]]). */
  def ethToString(mac: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      EthFormat(org.apache.spark.sql.GraftShims.expression(mac.cast("long"))))

  /** IPFAMILY for the sum-typed ip struct{family, addr4, addr6}. */
  def ipFamily(ip: Column): Column = ip.getField("family")
}
