package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** `LISTEN FOR` protocol decoders with the reference's fixed schemas:
  * netflow v5 (`/root/reference/src/RamenNetflow.ml:14-142`), collectd
  * binary (`src/RamenCollectd.ml:24-90`), graphite plaintext
  * (`src/RamenGraphiteSink.ml`).
  *
  * Decoders are pure byte/line parsers usable from any transport: the
  * [[UdpIngest]] dev receiver, Kafka values, or archived packet files.
  * Each emits the same record schema the reference declares.
  */
object Listeners {

  // --- netflow v5 (public packet layout) --------------------------------
  final case class NetflowRecord(
      source: String, start: Double, stop: Double, seqnum: Long,
      engine_type: Short, engine_id: Short,
      sampling_type: Short, sampling_rate: Int,
      src: Long, dst: Long, next_hop: Long,
      src_port: Int, dst_port: Int, in_iface: Int, out_iface: Int,
      packets: Long, bytes: Long, tcp_flags: Short, ip_proto: Short,
      ip_tos: Short, src_as: Int, dst_as: Int, src_mask: Short, dst_mask: Short)

  /** Decode one netflow v5 packet (24-byte header + n×48-byte records).
    * The flow's first/last sysuptimes are converted to absolute unix
    * seconds and emitted as `start`/`stop`, the reference's field names
    * (`src/RamenNetflow.ml:120-128`). */
  def parseNetflowV5(source: String, packet: Array[Byte]): Seq[NetflowRecord] = {
    val b = ByteBuffer.wrap(packet).order(ByteOrder.BIG_ENDIAN)
    val version = b.getShort() & 0xffff
    require(version == 5, s"not a netflow v5 packet (version=$version)")
    val count = b.getShort() & 0xffff
    val sysUptimeMs = b.getInt().toLong & 0xffffffffL
    val unixSecs = b.getInt().toLong & 0xffffffffL
    val unixNs = b.getInt().toLong & 0xffffffffL
    val seq = b.getInt().toLong & 0xffffffffL
    val engineType = (b.get() & 0xff).toShort
    val engineId = (b.get() & 0xff).toShort
    val sampling = b.getShort() & 0xffff
    val samplingType = ((sampling >> 14) & 0x3).toShort
    val samplingRate = sampling & 0x3fff
    val bootTime = unixSecs.toDouble + unixNs / 1e9 - sysUptimeMs / 1e3
    (0 until count).map { _ =>
      val src = b.getInt().toLong & 0xffffffffL
      val dst = b.getInt().toLong & 0xffffffffL
      val hop = b.getInt().toLong & 0xffffffffL
      val inIf = b.getShort() & 0xffff
      val outIf = b.getShort() & 0xffff
      val pkts = b.getInt().toLong & 0xffffffffL
      val octets = b.getInt().toLong & 0xffffffffL
      val first = b.getInt().toLong & 0xffffffffL
      val last = b.getInt().toLong & 0xffffffffL
      val sport = b.getShort() & 0xffff
      val dport = b.getShort() & 0xffff
      b.get() // pad1
      val flags = (b.get() & 0xff).toShort
      val proto = (b.get() & 0xff).toShort
      val tos = (b.get() & 0xff).toShort
      val srcAs = b.getShort() & 0xffff
      val dstAs = b.getShort() & 0xffff
      val srcMask = (b.get() & 0xff).toShort
      val dstMask = (b.get() & 0xff).toShort
      b.getShort() // pad2
      NetflowRecord(source, bootTime + first / 1e3, bootTime + last / 1e3,
        seq, engineType, engineId, samplingType, samplingRate,
        src, dst, hop, sport, dport, inIf, outIf, pkts, octets,
        flags, proto, tos, srcAs, dstAs, srcMask, dstMask)
    }
  }

  // --- collectd binary protocol (public part-based layout) --------------
  /** The reference's collectd tuple (`src/RamenCollectd.ml:24-80`):
    * `instance` is collectd's plugin-instance part, `start` the (hi-res)
    * timestamp, and each VALUES part spreads over `value`..`value5`
    * nullable columns (a part with more than 5 values emits one record
    * per chunk of 5 — nothing is silently dropped). */
  final case class CollectdRecord(
      host: String, instance: Option[String], plugin: Option[String],
      start: Double, type_instance: Option[String], type_name: Option[String],
      value: Double, value2: Option[Double], value3: Option[Double],
      value4: Option[Double], value5: Option[Double])

  /** Decode the collectd binary "parts" protocol: each part is
    * (type:u16be, len:u16be, payload); string parts are NUL-terminated;
    * VALUES parts carry (count, per-value type tag, 8-byte values). */
  def parseCollectd(packet: Array[Byte]): Seq[CollectdRecord] = {
    val b = ByteBuffer.wrap(packet).order(ByteOrder.BIG_ENDIAN)
    var host = ""; var time = 0.0
    var plugin: Option[String] = None; var pluginInst: Option[String] = None
    var typeName: Option[String] = None; var typeInst: Option[String] = None
    val out = scala.collection.mutable.ArrayBuffer[CollectdRecord]()
    def str(len: Int): String = {
      val arr = new Array[Byte](len - 4)
      b.get(arr)
      new String(arr, "UTF-8").takeWhile(_ != '\u0000')
    }
    // A hostile/corrupt packet must never hang or throw: every part length
    // is validated (a partLen < 4 would rewind the buffer and loop forever;
    // one longer than the payload would underflow), and any residual
    // underflow aborts the packet, keeping the records decoded so far.
    var bail = false
    try while (!bail && b.remaining() >= 4) {
      val partType = b.getShort() & 0xffff
      val partLen = b.getShort() & 0xffff
      if (partLen < 4 || partLen - 4 > b.remaining()) bail = true
      else partType match {
        case 0x0000 => host = str(partLen)
        case 0x0001 => time = (b.getLong()).toDouble
        case 0x0008 => time = b.getLong() / 1073741824.0 // 2^30 hi-res
        case 0x0002 => plugin = Some(str(partLen)).filter(_.nonEmpty)
        case 0x0003 => pluginInst = Some(str(partLen)).filter(_.nonEmpty)
        case 0x0004 => typeName = Some(str(partLen)).filter(_.nonEmpty)
        case 0x0005 => typeInst = Some(str(partLen)).filter(_.nonEmpty)
        case 0x0006 =>
          val n = b.getShort() & 0xffff
          val kinds = Array.fill(n)(b.get())
          val values = kinds.map {
            case 1 => // GAUGE: little-endian double
              java.lang.Double.longBitsToDouble(
                java.lang.Long.reverseBytes(b.getLong()))
            case _ => // COUNTER/DERIVE/ABSOLUTE: big-endian int64
              b.getLong().toDouble
          }.toSeq
          values.grouped(5).foreach { chunk =>
            out += CollectdRecord(host, pluginInst, plugin, time, typeInst,
              typeName, chunk.head, chunk.lift(1), chunk.lift(2),
              chunk.lift(3), chunk.lift(4))
          }
        case _ => b.position(b.position() + (partLen - 4)) // skip unknown
      }
    } catch { case _: java.nio.BufferUnderflowException => () }
    out.toSeq
  }

  // --- graphite plaintext ----------------------------------------------

  /** The reference's graphite sink tuple (`RamenGraphiteSink.ml:25-56`):
    * metric path, receipt time, sender address, event time (`start`,
    * the declared event-time field), `name=value` tags carried after `;`
    * in the metric, and the value. */
  final case class GraphiteRecord(metric: String, receipt_time: Double,
      sender: Option[String], start: Double, tags: Seq[(String, String)],
      value: Double)

  /** `metric[;tag=val…] value [unix_ts]` lines
    * (`RamenGraphiteSink.ml:92-116`): a missing timestamp means the
    * receipt time; a malformed value/timestamp/tag drops the line (the
    * reference raises and skips it). */
  def parseGraphite(line: String, sender: Option[String] = None,
      receiptTime: Double = 0.0): Option[GraphiteRecord] = {
    def num(s: String): Option[Double] =
      try Some(s.toDouble) catch { case _: NumberFormatException => None }
    val fields = line.trim.split("\\s+") match {
      case Array(m, v, t) => num(v).flatMap(vv => num(t).map(tt => (m, vv, tt)))
      case Array(m, v) => num(v).map(vv => (m, vv, receiptTime))
      case _ => None
    }
    fields.flatMap { case (m, v, start) =>
      val parts = m.split(";", -1)
      if (parts.head.isEmpty) None
      else {
        val tags = parts.tail.map { t =>
          t.split("=", 2) match {
            case Array(n, tv) => Some(n -> tv)
            case _ => None
          }
        }
        if (tags.exists(_.isEmpty)) None // a tag without '=' kills the line
        else Some(GraphiteRecord(parts.head, receiptTime, sender, start,
          tags.flatten.toSeq, v))
      }
    }
  }

  /** Decode a Dataset of raw packets into netflow records. */
  def netflowFrames(spark: SparkSession, packets: Dataset[(String, Array[Byte])]): DataFrame = {
    import spark.implicits._
    packets.flatMap { case (src, bytes) => parseNetflowV5(src, bytes) }.toDF()
  }
}
