package graft.aggs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Reservoir-sample state (Vitter's Algorithm R, plus a weighted merge for
  * distributed combination).
  *
  * RaQL `SAMPLE n, x` (`doc/raql/expr.ml:860`; impl
  * `/root/reference/src/RamenSampling.ml`, 56 LoC) keeps a uniform sample of
  * n values per group. The merge draws from the two reservoirs proportional
  * to their observed counts, preserving uniformity across partitions, so
  * the aggregate runs as a normal partial/final hash aggregation at any
  * parallelism.
  *
  * Randomness is seeded per (seed, partition content) via the running count,
  * making a single-threaded run reproducible; distributed runs are uniform
  * but not bit-stable (sampling is inherently so) — hence no SQL oracle.
  */
final class ReservoirState(val n: Int, seed: Long) {
  var count: Long = 0L
  val items: mutable.ArrayBuffer[Double] = mutable.ArrayBuffer.empty
  private[aggs] val rng = new java.util.Random(seed)

  def observe(x: Double): Unit = {
    count += 1
    if (items.size < n) items += x
    else {
      val j = (rng.nextDouble() * count).toLong
      if (j < n) items(j.toInt) = x
    }
  }

  /** In-place partial Fisher–Yates: move k uniformly-chosen distinct
    * elements to the front of `buf`, return them. Without replacement. */
  private def drawK(buf: mutable.ArrayBuffer[Double], k: Int): Seq[Double] = {
    var i = 0
    while (i < k) {
      val j = i + rng.nextInt(buf.size - i)
      val t = buf(i); buf(i) = buf(j); buf(j) = t
      i += 1
    }
    buf.take(k).toSeq
  }

  def mergeIn(o: ReservoirState): Unit = {
    if (o.count == 0) return
    if (count == 0) {
      count = o.count
      items.clear(); items ++= o.items
      return
    }
    val total = count + o.count
    if (items.size + o.items.size <= n) {
      // Both sides under-filled (items == full population seen): the
      // concatenation is itself an exact sample of the union.
      items ++= o.items
      count = total
      return
    }
    // Weighted merge WITHOUT replacement: the number of survivors taken
    // from `this` is Binomial(n, count/total) — each merged slot belongs to
    // this side's population w.p. count/total — then distinct items are
    // drawn from each side via partial Fisher–Yates. No item can appear
    // twice and inclusion stays uniform (cf. RamenSampling.ml's merge).
    val p = count.toDouble / total
    var kThis = 0
    var i = 0
    while (i < n) { if (rng.nextDouble() < p) kThis += 1; i += 1 }
    kThis = math.max(n - o.items.size, math.min(kThis, items.size))
    val fromThis = drawK(items, kThis)
    val fromOther = drawK(o.items.clone(), n - kThis)
    items.clear(); items ++= fromThis; items ++= fromOther
    count = total
  }
}

/** `graft_sample(x, n, seed)` → array<double> uniform sample of the group. */
case class ReservoirSample(
    child: Expression,
    n: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirState] with UnaryLike[Expression] {

  override def createAggregationBuffer(): ReservoirState = new ReservoirState(n, seed)

  override def update(b: ReservoirState, row: InternalRow): ReservoirState = {
    val v = child.eval(row)
    if (v != null) b.observe(v match {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.doubleValue()
      case l: java.lang.Long => l.doubleValue()
      case i: java.lang.Integer => i.doubleValue()
      case x => x.toString.toDouble
    })
    b
  }

  override def merge(b: ReservoirState, o: ReservoirState): ReservoirState = {
    b.mergeIn(o); b
  }

  override def eval(b: ReservoirState): Any =
    new GenericArrayData(b.items.toArray)

  override def serialize(b: ReservoirState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.n); out.writeLong(seed); out.writeLong(b.count)
    out.writeInt(b.items.size)
    b.items.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ReservoirState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new ReservoirState(in.readInt(), in.readLong())
    st.count = in.readLong()
    val sz = in.readInt()
    var i = 0
    while (i < sz) { st.items += in.readDouble(); i += 1 }
    st
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sample"

  override def withNewMutableAggBufferOffset(x: Int): ReservoirSample =
    copy(mutableAggBufferOffset = x)
  override def withNewInputAggBufferOffset(x: Int): ReservoirSample =
    copy(inputAggBufferOffset = x)
  override protected def withNewChildInternal(c: Expression): ReservoirSample =
    copy(child = c)
}
