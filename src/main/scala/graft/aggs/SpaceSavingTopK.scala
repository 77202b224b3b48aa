package graft.aggs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters state: at most `capacity` monitored keys, each
  * with an observed count and an over-estimation error bound.
  *
  * Re-expresses the semantics of the reference's decayed heavy-hitters
  * sketch (`/root/reference/src/HeavyHitters.ml`, 324 LoC; `TOP n x`
  * operator, `doc/raql/expr.ml:969`) with the standard Metwally et al.
  * Stream-Summary algorithm. The reference sizes its candidate table at
  * 10×n; callers here pick `capacity` the same way. When `capacity` exceeds
  * the true key cardinality the result is exact and merge-order-independent
  * (that configuration is what the DuckDB-oracle query verifies; tests
  * cover the lossy regime).
  *
  * Scale: the sketch is a constant-size mergeable summary, so a cluster-wide
  * TOP is one partial-aggregate pass + tiny shuffled states — no shuffle of
  * raw keys, no skew sensitivity.
  */
final class SpaceSavingState(val capacity: Int) {
  /** key -> (count, error) */
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def observe(key: String, w: Long): Unit = counts.get(key) match {
    case Some((c, e)) => counts.update(key, (c + w, e))
    case None if counts.size < capacity => counts.update(key, (w, 0L))
    case None =>
      // evict the minimum; ties broken by key so the result is independent
      // of hash-map iteration order
      val (mk, (mc, _)) = counts.minBy { case (k, (c, _)) => (c, k) }
      counts.remove(mk)
      counts.update(key, (mc + w, mc))
  }

  /** Smallest monitored count, the upper bound on any unmonitored key's true
    * count. 0 while the table isn't full (every seen key is monitored). */
  def minCount: Long =
    if (counts.size < capacity) 0L else counts.values.iterator.map(_._1).min

  /** Standard mergeable-summaries SpaceSaving merge (Agarwal et al. 2012;
    * cf. Metwally): a key absent from one side could have up to that side's
    * min count there, so fold that min into both count and error — keeping
    * the overestimate invariant (reported cnt ≥ true count) across
    * partitions — then truncate to the top `capacity` by count. */
  def mergeIn(o: SpaceSavingState): Unit = {
    val mThis = minCount
    val mOther = o.minCount
    val merged = mutable.HashMap[String, (Long, Long)]()
    counts.foreach { case (k, (c, e)) =>
      merged.update(k, (c + mOther, e + mOther))
    }
    o.counts.foreach { case (k, (c, e)) =>
      merged.get(k) match {
        // both sides monitored k: undo the mOther floor, use the real counts
        case Some((c0, e0)) => merged.update(k, (c0 - mOther + c, e0 - mOther + e))
        case None => merged.update(k, (c + mThis, e + mThis))
      }
    }
    counts.clear()
    if (merged.size > capacity)
      counts ++= merged.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
    else counts ++= merged
  }

  /** top-k by (count desc, key asc) — deterministic. */
  def top(k: Int): Seq[(String, Long, Long)] =
    counts.toSeq.sortBy { case (key, (c, _)) => (-c, key) }.take(k)
      .map { case (key, (c, e)) => (key, c, e) }
}

/** `graft_topk(key, weight, capacity, k)` aggregate → array<struct<key,cnt>>.
  * key is evaluated as a string; weight as a long (RaQL `TOP n x BY w`).
  */
case class SpaceSavingTopK(
    left: Expression,
    right: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] with BinaryLike[Expression] {

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity)

  override def update(b: SpaceSavingState, row: InternalRow): SpaceSavingState = {
    val key = left.eval(row)
    if (key != null) {
      val w = right.eval(row) match {
        case null => 0L
        case x: java.lang.Long => x.longValue()
        case x: java.lang.Integer => x.longValue()
        case x: java.lang.Short => x.longValue()
        case x => x.toString.toLong
      }
      if (w != 0L) b.observe(key.toString, w)
    }
    b
  }

  override def merge(b: SpaceSavingState, o: SpaceSavingState): SpaceSavingState = {
    b.mergeIn(o); b
  }

  override def eval(b: SpaceSavingState): Any =
    new GenericArrayData(b.top(k).map { case (key, c, _) =>
      InternalRow(UTF8String.fromString(key), c)
    })

  override def serialize(b: SpaceSavingState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (key, (c, e)) =>
      out.writeUTF(key); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new SpaceSavingState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      st.counts.update(key, (c, e))
      i += 1
    }
    st
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("cnt", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpaceSavingTopK =
    copy(left = newLeft, right = newRight)
}
