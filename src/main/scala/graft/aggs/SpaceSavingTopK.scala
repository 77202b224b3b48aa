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

/** Time-decayed, sigma-filtered SpaceSaving state — the full semantics of
  * the reference's heavy-hitters sketch (`/root/reference/src/HeavyHitters.ml`
  * :47-98: decay as inflation of new weights with periodic rebase; :199-218:
  * outlier cutoff at mean + sigmas·stddev of the added weights).
  *
  * Weights are stored in "inflated" units relative to `t0`: an add at time t
  * weighs w·exp((t−t0)·decay), so older contributions fade. When the
  * inflation factor exceeds 1e6 the state rebases (scales every stored
  * weight by exp((t0−t)·decay) and moves t0 to t) to keep magnitudes
  * bounded. `decay = ln 2 / (duration/2)` gives the reference's
  * `FOR duration` half-life. decay = 0 disables time weighting entirely.
  */
final class DecayedTopState(val capacity: Int, val decay: Double,
    val sigmas: Double) {
  /** key -> (inflated weight, overestimation error) */
  val weights: mutable.HashMap[String, (Double, Double)] = mutable.HashMap.empty
  var t0: Double = Double.NaN
  /** Latest observed event time — the canonical origin [[top]] rebases to,
    * so reported weights are Σ w·exp((t−tMax)·decay): independent of
    * partition boundaries (each partition's t0 is its FIRST event, which
    * is layout-dependent) and exactly reproducible by a SQL oracle. */
  var tMax: Double = Double.NaN
  var sumW: Double = 0.0
  var sumW2: Double = 0.0
  var nW: Long = 0L

  private def rebase(t: Double): Unit = {
    val f = math.exp((t0 - t) * decay)
    weights.mapValuesInPlace { case (_, (w, e)) => (w * f, e * f) }
    sumW *= f; sumW2 *= f * f
    t0 = t
  }

  def observe(key: String, w: Double, t: Double): Unit = {
    if (w == 0.0) return
    tMax = if (tMax.isNaN) t else math.max(tMax, t)
    val infl =
      if (decay == 0.0) 1.0
      else if (t0.isNaN) { t0 = t; 1.0 }
      else {
        val i = math.exp((t - t0) * decay)
        if (i > 1e6) { rebase(t); 1.0 } else i
      }
    val ww = w * infl
    weights.get(key) match {
      case Some((w0, e0)) => weights.update(key, (w0 + ww, e0))
      case None if weights.size < capacity => weights.update(key, (ww, 0.0))
      case None =>
        val (mk, (mw, _)) = weights.minBy { case (k, (w1, _)) => (w1, k) }
        weights.remove(mk)
        weights.update(key, (mw + ww, mw))
    }
    if (sigmas > 0.0) { sumW += ww; sumW2 += ww * ww; nW += 1 }
  }

  def minWeight: Double =
    if (weights.size < capacity) 0.0 else weights.values.iterator.map(_._1).min

  /** Mergeable-summaries rule, with both sides first rebased to the later
    * time origin so inflated units agree. */
  def mergeIn(o: DecayedTopState): Unit = {
    if (decay != 0.0) {
      val target =
        if (t0.isNaN) o.t0
        else if (o.t0.isNaN) t0
        else math.max(t0, o.t0)
      if (!target.isNaN) {
        if (!t0.isNaN) rebase(target) else t0 = target
        if (!o.t0.isNaN) o.rebase(target) else o.t0 = target
      }
    }
    val mThis = minWeight
    val mOther = o.minWeight
    val merged = mutable.HashMap[String, (Double, Double)]()
    weights.foreach { case (k, (w, e)) => merged.update(k, (w + mOther, e + mOther)) }
    o.weights.foreach { case (k, (w, e)) =>
      merged.get(k) match {
        case Some((w0, e0)) => merged.update(k, (w0 - mOther + w, e0 - mOther + e))
        case None => merged.update(k, (w + mThis, e + mThis))
      }
    }
    weights.clear()
    if (merged.size > capacity)
      weights ++= merged.toSeq.sortBy { case (k, (w, _)) => (-w, k) }.take(capacity)
    else weights ++= merged
    sumW += o.sumW; sumW2 += o.sumW2; nW += o.nW
    tMax = if (tMax.isNaN) o.tMax
           else if (o.tMax.isNaN) tMax
           else math.max(tMax, o.tMax)
  }

  /** top-k by (weight desc, key asc) after the sigma cutoff, with weights
    * first rebased to the canonical origin tMax (see [[tMax]]). */
  def top(k: Int): Seq[(String, Double)] = {
    if (decay != 0.0 && !tMax.isNaN && !t0.isNaN && tMax != t0) rebase(tMax)
    val cutoff =
      if (sigmas <= 0.0 || nW == 0L) Double.NegativeInfinity
      else {
        val mean = sumW / nW
        val std = math.sqrt(math.max(0.0, sumW2 / nW - mean * mean))
        mean + sigmas * std
      }
    weights.toSeq.sortBy { case (key, (w, _)) => (-w, key) }
      .filter { case (_, (w, _)) => w >= cutoff }
      .take(k).map { case (key, (w, _)) => (key, w) }
  }
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

/** `graft_topk_decayed(key, weight, time, capacity, k, decay, sigmas)` →
  * array<struct<key:string, w:double>> — RaQL
  * `TOP n x BY w AT TIME t FOR d ABOVE s SIGMAS`. */
case class DecayedTopK(
    first: Expression,
    second: Expression,
    third: Expression,
    capacity: Int,
    k: Int,
    decay: Double,
    sigmas: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecayedTopState]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def createAggregationBuffer(): DecayedTopState =
    new DecayedTopState(capacity, decay, sigmas)

  private def asDouble(v: Any): Double = v match {
    case null => 0.0
    case d: java.lang.Double => d.doubleValue()
    case f: java.lang.Float => f.doubleValue()
    case l: java.lang.Long => l.doubleValue()
    case i: java.lang.Integer => i.doubleValue()
    case x => x.toString.toDouble
  }

  override def update(b: DecayedTopState, row: InternalRow): DecayedTopState = {
    val key = first.eval(row)
    if (key != null) {
      val w = asDouble(second.eval(row))
      val t = asDouble(third.eval(row))
      if (w != 0.0) b.observe(key.toString, w, t)
    }
    b
  }

  override def merge(b: DecayedTopState, o: DecayedTopState): DecayedTopState = {
    b.mergeIn(o); b
  }

  override def eval(b: DecayedTopState): Any =
    new GenericArrayData(b.top(k).map { case (key, w) =>
      InternalRow(UTF8String.fromString(key), w)
    })

  override def serialize(b: DecayedTopState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity); out.writeDouble(b.decay); out.writeDouble(b.sigmas)
    out.writeDouble(b.t0); out.writeDouble(b.tMax)
    out.writeDouble(b.sumW); out.writeDouble(b.sumW2); out.writeLong(b.nW)
    out.writeInt(b.weights.size)
    b.weights.foreach { case (key, (w, e)) =>
      out.writeUTF(key); out.writeDouble(w); out.writeDouble(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DecayedTopState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new DecayedTopState(in.readInt(), in.readDouble(), in.readDouble())
    st.t0 = in.readDouble(); st.tMax = in.readDouble()
    st.sumW = in.readDouble(); st.sumW2 = in.readDouble(); st.nW = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readUTF(); val w = in.readDouble(); val e = in.readDouble()
      st.weights.update(key, (w, e))
      i += 1
    }
    st
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("w", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_decayed"

  override def withNewMutableAggBufferOffset(n: Int): DecayedTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DecayedTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): DecayedTopK =
    copy(first = f, second = s, third = t)
}
