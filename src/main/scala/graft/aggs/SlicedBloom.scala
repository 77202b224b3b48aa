package graft.aggs

import scala.util.hashing.MurmurHash3

/** Time-sliced rotating Bloom filter — the state behind RaQL's
  * `REMEMBER (fpr, t, dur, x)` ("was x seen within the last `dur`
  * seconds?", false positives only).
  *
  * Semantics per the reference (`/root/reference/src/RamenBloomFilter.ml`,
  * 238 LoC): the remembering window is covered by `nSlices` Bloom filters,
  * each owning `dur / nSlices` seconds; inserts go to the slice of the
  * event's time; queries OR across all live slices; slices older than `dur`
  * are dropped. Sizing from the requested false-positive rate and the
  * expected insertions per slice.
  *
  * Used by the streaming dedup harness ([[graft.streaming]]), where one
  * instance lives per group key inside flatMapGroupsWithState — constant
  * memory per key regardless of stream length, which is the point at
  * 100 TB: exact seen-sets grow without bound, sliced blooms don't.
  */
final class SlicedBloom(
    fpr: Double,
    expectedPerSlice: Int,
    val sliceDur: Double,
    val nSlices: Int = 10) extends Serializable {

  // standard sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2
  private val mBits: Int = math.max(64,
    math.ceil(-expectedPerSlice * math.log(fpr) / (math.log(2) * math.log(2))).toInt)
  private val kHashes: Int = math.max(1,
    math.round(mBits.toDouble / expectedPerSlice * math.log(2)).toInt)

  /** slice index -> bitset; slices are consecutive time buckets */
  private var slices: Map[Long, java.util.BitSet] = Map.empty

  private def sliceOf(time: Double): Long = math.floor(time / sliceDur).toLong

  private def bits(key: String): Array[Int] = {
    val h1 = MurmurHash3.stringHash(key, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(key, 0x85ebca6b)
    Array.tabulate(kHashes)(i => math.floorMod(h1 + i * h2, mBits))
  }

  private def dropOld(now: Double): Unit = {
    val oldest = sliceOf(now) - nSlices
    if (slices.keys.exists(_ < oldest)) slices = slices.filter(_._1 >= oldest)
  }

  /** Query-and-insert: returns whether `key` was (probably) seen within the
    * window ending at `time`, then records it. */
  def rememberAndAdd(time: Double, key: String): Boolean = {
    dropOld(time)
    val idxs = bits(key)
    val seen = slices.values.exists(bs => idxs.forall(bs.get))
    val s = sliceOf(time)
    val bs = slices.getOrElse(s, {
      val fresh = new java.util.BitSet(mBits)
      slices += s -> fresh
      fresh
    })
    idxs.foreach(bs.set)
    seen
  }

  def approxBits: Int = mBits
  def hashCount: Int = kHashes
}
