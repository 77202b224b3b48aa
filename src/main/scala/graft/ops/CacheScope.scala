package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Caller-owned registry of the frames a composite operator persists
  * internally, so the caller can release EXACTLY those frames when the
  * composed result is materialized.
  *
  * Why: operators like [[Dedup.verifyJaccard]] (restrict-to-candidates
  * pair frame), [[KMeans.semanticDedupTrained]] (assignment frame) and
  * [[Similarity.ivfPqTopKTrained]] (assignment frame) persist an internal
  * DataFrame that several plan subtrees consume. The frame is an
  * implementation detail the caller never sees, so before this class the
  * only way to release it eagerly was `spark.catalog.clearCache()` —
  * which in a SHARED session (a streaming trigger loop, a long-lived
  * service) evicts every UNRELATED cached frame too. A scope threads
  * through the operator, records what it persisted, and `release()`
  * unpersists precisely that set.
  *
  * The default argument everywhere is [[CacheScope.untracked]], which
  * persists without recording — byte-identical to the pre-scope behavior
  * (the frame stays cached until Spark's LRU evicts it), so existing
  * callers are unaffected until they opt in.
  */
final class CacheScope private[ops] (track: Boolean) {
  private val drops = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Persist `df` (MEMORY_AND_DISK — the level every internal operator
    * frame uses: spills at corpus scale rather than recomputing) and, in
    * a tracking scope, record it for [[release]]. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    if (track) synchronized { drops += (() => p.unpersist()) }
    p
  }

  /** Eagerly `localCheckpoint` `df` and, in a tracking scope, record the
    * checkpointed blocks for [[release]]. The stage-boundary cut for deep
    * composed pipelines (p04/p05): unlike [[persist]]'s InMemoryRelation
    * — whose plan STRING embeds the whole cached subtree, so nested cuts
    * make every AQE plan-string render quadratic in pipeline depth
    * (measured r17: the composed-p05 equivalence check pinned a core for
    * >15 min inside TreeNode.generateTreeString) — a checkpoint is a true
    * LogicalRDD leaf. CAUTION: released blocks are the frame's ONLY copy
    * (no lineage); `release()` only after every consumer of the cut
    * frames has fully materialized. */
  private[graft] def checkpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    if (track) cp.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val rdd = lr.rdd
        synchronized { drops += (() => { rdd.unpersist(false); () }) }
      case _ => () // not a checkpoint leaf (future-proofing): nothing to drop
    }
    cp
  }

  /** Release exactly what this scope tracked (non-blocking) and forget
    * it. Idempotent; a fresh operator call on the same scope starts
    * tracking again. */
  def release(): Unit = synchronized {
    drops.foreach(_())
    drops.clear()
  }
}

object CacheScope {
  /** Fresh tracking scope — `release()` when the composed result is
    * materialized. */
  def apply(): CacheScope = new CacheScope(true)

  /** Persists without tracking: frames stay cached until LRU eviction —
    * the right default for one-shot batch sessions where the cache IS the
    * reuse mechanism. */
  val untracked: CacheScope = new CacheScope(false)
}
