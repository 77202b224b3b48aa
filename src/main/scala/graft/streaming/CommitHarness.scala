package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Generic runtime for RaQL's `Aggregate` commit semantics in Structured
  * Streaming — the piece Spark's built-in windowed aggregation can't
  * express: arbitrary `COMMIT AFTER/BEFORE cond` over (input, group state),
  * `KEEP`/`FLUSH`, and `previous` (last committed output of the group).
  *
  * Reference semantics: `/root/reference/src/CodeGenLib_Skeletons.ml:
  * 433-930` — per input tuple: find group → update state → check commit
  * condition → emit, then KEEP or FLUSH the state. The common time-based
  * case (`COMMIT BEFORE in.start >= out.stop`, tumbling windows —
  * `tests/func/tumbling.ramen`) maps to [[GroupSpec.commitBefore]]: when
  * the predicate fires on the incoming tuple, the *current* state is
  * emitted first and then reset before the update — exactly the
  * reference's COMMIT BEFORE.
  *
  * Scale notes: state lives in Spark's state store (RocksDB-backed on a
  * real cluster), partitioned by group key — the same sharding the
  * reference does per-worker, but elastic and fault-tolerant via
  * checkpointing. An event-time timeout (watermark) bounds state for groups
  * that stop receiving data — the cross-group commit scan of the reference
  * (`check_commit_for_all`) becomes the watermark timeout firing per key.
  */
final case class GroupSpec[I, S, O](
    init: () => S,
    update: (S, I) => S,
    /** COMMIT AFTER: checked on the post-update state; emit then keep/flush.
      * The third argument is the group's last committed output (RaQL
      * `previous.*` — None before the first commit), so conditions may read
      * feedback values exactly like the reference's commit clause. */
    commitAfter: (S, I, Option[O]) => Boolean = (_: S, _: I, _: Option[O]) => false,
    /** COMMIT BEFORE: checked against the pre-update state with the incoming
      * tuple (and the last committed output); emits the previous state,
      * flushes, then applies the update. */
    commitBefore: (S, I, Option[O]) => Boolean = (_: S, _: I, _: Option[O]) => false,
    emit: (S, Option[O]) => O,
    /** KEEP (true) or FLUSH (false) the state on commit. */
    keepOnCommit: Boolean = false,
    /** Emit whatever state remains when the group times out (event-time
      * timeout via watermark) — end-of-stream flush for tumbling windows. */
    emitOnTimeout: Boolean = true)

object CommitHarness {

  /** Internal state wrapper carrying the group's last committed output
    * (RaQL's `previous` / `local_last_out`). */
  final case class GState[S, O](state: S, hasData: Boolean, previous: Option[O])

  /** Run the commit harness over a (possibly streaming) Dataset.
    *
    * Timeout modes:
    *  - `eventTimeMs` defined (+ `timeoutMs` > 0): EVENT-TIME timeout — the
    *    group flushes when the query watermark passes (last event time seen
    *    by the group + timeoutMs). This is the reference's cross-group
    *    commit (`check_commit_for_all`, CodeGenLib_Skeletons.ml:814-876):
    *    event-time monotone, correct under replay/backfill at any speed.
    *    The caller must define a watermark upstream
    *    (`df.withWatermark(...)` before this call).
    *  - `eventTimeMs` empty (+ `timeoutMs` > 0): processing-time timeout —
    *    wall-clock state expiry for live low-rate sources with no usable
    *    event time.
    */
  def run[K, I, S, O](
      input: Dataset[I],
      keyFn: I => K,
      spec: GroupSpec[I, S, O],
      timeoutMs: Long = -1L,
      eventTimeMs: Option[I => Long] = None)(implicit
      ek: Encoder[K], ei: Encoder[I], es: Encoder[GState[S, O]],
      eo: Encoder[O]): Dataset[O] = {

    val timeout =
      if (eventTimeMs.isDefined && timeoutMs > 0) GroupStateTimeout.EventTimeTimeout()
      else if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    input.groupByKey(keyFn).flatMapGroupsWithState[GState[S, O], O](
      OutputMode.Append(), timeout) {
      (_: K, rows: Iterator[I], gs: GroupState[GState[S, O]]) =>
        if (gs.hasTimedOut) {
          val st = gs.get
          gs.remove()
          if (spec.emitOnTimeout && st.hasData)
            Iterator.single(spec.emit(st.state, st.previous))
          else Iterator.empty
        } else {
          var st = gs.getOption.getOrElse(
            GState[S, O](spec.init(), hasData = false, None))
          val out = scala.collection.mutable.ArrayBuffer[O]()
          var maxEventMs = Long.MinValue
          rows.foreach { row =>
            eventTimeMs.foreach(f => maxEventMs = math.max(maxEventMs, f(row)))
            // COMMIT BEFORE: emit prior state, flush, then update
            if (st.hasData && spec.commitBefore(st.state, row, st.previous)) {
              val o = spec.emit(st.state, st.previous)
              out += o
              st = GState(
                if (spec.keepOnCommit) st.state else spec.init(),
                hasData = spec.keepOnCommit, previous = Some(o))
            }
            val updated = spec.update(st.state, row)
            st = st.copy(state = updated, hasData = true)
            // COMMIT AFTER: emit the post-update state
            if (spec.commitAfter(st.state, row, st.previous)) {
              val o = spec.emit(st.state, st.previous)
              out += o
              st = GState(
                if (spec.keepOnCommit) st.state else spec.init(),
                hasData = spec.keepOnCommit, previous = Some(o))
            }
          }
          gs.update(st)
          if (timeoutMs > 0) eventTimeMs match {
            case Some(_) =>
              // flush when the watermark passes last-seen + timeout; the
              // timestamp must stay ahead of the current watermark
              val target =
                if (maxEventMs == Long.MinValue) gs.getCurrentWatermarkMs() + timeoutMs
                else maxEventMs + timeoutMs
              gs.setTimeoutTimestamp(math.max(target, gs.getCurrentWatermarkMs() + 1))
            case None => gs.setTimeoutDuration(timeoutMs)
          }
          out.iterator
        }
    }
  }
}
