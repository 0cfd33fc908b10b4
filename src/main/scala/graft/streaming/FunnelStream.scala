package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Analytics.funnelMatch]] — the CEP
  * funnel advanced per event with `flatMapGroupsWithState`: the SAME
  * latest-start DP, so per-key state is the k chain-start slots plus a
  * done flag — O(k) longs FOREVER, independent of how many events the key
  * ever produces. That state bound is the whole point of running the DP
  * streaming: a join-based funnel would have to retain every in-window
  * event per key.
  *
  * Emits exactly one row per key, the first time its funnel completes.
  * Within a micro-batch events are sorted by (ts, id) before folding;
  * across batches the fold assumes per-key event-time order up to the
  * pipeline's watermark discipline (same contract as the sessionizer).
  */
object FunnelStream {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long, step: Int)
  case class FunnelState(starts: List[Long], done: Boolean)
  case class Completion(user_id: Long, first_completion: Long)

  /** `steps` indexes arrive pre-mapped (filter + step lookup are plain
    * column ops on the caller's side); `k` is the number of steps. CEP
    * negation uses the batch DP's sentinel: events with `step == k` are
    * BLOCKERS and reset every in-progress chain slot (a chain completing
    * later provably restarted after the blocker — exactly
    * [[graft.operators.Analytics.funnelMatch]]'s rule, so stream and batch
    * stay equal on replayed logs; spec'd in FunnelStreamSpec).
    */
  def funnelStream(events: Dataset[Ev], k: Int, windowUs: Long): Dataset[Completion] = {
    import events.sparkSession.implicits._
    require(k >= 2, "funnel needs at least two steps")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Completion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          val st0 = state.getOption.getOrElse(
            FunnelState(List.fill(k)(-1L), done = false))
          if (st0.done) Iterator.empty
          else {
            var starts = st0.starts.toArray
            var done = -1L
            it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              if (done < 0 && e.step == k) {
                java.util.Arrays.fill(starts, -1L) // blocker: reset all slots
              } else if (done < 0 && e.step >= 0 && e.step < k) {
                if (e.step == 0) starts(0) = e.ts_us // monotone ⇒ always later
                else {
                  val prev = starts(e.step - 1)
                  if (prev >= 0 && e.ts_us - prev <= windowUs) {
                    if (e.step == k - 1) done = e.ts_us
                    else if (prev > starts(e.step)) starts(e.step) = prev
                  }
                }
              }
            }
            state.update(FunnelState(starts.toList, done >= 0))
            if (done >= 0) Iterator(Completion(userId, done))
            else Iterator.empty
          }
      }
  }
}
