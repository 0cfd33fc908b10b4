package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state streaming operator
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`), with a batch twin that
  * is oracle-checkable SQL (lag-gap boundary flags + running sum).
  *
  * Semantics (both paths): events of one user sorted by (ts, event_id); a gap
  * of more than `gapUs` microseconds starts a new session; a session reports
  * its event count, span, and value sum.
  */
object Sessionize {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                        start_us: Long, end_us: Long, sum_value: Double)

  /** Batch formulation: one window pass (boundary flag → running sum =
    * session index) + one aggregation. Both shuffles key on user — at scale
    * the sort/agg pipeline is linear and partition-local per user.
    */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val withIdx = events
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts_us") - col("__prev") > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withIdx.groupBy("user_id", "session_idx").agg(
      count(lit(1)).as("n_events"),
      min("ts_us").as("start_us"), max("ts_us").as("end_us"),
      sum("value").as("sum_value"))
  }

  /** Streaming formulation: per-user open-session state; each closed session
    * is emitted as soon as the event that starts the next one arrives. The
    * final open session per user stays in state (it would be flushed by a
    * timeout in production — `GroupStateTimeout` is wired; the spec compares
    * emitted-closed sessions against the batch twin).
    */
  def sessionizeStream(events: Dataset[Ev], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, SessionState)], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[List[(Long, SessionState)]]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var (idx, open) = state.getOption.flatMap(_.headOption)
            .map { case (i, s) => (i, Option(s)) }.getOrElse((0L, Option.empty[SessionState]))
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_us - s.lastUs <= gapUs =>
                open = Some(s.copy(lastUs = e.ts_us, n = s.n + 1, sum = s.sum + e.value))
              case Some(s) =>
                out += SessionOut(userId, idx, s.n, s.startUs, s.lastUs, s.sum)
                idx += 1
                open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
              case None =>
                open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
            }
          }
          open.foreach(s => state.update(List((idx, s))))
          out.iterator
      }
  }
}
