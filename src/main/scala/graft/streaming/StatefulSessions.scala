package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed-state sessionization via `flatMapGroupsWithState` — the
  * Spark analogue of the reference's keyed ProcessFunction state (Flink's
  * DataStream API keeps per-key session state explicitly; Spark's typed
  * `KeyValueGroupedDataset` + GroupState is the same programming model).
  *
  * Used where the declarative `session_window` can't express the
  * semantics — here: sessions additionally close after `maxEvents`
  * events (a policy `session_window` has no vocabulary for), and emit a
  * typed summary on close. State per key is one [[SessionState]]; event
  * -time timeout evicts it, so state size is bounded by live keys.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class SessionState(start: Long, last: Long, n: Int, sum: Double)

  case class SessionOut(user_id: Long, sess_start: Long, sess_end: Long,
      n_events: Int, sum_value: Double, closed_by: String)

  /** Sessionize a typed event stream: gap-close (no event for
    * `gapSeconds`) or count-close (`maxEvents` reached).
    *
    * `sess_end` is last-event-time + gap for BOTH close reasons — the
    * same gap-padded end `session_window` reports, kept uniform so a
    * count-closed session's window equals what its gap-closure would
    * have produced (downstream window math never needs to branch on
    * `closed_by`). */
  def sessionize(events: Dataset[Event], gapSeconds: Long, maxEvents: Int)
      : Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(uid: Long, s: SessionState, why: String): SessionOut =
      SessionOut(uid, s.start, s.last + gapSeconds, s.n, s.sum, why)

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _, "gap")).toSeq
            state.remove()
            out.iterator
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val es = e.ts.getTime / 1000
              cur match {
                case Some(s) if es - s.last > gapSeconds =>
                  closed ::= close(uid, s, "gap")
                  cur = Some(SessionState(es, es, 1, e.value))
                case Some(s) =>
                  val grown = SessionState(s.start, math.max(s.last, es), s.n + 1, s.sum + e.value)
                  if (grown.n >= maxEvents) { closed ::= close(uid, grown, "count"); cur = None }
                  else cur = Some(grown)
                case None =>
                  cur = Some(SessionState(es, es, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp((s.last + gapSeconds) * 1000 + 1)
              case None => state.remove()
            }
            closed.reverseIterator
          }
      }
  }
}
