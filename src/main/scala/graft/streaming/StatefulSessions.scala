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

  case class KeyedDoc(key: String, ts: Timestamp, doc_id: Long)

  case class QuotaOut(key: String, ts: Timestamp, doc_id: Long, qrank: Long)

  /** Streaming per-key QUOTA: emit each key's first `quota` documents
    * (ordered by (ts, doc_id) within a micro-batch; across batches, by
    * arrival) and silently drop the rest — the streaming face of
    * [[graft.operators.Sampling.quotaCap]]'s per-domain cap, for the
    * ingest path where the corpus arrives as a stream and the cap must
    * hold online.
    *
    * State is ONE LONG per key — the information-theoretic floor for an
    * exact quota over an unbounded stream (you must remember how many a
    * key has emitted, forever; compare `dropDuplicates`, which holds
    * every seen id). No timeout: an evicted count would silently REOPEN
    * a key's quota, which is the one wrong answer this operator exists
    * to prevent — at web scale the state is #domains × 8 bytes, KBs per
    * million domains. Batch/stream asymmetry is inherent and documented:
    * the batch quotaCap picks a deterministic md5-ordered sample, the
    * stream keeps the first arrivals (an online operator cannot know
    * the md5 order of documents it has not seen). */
  def quotaFirstN(rows: Dataset[KeyedDoc], quota: Int): Dataset[QuotaOut] = {
    require(quota > 0, s"quotaFirstN: quota=$quota")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, batch: Iterator[KeyedDoc], state: GroupState[Long]) =>
          var c = state.getOption.getOrElse(0L)
          // materialize before state.update — the returned iterator is
          // consumed after this function returns, but state writes must
          // reflect every row of THIS batch
          val out = batch.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
            .flatMap { e =>
              if (c < quota) { c += 1; Some(QuotaOut(k, e.ts, e.doc_id, c)) }
              else None
            }
          state.update(c)
          out.iterator
      }
  }

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
