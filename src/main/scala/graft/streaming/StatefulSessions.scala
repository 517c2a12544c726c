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

  case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)

  case class TransEvent(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)

  case class TransState(es: Long, tie: Long, event_type: String)

  case class TransPair(user_id: Long, prev_type: String, event_type: String,
      es: Long)

  /** Streaming user-journey transitions — the online face of
    * [[graft.operators.Behavior.transitionCounts]]: emit one
    * (prev_type, event_type) pair row per consecutive event of a user,
    * ordered by (ts, event_id) within each micro-batch with the
    * predecessor carried ACROSS batches in state. Aggregating the
    * emitted pairs equals the batch operator's counts on an in-order
    * stream (asserted in StreamingSpec); a late event pairs against the
    * newest predecessor instead of its in-order one — the same
    * cannot-rewind asymmetry [[funnelStages]] documents.
    *
    * State is ONE (es, tie, type) row per user — the floor for an
    * online pair emitter, and the streaming answer to the batch
    * operator's hot-user problem: a 10⁹-event user costs the same 3
    * fields as everyone else. Deliberately NO timeout: evicting state
    * would silently swallow the next transition (the resumed user's
    * first event would look like a journey start), the one wrong answer
    * this operator must never give. */
  def transitionPairs(events: Dataset[TransEvent]): Dataset[TransPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TransEvent], state: GroupState[TransState]) =>
          var st = state.getOption.orNull
          val out = List.newBuilder[TransPair]
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val es = e.ts.getTime / 1000
            if (st != null)
              out += TransPair(uid, st.event_type, e.event_type, es)
            st = TransState(es, e.event_id, e.event_type)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class FunnelState(stage: Int, lastEs: Long)

  case class FunnelReach(user_id: Long, stage_idx: Int, stage: String,
      reach_es: Long)

  /** Streaming ordered-funnel progression — the online face of
    * [[graft.operators.Behavior.funnelReach]]: emit a row each time a
    * user ADVANCES a stage (stage k's event at a strictly later SECOND
    * than stage k−1's reach). Precision caveat: this operator compares
    * epoch SECONDS (`ts.getTime / 1000`) while the batch operator
    * compares the raw ts column at full precision — the two funnels are
    * equivalent only on sources whose timestamps are second-truncated
    * (the Tables.events contract; asserted in StreamingSpec). On a
    * sub-second source, an event 400 ms after the previous reach
    * advances the batch funnel but not this one — truncate upstream or
    * keep both funnels on the same clock before comparing them.
    * State is one (stage, lastEs) pair per user —
    * 12 bytes, the floor for an online funnel — and deliberately has NO
    * timeout: evicting it would silently restart a user's funnel, the
    * one wrong answer this operator must never give.
    *
    * Greedy-in-time-order IS the batch semantics: the batch operator's
    * earliest-after-previous match is exactly what a single pass in
    * event-time order produces, so on an in-order stream (micro-batches
    * sorted internally by (ts, user's arrival)) the emitted reach set
    * equals the batch funnel's — asserted in StreamingSpec. A LATE
    * event (earlier ts than an already-taken reach) cannot rewind state;
    * that asymmetry is inherent to online processing and documented
    * here rather than papered over. */
  def funnelStages(events: Dataset[TypedEvent], stages: Seq[String])
      : Dataset[FunnelReach] = {
    require(stages.nonEmpty && stages.distinct == stages,
      "funnelStages: stages must be non-empty and distinct")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1, Long.MinValue))
          val out = List.newBuilder[FunnelReach]
          batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val es = e.ts.getTime / 1000
            if (st.stage + 1 < stages.length &&
                e.event_type == stages(st.stage + 1) &&
                (st.stage < 0 || es > st.lastEs)) {
              st = FunnelState(st.stage + 1, es)
              out += FunnelReach(uid, st.stage, stages(st.stage), es)
            }
          }
          state.update(st)
          out.result().iterator
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
