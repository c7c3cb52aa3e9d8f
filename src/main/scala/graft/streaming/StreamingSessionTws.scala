package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One user's click/event for session assembly. */
final case class SessionEvent(user_id: Long, event_type: String, ts: Timestamp)

/** A CLOSED session: emitted exactly once, when the watermark passes
  * `last_ts + gap`. `prefix` is the first [[StreamingSessionTws.PrefixCap]]
  * event types — event-time-sorted within each micro-batch and folded in
  * batch order, so with the default zero watermark delay (late rows
  * dropped) the prefix is globally event-time ordered; a nonzero delay
  * lets an in-allowance straggler append at its ARRIVAL position (the
  * bounded trace a funnel/UX analysis reads either way). */
final case class SessionSummary(user_id: Long, start_ts: Timestamp,
    last_ts: Timestamp, n_events: Long, prefix: Seq[String])

/** Session-gap assembly with EVENT-TIME TIMER EMISSION — the output half
  * of the `transformWithState` timer API ([[StreamingDedupEventTime]]
  * exercises the eviction half; here `handleExpiredTimer` produces the
  * operator's actual output rows).
  *
  * Why not the built-in `session_window` aggregation (which the engine
  * also ships — `SessionWindowSpec`): an aggregate merges commutative
  * state, so an ORDERED, BOUNDED event trace is outside its vocabulary —
  * `collect_list` inside a session agg grows with session length, and a
  * bot session (the exact thing a trace analysis hunts) is unbounded.
  * Custom state holds the first [[PrefixCap]] event types plus counters:
  * per-key state is O(PrefixCap) however long the session runs — the
  * bound that keeps 100 TB of clickstream sessionization proportional to
  * CONCURRENT users, never to history or to session length.
  *
  * Mechanics: each arriving batch of a user's events (within-batch rows
  * sorted by (ts, event_type) — micro-batch iterator order is not
  * event-time order) folds into the open-session state; the one live
  * timer (register-new-delete-old, [[StreamingDedupEventTime]]'s device)
  * sits at `last_ts + gap`. Events inside the gap EXTEND the session and
  * push the timer; when the watermark passes the deadline the timer
  * fires, `handleExpiredTimer` EMITS the [[SessionSummary]], and state
  * clears — the next event starts a fresh session. Late rows behind the
  * watermark are dropped by the watermark operator (the standard
  * event-time contract); a row that arrives inside the gap but in a
  * later batch merges, exactly like the built-in's gap merge.
  *
  * Requires the RocksDB provider; semantics, cross-batch merge,
  * watermark-driven emission, and restart stability are pinned by
  * `StreamingSessionTwsSpec`. */
object StreamingSessionTws {

  /** Bounded event-trace prefix per session. */
  val PrefixCap = 8

  private final case class Open(start: Long, last: Long, n: Long, prefix: Seq[String])

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, SessionSummary] {
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Open]("open",
        Encoders.product[Open], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val batch = rows.toArray.sortBy(e => (e.ts.getTime, e.event_type))
      val prev = if (open.exists()) Some(open.get()) else None
      val merged = batch.foldLeft(prev) { (st, e) =>
        val t = e.ts.getTime
        st match {
          case Some(o) => Some(Open(math.min(o.start, t), math.max(o.last, t), o.n + 1,
            if (o.prefix.length < PrefixCap) o.prefix :+ e.event_type else o.prefix))
          case None => Some(Open(t, t, 1L, Seq(e.event_type)))
        }
      }
      merged.foreach { o =>
        prev.foreach(p => getHandle.deleteTimer(p.last + gapMs))
        getHandle.registerTimer(o.last + gapMs)
        open.update(o)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] =
      if (open.exists() && expiredTimerInfo.getExpiryTimeInMs() >= open.get().last + gapMs) {
        val o = open.get()
        open.clear()
        Iterator.single(SessionSummary(key, new Timestamp(o.start),
          new Timestamp(o.last), o.n, o.prefix))
      } else Iterator.empty // a stale timer an extension raced — session still open
  }

  /** Assemble gap-closed sessions; emission is watermark-driven (append
    * semantics — each session exactly once). */
  def sessions(events: Dataset[SessionEvent], gap: java.time.Duration,
      watermarkDelay: String = "0 seconds"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gap.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
