package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One keyed observation of a monitored metric (a per-interval event
  * count, a quality-gate pass rate ×10⁶ — any integer-scaled series). */
final case class CusumPoint(key: String, ts: Timestamp, value: Long)

/** One level-shift alert: emitted exactly once, when the one-sided Page
  * statistic first crosses the threshold; the detector then RESETS and
  * re-arms, so a persisting shift re-alerts after it re-accumulates. */
final case class CusumAlert(key: String, ts: Timestamp, direction: String,
    stat: Long, n_since_reset: Long)

/** Sequential CUSUM changepoint detection (Page 1954, the two-sided
  * tabular form) as a `transformWithState` operator — the ONLINE half of
  * q209: the batch card answers "when did the rate change" retrospectively
  * (global argmax over the whole series); this operator answers it WHILE
  * the stream runs, with O(1) state per key, which is the form a live
  * ingest monitor (source drift, quality-gate regression, rate collapse)
  * actually deploys.
  *
  * Statistic: S⁺ ← max(0, S⁺ + (x − μ₀ − κ)), S⁻ ← max(0, S⁻ + (μ₀ − x
  * − κ)); an alert fires the first time either side EXCEEDS h, then both
  * sides reset (the standard re-arm convention). All arithmetic is Long —
  * exact, no float drift across checkpointed restarts — so callers scale
  * rational μ₀/κ/h through their integer encoding (q209's n-multiply
  * device).
  *
  * Completes the TWS family's shape coverage: eviction timers
  * ([[StreamingDedupEventTime]]), emission timers ([[StreamingSessionTws]]),
  * update-mode estimates ([[StreamingDistinctTws]]) — and here the pure
  * ACCUMULATOR shape: bounded ValueState folded in event-time order,
  * output only on threshold crossings (append semantics, each alert
  * exactly once). Within a micro-batch rows fold sorted by (ts, value);
  * across batches the fold is arrival order, the same contract
  * [[StreamingSessionTws]]'s prefix documents — with in-order feeds
  * (or any single-batch replay) the alert set equals the batch reference
  * [[StreamingCusum.batchAlerts]], pinned by `StreamingCusumSpec` along
  * with RocksDB restart stability.
  *
  * 100 TB shape: state is three longs per key regardless of history —
  * proportional to MONITORED KEYS, never to the stream; a non-NONE TTL
  * (ProcessingTime mode, [[StreamingDistinctTws]]'s dispatch) lets a
  * key silent past the window re-arm from zero, the retention knob for
  * unbounded key churn. */
object StreamingCusum {

  /** (S⁺, S⁻, observations since last reset). */
  final case class Arm(sPos: Long, sNeg: Long, n: Long)

  /** The Page step shared verbatim by the streaming processor and the
    * batch reference — one definition, so the parity the spec pins can
    * never drift. Input must already be (ts, value)-sorted. */
  private[streaming] def fold(st0: Arm, sorted: Array[CusumPoint],
      mu0: Long, slack: Long, threshold: Long): (Arm, Seq[CusumAlert]) = {
    var st = st0
    val alerts = Seq.newBuilder[CusumAlert]
    sorted.foreach { p =>
      val sPos = math.max(0L, st.sPos + (p.value - mu0 - slack))
      val sNeg = math.max(0L, st.sNeg + (mu0 - p.value - slack))
      val n = st.n + 1
      if (sPos > threshold || sNeg > threshold) {
        val up = sPos >= sNeg
        alerts += CusumAlert(p.key, p.ts, if (up) "up" else "down",
          math.max(sPos, sNeg), n)
        st = Arm(0L, 0L, 0L) // re-arm
      } else st = Arm(sPos, sNeg, n)
    }
    (st, alerts.result())
  }

  class CusumProcessor(mu0: Long, slack: Long, threshold: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, CusumPoint, CusumAlert] {
    @transient private var arm: ValueState[Arm] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      arm = getHandle.getValueState[Arm]("arm", Encoders.product[Arm], ttl)

    override def handleInputRows(key: String, rows: Iterator[CusumPoint],
        timerValues: TimerValues): Iterator[CusumAlert] = {
      // micro-batch iterator order is not event-time order: sort the
      // batch (bounded by batch size) before folding
      val batch = rows.toArray.sortBy(p => (p.ts.getTime, p.value))
      val st0 = if (arm.exists()) arm.get() else Arm(0L, 0L, 0L)
      val (st, alerts) = fold(st0, batch, mu0, slack, threshold)
      arm.update(st)
      alerts.iterator
    }
  }

  /** Append-mode alerts; μ₀/κ/h in the caller's integer scale. */
  def alerts(points: Dataset[CusumPoint], mu0: Long, slack: Long,
      threshold: Long, ttl: TTLConfig = TTLConfig.NONE): Dataset[CusumAlert] = {
    import points.sparkSession.implicits._
    val timeMode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    points
      .groupByKey(_.key)
      .transformWithState(new CusumProcessor(mu0, slack, threshold, ttl),
        timeMode, OutputMode.Append())
  }

  /** Batch reference: the same per-key fold in strict (ts, value) order —
    * what the streaming operator converges to under in-order delivery.
    * Per key one sort inside `flatMapGroups`; state is O(1), the group
    * iterator streams. */
  def batchAlerts(points: Dataset[CusumPoint], mu0: Long, slack: Long,
      threshold: Long): Dataset[CusumAlert] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (_, it) =>
      val sorted = it.toArray.sortBy(p => (p.ts.getTime, p.value))
      fold(Arm(0L, 0L, 0L), sorted, mu0, slack, threshold)._2
    }
  }
}
