package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming exact dedup on the `transformWithState` API (the Spark-4
  * arbitrary-state operator, SPARK-46815): the modern successor of
  * [[StreamingDedup]], kept side by side deliberately —
  *
  *   - state TTL is NATIVE ([[TTLConfig]]): the store expires cold keys
  *     itself, replacing `firstSeenWithTtl`'s hand-carried deadline
  *     state and its subtle data-before-timeout ordering trap (see that
  *     scaladoc) with a declarative retention knob;
  *   - the operator REQUIRES the RocksDB state-store provider — the
  *     same deployment config `RocksDbStateSpec` proves — so state is
  *     disk-bounded by construction;
  *   - schema evolution of state types is supported by the engine, not
  *     by hand-rolled migration.
  *
  * Semantics are pinned IDENTICAL to [[StreamingDedup.firstSeen]] by
  * `StreamingDedupTwsSpec` (same fixture, same admissions): first
  * [[StreamDoc]] per content hash is admitted (within-batch ties →
  * lowest doc_id), every later sighting is suppressed until TTL expiry
  * re-admits a replay — the same approximate-dedup trade, now enforced
  * by the store. */
object StreamingDedupTws {

  /** Keyed by content hash; ValueState[Boolean] + native TTL. */
  class DedupProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, StreamDoc, KeptDoc] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)

    override def handleInputRows(key: String, rows: Iterator[StreamDoc],
        timerValues: TimerValues): Iterator[KeptDoc] =
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        Iterator.single(KeptDoc(key, rows.map(_.doc_id).min))
      }
  }

  /** First-seen admission; `ttl` bounds state retention (NONE = exact).
    * A real TTL REQUIRES ProcessingTime mode — Spark's
    * `validateTTLConfig` throws for any non-NONE TTL under
    * `TimeMode.None()` (the [[StreamingNearDupTws]] dispatch, applied
    * here after review caught the hardcoded mode). */
  def firstSeen(docs: Dataset[StreamDoc],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    val timeMode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    docs
      .groupByKey(_.content_hash)
      .transformWithState(new DedupProcessor(ttl), timeMode, OutputMode.Append())
  }
}
