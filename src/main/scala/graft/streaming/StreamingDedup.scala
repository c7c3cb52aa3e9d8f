package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incoming document (streaming dedup input). */
final case class StreamDoc(doc_id: Long, content_hash: String)

/** First-seen emission (streaming dedup output): the admitted document
  * for a content hash (within-batch ties → lowest doc_id). */
final case class KeptDoc(content_hash: String, doc_id: Long)

/** Streaming exact deduplication — q19's batch groupBy as a continuous
  * operator: the FIRST document per content hash is admitted, every later
  * arrival (same batch or any later batch) is suppressed by keyed state.
  *
  * Scale shape: state is one boolean per DISTINCT hash, partitioned by
  * the state store on the same key the batch dedup shuffles on; documents
  * themselves never enter state. At 100 TB-of-stream the state grows with
  * corpus novelty, not volume — [[firstSeen]] keeps exact semantics
  * (unbounded state), [[firstSeenWithTtl]] bounds it with a sliding
  * processing-time TTL (admitting a rare re-emission after expiry); the
  * remaining swap for truly unbounded corpora is an approximate
  * membership filter. `StreamingDedupSpec` pins both: cross-batch and
  * within-batch suppression, and TTL eviction/re-admission.
  */
object StreamingDedup {

  /** Admit the first [[StreamDoc]] per content hash; suppress the rest. */
  def firstSeen(docs: Dataset[StreamDoc]): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, KeptDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (hash: String, batch: Iterator[StreamDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // hash admitted in an earlier batch
          else {
            state.update(true)
            // within-batch duplicates: the earliest doc_id wins,
            // deterministically (batch order is not)
            Iterator(KeptDoc(hash, batch.map(_.doc_id).min))
          }
      }
  }

  /** TTL-bounded variant — the deployment shape for an unbounded stream:
    * a hash unseen for `ttlMillis` of processing time is evicted from
    * state, so a later replay of the SAME content is re-admitted (the
    * approximate-dedup trade every bounded-state deployment makes; the
    * stricter swap is an approximate membership filter, which admits false
    * suppressions instead). The TTL is SLIDING: every sighting — admitted
    * or suppressed — refreshes the clock, so hot duplicates never
    * re-admit while cold state drains.
    *
    * State is the expiry DEADLINE (epoch ms), not a boolean: Spark
    * processes a trigger's data invocations BEFORE its timed-out-state
    * callbacks, so a replay arriving in the first trigger after expiry
    * would see still-live state and be wrongly suppressed (and its
    * refresh would cancel the pending eviction). Carrying the deadline
    * lets the data path judge expiry itself; the timeout callback only
    * garbage-collects keys that never saw another sighting. */
  def firstSeenWithTtl(docs: Dataset[StreamDoc], ttlMillis: Long): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, KeptDoc](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(ttlHandler(ttlMillis))
  }

  /** The [[firstSeenWithTtl]] state-transition function, factored out so
    * `StreamingDedupSpec` can drive it deterministically through Spark's
    * `TestGroupState` (timeout firing is wall-clock-driven inside a real
    * query — the handler contract, not the clock, is what needs pinning). */
  def ttlHandler(ttlMillis: Long)(
      hash: String, batch: Iterator[StreamDoc], state: GroupState[Long]): Iterator[KeptDoc] =
    if (state.hasTimedOut) {
      state.remove() // cold key, no sighting since expiry: garbage-collect
      Iterator.empty
    } else {
      val now = state.getCurrentProcessingTimeMs()
      val live = state.exists && now < state.get
      state.update(now + ttlMillis) // sliding refresh (or fresh admission)
      state.setTimeoutDuration(ttlMillis)
      if (live) Iterator.empty // within TTL: duplicate suppressed
      else Iterator(KeptDoc(hash, batch.map(_.doc_id).min)) // fresh or expired: (re-)admit
    }
}
