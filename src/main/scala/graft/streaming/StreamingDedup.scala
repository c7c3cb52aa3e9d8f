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
  * corpus novelty, not volume — and a real deployment bounds it with
  * `GroupStateTimeout`/TTL (admitting a rare re-emission after expiry) or
  * swaps the exact state for an approximate membership filter; this
  * operator keeps exact semantics, which `StreamingDedupSpec` pins
  * across batches and duplicates-within-a-batch.
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
}
