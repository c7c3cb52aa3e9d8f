package graft.streaming

import graft.sketch.KmvSketch
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed observation whose distinct values are being counted. */
final case class KeyedValue(key: String, value_hash: Long)

/** Per-key running distinct estimate after a micro-batch. */
final case class DistinctEstimate(key: String, estimate: Double, state_size: Int)

/** Streaming distinct-count per key with BOUNDED sketch state — the
  * continuous form of q57's KMV distinct and the composition the sketch
  * family exists for: the same mergeable ≤k-longs [[KmvSketch.State]]
  * that q77 persists per shard lives here in the streaming state store,
  * updated per micro-batch by the aggregator's own insert path and
  * emitting a refreshed estimate per key per batch.
  *
  * Why this and not `approx_count_distinct` in a streaming agg:
  * Structured Streaming's aggregation state for distinct-style queries
  * is either exact (state grows with distinct values — unbounded on an
  * unbounded stream) or opaque; the KMV state is EXPLICIT, bounded at
  * k longs per key forever, inspectable (`state_size`), and the exact
  * same bytes a batch re-sketch or a q77-style shard rollup would
  * produce — stream and batch estimates can be reconciled value-for-
  * value below k (where the sketch IS the distinct set).
  *
  * Scale shape: state = one ≤k-long sorted array per key, partitioned
  * by the state store on the grouping key; values never enter state.
  * `StreamingDistinctSpec` pins: below-k exactness vs a batch distinct,
  * cross-batch accumulation, duplicate suppression, and the k-long
  * state cap under cardinality far past k.
  */
object StreamingDistinct {

  val DefaultK = 256

  /** Update mode: each batch emits the refreshed estimate for every key
    * it touched. */
  def estimates(values: Dataset[KeyedValue], k: Int = DefaultK): Dataset[DistinctEstimate] = {
    import values.sparkSession.implicits._
    val agg = new KmvSketch.KmvAggregator(k)
    values
      .groupByKey(_.key)
      .mapGroupsWithState[KmvSketch.State, DistinctEstimate](
        GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[KeyedValue], state: GroupState[KmvSketch.State]) =>
          val prior = state.getOption.getOrElse(agg.zero)
          val updated = batch.foldLeft(prior)((s, v) => agg.reduce(s, v.value_hash))
          state.update(updated)
          DistinctEstimate(key, agg.finish(updated), updated.mins.length)
      }
  }
}
