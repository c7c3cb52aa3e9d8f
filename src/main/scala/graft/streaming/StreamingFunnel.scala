package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the q75 strict-order funnel
  * ([[graft.sql.RelationalQueries.q75EventFunnel]]): a per-user stage
  * machine (0 → view → click → purchase) that advances exactly when the
  * next-required event type arrives and emits one [[StreamingFunnel.Advance]]
  * row per transition — live conversion dashboards consume the transitions,
  * while the batch q75 recomputes the same stages corpus-wide (greedy
  * first-match over an ordered stream reaches a stage iff the batch
  * first-view/first-click-after/first-purchase-after chain does, so the two
  * agree on stages reached; `StreamingFunnelSpec` pins that equivalence on
  * the q75 fixture).
  *
  * 100 TB shape: state is ONE Int per user that has ever advanced —
  * orders of magnitude below the per-event window state a naive streaming
  * join would hold; completed funnels (stage 3) stop updating and a
  * production deployment would add a state TTL exactly like
  * [[StreamingDedup.firstSeenWithTtl]] does for the dedup hashes. Events
  * inside one micro-batch sort by event time per key; cross-batch order is
  * the stream's arrival order, the same at-least-once queue contract the
  * ingest path documents. */
object StreamingFunnel {

  case class Ev(userId: Long, eventType: String, ts: Timestamp)

  /** One row per stage transition: stage 1 = view, 2 = click, 3 = purchase. */
  case class Advance(userId: Long, stage: Int, ts: Timestamp)

  private val Wanted = Array("view", "click", "purchase")

  def advances(events: Dataset[Ev]): Dataset[Advance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Int, Advance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[Int]) =>
          var stage = state.getOption.getOrElse(0)
          val out = scala.collection.mutable.ListBuffer.empty[Advance]
          // a micro-batch delivers a key's events unordered — sort by event
          // time so within-batch progression matches the batch semantics
          batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (stage < Wanted.length && e.eventType == Wanted(stage)) {
              stage += 1
              out += Advance(uid, stage, e.ts)
            }
          }
          state.update(stage)
          out.iterator
      }
  }
}
