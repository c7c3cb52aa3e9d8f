package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One held bucket representative (TWS list-state element). */
final case class BucketEntry(doc_id: Long, sig: Array[Long])

/** Streaming MinHash-LSH near-dup on the `transformWithState` API — the
  * Spark-4 successor of [[StreamingNearDup]], kept side by side like
  * [[StreamingDedupTws]] vs [[StreamingDedup]]:
  *
  *   - the per-bucket representatives live in a native [[ListState]]
  *     instead of a hand-encoded `List` value, so the store persists
  *     each entry as its own row (RocksDB-backed, disk-bounded);
  *   - the recall window is a declarative [[TTLConfig]]: stale
  *     representatives expire in the store itself, replacing the
  *     "deployment swap to the firstSeenWithTtl deadline pattern" the
  *     classic operator's scaladoc could only describe;
  *   - the FIFO cap stays application logic (TTL bounds AGE, the cap
  *     bounds WIDTH — a hot bucket needs both).
  *
  * The stateless front (signature → 32×3 banding → bucket keys) is the
  * classic operator's own functions, so the (band, sig) keys remain
  * bit-identical to the batch pipeline by construction;
  * `StreamingNearDupTwsSpec` pins emissions identical to
  * [[StreamingNearDup.detect]] on the same fixture and proves the
  * per-bucket state bound behaviorally (a flooded bucket scores new
  * arrivals against exactly [[StreamingNearDup.BucketCap]] survivors). */
object StreamingNearDupTws {

  import StreamingNearDup.{BucketArrival, BucketCap, DefaultThreshold, estJaccard}

  /** Keyed by (band, sig) bucket; ListState of capped FIFO entries. */
  class NearDupProcessor(threshold: Double, ttl: TTLConfig)
      extends StatefulProcessor[String, BucketArrival, NearDupHit] {
    @transient private var held: ListState[BucketEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      held = getHandle.getListState[BucketEntry]("held", Encoders.product[BucketEntry], ttl)

    override def handleInputRows(key: String, rows: Iterator[BucketArrival],
        timerValues: TimerValues): Iterator[NearDupHit] = {
      // ≤ BucketCap entries per key — the whole-list read is bounded
      var cur: List[BucketEntry] = if (held.exists()) held.get().toList else Nil
      val hits = List.newBuilder[NearDupHit]
      // doc_id order for within-batch determinism (same as the classic
      // bucketHandler, spec-pinned identical)
      rows.toSeq.sortBy(_.doc_id).foreach { a =>
        cur.foreach { e =>
          if (e.doc_id != a.doc_id) {
            val j = estJaccard(a.sig, e.sig)
            if (j >= threshold) hits += NearDupHit(a.doc_id, e.doc_id, a.band, j)
          }
        }
        // replays refresh their slot; FIFO cap bounds bucket width
        cur = (cur.filterNot(_.doc_id == a.doc_id) :+ BucketEntry(a.doc_id, a.sig))
          .takeRight(BucketCap)
      }
      held.put(cur.toArray)
      hits.result().iterator
    }
  }

  /** Wire the operator over a stream of raw documents. `ttl` bounds each
    * representative's age in state (NONE = keep until FIFO-evicted);
    * a non-NONE TTL requires processing-time mode, chosen automatically. */
  def detect(docs: Dataset[StreamText],
      threshold: Double = DefaultThreshold,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    val timeMode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    docs
      .flatMap { d =>
        val sig = StreamingNearDup.signature(d.text)
        if (sig.isEmpty) Iterator.empty
        else StreamingNearDup.bandKeys(sig).iterator.map { case (b, s) =>
          BucketArrival(s"$b:$s", b, d.doc_id, sig)
        }
      }
      .groupByKey(_.bucket)
      .transformWithState(new NearDupProcessor(threshold, ttl), timeMode, OutputMode.Append())
  }
}
