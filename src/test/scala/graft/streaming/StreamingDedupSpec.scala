package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming exact dedup (q19's continuous form): first-seen admission,
  * within-batch and cross-batch duplicate suppression via keyed state. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first document per hash is admitted; later duplicates suppressed across batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamDoc]

    val q = StreamingDedup.firstSeen(source.toDS())
      .writeStream.format("memory").queryName("kept").outputMode("append").start()

    // batch 1: three docs, one within-batch duplicate pair (h1)
    source.addData(
      StreamDoc(7L, "h1"), StreamDoc(3L, "h1"), StreamDoc(5L, "h2"))
    q.processAllAvailable()
    val kept1 = spark.table("kept").as[KeptDoc].collect().toSet
    assert(kept1 == Set(KeptDoc("h1", 3L), KeptDoc("h2", 5L))) // min doc_id wins h1

    // batch 2: replays of both hashes suppressed; a new hash admitted
    source.addData(StreamDoc(9L, "h1"), StreamDoc(11L, "h2"), StreamDoc(13L, "h3"))
    q.processAllAvailable()
    q.stop()
    val kept2 = spark.table("kept").as[KeptDoc].collect().toSet
    assert(kept2 == kept1 + KeptDoc("h3", 13L))
  }

  test("TTL handler: admit arms the clock, suppress slides it, expiry evicts, replay re-admits") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val ttl = 200L
    val h = StreamingDedup.ttlHandler(ttl) _
    def state(s: Optional[Long], batchTimeMs: Long, timedOut: Boolean) =
      TestGroupState.create[Long](s, GroupStateTimeout.ProcessingTimeTimeout,
        batchTimeMs, Optional.empty[Long], timedOut)

    // fresh hash at t=1000: admitted (min doc_id), deadline stored at t+ttl
    val s1 = state(Optional.empty[Long], 1000L, timedOut = false)
    val out1 = h("h1", Iterator(StreamDoc(7L, "h1"), StreamDoc(3L, "h1")), s1).toSeq
    assert(out1 == Seq(KeptDoc("h1", 3L)))
    assert(s1.isUpdated && s1.get == 1000L + ttl)
    assert(s1.getTimeoutTimestampMs.get() == 1000L + ttl)

    // duplicate at t=1100 (pre-deadline): suppressed, deadline SLID to 1100+ttl
    val s2 = state(Optional.of(1200L), 1100L, timedOut = false)
    assert(h("h1", Iterator(StreamDoc(9L, "h1")), s2).isEmpty)
    assert(!s2.isRemoved && s2.get == 1100L + ttl)

    // replay arriving AFTER the deadline but BEFORE any timeout trigger
    // fired (Spark runs data invocations before timed-out-state callbacks,
    // so state still exists and hasTimedOut=false): must RE-admit, not
    // suppress — the case a boolean-state design gets wrong
    val s3 = state(Optional.of(1200L), 5000L, timedOut = false)
    assert(h("h1", Iterator(StreamDoc(11L, "h1")), s3).toSeq == Seq(KeptDoc("h1", 11L)))
    assert(s3.get == 5000L + ttl)

    // expiry callback (no data since the deadline): state garbage-collected
    val s4 = state(Optional.of(1200L), 2000L, timedOut = true)
    assert(h("h1", Iterator.empty, s4).isEmpty)
    assert(s4.isRemoved)

    // post-eviction replay of the SAME content: re-admitted (the TTL trade)
    val s5 = state(Optional.empty[Long], 2100L, timedOut = false)
    assert(h("h1", Iterator(StreamDoc(13L, "h1")), s5).toSeq == Seq(KeptDoc("h1", 13L)))
    assert(s5.isUpdated)
  }
}
