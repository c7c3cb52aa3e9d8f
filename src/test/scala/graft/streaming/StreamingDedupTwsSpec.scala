package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The transformWithState dedup: admission semantics pinned identical to
  * the classic flatMapGroupsWithState operator on the same fixture, under
  * the RocksDB provider the API requires. */
class StreamingDedupTwsSpec extends SparkSpec {
  import spark.implicits._

  test("tws first-seen matches StreamingDedup.firstSeen admissions across batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[StreamDoc]
      val q = StreamingDedupTws.firstSeen(source.toDS())
        .writeStream.format("memory").queryName("tws_kept").outputMode("append").start()
      try {
        source.addData(StreamDoc(7L, "h1"), StreamDoc(3L, "h1"), StreamDoc(5L, "h2"))
        q.processAllAvailable()
        val kept1 = spark.table("tws_kept").as[KeptDoc].collect().toSet
        assert(kept1 == Set(KeptDoc("h1", 3L), KeptDoc("h2", 5L)),
          "within-batch tie must admit the lowest doc_id")

        source.addData(StreamDoc(9L, "h1"), StreamDoc(11L, "h2"), StreamDoc(13L, "h3"))
        q.processAllAvailable()
        val kept2 = spark.table("tws_kept").as[KeptDoc].collect().toSet
        assert(kept2 == kept1 + KeptDoc("h3", 13L),
          "cross-batch replays must stay suppressed; new hashes admitted")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("tws first-seen with a REAL TTL starts and admits (ProcessingTime dispatch)") {
    // a non-NONE TTLConfig under TimeMode.None() throws at query start —
    // the operator must dispatch to ProcessingTime (review-caught)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[StreamDoc]
      val q = StreamingDedupTws.firstSeen(source.toDS(),
          org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))
        .writeStream.format("memory").queryName("tws_kept_ttl")
        .outputMode("append").start()
      try {
        source.addData(StreamDoc(1L, "t1"), StreamDoc(2L, "t1"), StreamDoc(3L, "t2"))
        // a processing-time-TTL stream runs micro-batches CONTINUOUSLY to
        // advance expiry, so processAllAvailable never quiesces — poll the
        // sink instead (found the hard way: the first spelling hung)
        def kept = spark.table("tws_kept_ttl").as[KeptDoc].collect().toSet
        val deadline = System.currentTimeMillis + 60000
        while (kept.size < 2 && System.currentTimeMillis < deadline) Thread.sleep(200)
        assert(kept == Set(KeptDoc("t1", 1L), KeptDoc("t2", 3L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
