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
}
