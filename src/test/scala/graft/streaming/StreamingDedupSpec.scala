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
}
