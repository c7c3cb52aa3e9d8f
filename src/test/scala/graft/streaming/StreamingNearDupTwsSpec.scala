package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The transformWithState near-dup: emissions pinned identical to the
  * classic flatMapGroupsWithState operator on the same fixture (under
  * the RocksDB provider the API requires), and the per-bucket FIFO cap
  * proven behaviorally — a probe against a flooded bucket scores against
  * exactly BucketCap survivors, never the full flood. */
class StreamingNearDupTwsSpec extends SparkSpec {
  import spark.implicits._

  private val base = (0 until 100).map(i => s"w$i").mkString(" ")
  private val nearDup = (0 until 99).map(i => s"w$i").mkString(" ") + " changed"
  private val unrelated = (0 until 100).map(i => s"x$i").mkString(" ")

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("tws near-dup emissions match StreamingNearDup.detect on the cross-batch fixture") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val batches = Seq(
        Seq(StreamText(1L, base), StreamText(3L, unrelated)),
        Seq(StreamText(2L, nearDup),
          StreamText(4L, (0 until 100).map(i => s"y$i").mkString(" "))),
        // replay of doc 2 (redelivery) + a fresh near-dup of the family
        Seq(StreamText(2L, nearDup),
          StreamText(5L, (0 until 98).map(i => s"w$i").mkString(" ") + " two edits")))

      def run(wire: org.apache.spark.sql.Dataset[StreamText]
          => org.apache.spark.sql.Dataset[NearDupHit], name: String): Set[NearDupHit] = {
        val source = MemoryStream[StreamText]
        val q = wire(source.toDS())
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
          spark.table(name).as[NearDupHit].collect().toSet
        } finally q.stop()
      }

      val classic = run(StreamingNearDup.detect(_), "ndtws_classic")
      val tws = run(StreamingNearDupTws.detect(_), "ndtws_new")
      assert(classic.nonEmpty, "fixture must produce hits")
      assert(tws == classic,
        s"tws emissions diverge: only-classic=${classic -- tws} only-tws=${tws -- classic}")
      // the planted pairs (order-free on dup_of direction within a batch)
      val pairs = tws.map(h => (h.doc_id, h.dup_of))
      assert(pairs.contains((2L, 1L)), s"missing the planted near-dup pair: $pairs")
    }
  }

  test("tws near-dup: flooded bucket stays FIFO-capped (probe scores against exactly BucketCap)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[StreamText]
      val q = StreamingNearDupTws.detect(source.toDS())
        .writeStream.format("memory").queryName("ndtws_cap").outputMode("append").start()
      try {
        // 20 identical texts (distinct ids) land in the SAME 32 buckets;
        // state must keep only the newest BucketCap per bucket
        val flood = (100L until 120L).map(id => StreamText(id, base))
        flood.grouped(5).foreach { g => source.addData(g: _*); q.processAllAvailable() }
        val before = spark.table("ndtws_cap").count()
        source.addData(StreamText(999L, base))
        q.processAllAvailable()
        val probeHits = spark.table("ndtws_cap").as[NearDupHit]
          .filter(_.doc_id == 999L).collect()
        // capped: 32 bands x BucketCap survivors; uncapped would be 32 x 20
        assert(probeHits.length == 32 * StreamingNearDup.BucketCap,
          s"expected ${32 * StreamingNearDup.BucketCap} probe hits, got ${probeHits.length} " +
            s"(uncapped would be ${32 * 20}; pre-probe rows=$before)")
        // and only against the NEWEST BucketCap of the flood
        val against = probeHits.map(_.dup_of).distinct.sorted
        assert(against.toSeq == (112L until 120L).toSeq,
          s"survivors must be the newest ${StreamingNearDup.BucketCap}: ${against.toSeq}")
      } finally q.stop()
    }
  }
}
