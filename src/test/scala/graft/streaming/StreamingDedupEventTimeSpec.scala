package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time-timer dedup: admissions match the classic first-seen rule,
  * replays inside the event-time horizon stay suppressed however many
  * batches pass, and a replay AFTER the watermark moves past the
  * retention deadline re-admits — retention follows DATA time, which is
  * the property the processing-time TTL trio cannot give a backfill. */
class StreamingDedupEventTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("event-time dedup: suppression inside the horizon, watermark-driven re-admission") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[StreamEvtDoc]
      val q = StreamingDedupEventTime.firstSeen(source.toDS(),
          java.time.Duration.ofSeconds(60))
        .writeStream.format("memory").queryName("evt_kept").outputMode("append").start()
      try {
        def kept = spark.table("evt_kept").as[KeptDoc].collect().toSet

        // b1: first sightings admit; within-batch tie -> lowest doc_id
        source.addData(StreamEvtDoc(7L, "h1", ts(10)), StreamEvtDoc(3L, "h1", ts(10)),
          StreamEvtDoc(5L, "h2", ts(11)))
        q.processAllAvailable()
        assert(kept == Set(KeptDoc("h1", 3L), KeptDoc("h2", 5L)))

        // b2: replay at event time 20s — inside the 60s horizon (deadline
        // for h1 is now extended to 20+60) -> suppressed
        source.addData(StreamEvtDoc(9L, "h1", ts(20)))
        q.processAllAvailable()
        assert(kept == Set(KeptDoc("h1", 3L), KeptDoc("h2", 5L)),
          "in-horizon replay must stay suppressed")

        // b3: data time jumps far past every deadline (watermark will
        // advance to 200 at the NEXT batch boundary)
        source.addData(StreamEvtDoc(13L, "h3", ts(200)))
        q.processAllAvailable()
        assert(kept == Set(KeptDoc("h1", 3L), KeptDoc("h2", 5L), KeptDoc("h3", 13L)))

        // b4: watermark is now 200 >= both deadlines (80, 71) -> timers
        // fire and clear h1/h2 state in this batch
        source.addData(StreamEvtDoc(15L, "h4", ts(201)))
        q.processAllAvailable()
        assert(kept == Set(KeptDoc("h1", 3L), KeptDoc("h2", 5L), KeptDoc("h3", 13L),
          KeptDoc("h4", 15L)))

        // b5: h1 reappears AFTER the event-time gap -> RE-admitted
        source.addData(StreamEvtDoc(21L, "h1", ts(205)))
        q.processAllAvailable()
        assert(kept.contains(KeptDoc("h1", 21L)),
          "post-gap replay must re-admit once the watermark passed the deadline")
        // and the suppressed in-horizon replay (doc 9) never surfaced
        assert(!kept.exists(_.doc_id == 9L))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("event-time dedup: replay-stable across a stop/restart (checkpointed timers)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-evt-dedup-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-evt-dedup-out").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[StreamEvtDoc]
      // a FILE sink: the memory sink cannot recover from a checkpoint
      def start() = StreamingDedupEventTime.firstSeen(source.toDS(),
          java.time.Duration.ofSeconds(60))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def kept = spark.read.parquet(outDir).as[KeptDoc].collect().toSet

      val q1 = start()
      source.addData(StreamEvtDoc(1L, "r1", ts(10)), StreamEvtDoc(2L, "r2", ts(10)))
      q1.processAllAvailable()
      q1.stop()

      // restart from the checkpoint: seen-state AND the registered timers
      // must survive — an in-horizon replay stays suppressed
      val q2 = start()
      source.addData(StreamEvtDoc(3L, "r1", ts(30)))
      q2.processAllAvailable()
      assert(kept == Set(KeptDoc("r1", 1L), KeptDoc("r2", 2L)),
        "post-restart in-horizon replay must stay suppressed")

      // and the watermark path still evicts after restart
      source.addData(StreamEvtDoc(4L, "r3", ts(300)))
      q2.processAllAvailable()
      source.addData(StreamEvtDoc(5L, "r4", ts(301)))
      q2.processAllAvailable()
      source.addData(StreamEvtDoc(6L, "r1", ts(305)))
      q2.processAllAvailable()
      assert(kept.contains(KeptDoc("r1", 6L)),
        "post-restart watermark advance must re-admit after the gap")
      q2.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
