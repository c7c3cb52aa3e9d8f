package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Timer-EMISSION sessions: gap merge across batches, exactly-once
  * emission when the watermark passes last_ts + gap, bounded event
  * prefix, and a fresh session after close — the output half of the
  * event-time timer API. */
class StreamingSessionTwsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def withRocks(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sessions merge across batches and emit exactly once on watermark close") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[SessionEvent]
      val q = StreamingSessionTws.sessions(source.toDS(),
          java.time.Duration.ofSeconds(30))
        .writeStream.format("memory").queryName("tws_sessions").outputMode("append").start()
      try {
        def out = spark.table("tws_sessions").as[SessionSummary].collect()

        // b1: user 1 opens a session (two events, out of order in the
        // batch — the fold must sort); user 2 opens one
        source.addData(SessionEvent(1L, "view", ts(15)), SessionEvent(1L, "land", ts(10)),
          SessionEvent(2L, "land", ts(12)))
        q.processAllAvailable()
        assert(out.isEmpty, "open sessions must not emit")

        // b2: user 1 extends inside the gap (deadline moves to 40+30);
        // watermark after b1 was 15 — nothing closes
        source.addData(SessionEvent(1L, "click", ts(40)))
        q.processAllAvailable()
        assert(out.isEmpty)

        // b3: far-future event advances the watermark past both
        // deadlines (70, 42) at the NEXT batch
        source.addData(SessionEvent(3L, "land", ts(500)))
        q.processAllAvailable()
        // b4: any batch processed with watermark=500 fires the timers
        source.addData(SessionEvent(3L, "view", ts(501)))
        q.processAllAvailable()

        val byUser = out.groupBy(_.user_id)
        assert(byUser.keySet == Set(1L, 2L), s"expected users 1,2 closed, got $byUser")
        val s1 = byUser(1L).head
        assert(byUser(1L).length == 1, "exactly one emission per session")
        assert(s1.start_ts == ts(10) && s1.last_ts == ts(40) && s1.n_events == 3L)
        assert(s1.prefix == Seq("land", "view", "click"),
          s"prefix must be event-time ordered, got ${s1.prefix}")
        val s2 = byUser(2L).head
        assert(s2.n_events == 1L && s2.prefix == Seq("land"))

        // b5: user 1 returns AFTER the close — a FRESH session, which
        // closes once the watermark moves past its gap
        source.addData(SessionEvent(1L, "return", ts(505)))
        q.processAllAvailable()
        source.addData(SessionEvent(3L, "view", ts(600)))
        q.processAllAvailable()
        source.addData(SessionEvent(3L, "view", ts(601)))
        q.processAllAvailable()
        val s1b = out.filter(r => r.user_id == 1L && r.start_ts == ts(505))
        assert(s1b.length == 1, "post-close event must open and close a fresh session")
        assert(s1b.head.n_events == 1L && s1b.head.prefix == Seq("return"))
      } finally q.stop()
    }
  }

  test("the event prefix is bounded at PrefixCap while counters keep counting") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[SessionEvent]
      val q = StreamingSessionTws.sessions(source.toDS(),
          java.time.Duration.ofSeconds(5))
        .writeStream.format("memory").queryName("tws_sessions_cap").outputMode("append").start()
      try {
        // 20 events, one session — the trace must clamp at PrefixCap
        source.addData((0 until 20).map(i =>
          SessionEvent(9L, s"e$i", ts(100 + i))): _*)
        q.processAllAvailable()
        source.addData(SessionEvent(8L, "land", ts(1000)))
        q.processAllAvailable()
        source.addData(SessionEvent(8L, "view", ts(1001)))
        q.processAllAvailable()
        val s = spark.table("tws_sessions_cap").as[SessionSummary].collect()
          .find(_.user_id == 9L).get
        assert(s.n_events == 20L)
        assert(s.prefix == (0 until StreamingSessionTws.PrefixCap).map(i => s"e$i"),
          s"prefix must clamp at the cap in event-time order, got ${s.prefix}")
      } finally q.stop()
    }
  }

  test("sessions survive a stop/restart: open state and timers recover from the checkpoint") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ck").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-sess-out").toString
      val source = MemoryStream[SessionEvent]
      def start() = StreamingSessionTws.sessions(source.toDS(),
          java.time.Duration.ofSeconds(30))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      source.addData(SessionEvent(5L, "land", ts(10)), SessionEvent(5L, "view", ts(20)))
      q1.processAllAvailable()
      q1.stop()

      val q2 = start()
      // extend the RECOVERED open session, then close it via watermark
      source.addData(SessionEvent(5L, "click", ts(30)))
      q2.processAllAvailable()
      source.addData(SessionEvent(6L, "land", ts(200)))
      q2.processAllAvailable()
      source.addData(SessionEvent(6L, "view", ts(201)))
      q2.processAllAvailable()
      val sessions = spark.read.parquet(outDir).as[SessionSummary].collect()
        .filter(_.user_id == 5L)
      assert(sessions.length == 1, "recovered session must emit exactly once")
      assert(sessions.head.n_events == 3L &&
        sessions.head.prefix == Seq("land", "view", "click"),
        "post-restart events must merge into the recovered open session")
      q2.stop()
    }
  }
}
