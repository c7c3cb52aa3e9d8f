package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Sequential CUSUM on transformWithState: planted level shifts alert at
  * the exact Page-statistic crossing (stat and n pinned by hand), the
  * detector re-arms after each alert, a steady key stays silent, and the
  * streaming alert set equals [[StreamingCusum.batchAlerts]] when the
  * same points replay as one batch dataset — state carried across
  * micro-batch boundaries under the RocksDB provider. */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

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

  private def pt(key: String, i: Int, v: Long) =
    CusumPoint(key, new Timestamp(1700000000000L + i * 60000L), v)

  // mu0=100, slack=10, threshold=200:
  //  - "up": 20 on-target points, then a +30 shift — each shifted point
  //    adds 130-100-10=20 to S⁺, first EXCEEDS 200 at the 11th (220)
  //  - "down": 10 on-target, then a -40 shift — each adds 100-60-10=30
  //    to S⁻, crosses at the 7th shifted point (210); the re-armed
  //    detector re-accumulates and crosses AGAIN 7 points later (210)
  //  - "steady": alternates ±10 around mu0 (inside the slack), no alert
  private val Mu0 = 100L; private val Slack = 10L; private val H = 200L
  private val upPts = (1 to 20).map(pt("up", _, 100L)) ++
    (21 to 35).map(pt("up", _, 130L))
  private val downPts = (1 to 10).map(pt("down", _, 100L)) ++
    (11 to 25).map(pt("down", _, 60L))
  private val steadyPts = (1 to 30).map(i => pt("steady", i, if (i % 2 == 0) 110L else 90L))
  private val allPts = (upPts ++ downPts ++ steadyPts).sortBy(_.ts.getTime)

  test("batch reference: planted shifts alert at the exact crossing, re-arm, steady silent") {
    val alerts = StreamingCusum.batchAlerts(
      allPts.toDS(), Mu0, Slack, H).collect().sortBy(a => (a.key, a.ts.getTime))
    val up = alerts.filter(_.key == "up")
    assert(up.length == 1 && up.head.direction == "up" &&
      up.head.stat == 220L && up.head.n_since_reset == 31L,
      s"up: expected one alert (stat 220, n 31), got ${up.toSeq}")
    val down = alerts.filter(_.key == "down")
    assert(down.length == 2 && down.forall(_.direction == "down"),
      s"down: expected the re-armed second alert, got ${down.toSeq}")
    assert(down(0).stat == 210L && down(0).n_since_reset == 17L)
    assert(down(1).stat == 210L && down(1).n_since_reset == 7L,
      "n counts from the reset, not from the stream start")
    assert(!alerts.exists(_.key == "steady"), "inside-slack noise must stay silent")
  }

  test("streaming alerts across 3 micro-batches == batch reference (append, exactly once)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // in-order feed split mid-accumulation: the up-shift crossing sits
      // in batch 3 while its S⁺ run-up starts in batch 2
      val batches = Seq(
        allPts.filter(_.ts.getTime < 1700000000000L + 15 * 60000L),
        allPts.filter(p => p.ts.getTime >= 1700000000000L + 15 * 60000L &&
          p.ts.getTime < 1700000000000L + 28 * 60000L),
        allPts.filter(_.ts.getTime >= 1700000000000L + 28 * 60000L))
      assert(batches.forall(_.nonEmpty))
      val src = MemoryStream[CusumPoint]
      val q = StreamingCusum.alerts(src.toDS(), Mu0, Slack, H)
        .writeStream.format("memory").queryName("cusum_alerts")
        .outputMode("append").start()
      val streamed = try {
        batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        spark.table("cusum_alerts").as[CusumAlert].collect()
      } finally q.stop()
      val reference = StreamingCusum.batchAlerts(allPts.toDS(), Mu0, Slack, H).collect()
      assert(streamed.sortBy(a => (a.key, a.ts.getTime)).toSeq ==
        reference.sortBy(a => (a.key, a.ts.getTime)).toSeq,
        "streaming fold must equal the batch fold under in-order delivery")
      assert(streamed.length == streamed.distinct.length, "append = each alert exactly once")
    }
  }

  test("orderedAlerts: rows shuffled ACROSS micro-batches still equal the batch reference") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // adversarial cross-batch order: batch 1 carries the LATE half of
      // every series, batch 2 the early half, batch 3 a shuffled remainder
      // — arrival order shares nothing with event order, so the
      // arrival-order processor would diverge; the watermark-ordered one
      // must not. Delay 2h > the 35-minute series span, so nothing is late.
      val scrambled = allPts.zipWithIndex
      val b1 = scrambled.collect { case (p, i) if i % 3 == 2 => p }.reverse
      val b2 = scrambled.collect { case (p, i) if i % 3 == 0 => p }.sortBy(-_.value)
      val b3 = scrambled.collect { case (p, i) if i % 3 == 1 => p }.sortBy(_.value)
      // far-future on-target sentinel advances the watermark past every
      // real point so the final timers fire (watermark moves at batch
      // boundaries: sentinel lands in batch 4, timers fire in batch 5)
      val sentinel = CusumPoint("flush", new Timestamp(1700000000000L + 365L * 86400000L), Mu0)
      val src = MemoryStream[CusumPoint]
      val q = StreamingCusum.orderedAlerts(src.toDS(), Mu0, Slack, H, "2 hours")
        .writeStream.format("memory").queryName("cusum_ordered")
        .outputMode("append").start()
      val streamed = try {
        Seq(b1, b2, b3).foreach { b => src.addData(b: _*); q.processAllAvailable() }
        src.addData(sentinel); q.processAllAvailable()
        src.addData(sentinel); q.processAllAvailable() // timer fires a boundary later
        spark.table("cusum_ordered").as[CusumAlert].collect().filter(_.key != "flush")
      } finally q.stop()
      val reference = StreamingCusum.batchAlerts(allPts.toDS(), Mu0, Slack, H).collect()
      assert(streamed.sortBy(a => (a.key, a.ts.getTime)).toSeq ==
        reference.sortBy(a => (a.key, a.ts.getTime)).toSeq,
        "watermark-ordered fold must equal the batch fold under shuffled delivery")
      assert(streamed.length == streamed.distinct.length, "append = each alert exactly once")
    }
  }

  test("orderedAlerts folds incrementally as the watermark advances (not only at flush)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // zero delay + in-order batches: after batch 2's boundary the
      // watermark has passed batch 1's points, so batch 1's crossing must
      // already be out BEFORE any sentinel — proves chunked folding, and
      // that a hot key (new rows every batch) still folds because the
      // timer keys to the OLDEST buffered point, not the newest
      val cut = 1700000000000L + 28 * 60000L
      val early = allPts.filter(_.ts.getTime < cut)   // down-shift crossing at min 17
      val late = allPts.filter(_.ts.getTime >= cut)
      val src = MemoryStream[CusumPoint]
      val q = StreamingCusum.orderedAlerts(src.toDS(), Mu0, Slack, H)
        .writeStream.format("memory").queryName("cusum_incr")
        .outputMode("append").start()
      try {
        src.addData(early: _*); q.processAllAvailable()
        src.addData(late: _*); q.processAllAvailable()  // watermark passes `early`
        src.addData(late.last.copy(key = "flush")); q.processAllAvailable()
        val mid = spark.table("cusum_incr").as[CusumAlert].collect()
        assert(mid.exists(a => a.key == "down" && a.stat == 210L && a.n_since_reset == 17L),
          s"the sealed down-crossing must emit before any flush, got ${mid.toSeq}")
      } finally q.stop()
    }
  }

  test("orderedAlerts: buffered points and the pending timer survive a stop/restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ocusum-ck").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-ocusum-out").toString
      val src = MemoryStream[CusumPoint]
      def start() = StreamingCusum.orderedAlerts(src.toDS(), Mu0, Slack, H, "2 hours")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      // phase 1: the whole shifted series lands SHUFFLED, but the 2h
      // delay keeps the watermark below it — everything is still in the
      // ListState buffer (nothing folded) when the query dies
      val q1 = start()
      src.addData(((1 to 20).map(pt("r", _, 100L)) ++
        (21 to 31).map(pt("r", _, 130L))).reverse: _*)
      q1.processAllAvailable()
      q1.stop()
      assert(spark.read.schema("key STRING, ts TIMESTAMP, direction STRING, stat LONG, n_since_reset LONG")
        .parquet(outDir).count() == 0, "nothing folds inside the watermark horizon")

      // phase 2: only a far-future sentinel arrives — the crossing can
      // ONLY appear if the 31 buffered points AND the registered timer
      // were recovered from the checkpoint
      val q2 = start()
      val sentinel = CusumPoint("flush", new Timestamp(1700000000000L + 365L * 86400000L), Mu0)
      src.addData(sentinel); q2.processAllAvailable()
      src.addData(sentinel); q2.processAllAvailable()
      val alerts = spark.read.parquet(outDir).as[CusumAlert].collect().filter(_.key == "r")
      assert(alerts.length == 1 && alerts.head.direction == "up" &&
        alerts.head.stat == 220L && alerts.head.n_since_reset == 31L,
        s"recovered buffer must fold to the exact planted crossing, got ${alerts.toSeq}")
      q2.stop()
    }
  }

  test("orderedAlerts retention: a silent key's arm evicts and re-arms from zero") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // key "r": 20 on-target + 8 shifted points → S⁺ = 160, under h=200.
      // Then silence. Key "other" keeps the stream alive and pushes the
      // watermark past r's last sighting + retention (30 min). When "r"
      // returns with 3 more shifted points (3×20 = 60):
      //   - arm retained (no retention):   160 + 60 = 220 > 200 → alert
      //   - arm evicted  (with retention): 60 alone stays silent
      val rEarly = (1 to 20).map(pt("r", _, 100L)) ++ (21 to 28).map(pt("r", _, 130L))
      val keepAlive = (29 to 120).map(pt("other", _, 100L)) // spans ~90 min past r
      val rLate = (121 to 123).map(pt("r", _, 130L))
      val flush = (124 to 130).map(pt("flush", _, 100L))
      val retention = Some(30L * 60000L) // 30 minutes event-time

      def run(name: String, ret: Option[Long]): Seq[CusumAlert] = {
        val src = MemoryStream[CusumPoint]
        val q = StreamingCusum.orderedAlerts(src.toDS(), Mu0, Slack, H,
            retentionMs = ret)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          Seq(rEarly, keepAlive, rLate, flush, flush).foreach { b =>
            src.addData(b: _*); q.processAllAvailable()
          }
          spark.table(name).as[CusumAlert].collect().toSeq.filter(_.key == "r")
        } finally q.stop()
      }

      val withRetention = run("cusum_ttl_on", retention)
      assert(withRetention.isEmpty,
        s"evicted arm must re-accumulate from zero, got $withRetention")
      val without = run("cusum_ttl_off", None)
      assert(without.length == 1 && without.head.stat == 220L,
        s"control: the retained arm must cross at 220, got $without")
    }
  }

  test("accumulated S+ survives a stop/restart: the crossing proves recovered state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft-cusum-ck").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-cusum-out").toString
      val src = MemoryStream[CusumPoint]
      def start() = StreamingCusum.alerts(src.toDS(), Mu0, Slack, H)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      // 20 on-target + 5 shifted points: S+ = 5*20 = 100, under h — all
      // the evidence lives in state when we kill the query
      src.addData((1 to 20).map(pt("r", _, 100L)) ++ (21 to 25).map(pt("r", _, 130L)): _*)
      q1.processAllAvailable()
      q1.stop()

      val q2 = start()
      // 6 more shifted points: 6*20 = 120 alone stays under h=200 — the
      // crossing at 220 can ONLY happen if the 100 recovered
      src.addData((26 to 31).map(pt("r", _, 130L)): _*)
      q2.processAllAvailable()
      val alerts = spark.read.parquet(outDir).as[CusumAlert].collect()
      assert(alerts.length == 1, s"exactly one alert, got ${alerts.toSeq}")
      assert(alerts.head.direction == "up" && alerts.head.stat == 220L &&
        alerts.head.n_since_reset == 31L,
        "stat/n must continue from the pre-restart accumulation")
      q2.stop()
    }
  }
}
