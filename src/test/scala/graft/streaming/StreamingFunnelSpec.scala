package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingFunnel.{Advance, Ev}

/** The streaming funnel must agree with batch q75 on stages reached, on
  * the same ordering traps, and carry state across micro-batches. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("q75 fixture semantics: pre-view clicks don't open, skipped stages don't convert") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = StreamingFunnel.advances(source.toDS())
      .writeStream.format("memory").queryName("funnel_adv").outputMode("append").start()
    try {
      // user 1: click BEFORE view (ignored), then the full strict chain
      // user 2: click/purchase with no view — nothing advances
      // user 3: view then purchase without click — stuck at stage 1
      source.addData(
        Ev(1L, "click", t(5)), Ev(1L, "view", t(10)), Ev(1L, "click", t(20)), Ev(1L, "purchase", t(30)),
        Ev(2L, "click", t(10)), Ev(2L, "purchase", t(20)),
        Ev(3L, "view", t(10)), Ev(3L, "purchase", t(20)))
      q.processAllAvailable()
      val rows = spark.table("funnel_adv").as[Advance].collect().toSet
      assert(rows == Set(
        Advance(1L, 1, t(10)), Advance(1L, 2, t(20)), Advance(1L, 3, t(30)),
        Advance(3L, 1, t(10))))
    } finally q.stop()
  }

  test("state carries across micro-batches; completed funnels emit nothing more") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = StreamingFunnel.advances(source.toDS())
      .writeStream.format("memory").queryName("funnel_adv2").outputMode("append").start()
    try {
      source.addData(Ev(7L, "view", t(1)))
      q.processAllAvailable()
      source.addData(Ev(7L, "click", t(2)))
      q.processAllAvailable()
      source.addData(Ev(7L, "purchase", t(3)), Ev(7L, "view", t(4)), Ev(7L, "purchase", t(5)))
      q.processAllAvailable()
      val rows = spark.table("funnel_adv2").as[Advance].collect().toSeq.sortBy(_.stage)
      // exactly one advance per stage, across three separate batches; the
      // post-completion view/purchase emit nothing (stage machine is done)
      assert(rows == Seq(Advance(7L, 1, t(1)), Advance(7L, 2, t(2)), Advance(7L, 3, t(3))))
    } finally q.stop()
  }

  test("agrees with batch q75 stage counts on the events table") {
    val batch = graft.sql.RelationalQueries.q75EventFunnel(spark, Sf0001).collect().head
    val evs = graft.sql.Tables(spark, Sf0001).events
      .selectExpr("user_id as userId", "event_type as eventType", "ts").as[Ev]
    // run the same state machine in BATCH via the per-user event-time sort
    // (flatMapGroupsWithState needs a stream; the kernel logic is shared)
    val stages = evs.groupByKey(_.userId).mapGroups { (_, it) =>
      var stage = 0
      it.toSeq.sortBy(e => (e.ts.getTime, e.eventType)).foreach { e =>
        if (stage == 0 && e.eventType == "view") stage = 1
        else if (stage == 1 && e.eventType == "click") stage = 2
        else if (stage == 2 && e.eventType == "purchase") stage = 3
      }
      stage
    }.collect()
    assert(stages.count(_ >= 1) == batch.getLong(batch.fieldIndex("n_viewed")))
    assert(stages.count(_ >= 2) == batch.getLong(batch.fieldIndex("n_clicked")))
    assert(stages.count(_ >= 3) == batch.getLong(batch.fieldIndex("n_purchased")))
  }
}
