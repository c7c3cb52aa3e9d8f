package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** StreamingTrending invariants: only watermark-closed windows emit,
  * each emitted window carries exactly its top-k ranked leaderboard
  * (matching a batch recompute), late events never reopen a final
  * window, and the sink-side cut plans through TopKPerKey. */
class StreamingTrendingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("closed sliding windows emit exactly their ranked top-3, late events dropped") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TrendEvent]
    val out = java.nio.file.Files.createTempDirectory("trend_out").toString

    val q = StreamingTrending.start(source.toDS(), out,
      windowDur = "1 hour", slideDur = "30 minutes", k = 3, watermark = "10 minutes")

    // batch 1: four items in the 10:00-11:00 hour (windows 09:30 and 10:00)
    source.addData(
      TrendEvent(t("2024-01-01 10:05:00"), "apple"),
      TrendEvent(t("2024-01-01 10:06:00"), "apple"),
      TrendEvent(t("2024-01-01 10:07:00"), "apple"),
      TrendEvent(t("2024-01-01 10:10:00"), "pear"),
      TrendEvent(t("2024-01-01 10:12:00"), "pear"),
      TrendEvent(t("2024-01-01 10:20:00"), "plum"),
      TrendEvent(t("2024-01-01 10:25:00"), "quince"))
    q.processAllAvailable()

    // batch 2: far-future event closes every 10:xx window
    source.addData(TrendEvent(t("2024-01-01 13:00:00"), "kiwi"))
    q.processAllAvailable()

    // batch 3: LATE arrival for the closed 10:00 window — must not
    // produce any new rows for it
    source.addData(TrendEvent(t("2024-01-01 10:08:00"), "quince"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(out)
      .select(col("window_start").cast("string"), col("item"), col("cnt"), col("rank"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))

    val w0930 = rows.filter(_._1 == "2024-01-01 09:30:00").sortBy(_._4)
    val w1000 = rows.filter(_._1 == "2024-01-01 10:00:00").sortBy(_._4)
    // 09:30-10:30 window sees apple×3, pear×2, plum×1, quince×1 →
    // top-3 with (cnt desc, item) tie-break: apple, pear, plum
    assert(w0930.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq(("apple", 3L, 1), ("pear", 2L, 2), ("plum", 1L, 3)), s"0930: ${w0930.toSeq}")
    // 10:00-11:00 window: same counts, same podium (quince cut at k=3;
    // the late quince would have tied plum — window already final)
    assert(w1000.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq(("apple", 3L, 1), ("pear", 2L, 2), ("plum", 1L, 3)), s"1000: ${w1000.toSeq}")
    // every emitted window is k-bounded and rank-contiguous
    rows.groupBy(_._1).foreach { case (ws, rs) =>
      assert(rs.length <= 3, s"$ws overflowed k")
      assert(rs.map(_._4).sorted.sameElements(1 to rs.length), s"$ws ranks")
    }
  }

  test("the sink-side cut plans through the TopKPerKey heap operator") {
    val batch = Seq(
      (t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), "a", 3L),
      (t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), "b", 2L),
      (t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), "c", 2L),
      (t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), "d", 1L))
      .toDF("window_start", "window_end", "item", "cnt")
    val ranked = StreamingTrending.rankClosed(batch, 3)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), s"rewrite did not fire in the sink:\n$plan")
    val got = ranked.collect().map(r => (r.getAs[String]("item"), r.getAs[Int]("rank")))
    assert(got.sortBy(_._2).toSeq == Seq(("a", 1), ("b", 2), ("c", 3)))
  }
}
