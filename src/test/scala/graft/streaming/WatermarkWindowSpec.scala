package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time tumbling windows with a watermark over a streaming source —
  * the Structured Streaming counterpart of batch q11, pinning late-data
  * semantics: events older than the watermark are DROPPED once the
  * watermark passes, on-time events aggregate into their window. */
class WatermarkWindowSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling window + 10min watermark drops late events after advance") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, Long)]
    val events = source.toDS().toDF("ts", "user_id", "amount")

    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum(col("amount")).as("total"), count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("user_id"), col("total"), col("n"))

    val q = agg.writeStream
      .format("memory")
      .queryName("wm_windows")
      .outputMode("update")
      .start()

    def t(s: String) = Timestamp.valueOf(s)

    // batch 1: two users in the 10:00 window
    source.addData(
      (t("2024-01-01 10:05:00"), "alice", 10L),
      (t("2024-01-01 10:20:00"), "alice", 5L),
      (t("2024-01-01 10:30:00"), "bob", 7L))
    q.processAllAvailable()

    // batch 2: event at 12:00 advances the watermark to 11:50
    source.addData((t("2024-01-01 12:00:00"), "alice", 1L))
    q.processAllAvailable()

    // batch 3: a LATE event back in the 10:00 window — behind the
    // watermark, must be dropped (no 10:00-window update emitted)
    source.addData((t("2024-01-01 10:40:00"), "alice", 100L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_windows")
      .groupBy("ws", "user_id").agg(max("total").as("total"), max("n").as("n"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(rows == Set(
      ("2024-01-01 10:00:00.0", "alice", 15L, 2L), // late +100 NOT applied
      ("2024-01-01 10:00:00.0", "bob", 7L, 1L),
      ("2024-01-01 12:00:00.0", "alice", 1L, 1L)))
  }
}
