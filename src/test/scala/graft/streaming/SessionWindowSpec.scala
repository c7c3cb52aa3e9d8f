package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming `session_window` aggregation — the gap-based window kind
  * (batch q12 sessionize's continuous form): events within the gap merge
  * into one growing session, a quiet period closes it, and closed
  * sessions emit exactly once in append mode after the watermark passes.
  * State per key is the OPEN sessions only — the property that keeps a
  * 100 TB event stream's session state proportional to concurrent
  * activity, not history. */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("gap merge, gap split, and append-mode emission on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val sessions = source.toDS().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("string").as("start"),
        col("session_window.end").cast("string").as("end"),
        col("user_id"), col("n_events"))

    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("append").start()

    // alice: 10:00, 10:03, 10:06 chain into ONE session (each within 5min
    // of the previous); the 10:30 event is past the gap — a second
    // session. That same event drives the watermark to 10:20, which
    // closes (and emits) the two sessions ending before it — but NOT
    // alice's still-open 10:30 session.
    source.addData(
      (t("2024-01-01 10:00:00"), "alice"),
      (t("2024-01-01 10:03:00"), "alice"),
      (t("2024-01-01 10:06:00"), "alice"),
      (t("2024-01-01 10:30:00"), "alice"),
      (t("2024-01-01 10:04:00"), "bob"))
    q.processAllAvailable()
    def collected() = spark.table("sessions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val closedEarly = Set(
      ("2024-01-01 10:00:00", "2024-01-01 10:11:00", "alice", 3L), // merged chain
      ("2024-01-01 10:04:00", "2024-01-01 10:09:00", "bob", 1L))
    assert(collected() == closedEarly,
      s"watermark 10:20 closes exactly the pre-10:20 sessions — got ${collected()}")

    // watermark jumps to 11:50 — the remaining open session closes,
    // emitted exactly once (append-mode no-duplicates)
    source.addData((t("2024-01-01 12:00:00"), "carol"))
    q.processAllAvailable()
    q.stop()

    assert(collected() == closedEarly +
      (("2024-01-01 10:30:00", "2024-01-01 10:35:00", "alice", 1L)),
      s"got ${collected()}")
  }
}
