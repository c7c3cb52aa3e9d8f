package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join: membership at both window boundaries,
  * the no-impression conversion, and state eviction once both
  * watermarks pass the interval. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("interval membership, boundaries, and state eviction") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[StreamingJoin.Impression]
    val convs = MemoryStream[StreamingJoin.Conversion]

    val q = StreamingJoin.attributed(imps.toDS(), convs.toDS())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()

    imps.addData(
      StreamingJoin.Impression(1L, 100L, t("2024-01-01 10:00:00")),
      StreamingJoin.Impression(1L, 101L, t("2024-01-01 10:40:00")),
      StreamingJoin.Impression(2L, 200L, t("2024-01-01 10:00:00")))
    convs.addData(
      // matches imp 100 exactly at the +30min upper boundary (inclusive)
      StreamingJoin.Conversion(1L, 500L, t("2024-01-01 10:30:00")),
      // 10:40 conversion: same instant as imp 101 (lower boundary
      // inclusive) AND 40min after imp 100 (outside the window)
      StreamingJoin.Conversion(1L, 501L, t("2024-01-01 10:40:00")),
      // user 3 has no impressions at all — must not appear
      StreamingJoin.Conversion(3L, 502L, t("2024-01-01 10:10:00")))
    q.processAllAvailable()

    val rows = spark.table("ssj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(
      (1L, 500L, 100L), // upper boundary inclusive
      (1L, 501L, 101L)), // lower boundary inclusive; 40min-old imp excluded
      s"got $rows")

    // advance BOTH watermarks far past every buffered row; the symmetric
    // hash join must evict its state (numRowsRemoved > 0 across batches)
    imps.addData(StreamingJoin.Impression(9L, 900L, t("2024-01-01 20:00:00")))
    convs.addData(StreamingJoin.Conversion(9L, 901L, t("2024-01-01 20:00:00")))
    q.processAllAvailable()
    imps.addData(StreamingJoin.Impression(9L, 902L, t("2024-01-01 21:00:00")))
    convs.addData(StreamingJoin.Conversion(9L, 903L, t("2024-01-01 21:00:00")))
    q.processAllAvailable()

    val removed = q.recentProgress
      .flatMap(p => p.stateOperators.map(_.numRowsRemoved)).sum
    q.stop()
    assert(removed > 0, "watermark advance did not evict any join state")
  }

  test("left outer: unmatched impression emits null-extended exactly once, AFTER the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[StreamingJoin.Impression]
    val convs = MemoryStream[StreamingJoin.Conversion]
    val q = StreamingJoin.attributedLeftOuter(imps.toDS(), convs.toDS())
      .writeStream.format("memory").queryName("ssj_outer").outputMode("append").start()

    imps.addData(
      StreamingJoin.Impression(1L, 100L, t("2024-01-01 10:00:00")), // will match
      StreamingJoin.Impression(2L, 200L, t("2024-01-01 10:00:00"))) // never matches
    convs.addData(StreamingJoin.Conversion(1L, 500L, t("2024-01-01 10:10:00")))
    q.processAllAvailable()
    val matchedOnly = spark.table("ssj_outer").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
    // the match may emit immediately; the unmatched row MUST NOT yet —
    // its window is still open and a conversion could still arrive
    assert(!matchedOnly.exists(_._1 == 2L),
      s"unmatched impression emitted before its window closed: $matchedOnly")

    // watermark far past 10:30 (imp_ts + window): user 2's null row is due
    imps.addData(StreamingJoin.Impression(9L, 900L, t("2024-01-01 12:00:00")))
    convs.addData(StreamingJoin.Conversion(9L, 901L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    imps.addData(StreamingJoin.Impression(9L, 902L, t("2024-01-01 13:00:00")))
    convs.addData(StreamingJoin.Conversion(9L, 903L, t("2024-01-01 13:00:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_outer").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
    assert(rows.count(_ == ((2L, None, 200L))) == 1,
      s"expected exactly one null-extended row for impression 200 — got ${rows.toSeq}")
    assert(rows.contains((1L, Some(500L), 100L)), s"matched pair missing: ${rows.toSeq}")
  }
}
