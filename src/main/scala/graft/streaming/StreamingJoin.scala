package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution relation of
  * batch q85 ([[graft.sql.RelationalQueries.q85Attribution]]) run live:
  * each conversion matches the impressions of the SAME user whose event
  * time precedes it by at most `window`.
  *
  * This is the streaming-join shape whose state Spark can provably
  * evict: both sides carry watermarks, and the join condition bounds
  * `conv_ts` relative to `imp_ts` from BOTH directions, so the
  * symmetric hash join drops an impression once the conversion-side
  * watermark passes `imp_ts + window` (and a conversion once the
  * impression side passes it). State is O(arrival rate × window),
  * independent of stream lifetime — an unbounded-condition join would
  * buffer both streams forever, which is the mistake this operator
  * exists to encode away. At 100 TB-scale event rates the state store
  * shards by the join key (user), so eviction and matching are both
  * key-local.
  *
  * `StreamingJoinSpec` pins interval membership (both boundaries
  * inclusive/exclusive exactly as the batch as-of family defines them),
  * the no-impression case, and actual state eviction via the query's
  * stateOperators metrics. */
object StreamingJoin {

  case class Impression(userId: Long, impressionId: Long, impTs: Timestamp)
  case class Conversion(userId: Long, conversionId: Long, convTs: Timestamp)

  /** Inner interval join: `imp_ts <= conv_ts <= imp_ts + window`, same
    * user. Append-mode output, one row per (conversion, matching
    * impression). */
  def attributed(
      imps: Dataset[Impression],
      convs: Dataset[Conversion],
      window: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    joined(imps, convs, window, watermark, "inner")

  /** LEFT OUTER variant — the unmatched-impression report: an
    * impression with no conversion inside its window emits exactly once
    * with null conversion columns, and only AFTER the watermark proves
    * no match can still arrive (outer results are held back until then;
    * an early emit would be retractable, which append mode forbids).
    * Same bounded state as the inner join. */
  def attributedLeftOuter(
      imps: Dataset[Impression],
      convs: Dataset[Conversion],
      window: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    joined(imps, convs, window, watermark, "left_outer")

  private def joined(
      imps: Dataset[Impression],
      convs: Dataset[Conversion],
      window: String, watermark: String, how: String): DataFrame = {
    val i = imps.withWatermark("impTs", watermark)
    val c = convs.withWatermark("convTs", watermark)
    i.join(c,
      i("userId") === c("userId") &&
        c("convTs") >= i("impTs") &&
        c("convTs") <= i("impTs") + expr(s"INTERVAL $window"),
      how)
      .select(i("userId").as("user_id"),
        c("conversionId").as("conversion_id"),
        i("impressionId").as("impression_id"),
        i("impTs").as("imp_ts"), c("convTs").as("conv_ts"))
  }
}
