package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE sessionization: 30-minute inactivity gap, (us, event_id) total
  * order, running-sum session ids per user — shared by every session
  * card (q121 Markov, q133 trigrams, q135 CEP; q12 computes only the
  * per-user counts and keeps its one-aggregate form). One definition so
  * the gap rule and tie-break can never silently diverge between cards
  * that claim to share it. */
object Sessionize {

  val GapMicros: Long = 1800L * 1000000L

  /** (user_id, event_id, event_type, us, sid): one user-keyed shuffle;
    * the (user_id, sid) windows downstream are satisfied by the same
    * partition (subset semantics). */
  def withSid(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull || (col("us") - col("prev_us")) > GapMicros, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"), col("sid"))
  }
}
