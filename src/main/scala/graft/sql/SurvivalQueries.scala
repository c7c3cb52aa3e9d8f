package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-to-event analysis over the event stream — the survival family:
  * how long until users convert, accounting for the ones whose
  * observation window closed without converting (right-censored) that a
  * naive mean-time-to-convert silently drops or miscounts.
  */
object SurvivalQueries {

  // ---------------------------------------------------------------- q152
  /** Kaplan–Meier survival curve (product-limit estimator, JASA 1958)
    * of hours from a user's FIRST event to their FIRST PURCHASE, right-
    * censored at a [[ObsWindowH]]-hour observation window: a user who
    * converts within the window is an event at their elapsed hour; one
    * who does not is censored at [[ObsWindowH]] — they hold their place
    * in every risk set they reach but never count as an event. One row
    * per event time t (hours where someone converted): at-risk n_t,
    * conversions d_t, and S(t) = Π_{s≤t} (1 − d_s/n_s) = P(still
    * unconverted at t). This is the correct replacement for "average
    * time to convert" the moment any window closes unconverted (the
    * naive mean either drops those users or pretends they converted at
    * the horizon — both biased; Kaplan–Meier is the standard fix).
    *
    * 100 TB shape: ONE corpus pass map-side combines to per-user
    * (first-event, first-purchase) extrema; everything downstream is
    * user- then duration-HOUR-cardinality (≤ [[ObsWindowH]]+1 distinct
    * values by construction) — the (duration, counts) collapse map-side
    * combines, and the risk-set/product windows run over that bounded
    * frame, never user rows.
    *
    * Parity: durations, risk sets, and event counts are exact integers;
    * the product telescopes as exp(Σ ln(1 − d/n)) with each ln term
    * rounded through DECIMAL(18,9) (q74's rule — exact order-free sums)
    * and one exp per output row rounded through DECIMAL(18,6); the
    * d = n full-absorption step (ln 0 = −∞) is handled structurally: a
    * zero-survival flag propagates via a cumulative max, never touching
    * the float path. */
  private val ObsWindowH = 72

  def q152KmSurvival(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables(spark, dir).events
      .groupBy(col("user_id"))
      .agg(min(unix_timestamp(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", unix_timestamp(col("ts")))).as("tp"))
    val lives = users
      .select((expr("(tp - t0) div 3600")).as("hrs"))
      .select(
        when(col("hrs").isNotNull && col("hrs") <= ObsWindowH, col("hrs"))
          .otherwise(lit(ObsWindowH.toLong)).as("life"),
        (col("hrs").isNotNull && col("hrs") <= ObsWindowH).as("churned"))
    val byLife = lives
      .groupBy(col("life"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"))
    val total = byLife.agg(sum(col("n_all")).as("n_users"))
    val ord = Window.orderBy(col("life"))
    val steps = byLife.crossJoin(broadcast(total))
      .withColumn("cum_before",
        coalesce(sum(col("n_all")).over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("n_users") - col("cum_before"))
      // per-step ln(1 - d/n) on the day-cardinality frame; d = n flags a
      // structural zero instead of feeding ln(0)
      .withColumn("lnterm",
        when(col("d") === col("n_risk"), lit(null))
          .otherwise(log(lit(1.0) - col("d").cast(DoubleType) / col("n_risk").cast(DoubleType))
            .cast(DecimalType(18, 9))))
      .withColumn("zero_step", (col("d") === col("n_risk")).cast("int"))
    val curve = steps
      .withColumn("cum_ln", sum(col("lnterm")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("hit_zero", max(col("zero_step")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("d") > 0)
      .select(col("life").as("t_hours"), col("n_risk").as("n_at_risk"),
        col("d").as("n_converted"),
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(exp(col("cum_ln").cast(DoubleType)).cast(DecimalType(18, 6)).cast(DoubleType))
          .as("survival"))
    curve.orderBy(col("t_hours"))
  }

  val q152Sql: String =
    s"""WITH u AS (SELECT user_id, min(epoch_us(ts)) // 1000000 AS t0,
       |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) // 1000000 AS tp
       |  FROM events GROUP BY 1),
       |hr AS (SELECT (tp - t0) // 3600 AS hrs FROM u),
       |lv AS (SELECT
       |    CASE WHEN hrs IS NOT NULL AND hrs <= $ObsWindowH THEN hrs ELSE $ObsWindowH END AS life,
       |    hrs IS NOT NULL AND hrs <= $ObsWindowH AS churned
       |  FROM hr),
       |bl AS (SELECT life, count(*) AS n_all,
       |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM lv GROUP BY 1),
       |tt AS (SELECT CAST(sum(n_all) AS BIGINT) AS n_users FROM bl),
       |st AS (SELECT life, n_all, d, n_users,
       |    n_users - coalesce(CAST(sum(n_all) OVER (ORDER BY life
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
       |  FROM bl, tt),
       |s2 AS (SELECT life, d, n_risk,
       |    CASE WHEN d = n_risk THEN NULL
       |         ELSE CAST(ln(CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS DECIMAL(18,9))
       |    END AS lnterm,
       |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zero_step
       |  FROM st),
       |s3 AS (SELECT life, d, n_risk,
       |    sum(lnterm) OVER (ORDER BY life ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln,
       |    max(zero_step) OVER (ORDER BY life ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
       |  FROM s2)
       |SELECT life AS t_hours, n_risk AS n_at_risk, d AS n_converted,
       |  CASE WHEN hit_zero = 1 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(CAST(exp(CAST(cum_ln AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
       |  END AS survival
       |FROM s3 WHERE d > 0 ORDER BY t_hours""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q152_km_survival" -> (q152KmSurvival _))

  val oracleSql: Map[String, String] =
    Map("q152_km_survival" -> q152Sql)
}
