package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q214 sequential-CUSUM alert ledger vs an INDEPENDENT driver replay:
  * the whole pipeline — zero-filled hourly spine, first-day baseline
  * mean, mean-absolute-successive-difference noise scale, sign-split
  * integer standardization, and the two-sided Page fold with re-arm —
  * re-derived in plain Scala from the raw events and compared alert for
  * alert. Structural invariants (stat exceeds the threshold, n counts
  * from the reset) ride along. */
class CusumAlertsSpec extends SparkSpec {

  private val Slack = 50L
  private val H = 500L

  private def replay(dir: String): Seq[(String, Long, String, Long, Long)] = {
    val hourly = Tables(spark, dir).events
      .select(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    hourly.keys.map(_._1).toSeq.distinct.sorted.flatMap { et =>
      val hs = hourly.collect { case ((t, h), c) if t == et => (h, c) }.toSeq
      val h0 = hs.map(_._1).min; val h1 = hs.map(_._1).max
      val byH = hs.toMap
      val xs = (h0 to h1).map(h => (h, byH.getOrElse(h, 0L)))
      val mu0 = math.max(xs.take(24).map(_._2).sum / 24, 1L)
      val vs = xs.map { case (h, x) => (h, x * 1000 / mu0) }
      val sad = math.max(
        vs.take(24).map(_._2).sliding(2).map(p => math.abs(p(1) - p(0))).sum / 23, 1L)
      val ws = vs.map { case (h, v) =>
        (h, if (v >= 1000) (v - 1000) * 100 / sad else -((1000 - v) * 100 / sad))
      }
      var sPos = 0L; var sNeg = 0L; var n = 0L
      ws.flatMap { case (h, w) =>
        val p = math.max(0L, sPos + w - Slack)
        val q = math.max(0L, sNeg - w - Slack)
        n += 1
        if (p > H || q > H) {
          val out = (et, h, if (p >= q) "up" else "down", math.max(p, q), n)
          sPos = 0L; sNeg = 0L; n = 0L
          Some(out)
        } else { sPos = p; sNeg = q; None }
      }
    }
  }

  test("q214 equals the independent driver replay at sf0.001 and sf0.01") {
    for (dir <- Seq(Sf0001, "/root/testdata/sf0.01")) {
      val got = TimeSeriesQueries.q214CusumAlerts(spark, dir).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("alert_h"),
          r.getAs[String]("direction"), r.getAs[Long]("stat"),
          r.getAs[Long]("n_since_reset"))).toSeq
      assert(got == replay(dir), s"alert ledger diverged from the replay at $dir")
      got.foreach { case (_, _, _, stat, n) =>
        assert(stat > H, "every alert's statistic exceeds the threshold")
        assert(n >= 1L)
      }
    }
    assert(TimeSeriesQueries.q214CusumAlerts(spark, "/root/testdata/sf0.01")
      .count() > 0, "the card must alert on the gate corpus")
  }
}
