package graft.sql

import graft.SparkSpec

/** q146 EWMA invariants: convexity (the smoother can never leave the hull
  * of what it averages) and the structural tie between the two outputs —
  * the prior-only baseline at hour t IS the EWMA at the preceding hour
  * when that hour exists (same weights, re-anchored one step back). */
class EwmaSpec extends SparkSpec {

  private lazy val rows = TimeSeriesQueries.q146EwmaSpikes(spark, Sf0001).collect()

  test("q146: ewma lies within [min, max] of the contributing counts (convex combination)") {
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    for ((_, rs) <- byType) {
      val sorted = rs.sortBy(_.getAs[String]("hour"))
      val cnts = sorted.map(_.getAs[Long]("cnt").toDouble)
      sorted.zipWithIndex.foreach { case (r, i) =>
        // the support window is ≤ 24 rows back in hour terms; the row
        // slice is a superset of the true contributors, so its hull
        // bounds the (tighter) true hull
        val lo = cnts.slice(math.max(0, i - 24), i + 1).min
        val hi = cnts.slice(math.max(0, i - 24), i + 1).max
        val e = r.getAs[Double]("ewma")
        assert(e >= lo - 1e-9 && e <= hi + 1e-9,
          s"${r.getAs[String]("event_type")} ${r.getAs[String]("hour")}: ewma $e outside [$lo, $hi]")
      }
    }
  }

  test("q146: baseline(t) equals ewma(t-1) whenever hour t-1 has events") {
    val byKey = rows.map(r =>
      (r.getAs[String]("event_type"), r.getAs[String]("hour")) -> r).toMap
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    var checked = 0
    for (((et, hour), r) <- byKey) {
      val prevHour = java.time.LocalDateTime.parse(hour, fmt).minusHours(1).format(fmt)
      byKey.get((et, prevHour)).foreach { prev =>
        checked += 1
        assert(math.abs(r.getAs[Double]("baseline") - prev.getAs[Double]("ewma")) < 1e-12,
          s"$et $hour: baseline != previous hour's ewma")
      }
    }
    assert(checked > 10, s"only $checked adjacent-hour pairs — data too sparse to pin the invariant")
  }

  test("q146: spike flag is exactly cnt > 2 × baseline") {
    for (r <- rows; b = r.getAs[java.lang.Double]("baseline"); if b != null)
      assert(r.getAs[Boolean]("is_spike") == (r.getAs[Long]("cnt").toDouble > 2.0 * b),
        s"flag mismatch at ${r.getAs[String]("event_type")} ${r.getAs[String]("hour")}")
  }
}
