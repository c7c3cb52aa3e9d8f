package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins the robust-stats cards against driver-side recomputation of the
  * lower-weighted-median contract. */
class RobustStatsSpec extends SparkSpec {

  private def lowerWeightedMedian(pairs: Seq[(Double, Double)]): Double = {
    val sorted = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val tot = sorted.map(_._2).sum
    var cum = 0.0
    sorted.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
  }

  test("q138: per-brand weighted medians match a driver recompute; median is a data value") {
    val t = Tables(spark, Sf0001)
    val rows = t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).view
      .mapValues(vs => lowerWeightedMedian(vs.map(v => (v._2, v._3)))).toMap
    val got = RobustStatsQueries.q138WeightedMedian(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (brand, m) =>
      // DECIMAL(18,2) collapse: compare at cent precision
      assert(math.abs(m - expected(brand)) < 0.005, s"$brand: $m vs ${expected(brand)}")
      assert(rows.exists(r => r._1 == brand && math.abs(r._2 - m) < 0.005),
        s"$brand median $m is not a data value")
    }
  }

  test("q139: median/MAD/outliers match a driver recompute; MAD gate has the breakdown property") {
    val events = Tables(spark, Sf0001).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = RobustStatsQueries.q139RobustOutliers(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    events.groupBy(_._1).foreach { case (tpe, vs) =>
      val xs = vs.map(_._2)
      val med = lowerWeightedMedian(xs.map((_, 1.0)))
      val mad = lowerWeightedMedian(xs.map(x => (math.abs(x - med), 1.0)))
      val out = xs.count(x => math.abs(x - med) > 4.4478 * mad)
      val (gm, gmad, gn, gout) = got(tpe)
      assert(gm == med, s"$tpe median: $gm vs $med")
      assert(gmad == mad, s"$tpe mad: $gmad vs $mad")
      assert(gn == xs.length && gout == out, s"$tpe counts: ($gn,$gout) vs (${xs.length},$out)")
      // breakdown sanity: the gate flags a minority, never the median itself
      assert(gout * 2 < gn, s"$tpe: MAD gate flagged a majority")
    }
  }
}
