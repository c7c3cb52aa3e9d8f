package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q160 DP-release invariants: true counts tally the raw histogram, the
  * noise replays exactly from the documented seeded inverse-CDF, the
  * clip law holds, and the realized noise magnitude is in the Laplace
  * b = 1 ballpark. */
class DpHistogramSpec extends SparkSpec {

  private lazy val rows = MiningQueries.q160DpHistogram(spark, Sf0001).collect()

  private def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q160: true counts tally the raw histogram and the clip law holds") {
    val expected = Tables(spark, Sf0001).customer
      .join(Tables(spark, Sf0001).nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val nation = r.getAs[String]("nation")
      assert(r.getAs[Long]("true_count") == expected(nation), s"$nation true count")
      assert(r.getAs[Long]("noisy_count") ==
        math.max(0L, r.getAs[Long]("true_count") + r.getAs[Long]("noise")),
        s"$nation clip law")
      assert(r.getAs[Double]("epsilon_nominal") == 1.0)
    }
  }

  test("q160: noise replays from the seeded Laplace inverse-CDF") {
    rows.foreach { r =>
      val nation = r.getAs[String]("nation")
      val m = hex60("dp:" + nation) % 1000000L
      val u = (m.toDouble + 0.5) / 1000000.0
      val lap = if (u >= 0.5) -math.log(1.0 - 2.0 * (u - 0.5))
                else math.log(1.0 - 2.0 * (0.5 - u))
      val noise = BigDecimal(lap).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(r.getAs[Long]("noise") == noise, s"$nation: ${r.getAs[Long]("noise")} vs $noise")
    }
  }

  test("q160: realized noise magnitude sits in the Laplace b=1 ballpark") {
    val mean = rows.head.getAs[Double]("mean_abs_noise")
    assert(rows.map(_.getAs[Double]("mean_abs_noise")).distinct.length == 1)
    val recompute = rows.map(r => math.abs(r.getAs[Long]("noise"))).sum.toDouble / rows.length
    assert(mean == recompute, s"mean_abs_noise $mean vs $recompute")
    // E|Laplace(b=1)| = 1; 25 seeded draws land well within [0.2, 3]
    assert(mean >= 0.2 && mean <= 3.0, s"mean |noise| $mean implausible for b=1")
  }
}
