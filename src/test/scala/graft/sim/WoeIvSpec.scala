package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q159 WOE/IV invariants: bins partition the corpus into deciles, WOE
  * matches a driver-side smoothed log-odds recompute, IV is the sum of
  * its terms and non-negative, and WOE's sign tracks the bin's positive
  * rate against the global rate. */
class WoeIvSpec extends SparkSpec {

  private lazy val rows = MlQueries.q159WoeIv(spark, Sf0001).collect()

  private lazy val data = graft.sql.Tables(spark, Sf0001).embeddings
    .select(element_at(col("embedding"), 1).cast("double").as("x"),
      when(col("label") < 5, 1).otherwise(0).as("y"))
    .collect().map(r => (r.getDouble(0), r.getInt(1)))

  test("q159: bins partition the corpus and roughly tithe it") {
    val total = data.length.toLong
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.map(_.getAs[Int]("bin")).sorted.sameElements(1 to 10),
      "all ten decile bins must be present")
    // integer-threshold deciles: each bin within ±1 distinct-value step
    // of the tithe on this continuous-ish feature
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n > 0 && n <= total / 4, s"bin ${r.getAs[Int]("bin")} size $n implausible")
    }
  }

  test("q159: WOE and IV match a driver-side smoothed recompute") {
    // rebuild bins from the same integer-threshold rule
    val sorted = data.sortBy(_._1)
    val total = sorted.length
    val thresholds = (1 to 9).map { i =>
      // smallest distinct value with 10*cum >= i*tot
      val distinct = sorted.map(_._1).distinct
      val cums = distinct.map(v => sorted.count(_._1 <= v))
      distinct.zip(cums).find { case (_, c) => 10L * c >= i.toLong * total }.get._1
    }
    def bin(x: Double): Int = 1 + thresholds.count(x > _)
    val p = data.count(_._2 == 1).toLong
    val nn = data.length - p
    val byBin = data.groupBy(d => bin(d._1))
    var ivExpected = BigDecimal(0)
    rows.foreach { r =>
      val b = r.getAs[Int]("bin")
      val members = byBin(b)
      val pos = members.count(_._2 == 1).toLong
      assert(r.getAs[Long]("n_pos") == pos, s"bin $b n_pos")
      val ps = (pos + 1).toDouble / (p + 10)
      val ns = ((members.length - pos) + 1).toDouble / (nn + 10)
      val woe = math.log(ps / ns)
      assert(math.abs(r.getAs[Double]("woe") - woe) < 1e-6, s"bin $b woe")
      ivExpected += BigDecimal((ps - ns) * woe)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      // WOE sign tracks the bin's positive rate vs the smoothed global
      if (woe > 0.01) assert(pos.toDouble / members.length > p.toDouble / total - 0.1)
    }
    val iv = rows.head.getAs[Double]("iv")
    assert(rows.map(_.getAs[Double]("iv")).distinct.length == 1)
    assert(math.abs(iv - ivExpected.toDouble) < 1e-5, s"iv $iv vs $ivExpected")
    assert(iv >= 0.0, "IV is a sum of (p-q)ln(p/q) terms, each >= 0 up to smoothing")
  }
}
