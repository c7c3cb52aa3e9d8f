package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q161 A/B-readout invariants: the hash assignment partitions users
  * reproducibly, arm stats match a driver-side recompute on rounded
  * per-user totals, and the t statistic follows Welch's formula from
  * the published arm stats. */
class AbTestSpec extends SparkSpec {

  private lazy val rows = MiningQueries.q161AbTest(spark, Sf0001).collect()

  private def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private lazy val perUser: Map[Long, BigDecimal] = Tables(spark, Sf0001).events
    .select(col("user_id"), col("value").cast("decimal(18,6)").as("v"))
    .groupBy(col("user_id")).agg(sum(col("v")).as("tv"))
    .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap

  test("q161: arms partition users via the seeded hash and stats recompute") {
    val byArm = perUser.groupBy { case (u, _) => (hex60(s"ab:$u") % 2).toInt }
    assert(rows.map(_.getAs[Int]("arm")).sorted.sameElements(Array(0, 1)))
    rows.foreach { r =>
      val arm = r.getAs[Int]("arm")
      val members = byArm(arm).values.toSeq
      assert(r.getAs[Long]("n_users") == members.length, s"arm $arm size")
      val mean = (members.sum / members.length).toDouble
      assert(math.abs(r.getAs[Double]("mean_value") - mean) < 1e-9, s"arm $arm mean")
      val n = members.length
      // mirror the card's whole-unit quantization of Σ and Σ² (HALF_UP
      // to scale 0) before the IEEE variance chain
      val s = members.sum.setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ss = members.map(v => (v * v)).sum
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      val v = (n * ss - s * s) / (n.toDouble * (n - 1))
      assert(math.abs(r.getAs[Double]("var_value") - v) < 1e-9 * math.max(1.0, v),
        s"arm $arm variance")
    }
  }

  test("q161: t statistic follows Welch's formula from the published arm stats") {
    val a = rows.find(_.getAs[Int]("arm") == 0).get
    val b = rows.find(_.getAs[Int]("arm") == 1).get
    val t = (a.getAs[Double]("mean_value") - b.getAs[Double]("mean_value")) /
      math.sqrt(a.getAs[Double]("var_value") / a.getAs[Long]("n_users") +
        b.getAs[Double]("var_value") / b.getAs[Long]("n_users"))
    val got = rows.head.getAs[Double]("t_stat")
    assert(rows.map(_.getAs[Double]("t_stat")).distinct.length == 1)
    assert(math.abs(got - t) < 1e-12, s"t $got vs $t")
    assert(rows.head.getAs[Boolean]("significant") == (math.abs(t) > 1.96))
  }
}
