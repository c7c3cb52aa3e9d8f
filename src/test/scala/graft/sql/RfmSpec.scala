package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q163 RFM invariants: the segment table matches a driver-side
  * from-scratch RFM build (same integer-threshold quintiles), shares sum
  * to one, and every dimension actually uses its full 1–5 scale. */
class RfmSpec extends SparkSpec {

  private lazy val rows = MiningQueries.q163RfmSegments(spark, Sf0001).collect()

  private lazy val expected: Map[String, (Long, Double, Double, Double)] = {
    val o = Tables(spark, Sf0001).orders
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
        col("o_totalprice").cast("decimal(18,6)").as("p"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, BigDecimal(r.getDecimal(2))))
    val maxd = o.map(_._2).max
    val cust = o.groupBy(_._1).map { case (c, g) =>
      val r = java.time.temporal.ChronoUnit.DAYS.between(g.map(_._2).max, maxd)
      (c, r, g.length.toLong, g.map(_._3).sum)
    }.toSeq
    def cuts[T](vs: Seq[T])(implicit ord: Ordering[T]): Seq[T] = {
      val total = vs.length
      val distinct = vs.distinct.sorted
      (1 to 4).map(i => distinct.find(v => 5L * vs.count(ord.lteq(_, v)) >= i.toLong * total).get)
    }
    val (rc, fc, mc) = (cuts(cust.map(_._2)), cuts(cust.map(_._3)), cuts(cust.map(_._4)))
    cust.groupBy { case (_, r, f, m) =>
      val rs = 6 - (1 + rc.count(r > _))
      val fs = 1 + fc.count(f > _)
      val ms = 1 + mc.count(m > _)
      s"$rs$fs$ms"
    }.map { case (seg, g) =>
      seg -> ((g.size.toLong,
        g.map(_._2).sum.toDouble / g.size,
        g.map(_._3).sum.toDouble / g.size,
        g.map(_._4).sum.toDouble / g.size))
    }
  }

  test("q163: segment table matches a driver-side RFM build") {
    assert(rows.map(_.getAs[String]("segment")).toSet == expected.keySet)
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      val (n, ar, af, am) = expected(seg)
      assert(r.getAs[Long]("n_customers") == n, s"$seg n")
      assert(math.abs(r.getAs[Double]("avg_recency_days") - ar) < 1e-9, s"$seg recency")
      assert(math.abs(r.getAs[Double]("avg_orders") - af) < 1e-9, s"$seg orders")
      assert(math.abs(r.getAs[Double]("avg_spend") - am) < 1e-6, s"$seg spend")
    }
  }

  test("q163: shares sum to one and every dimension uses its 1-5 scale") {
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val segs = rows.map(_.getAs[String]("segment"))
    (0 to 2).foreach { pos =>
      val used = segs.map(_.charAt(pos).asDigit).toSet
      assert(used.subsetOf((1 to 5).toSet), s"dimension $pos out of scale: $used")
      assert(used.size >= 4, s"dimension $pos collapsed to $used")
    }
  }
}
