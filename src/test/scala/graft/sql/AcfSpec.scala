package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q158 ACF invariants: values match a driver-side textbook recompute on
  * the zero-filled series, live in [−1, 1], and the pair bookkeeping
  * (n_pairs = spine length − lag) is exact. */
class AcfSpec extends SparkSpec {

  private lazy val rows = TimeSeriesQueries.q158Acf(spark, Sf0001).collect()

  private lazy val series: Map[String, Array[Long]] = {
    val hourly = Tables(spark, Sf0001).events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    hourly.groupBy(_._1).map { case (t, rs) =>
      val byH = rs.map(r => r._2 -> r._3).toMap
      val (h0, h1) = (rs.map(_._2).min, rs.map(_._2).max)
      t -> (h0 to h1).map(h => byH.getOrElse(h, 0L)).toArray
    }
  }

  test("q158: matches a driver-side textbook ACF on the zero-filled series") {
    rows.foreach { r =>
      val (t, lag) = (r.getAs[String]("event_type"), r.getAs[Int]("lag"))
      val x = series(t).map(_.toDouble)
      val n = x.length
      val mean = x.sum / n
      val den = x.map(v => (v - mean) * (v - mean)).sum
      val num = (0 until n - lag).map(i => (x(i) - mean) * (x(i + lag) - mean)).sum
      val expected = num / den
      val got = r.getAs[Double]("acf")
      assert(math.abs(got - expected) < 1e-9, s"$t lag $lag: $got vs $expected")
      assert(r.getAs[Long]("n_pairs") == n - lag, s"$t lag $lag n_pairs")
    }
  }

  test("q158: every type has all six lags and lawful values") {
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Int]("lag")).sorted.sameElements(Array(1, 2, 3, 6, 12, 24)),
        s"$t lag coverage")
      rs.foreach { r =>
        val a = r.getAs[Double]("acf")
        assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"$t lag ${r.getAs[Int]("lag")}: $a")
      }
    }
  }
}
