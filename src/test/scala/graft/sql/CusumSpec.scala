package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q209 CUSUM changepoint invariants: the whole statistic re-derived
  * driver-side from the raw events (zero-filled spine, exact integer
  * D_t = n·P_t − t·T, earliest-argmax), plus the structural laws
  * (D_n = 0, split means reconstruct the total). */
class CusumSpec extends SparkSpec {

  private lazy val hourly: Map[(String, Long), Long] =
    spark.read.parquet(s"$Sf0001/events.parquet")
      .select(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', CAST(ts AS TIMESTAMP))) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("q209: changepoint, means, and cusum_max match a driver replay") {
    val rows = graft.sql.TimeSeriesQueries.q209CusumChangepoint(spark, Sf0001).collect()
    val types = hourly.keys.map(_._1).toSeq.distinct.sorted
    assert(rows.map(_.getAs[String]("event_type")).toSeq == types)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val hs = hourly.collect { case ((t, h), c) if t == et => (h, c) }.toSeq
      val h0 = hs.map(_._1).min; val h1 = hs.map(_._1).max
      val byH = hs.toMap
      val xs = (h0 to h1).map(h => byH.getOrElse(h, 0L))
      val n = xs.size.toLong
      val tot = xs.sum
      var p = 0L
      val ds = xs.zipWithIndex.map { case (x, i) =>
        p += x
        val t = i + 1L
        (t, p, BigInt(n) * p - BigInt(t) * tot)
      }
      // D_n = 0 by construction
      assert(ds.last._3 == 0)
      val (ct, cp, cd) = ds.minBy { case (t, _, d) => (-d.abs, t) }
      assert(r.getAs[Long]("n_hours") == n && r.getAs[Long]("n_events") == tot)
      assert(r.getAs[Long]("cp_index") == ct, s"$et cp_index")
      assert(r.getAs[Double]("mean_before") == cp.toDouble / ct)
      if (ct < n) {
        val after = (tot - cp).toDouble / (n - ct)
        assert(r.getAs[Double]("mean_after") == after)
        assert(r.getAs[Double]("shift") == after - cp.toDouble / ct)
      }
      assert(r.getAs[Double]("cusum_max") == cd.abs.toDouble / n)
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("direction")))
      // the split means must reconstruct the total mass exactly
      assert(cp + (tot - cp) == tot)
    }
  }
}
