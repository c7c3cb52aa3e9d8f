package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q166 seasonal-index invariants: the cell-weighted mean of the indices
  * is exactly 1 (the decomposition identity), all 12 months appear, and
  * a driver-side recompute agrees. */
class SeasonalIndexSpec extends SparkSpec {

  private lazy val rows = TimeSeriesQueries.q166SeasonalIndex(spark, Sf0001).collect()

  test("q166: all 12 months, indices positive, identity holds") {
    assert(rows.map(_.getAs[Int]("month")).sorted.sameElements(1 to 12))
    rows.foreach(r => assert(r.getAs[Double]("seasonal_index") > 0))
    // Σ n_cells·index / Σ n_cells = overall_avg/overall_avg = 1 exactly
    val num = rows.map(r => r.getAs[Long]("n_cells") * r.getAs[Double]("seasonal_index")).sum
    val den = rows.map(_.getAs[Long]("n_cells")).sum
    assert(math.abs(num / den - 1.0) < 1e-9, s"identity ${num / den}")
  }

  test("q166: matches a driver-side recompute") {
    val cells = Tables(spark, Sf0001).orders
      .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        col("o_totalprice").cast("decimal(18,6)").as("p"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), BigDecimal(r.getDecimal(2))))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val overall = cells.values.sum.toDouble / cells.size
    val byMonth = cells.groupBy(_._1._2)
    rows.foreach { r =>
      val m = r.getAs[Int]("month")
      val g = byMonth(m)
      assert(r.getAs[Long]("n_cells") == g.size)
      val exp = (g.values.sum.toDouble / g.size) / overall
      assert(math.abs(r.getAs[Double]("seasonal_index") - exp) < 1e-9, s"month $m")
    }
  }
}
