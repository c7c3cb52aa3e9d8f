package graft.sql

import graft.SparkSpec

/** q153 backtest invariants: metric ranges, the MAE ≥ |bias| triangle
  * inequality, and coverage consistency with q146's forecast rows. */
class ForecastEvalSpec extends SparkSpec {

  private lazy val rows = TimeSeriesQueries.q153ForecastEval(spark, Sf0001).collect()

  test("q153: sMAPE in [0, 2], MAE >= |bias|, all metrics finite") {
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (mae, smape, bias) =
        (r.getAs[Double]("mae"), r.getAs[Double]("smape"), r.getAs[Double]("bias"))
      assert(smape >= 0.0 && smape <= 2.0, s"sMAPE out of range: $smape")
      assert(mae >= math.abs(bias) - 1e-9, s"triangle inequality violated: mae=$mae bias=$bias")
      assert(!mae.isNaN && !smape.isNaN && !bias.isNaN)
    }
  }

  test("q153: n_forecasts equals q146's rows with a baseline, per type") {
    val fromSpikes = TimeSeriesQueries.q146EwmaSpikes(spark, Sf0001).collect()
      .filter(_.getAs[java.lang.Double]("baseline") != null)
      .groupBy(_.getAs[String]("event_type")).map { case (t, rs) => t -> rs.length.toLong }
    val got = rows.map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_forecasts")).toMap
    assert(got == fromSpikes, s"coverage mismatch: $got vs $fromSpikes")
  }
}
