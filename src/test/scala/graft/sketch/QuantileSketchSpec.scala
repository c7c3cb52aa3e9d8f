package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q105's estimator contract: the histogram quantile is the upper edge
  * of the bin the exact discrete percentile falls in, so the error is
  * non-negative and strictly under one bin width. */
class QuantileSketchSpec extends SparkSpec {

  test("0 <= err < bin width for every group and both quantiles") {
    val e = graft.sql.Tables(spark, Sf0001).events.filter(col("value").isNotNull)
    val Seq(lo, hi) = e.agg(min(col("value")), max(col("value")))
      .collect()(0).toSeq.map(_.asInstanceOf[Double])
    val w = (hi - lo) / 128
    val rows = SketchQueries.q105QuantileSketch(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("p50_err", "p95_err")) {
        val err = r.getDouble(r.fieldIndex(c))
        assert(err >= 0 && err < w,
          s"${r.getString(0)} $c=$err outside [0, $w)")
      }
    }
  }
}
