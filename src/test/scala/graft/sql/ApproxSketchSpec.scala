package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approximate-sketch toolkit the exact queries swap to at 100 TB:
  * HLL distinct counts and quantile sketches, pinned to their error
  * contracts against the exact answers (no DuckDB oracle — sketch
  * internals differ per engine, so the spec IS the gate, like q25/q45). */
class ApproxSketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact (HLL, rsd=0.02)") {
    val t = Tables(spark, Sf0001)
    val exact = t.orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = t.orders.select(approx_count_distinct(col("o_custkey"), 0.02)).head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"exact=$exact approx=$approx err=$err")
  }

  test("approx_percentile within 2% of the exact discrete percentile") {
    val t = Tables(spark, Sf0001)
    val exact = t.lineitem
      .select(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"))
      .head().getDouble(0)
    val approx = t.lineitem
      .select(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.02, s"exact=$exact approx=$approx")
  }
}
