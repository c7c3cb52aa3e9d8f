package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q149 bootstrap invariants: the resampling weights are a proper
  * mean-one multiplicity distribution, the interval brackets the point
  * estimate, and the whole construction is replay-deterministic. */
class BootstrapSpec extends SparkSpec {

  private lazy val rows = RobustStatsQueries.q149BootstrapCi(spark, Sf0001).collect()

  test("q149: ci_lo <= mean <= ci_hi and the band has positive width") {
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (m, lo, hi) = (r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= m && m <= hi, s"${r.getAs[String]("event_type")}: mean $m outside [$lo, $hi]")
      assert(hi - lo > 0.0, "degenerate interval")
      assert(r.getAs[Double]("ci_width") == hi - lo)
    }
  }

  test("q149: the hash multiplicity is Binomial(8,1/8)-shaped — mean ~1 over many draws") {
    import graft.text.TextOps.hex60
    val spark2 = spark
    import spark2.implicits._
    val draws = (0L until 4000L).toDF("i")
      .select(hex60(concat(lit("bs:"), col("i").cast("string"), lit(":0"))).as("h"))
      .select((0 until 8).map(f =>
        when(shiftright(col("h"), 6 * f).bitwiseAND(lit(63L)) < 8, 1L).otherwise(0L))
        .reduce(_ + _).as("w"))
    val Seq(mean, mx) = draws.agg(avg(col("w")), max(col("w"))).collect()(0)
      .toSeq.map(v => v.toString.toDouble)
    assert(math.abs(mean - 1.0) < 0.1, s"weight mean $mean far from 1")
    assert(mx <= 8.0, "multiplicity above the field count")
  }

  test("q149: replay-deterministic — a second evaluation returns identical bytes") {
    val again = RobustStatsQueries.q149BootstrapCi(spark, Sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
