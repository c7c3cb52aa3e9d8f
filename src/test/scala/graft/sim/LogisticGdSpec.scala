package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q147 logistic-GD invariants: step 1 from zero init has the closed form
  * w₁ = mean((y − σ(0))·x) = mean((y − ½)·x), and the trajectory must
  * actually move (a fixed point at step 1 would mean the gradient fold is
  * reading zeros). */
class LogisticGdSpec extends SparkSpec {

  private lazy val row = MlQueries.q147LogisticGd(spark, Sf0001).collect()(0)

  test("q147: step-1 weights match the closed form mean((y - 1/2)·x)") {
    val e = graft.sql.Tables(spark, Sf0001).embeddings
    val y = when(col("label") < 5, lit(1.0)).otherwise(lit(0.0))
    val expected = (0 until 4).map { i =>
      val x = element_at(col("embedding"), i + 1).cast("double")
      e.agg(avg((y - lit(0.5)) * x)).collect()(0).getDouble(0)
    } :+ e.agg(avg(y - lit(0.5))).collect()(0).getDouble(0)
    val got = (0 until 4).map(i => row.getAs[Double](s"w1_x$i")) :+ row.getAs[Double]("w1_b")
    expected.zip(got).zipWithIndex.foreach { case ((exp, g), k) =>
      // the query rounds σ through DECIMAL(18,6) and terms through
      // DECIMAL(18,9); with n=50 rows the accumulated slack stays ≪ 1e-5
      assert(math.abs(exp - g) < 1e-5, s"w1[$k]: closed form $exp vs query $g")
    }
  }

  test("q147: the second step moves every weight (the trajectory is not a fixed point)") {
    val moved = (0 until 4).count(i =>
      math.abs(row.getAs[Double](s"w2_x$i") - row.getAs[Double](s"w1_x$i")) > 1e-9)
    assert(moved >= 3, "step 2 left the weight vector (almost) unchanged")
    assert(row.schema.fieldNames.toSet ==
      (0 until 4).flatMap(i => Seq(s"w1_x$i", s"w2_x$i")).toSet ++ Set("w1_b", "w2_b"))
  }

  test("q147: full-batch loss does not increase from step 1 to step 2") {
    val e = graft.sql.Tables(spark, Sf0001).embeddings
    def loss(w: Seq[Double]): Double = {
      val y = when(col("label") < 5, lit(1.0)).otherwise(lit(0.0))
      val z = (0 until 4).map(i =>
        lit(w(i)) * element_at(col("embedding"), i + 1).cast("double")).reduce(_ + _) + lit(w(4))
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      e.agg(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))))
        .collect()(0).getDouble(0)
    }
    val w1 = (0 until 4).map(i => row.getAs[Double](s"w1_x$i")) :+ row.getAs[Double]("w1_b")
    val w2 = (0 until 4).map(i => row.getAs[Double](s"w2_x$i")) :+ row.getAs[Double]("w2_b")
    assert(loss(w2) <= loss(w1) + 1e-9,
      s"GD step increased the loss: ${loss(w1)} -> ${loss(w2)}")
  }
}
