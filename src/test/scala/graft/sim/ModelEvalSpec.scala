package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q154 model-eval invariants: the AUC must equal a driver-side
  * brute-force Mann–Whitney recompute on the raw (score, label) pairs
  * (tie-corrected), the reliability table must partition the corpus, and
  * every probability-space metric must live in its lawful range. */
class ModelEvalSpec extends SparkSpec {

  private lazy val rows = MlQueries.q154ModelEval(spark, Sf0001).collect()

  test("q154: AUC matches a driver-side tie-corrected Mann-Whitney recompute") {
    // recompute scores with the same 6-dp sigmoid contract by reading the
    // fitted weights straight off q147's trajectory row
    val t = MlQueries.q147LogisticGd(spark, Sf0001).collect()(0)
    val w = (0 until 4).map(i => t.getAs[Double](s"w2_x$i")) :+ t.getAs[Double]("w2_b")
    val e = graft.sql.Tables(spark, Sf0001).embeddings
    val z = (0 until 4).map(i =>
      lit(w(i)) * element_at(col("embedding"), i + 1).cast("double")).reduce(_ + _) + lit(w(4))
    val pairs = e.select(
      (lit(1.0) / (lit(1.0) + exp(-z))).cast("decimal(18,6)").cast("double").as("s"),
      when(col("label") < 5, 1).otherwise(0).as("y"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))

    val pos = pairs.filter(_._2 == 1).map(_._1)
    val neg = pairs.filter(_._2 == 0).map(_._1)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val expected = num / (pos.length.toDouble * neg.length.toDouble)

    val auc = rows.head.getAs[Double]("auc")
    assert(rows.map(_.getAs[Double]("auc")).distinct.length == 1,
      "auc must be constant across bin rows")
    assert(math.abs(auc - expected) < 1e-12, s"auc $auc vs brute-force $expected")
  }

  test("q154: reliability bins partition the corpus and metrics stay in range") {
    val total = graft.sql.Tables(spark, Sf0001).embeddings.count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total,
      "bin row counts must sum to the corpus size")
    assert(rows.map(_.getAs[Int]("bin")).distinct.length == rows.length)
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      assert(bin >= 0 && bin <= 9)
      val ms = r.getAs[Double]("mean_score")
      val fp = r.getAs[Double]("frac_pos")
      assert(ms >= 0.0 && ms <= 1.0, s"mean_score $ms out of range")
      assert(fp >= 0.0 && fp <= 1.0, s"frac_pos $fp out of range")
      // the bin's mean score must actually fall inside (or on) the bin
      assert(ms >= bin / 10.0 - 1e-9 && ms <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean_score $ms escapes its decile")
      val auc = r.getAs[Double]("auc")
      val brier = r.getAs[Double]("brier")
      assert(auc >= 0.0 && auc <= 1.0)
      assert(brier >= 0.0 && brier <= 1.0)
    }
  }

  test("q154: Brier score matches a driver-side mean-squared-error recompute") {
    val t = MlQueries.q147LogisticGd(spark, Sf0001).collect()(0)
    val w = (0 until 4).map(i => t.getAs[Double](s"w2_x$i")) :+ t.getAs[Double]("w2_b")
    val e = graft.sql.Tables(spark, Sf0001).embeddings
    val z = (0 until 4).map(i =>
      lit(w(i)) * element_at(col("embedding"), i + 1).cast("double")).reduce(_ + _) + lit(w(4))
    val exp6 = (lit(1.0) / (lit(1.0) + exp(-z))).cast("decimal(18,6)").cast("double")
    val y = when(col("label") < 5, 1.0).otherwise(0.0)
    val expected = e.agg(avg(pow(exp6 - y, 2.0))).collect()(0).getDouble(0)
    assert(math.abs(rows.head.getAs[Double]("brier") - expected) < 1e-9)
  }
}
