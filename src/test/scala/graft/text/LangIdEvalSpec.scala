package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q167 lang-id-eval invariants: the metrics must derive exactly from
  * q17's per-doc predictions (shared kernel), supports tally the corpus,
  * the F1 identity holds, and accuracy equals q17's agree rate. */
class LangIdEvalSpec extends SparkSpec {

  private lazy val rows = TextQueries.q167LangIdEval(spark, Sf0001).collect()

  private lazy val preds: Seq[(String, String)] =
    TextQueries.q17LangId(spark, Sf0001)
      .select(col("lang"), col("pred_lang")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("q167: metrics derive exactly from q17's prediction frame") {
    val byTrue = preds.groupBy(_._1)
    assert(rows.map(_.getAs[String]("lang")).toSet == byTrue.keySet)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val nTrue = byTrue(lang).size.toLong
      val tp = byTrue(lang).count(_._2 == lang).toLong
      val nPred = preds.count(_._2 == lang).toLong
      assert(r.getAs[Long]("n_true") == nTrue, s"$lang n_true")
      assert(r.getAs[Long]("tp") == tp, s"$lang tp")
      assert(r.getAs[Long]("n_pred") == nPred, s"$lang n_pred")
      if (nPred > 0)
        assert(math.abs(r.getAs[Double]("precision") - tp.toDouble / nPred) < 1e-12)
      assert(math.abs(r.getAs[Double]("recall") - tp.toDouble / nTrue) < 1e-12)
      // F1 identity: 2TP/(n_pred + n_true) ≡ harmonic mean of P and R
      val f1 = 2.0 * tp / (nPred + nTrue)
      assert(math.abs(r.getAs[Double]("f1") - f1) < 1e-6, s"$lang f1")
    }
  }

  test("q167: accuracy equals q17's agree rate; macro-F1 averages the F1 column") {
    val agree = preds.count(p => p._1 == p._2).toDouble / preds.size
    assert(math.abs(rows.head.getAs[Double]("accuracy") - agree) < 1e-12)
    val f1s = rows.map(_.getAs[Double]("f1"))
    assert(math.abs(rows.head.getAs[Double]("macro_f1") - f1s.sum / f1s.length) < 1e-6)
    assert(rows.map(_.getAs[Double]("accuracy")).distinct.length == 1)
    rows.foreach { r =>
      Seq("precision", "recall", "f1").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"${r.getAs[String]("lang")} $c=$v")
      }
    }
  }
}
