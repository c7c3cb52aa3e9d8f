package graft.sql

import graft.SparkSpec

/** q171 Shapley invariants: the efficiency axiom Σφ = v(full) − v(∅)
  * holds (it is an algebraic identity over ANY characteristic function,
  * so decimal-exact here), the full-coalition value equals q169's base
  * conversion probability (shared kernel), dummy-channel monotonicity,
  * and shares normalize. */
class ShapleySpec extends SparkSpec {

  private lazy val rows = RelationalQueries.q171ShapleyAttribution(spark, Sf0001)
    .collect().map(r => r.getAs[String]("channel") -> r).toMap

  test("q171: efficiency axiom holds exactly; v_full matches q169's base") {
    val phis = rows.values.map(_.getAs[Double]("shapley")).toSeq
    val vf = rows.values.head.getAs[Double]("v_full")
    val ve = rows.values.head.getAs[Double]("v_empty")
    assert(math.abs(phis.sum - (vf - ve)) < 1e-12,
      s"efficiency: sum(phi)=${phis.sum} vs v_full - v_empty = ${vf - ve}")
    val q169base = RelationalQueries.q169RemovalAttribution(spark, Sf0001)
      .collect().head.getAs[Double]("p_base")
    assert(math.abs(vf - q169base) < 1e-15,
      s"v(full coalition) $vf must equal q169's base $q169base (same chain)")
  }

  test("q171: shares normalize; channel set fixed; values lawful") {
    assert(rows.keySet == Set("click", "error", "signup", "view"))
    val shares = rows.values.map(_.getAs[Double]("attribution_share")).toSeq
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"share sum ${shares.sum}")
    rows.values.foreach { r =>
      val ve = r.getAs[Double]("v_empty")
      val vf = r.getAs[Double]("v_full")
      assert(ve >= 0.0 && vf <= 1.0 && ve <= vf + 1e-12,
        "monotone coalition values (more channels can only add paths)")
    }
  }

  test("q171: Shapley and removal-effect agree on ranking direction for the top channel") {
    // both methods credit conversion contribution; the top Shapley
    // channel should carry a positive removal effect too (sanity link
    // between the two attribution cards)
    val topShap = rows.values.maxBy(_.getAs[Double]("shapley"))
    val q169 = RelationalQueries.q169RemovalAttribution(spark, Sf0001)
      .collect().map(r => r.getAs[String]("channel") -> r.getAs[Double]("removal_effect"))
      .toMap
    assert(q169(topShap.getAs[String]("channel")) >= 0.0)
    assert(topShap.getAs[Double]("shapley") >= 0.0,
      "the top channel cannot have negative Shapley value in a monotone game")
  }
}
