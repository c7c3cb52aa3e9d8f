package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q152 Kaplan–Meier invariants, checked against a driver-side
  * product-limit recompute (engine-independent oracle at sf0.001). */
class SurvivalSpec extends SparkSpec {

  private lazy val rows = SurvivalQueries.q152KmSurvival(spark, Sf0001).collect()
    .sortBy(_.getAs[Long]("t_hours"))

  test("q152: survival is a proper non-increasing curve in [0, 1] with censoring present") {
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Double]("survival"))
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 }, "survival increased")
    val r0 = rows.head
    val expected0 = 1.0 - r0.getAs[Long]("n_converted").toDouble / r0.getAs[Long]("n_at_risk")
    assert(math.abs(r0.getAs[Double]("survival") - expected0) < 1e-5,
      "first step must be 1 - d1/n1")
    // the card only earns its keep if the window actually censors
    // someone: final survival must stay ABOVE zero-minus-everyone, i.e.
    // conversions observed < users at risk initially
    assert(rows.map(_.getAs[Long]("n_converted")).sum < rows.head.getAs[Long]("n_at_risk"),
      "no censoring at sf0.001 — the observation window no longer bites")
  }

  test("q152: matches a driver-side Kaplan-Meier recompute") {
    val users = Tables(spark, Sf0001).events
      .groupBy(col("user_id"))
      .agg(min(unix_timestamp(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", unix_timestamp(col("ts")))).as("tp"))
      .collect()
      .map(r => (r.getAs[Long]("t0"), Option(r.getAs[java.lang.Long]("tp")).map(_.longValue())))
    val lives = users.map { case (t0, tp) =>
      val hrs = tp.map(p => (p - t0) / 3600)
      hrs match {
        case Some(h) if h <= 72 => (h, true)
        case _                  => (72L, false)
      }
    }
    val total = lives.length
    val byLife = lives.groupBy(_._1).toSeq.sortBy(_._1)
    var cumBefore = 0
    var surv = 1.0
    val expected = byLife.flatMap { case (life, grp) =>
      val nRisk = total - cumBefore
      val d = grp.count(_._2)
      cumBefore += grp.length
      if (d > 0) {
        surv *= 1.0 - d.toDouble / nRisk
        Some((life, nRisk.toLong, d.toLong, surv))
      } else None
    }
    val got = rows.map(r => (r.getAs[Long]("t_hours"), r.getAs[Long]("n_at_risk"),
      r.getAs[Long]("n_converted"), r.getAs[Double]("survival")))
    assert(got.length == expected.length, s"step counts: ${got.length} vs ${expected.length}")
    got.zip(expected).foreach { case ((gl, gn, gd, gs), (el, en, ed, es)) =>
      assert(gl == el && gn == en && gd == ed, s"step $gl: risk/event mismatch")
      // the query routes the product through decimal-rounded ln terms;
      // agreement to 1e-5 pins the arithmetic without re-deriving it
      assert(math.abs(gs - es) < 1e-5, s"step $gl: survival $gs vs driver $es")
    }
  }
}
