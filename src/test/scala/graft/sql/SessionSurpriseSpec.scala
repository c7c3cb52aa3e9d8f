package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q172 surprise-scoring invariants: the top-k list matches a driver-side
  * replay (sessionize → model → NLL → rank), scores are lawful
  * (nll ≥ 0, per-transition mean consistent), and the list is genuinely
  * the maximum over all scored sessions. */
class SessionSurpriseSpec extends SparkSpec {

  private lazy val rows = RelationalQueries.q172SessionSurprise(spark, Sf0001).collect()

  private lazy val replay: Seq[(Long, Long, Int, Double)] = {
    val ev = Tables(spark, Sf0001).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val sorted = g.sortBy(e => (e._4, e._2))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, List[String])]()
      var sid = 0L; var prev = Long.MinValue
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      sorted.foreach { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800000000L) {
          if (cur.nonEmpty) out += ((u, sid, cur.toList))
          sid += 1; cur = scala.collection.mutable.ArrayBuffer[String]()
        }
        cur += e._3; prev = e._4
      }
      if (cur.nonEmpty) out += ((u, sid, cur.toList))
      out
    }
    val pairs = sessions.flatMap { case (u, s, path) =>
      path.zip(path.tail).map(p => (u, s, p))
    }
    val counts = pairs.groupBy(_._3).map { case (p, g) => p -> g.size.toLong }
    val fromTotals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    def term(p: (String, String)): BigDecimal =
      BigDecimal(-math.log(counts(p).toDouble / fromTotals(p._1)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    pairs.groupBy(p => (p._1, p._2)).map { case ((u, s), g) =>
      val nll = g.map(p => term(p._3)).sum
      (u, s, g.size, nll.toDouble / g.size)
    }.toSeq.sortBy { case (u, s, _, npt) => (-npt, u, s) }.take(20)
  }

  test("q172: top-20 matches the driver-side replay exactly") {
    val got = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sid"),
      r.getAs[Long]("n_transitions").toInt, r.getAs[Double]("nll_per_transition")))
    replay.zip(got).zipWithIndex.foreach { case (((eu, es, en, enpt), (u, s, n, npt)), i) =>
      assert((eu, es, en) == (u, s, n), s"rank $i identity: got ($u,$s,$n) vs ($eu,$es,$en)")
      assert(math.abs(enpt - npt) < 1e-9, s"rank $i score")
    }
  }

  test("q172: scores lawful and internally consistent") {
    rows.foreach { r =>
      val nll = r.getAs[Double]("nll")
      val n = r.getAs[Long]("n_transitions")
      assert(nll >= 0.0, "NLL of probabilities <= 1 cannot be negative")
      assert(math.abs(r.getAs[Double]("nll_per_transition") - nll / n) < 1e-12)
      assert(n >= 1)
    }
    assert(rows.length == 20)
  }
}
