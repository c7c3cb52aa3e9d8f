package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q169 removal-effect invariants: the whole pipeline (journey build →
  * matrix → per-removal induction → shares) must match a driver-side
  * from-scratch replay; removal can only LOSE paths (no renormalization)
  * so every effect is in [0, 1]; shares normalize. */
class RemovalAttributionSpec extends SparkSpec {

  private lazy val rows = RelationalQueries.q169RemovalAttribution(spark, Sf0001)
    .collect().map(r => r.getAs[String]("channel") -> r).toMap

  // driver-side replay on the raw events
  private lazy val replay: (Double, Map[String, Double]) = {
    val ev = Tables(spark, Sf0001).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // sessionize: 30-minute gap on (us, event_id) order per user
    val journeys = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._4, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev != Long.MinValue && e._4 - prev > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._3
        prev = e._4
      }
      sessions.map(_.toList)
    }.toList
    // truncate at first purchase; terminal conv/no_conv
    def transitions(): Map[(String, String), Long] = {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      journeys.foreach { j =>
        val cut = j.indexOf("purchase") match {
          case -1 => j
          case i  => j.take(i + 1)
        }
        val path = "start" :: cut
        path.zip(path.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + 1)
        val term = (cut.last, if (cut.contains("purchase")) "conv" else "no_conv")
        pairs(term) = pairs.getOrElse(term, 0L) + 1
      }
      pairs.toMap
    }
    val full = transitions()
    val totals = full.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    def probs(drop: Option[String]) = full.collect {
      case ((f, t), n) if drop.forall(c => f != c && t != c) =>
        (f, t) -> n.toDouble / totals(f) // NOTE: totals from the FULL matrix
    }.toMap
    def absorb(p: Map[(String, String), Double]): Double = {
      val states = (p.keys.flatMap(k => Seq(k._1, k._2))).toSet ++ Set("conv", "no_conv")
      var ph = states.map(s => s -> (if (s == "conv") 1.0 else 0.0)).toMap
      for (_ <- 1 to 6) {
        val next = states.map { s =>
          s -> (if (s == "conv") 1.0
                else p.collect { case ((f, t), pr) if f == s => pr * ph(t) }.sum)
        }.toMap
        ph = next
      }
      ph.getOrElse("start", 0.0)
    }
    val pb = absorb(probs(None))
    val prs = Seq("click", "error", "signup", "view")
      .map(c => c -> absorb(probs(Some(c)))).toMap
    (pb, prs)
  }

  test("q169: base and per-removal conversion probabilities match the replay") {
    val (pb, prs) = replay
    // the query rounds per-step products through DECIMAL(18,12); the
    // replay is full-double — agreement to ~1e-9 over 6 steps
    rows.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("p_base") - pb) < 1e-9,
        s"p_base ${r.getAs[Double]("p_base")} vs $pb")
      val c = r.getAs[String]("channel")
      assert(math.abs(r.getAs[Double]("p_removed") - prs(c)) < 1e-9, s"$c p_removed")
    }
  }

  test("q169: effects in [0,1] (removal only loses paths) and shares normalize") {
    assert(rows.keySet == Set("click", "error", "signup", "view"))
    rows.values.foreach { r =>
      val re = r.getAs[Double]("removal_effect")
      assert(re >= -1e-12 && re <= 1.0 + 1e-12, s"${r.getAs[String]("channel")} re=$re")
    }
    val shares = rows.values.map(_.getAs[Double]("attribution_share")).toSeq
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"shares sum ${shares.sum}")
  }
}
