package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the mining/profiling cards (q126–q128): math invariants the
  * oracle hash can't see by itself, and the plan shapes the 100 TB
  * arguments rest on. */
class MiningSpec extends SparkSpec {

  test("q126: rule metrics satisfy the association-rule identities") {
    val rules = MiningQueries.q126BasketRules(spark, Sf0001).collect()
    assert(rules.nonEmpty)
    // both directions of every surviving pair are emitted
    assert(rules.length % 2 == 0)
    val byPair = rules.groupBy(r => {
      val (a, b) = (r.getString(0), r.getString(1))
      if (a < b) (a, b) else (b, a)
    })
    byPair.values.foreach { dirs =>
      assert(dirs.length == 2)
      // lift is symmetric; support_n identical; confidence direction-specific
      assert(math.abs(dirs(0).getDouble(5) - dirs(1).getDouble(5)) < 1e-9)
      assert(dirs(0).getLong(2) == dirs(1).getLong(2))
    }
    rules.foreach { r =>
      val (supp, conf, lift) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(supp > 0 && supp <= 1, s"support out of range: $r")
      assert(conf >= supp - 1e-9 && conf <= 1, s"confidence < support: $r")
      assert(lift > 0, s"non-positive lift: $r")
    }
  }

  test("q126: part dim broadcasts into the basket build") {
    val plan = MiningQueries.q126BasketRules(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the part dim to broadcast:\n$plan")
  }

  test("q127: clean fixture profiles clean — completeness/uniqueness 1, zero violations") {
    val m = MiningQueries.q127DataProfile(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_totalprice", "o_orderdate")
    cols.foreach(c => assert(m((c, "completeness")) == 1.0, s"$c incomplete"))
    assert(m(("o_orderkey", "uniqueness")) == 1.0)
    assert(m(("o_orderstatus", "domain_violations")) == 0.0)
    assert(m(("o_orderpriority", "format_violations")) == 0.0)
    assert(m(("o_totalprice", "range_violations")) == 0.0)
    assert(m(("o_totalprice", "min")) > 0
      && m(("o_totalprice", "max")) >= m(("o_totalprice", "min")))
    assert(m(("o_orderdate", "max_epoch_day")) >= m(("o_orderdate", "min_epoch_day")))
    // distinct keys == row count (the uniqueness claim, cross-checked)
    val n = Tables(spark, Sf0001).orders.count().toDouble
    assert(m(("o_orderkey", "distinct")) == n)
  }

  test("q127: exact multi-distinct plans as ONE scan through Expand") {
    val qe = MiningQueries.q127DataProfile(spark, Sf0001).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Expand"), s"expected Expand for multi-distinct:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one orders scan, got $scans:\n$plan")
  }

  test("q128: candidates stay inside blocks and verify with dist <= 2") {
    val rows = MiningQueries.q128FuzzyBlocking(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (block, a, b, d) =
        (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))
      assert(a < b, s"unordered pair: $r")
      assert(a.split(" ")(1) == block && b.split(" ")(1) == block,
        s"pair escaped its block: $r")
      assert(d >= 1 && d <= 2, s"distance out of contract: $r")
    }
  }

  test("q131: skyline members are mutually non-dominated and dominate every other point") {
    val sky = MiningQueries.q131Skyline(spark, Sf0001).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    assert(sky.nonEmpty)
    def dominates(p: (Double, Int), r: (Double, Int)): Boolean =
      p._1 <= r._1 && p._2 <= r._2 && (p._1 < r._1 || p._2 < r._2)
    // internal consistency: no member dominates another
    for (p <- sky; r <- sky if p != r) assert(!dominates(p, r), s"$p dominates $r")
    // completeness: every distinct non-member point is dominated by a member
    val all = Tables(spark, Sf0001).part
      .select(col("p_retailprice"), col("p_size")).distinct().collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val skySet = sky.toSet
    all.filterNot(skySet).foreach { r =>
      assert(sky.exists(p => dominates(p, r)), s"$r escaped the skyline")
    }
    // the sweep's signature: sizes strictly decrease as price increases
    sky.sortBy(_._1).map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b < a)
      case _ =>
    }
  }

  test("q132: clusters match a driver-side union-find over the q128 edge set") {
    // independent path: rebuild the similarity graph from the q128 card's
    // output and union-find it in memory, then compare entity rollups
    val names = Tables(spark, Sf0001).part
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map(names.keys.map(n => n -> n).toSeq: _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    MiningQueries.q128FuzzyBlocking(spark, Sf0001).collect().foreach { r =>
      val (a, b) = (find(r.getString(1)), find(r.getString(2)))
      if (a != b) parent(if (a < b) b else a) = if (a < b) a else b
    }
    val expected = names.keys.toSeq.groupBy(find).map { case (_, ms) =>
      // toSeq: mapping a SET of names to counts would collapse equal counts
      ms.min -> (ms.size.toLong, ms.map(names).sum)
    }
    val got = MiningQueries.q132EntityResolution(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("q133: trigram counts match a driver-side sessionize-and-slide simulation") {
    val events = Tables(spark, Sf0001).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    var eligibleSessions = 0L
    val occ = scala.collection.mutable.Map[(String, String, String), Long]()
    val supp = scala.collection.mutable.Map[(String, String, String), Set[Long]]()
    var sessionSeq = 0L
    events.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      var sessions = List.empty[List[String]]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800L * 1000000L) sessions ::= Nil
        sessions = (sessions.head :+ e._3) :: sessions.tail
        prev = e._4
      }
      sessions.foreach { s =>
        sessionSeq += 1
        if (s.size >= 3) eligibleSessions += 1
        s.sliding(3).filter(_.size == 3).foreach { w =>
          val k = (w(0), w(1), w(2))
          occ(k) = occ.getOrElse(k, 0L) + 1
          supp(k) = supp.getOrElse(k, Set.empty) + sessionSeq
        }
      }
    }
    val got = MiningQueries.q133SeqPatterns(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == occ.keySet)
    got.foreach { case (k, (n, ns, support)) =>
      assert(n == occ(k), s"occurrence mismatch at $k")
      assert(ns == supp(k).size, s"session-support mismatch at $k")
      // same two longs, one IEEE division — bit-equal
      assert(support == ns.toDouble / eligibleSessions.toDouble)
    }
  }

  test("q134: cells partition the fact table; chi2 is the sum of its contributions") {
    val rows = MiningQueries.q134ChiSquare(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val factCount = Tables(spark, Sf0001).lineitem.count()
    assert(rows.map(_.getLong(2)).sum == factCount,
      "observed counts must partition lineitem")
    val chi2 = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == chi2))
    // contributions are 6-dp-exact doubles; their BigDecimal sum is the statistic
    val sum = rows.map(r => BigDecimal(r.getDouble(4))).sum.toDouble
    assert(math.abs(sum - chi2) < 1e-6, s"chi2 $chi2 != sum of contributions $sum")
    rows.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(4) >= 0)
    }
    // expected margins reproduce observed margins (within 6-dp rounding per cell)
    rows.groupBy(_.getString(0)).foreach { case (nation, cs) =>
      val o = cs.map(_.getLong(2)).sum.toDouble
      val e = cs.map(_.getDouble(3)).sum
      assert(math.abs(o - e) < 1e-4 * o + 1e-3, s"margin drift for $nation: $o vs $e")
    }
  }

  test("q135: pattern counts match a driver-side regex over rebuilt session strings") {
    val events = Tables(spark, Sf0001).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val seqs = scala.collection.mutable.ArrayBuffer[String]()
    events.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      var cur = List.empty[String]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev != Long.MinValue && e._4 - prev > 1800L * 1000000L) {
          seqs += cur.reverse.mkString(">"); cur = Nil
        }
        cur ::= e._3; prev = e._4
      }
      if (cur.nonEmpty) seqs += cur.reverse.mkString(">")
    }
    val patterns = Map(
      "browse_then_buy" -> "view(>view|>click)*>purchase",
      "error_recovery" -> "error(>[a-z]+)*>purchase",
      "rage_errors" -> "error>error",
      "bounce" -> "^view$")
    val got = MiningQueries.q135CepPatterns(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == patterns.keySet)
    patterns.foreach { case (name, pat) =>
      // Spark's rlike is java.util.regex find semantics — same engine here
      val expected = seqs.count(s => pat.r.findFirstIn(s).isDefined).toLong
      assert(got(name)._1 == expected, s"$name: ${got(name)._1} != $expected")
      assert(got(name)._2 == expected.toDouble / seqs.size.toDouble)
    }
  }

  test("q136: the generalization ladder is monotone and matches a driver-side rung") {
    val rows = MiningQueries.q136KAnonymity(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(100, 1000, 10000))
    // widening buckets can only merge classes: counts shrink, min_k grows
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 <= a._2, "classes must merge as buckets widen")
        assert(b._3 >= a._3, "min class size cannot shrink as buckets widen")
        assert(b._6 <= a._6 + 1e-12, "risky fraction cannot grow as buckets widen")
      case _ =>
    }
    // independent recompute of the finest rung
    val cust = Tables(spark, Sf0001).customer
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => ((r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 100)), 1L))
    val classes = cust.groupBy(_._1).map(_._2.size.toLong)
    val (w100, nc, minK, risky, riskyRows, frac) = rows.head
    assert(w100 == 100 && nc == classes.size && minK == classes.min)
    assert(risky == classes.count(_ < 10) && riskyRows == classes.filter(_ < 10).sum)
    assert(math.abs(frac - riskyRows.toDouble / cust.length) < 1e-6)
  }

  test("q142: absorption probabilities are monotone in horizon and anchor to q121's matrix") {
    val rows = RelationalQueries.q142MarkovAbsorption(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, p) => assert(p >= 0.0 && p <= 1.0) }
    // the target is absorbing: probability 1 at every horizon
    rows.filter(_._1 == "purchase").foreach { case (_, _, p) => assert(p == 1.0) }
    // more steps can only help: p is non-decreasing in the horizon
    rows.groupBy(_._1).values.foreach { hs =>
      hs.sortBy(_._2).map(_._3).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a - 1e-12, s"absorption decreased: $hs")
        case _ =>
      }
    }
    // horizon 1 IS the direct transition probability into the target
    val direct = RelationalQueries.q121MarkovTransitions(spark, Sf0001).collect()
      .filter(_.getString(1) == "purchase")
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    rows.filter(r => r._2 == 1 && r._1 != "purchase").foreach { case (s, _, p) =>
      assert(math.abs(p - direct.getOrElse(s, 0.0)) < 1e-12,
        s"$s: horizon-1 $p != direct ${direct.getOrElse(s, 0.0)}")
    }
  }

  test("q128: blocking prunes the cross product to sum-of-block-squares") {
    val names = Tables(spark, Sf0001).part
      .select(col("p_name")).distinct()
      .withColumn("block", element_at(split(col("p_name"), " "), 2))
    val total = names.count()
    val perBlock = names.groupBy(col("block")).count().collect()
      .map(_.getLong(1))
    val blocked = perBlock.map(n => n * (n - 1) / 2).sum
    val all = total * (total - 1) / 2
    assert(blocked < all,
      s"blocking should prune candidates: $blocked !< $all")
    // the candidate join (pre-distance-filter) produces exactly the
    // blocked pair count — no pair is considered outside its block
    val cand = names.as("a").join(names.as("b"), "block")
      .filter(col("a.p_name") < col("b.p_name")).count()
    assert(cand == blocked)
  }
}
