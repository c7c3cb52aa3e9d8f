package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q155 item-item CF invariants: the shortlist must match a driver-side
  * brute-force cosine top-k, the cut must actually plan through the
  * TopKPerKey operator (the card's scale story), and the similarity
  * ledger must obey its structural laws (symmetry of the underlying
  * score, cooc ≤ min reach, k-bounded lists). */
class ItemCfSpec extends SparkSpec {

  private lazy val df = MiningQueries.q155ItemCf(spark, Sf0001)
  private lazy val rows = df.collect()

  test("q155: per-item lists are k-bounded with lawful scores") {
    val byItem = rows.groupBy(_.getAs[Long]("item"))
    byItem.foreach { case (item, rs) =>
      assert(rs.length <= 3, s"item $item has ${rs.length} neighbors")
      assert(rs.map(_.getAs[Long]("neighbor")).distinct.length == rs.length)
      rs.foreach { r =>
        val sim = r.getAs[Double]("sim")
        assert(sim > 0.0 && sim <= 1.0, s"item $item sim $sim out of (0,1]")
        assert(r.getAs[Long]("neighbor") != item, "self-similarity leaked")
      }
      // list is served ranked: sim non-increasing within the item
      val sims = rs.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"item $item list not rank-ordered")
    }
  }

  test("q155: matches a driver-side brute-force cosine top-3") {
    val baskets = Tables(spark, Sf0001).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ic = baskets.groupBy(_._2).map { case (i, g) => i -> g.length }
    val byOid = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCnt = scala.collection.mutable.Map[(Long, Long), Int]()
    byOid.values.filter(is => is.length >= 2 && is.length <= 64).foreach { is =>
      for (i <- is.indices; j <- i + 1 until is.length)
        pairCnt((is(i), is(j))) = pairCnt.getOrElse((is(i), is(j)), 0) + 1
    }
    val directed = pairCnt.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val expected = directed.groupBy(_._1).flatMap { case (item, ns) =>
      ns.map { case (_, n, c) => (n, c, c / math.sqrt(ic(item).toDouble * ic(n))) }
        .sortBy { case (n, _, s) => (-s, n) }
        .take(3)
        .map { case (n, c, s) => (item, n, c.toLong, s) }
    }.toSet
    val got = rows.map(r => (r.getAs[Long]("item"), r.getAs[Long]("neighbor"),
      r.getAs[Long]("cooc"), r.getAs[Double]("sim"))).toSet
    assert(got == expected,
      s"mismatch: extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
  }

  test("q155: the cut plans through the TopKPerKey heap operator") {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), s"TopKWindowRewrite did not fire:\n$plan")
    assert(!plan.contains("WindowGroupLimit"), "window group-limit machinery survived")
  }

  test("q155: cooc never exceeds either item's basket reach") {
    val ic = Tables(spark, Sf0001).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val c = r.getAs[Long]("cooc")
      assert(c <= math.min(ic(r.getAs[Long]("item")), ic(r.getAs[Long]("neighbor"))))
    }
  }
}
