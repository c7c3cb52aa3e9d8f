package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q181 invariants: the greedy fill re-derives bit-exactly from a
  * plain-Scala rebuild (tokenize → source stats → ranked candidates →
  * fractional knapsack), the budget is exactly exhausted, and the
  * allocation is threshold-shaped (full above the marginal-utility cut,
  * zero below, at most one fractional straddler). */
class EpochAllocationSpec extends SparkSpec {

  private lazy val rows = TextQueries.q181EpochAllocation(spark, Sf0001).collect()

  private lazy val stats: Map[String, (Long, Long)] = {
    val docs = graft.sql.Tables(spark, Sf0001).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).view.mapValues { g =>
      val toks = g.flatMap(_._2.toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+").toSeq)
      (toks.length.toLong, toks.distinct.length.toLong)
    }.toMap
  }

  test("q181: the allocation re-derives bit-exactly from a driver-side greedy rebuild") {
    val b = 2L * stats.values.map(_._1).sum
    val cand = (for {
      (src, (n, d)) <- stats.toSeq
      e <- 1 to 4
    } yield (src, e, n, d.toDouble / n / math.pow(2.0, e - 1)))
      .sortBy { case (src, e, _, u) => (-u, src, e) }
    var cum = 0L
    val fracs = cand.map { case (src, e, n, _) =>
      cum += n
      val frac =
        if (cum <= b) 1.0
        else if (cum - n >= b) 0.0
        else (b - (cum - n)).toDouble / n
      (src, e, frac)
    }
    val bySrc = fracs.groupBy(_._1)
    assert(rows.length == stats.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (n, d) = stats(src)
      assert(r.getAs[Long]("n_tokens") == n, s"$src n_tokens")
      assert(r.getAs[Long]("distinct_tokens") == d, s"$src distinct")
      assert(r.getAs[Double]("ttr") == d.toDouble / n, s"$src ttr")
      val fs = bySrc(src).map(_._3)
      val full = fs.count(_ == 1.0)
      val fracPart = fs.filter(f => f > 0 && f < 1).sum
      assert(r.getAs[Double]("epochs_alloc") == full + fracPart, s"$src epochs")
      val alloc = (n * full).toDouble + n.toDouble * fracPart
      assert(r.getAs[Double]("alloc_tokens") == alloc, s"$src alloc")
      assert(r.getAs[Double]("budget_share") == alloc / b.toDouble, s"$src share")
    }
  }

  test("q181: the budget is exactly exhausted and the allocation is threshold-shaped") {
    val b = 2L * stats.values.map(_._1).sum
    val total = rows.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(total - b) < 1e-6 * b, s"allocated $total of budget $b")
    // 2x budget with 4 allowed epochs: every source gets at least its
    // first epoch (utility ordering within a source is decreasing)
    rows.foreach(r => assert(r.getAs[Double]("epochs_alloc") >= 1.0,
      s"${r.getAs[String]("source")} starved below one epoch"))
    // at most one fractional source (the global straddler)
    val fractional = rows.count { r =>
      val e = r.getAs[Double]("epochs_alloc"); e != math.floor(e)
    }
    assert(fractional <= 1, s"$fractional fractional sources")
  }
}
