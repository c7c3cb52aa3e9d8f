package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q182 invariants: the spectrum re-derives from a plain-Scala gram count
  * at orders 1 and 2, and novelty is monotone in gram order (longer grams
  * can only be rarer). */
class NgramNoveltySpec extends SparkSpec {

  private lazy val rows = TextQueries.q182NgramNovelty(spark, Sf0001).collect()
    .map(r => r.getAs[Int]("n") -> r).toMap

  private lazy val docTokens: Seq[Seq[String]] =
    graft.sql.Tables(spark, Sf0001).documents
      .select(col("text")).collect()
      .map(_.getString(0).toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+").toSeq).toSeq

  private def expected(n: Int): (Long, Long, Long) = {
    val grams = docTokens.flatMap(t => t.sliding(n).filter(_.size == n).map(_.mkString(" ")))
    val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
    (grams.size.toLong, counts.size.toLong, counts.count(_._2 == 1).toLong)
  }

  test("q182: orders 1 and 2 re-derive from a driver-side gram count") {
    for (n <- Seq(1, 2)) {
      val (total, distinct, singles) = expected(n)
      val r = rows(n)
      assert(r.getAs[Long]("total_ngrams") == total, s"n=$n total")
      assert(r.getAs[Long]("distinct_ngrams") == distinct, s"n=$n distinct")
      assert(r.getAs[Long]("singletons") == singles, s"n=$n singletons")
      assert(r.getAs[Double]("distinct_ratio") == distinct.toDouble / total)
      assert(r.getAs[Double]("novel_frac") == singles.toDouble / total)
      assert(r.getAs[Double]("dup_mass_frac") == (total - singles).toDouble / total)
    }
  }

  test("q182: novelty is monotone in gram order") {
    val orders = Seq(1, 2, 4, 8)
    orders.zip(orders.tail).foreach { case (a, b) =>
      assert(rows(a).getAs[Double]("distinct_ratio") <= rows(b).getAs[Double]("distinct_ratio"),
        s"distinct_ratio not monotone $a -> $b")
      assert(rows(a).getAs[Double]("novel_frac") <= rows(b).getAs[Double]("novel_frac"),
        s"novel_frac not monotone $a -> $b")
    }
    // total gram positions shrink by exactly (n-1) per doc with >= n tokens
    val t1 = rows(1).getAs[Long]("total_ngrams")
    val t2 = rows(2).getAs[Long]("total_ngrams")
    assert(t2 == t1 - docTokens.count(_.size >= 2))
  }
}
