package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q95's CountMin contract at sf0.001: estimates never undercount,
  * are bounded by the corpus size, and the reported exact counts agree
  * with an independently computed token frequency table. */
class CmsSpec extends SparkSpec {

  private lazy val rows = SketchQueries.q95HeavyHitters(spark, Sf0001)
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("CMS never undercounts and overestimate arithmetic holds") {
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (tok, exact, est, over) =>
      assert(est >= exact, s"token '$tok' undercounted: est=$est exact=$exact")
      assert(over == est - exact, s"token '$tok' overestimate arithmetic")
    }
    // descending by exact count (token tie-break)
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("reported exact counts match an independent frequency table; estimates bounded by N") {
    import graft.text.TextOps._
    val freq = graft.sql.Tables(spark, Sf0001).documents
      .select(explode(tokens(normText(col("text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = freq.values.sum
    rows.foreach { case (tok, exact, est, _) =>
      assert(freq(tok) == exact, s"token '$tok' exact count")
      assert(est <= n, s"token '$tok' estimate exceeds corpus size")
    }
  }
}
