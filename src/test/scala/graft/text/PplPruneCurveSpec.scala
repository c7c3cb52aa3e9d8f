package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q177 invariants: the curve re-derives exactly from q74's own scored
  * output (shared-kernel honesty), deciles are balanced, the cumulative
  * token fraction is monotone ending at 1, and mean NLL is
  * non-decreasing across deciles (the bucketing actually orders by
  * fluency). */
class PplPruneCurveSpec extends SparkSpec {

  private lazy val rows = TextQueries.q177PplPruneCurve(spark, Sf0001)
    .collect().sortBy(_.getAs[Long]("decile"))

  private lazy val scored = TextQueries.q74BigramLm(spark, Sf0001).collect()
    .filter(_.getAs[Long]("n_bigrams") > 0)
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
      BigDecimal(r.getAs[Double]("avg_nll")).setScale(6, BigDecimal.RoundingMode.HALF_UP)))

  test("q177: curve re-derives from q74's scored docs") {
    assert(rows.length == 10)
    val sorted = scored.sortBy(d => (d._3, d._1))
    val n = sorted.length
    // ntile semantics: first (n % 10) tiles get one extra row
    val base = n / 10
    val extra = n % 10
    var idx = 0
    val expected = (1 to 10).map { d =>
      val sz = base + (if (d <= extra) 1 else 0)
      val slice = sorted.slice(idx, idx + sz)
      idx += sz
      (d.toLong, slice.length.toLong, slice.map(_._2).sum,
        slice.map(_._3).sum)
    }
    rows.zip(expected).foreach { case (r, (d, nd, nt, nllSum)) =>
      assert(r.getAs[Long]("decile") == d)
      assert(r.getAs[Long]("n_docs") == nd, s"decile $d n_docs")
      assert(r.getAs[Long]("n_tokens") == nt, s"decile $d n_tokens")
      // mirror the engine's op order: exact decimal sum -> double -> one
      // IEEE division (BigDecimal division would round differently)
      assert(r.getAs[Double]("mean_nll") == nllSum.toDouble / nd,
        s"decile $d mean_nll")
    }
  }

  test("q177: cumulative fraction monotone to 1; mean NLL non-decreasing; bands correct") {
    val fracs = rows.map(_.getAs[Double]("cum_token_frac"))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => a <= b })
    assert(math.abs(fracs.last - 1.0) < 1e-12)
    val means = rows.map(_.getAs[Double]("mean_nll"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      s"deciles out of fluency order: ${means.mkString(", ")}")
    assert(rows.map(_.getAs[String]("band")).toSeq ==
      Seq("head", "head", "head", "middle", "middle", "middle", "middle",
        "tail", "tail", "tail"))
  }
}
