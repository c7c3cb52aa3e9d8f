package graft.text

import graft.SparkSpec

/** q170 compression-curve invariants: the curve is monotone in the right
  * directions (merges only shrink token counts and never change word
  * counts), stage 0 is the character baseline, and each stage reconciles
  * with a driver-side re-encode under q157's learned merges. */
class BpeCompressionSpec extends SparkSpec {

  private lazy val rows = BpeQueries.q170BpeCompression(spark, Sf0001)
    .collect().sortBy(_.getAs[Int]("n_merges"))

  test("q170: monotone curve, constant word mass, baseline compression = 1") {
    assert(rows.map(_.getAs[Int]("n_merges")).sameElements(0 to 3))
    val words = rows.map(_.getAs[Long]("total_words")).distinct
    assert(words.length == 1, "merges must not change word occurrences")
    val toks = rows.map(_.getAs[Long]("total_tokens"))
    assert(toks.zip(toks.tail).forall { case (a, b) => b < a },
      s"each applied merge must strictly shrink tokens: ${toks.toSeq}")
    assert(rows.head.getAs[Double]("compression") == 1.0)
    val comps = rows.map(_.getAs[Double]("compression"))
    assert(comps.zip(comps.tail).forall { case (a, b) => b > a })
  }

  test("q170: reconciles with a driver-side re-encode under q157's merges") {
    val merges = BpeQueries.q157BpeMerges(spark, Sf0001).collect()
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b")))
    val words = graft.sql.Tables(spark, Sf0001).documents
      .selectExpr("explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w")
      .collect().map(_.getString(0)).filter(_.length <= 24)
    def fuse(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: fuse(rest, a, b)
      case x :: rest                          => x :: fuse(rest, a, b)
      case Nil                                => Nil
    }
    var seqs = words.map(_.toList.map(_.toString))
    rows.foreach { r =>
      val k = r.getAs[Int]("n_merges")
      if (k > 0) {
        val (a, b) = merges(k - 1)
        seqs = seqs.map(s => fuse(s, a, b))
      }
      assert(r.getAs[Long]("total_tokens") == seqs.map(_.length.toLong).sum,
        s"stage $k token count")
      assert(r.getAs[Long]("total_words") == seqs.length.toLong)
      assert(r.getAs[Long]("vocab_size") == seqs.map(_.mkString(" ")).distinct.length.toLong)
    }
  }
}
