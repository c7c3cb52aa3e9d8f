package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q190 invariants: ranks re-derive from q74's own scores, every source
  * keeps ~60% under the per-source gate (the normalization point — a
  * global gate does NOT guarantee this per source), and `disagree` is
  * exactly the XOR of the two keep decisions. */
class SourceQuantileGateSpec extends SparkSpec {

  private lazy val rows = TextQueries.q190SourceQuantileGate(spark, Sf0001).collect()

  test("q190: ranks re-derive from q74's scores driver-side") {
    val nll = TextQueries.q74BigramLm(spark, Sf0001).collect()
      .flatMap { r =>
        if (r.isNullAt(r.fieldIndex("avg_nll"))) None
        else Some(r.getAs[Long]("doc_id") ->
          BigDecimal(r.getAs[Double]("avg_nll")).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }.toMap
    val srcOf = graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ranks(ids: Seq[Long]): Map[Long, Double] = {
      val sorted = ids.sortBy(id => (nll(id), id))
      val n = sorted.size
      sorted.zipWithIndex.map { case (id, i) =>
        id -> (if (n == 1) 0.0 else i.toDouble / (n - 1))
      }.toMap
    }
    val globalRank = ranks(nll.keys.toSeq)
    val srcRank = nll.keys.toSeq.groupBy(srcOf).values.flatMap(ranks).toMap
    assert(rows.length == nll.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Double]("global_rank") == globalRank(id), s"doc $id global")
      assert(r.getAs[Double]("src_rank") == srcRank(id), s"doc $id src")
    }
  }

  test("q190: every source keeps ~60%; disagree is the XOR; a global gate skews") {
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (s, rs) =>
      val frac = rs.count(_.getAs[Boolean]("keep_src")).toDouble / rs.length
      assert(math.abs(frac - 0.6) < 0.05, s"source $s keeps $frac under the src gate")
    }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("disagree") ==
        (r.getAs[Boolean]("keep_src") ^ r.getAs[Boolean]("keep_global")))
    }
    // the card's reason to exist: the global gate's per-source keep rates
    // spread wider than the per-source gate's (which is ~0.6 everywhere)
    val globalSpread = bySource.values.map { rs =>
      rs.count(_.getAs[Boolean]("keep_global")).toDouble / rs.length
    }
    assert(globalSpread.max - globalSpread.min > 0.0,
      "sources should differ in fluency; if not the fixture corpus changed")
  }
}
