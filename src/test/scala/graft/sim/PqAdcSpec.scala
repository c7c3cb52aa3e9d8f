package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q198 pinned two ways: (1) the whole PQ pipeline — hash-seeded init,
  * one Lloyd step, encoding, ADC ranking, shortlist rerank, recall —
  * re-derived driver-side from the raw floats with the same quantization
  * rules, every output row bit-exact; (2) the provable invariant that
  * reranking an ADC shortlist never loses recall (the exact top-10 ∩
  * shortlist always survives the rerank cut).
  */
class PqAdcSpec extends SparkSpec {

  private val M = 8; private val SubDim = 8; private val K = 16
  private val TopK = 10; private val Short = 100; private val NQ = 20
  private val Fp = 1073741824.0 // 2^30

  private def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def term(a: Double, b: Double): Long =
    math.floor((a - b) * (a - b) * 1.0e12 + 0.5).toLong

  private lazy val rows = SimilarityQueries.q198PqAdc(spark, Sf0001).collect()

  /** vec_id -> 64 doubles (the float32 column widened like the engine). */
  private lazy val vecs: Map[Long, Array[Double]] =
    graft.sql.Tables(spark, Sf0001).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  /** (sub, code) -> centroid[SubDim] from an assignment map. */
  private def codebook(assign: Map[(Long, Int), Int]): Map[(Int, Int), Array[Double]] =
    assign.toSeq.groupBy { case ((_, sub), code) => (sub, code) }.map {
      case ((sub, code), members) =>
        val ids = members.map(_._1._1)
        val cent = Array.tabulate(SubDim) { ld =>
          val s = ids.map(id => math.floor(vecs(id)(sub * SubDim + ld) * Fp).toLong).sum
          s.toDouble / (ids.size.toDouble * Fp)
        }
        (sub, code) -> cent
    }

  private def assignUnder(cb: Map[(Int, Int), Array[Double]]): Map[(Long, Int), Int] =
    (for (id <- vecs.keys; sub <- 0 until M) yield {
      val best = cb.collect { case ((s, code), cent) if s == sub =>
        val dp = (0 until SubDim).map(ld => term(vecs(id)(sub * SubDim + ld), cent(ld))).sum
        (dp, code)
      }.min
      (id, sub) -> best._2
    }).toMap

  test("q198: every output row matches the driver-side PQ pipeline bit-exactly") {
    val init = (for (id <- vecs.keys; sub <- 0 until M)
      yield (id, sub) -> (hex60(s"pq:$id") % K).toInt).toMap
    val cb1 = codebook(assignUnder(codebook(init)))
    val codes = assignUnder(cb1)
    val qids = vecs.keys.filter(_ < NQ).toSeq.sorted
    def exactD(qid: Long, id: Long): Long =
      (0 until 64).map(d => term(vecs(id)(d), vecs(qid)(d))).sum
    val perQ = qids.map { qid =>
      val others = vecs.keys.filter(_ != qid).toSeq
      val adc = cb1.map { case ((sub, code), cent) =>
        (sub, code) -> (0 until SubDim)
          .map(ld => term(vecs(qid)(sub * SubDim + ld), cent(ld))).sum
      }
      val ranked = others.map(id =>
        ((0 until M).map(sub => adc((sub, codes((id, sub))))).sum, id))
        .sorted.map(_._2)
      val atop = ranked.take(TopK).toSet
      val short = ranked.take(Short)
      val etop = others.map(id => (exactD(qid, id), id)).sorted.take(TopK).map(_._2).toSet
      val rr = short.map(id => (exactD(qid, id), id)).sorted.take(TopK).map(_._2).toSet
      qid -> ((atop.count(etop), rr.count(etop)))
    }.toMap
    val ta = perQ.values.map(_._1).sum
    val tr = perQ.values.map(_._2).sum
    assert(rows.length == NQ)
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val (ha, hr) = perQ(qid)
      assert(r.getAs[Long]("n_hits") == ha.toLong, s"q$qid adc hits")
      assert(r.getAs[Double]("recall_at10") == ha / 10.0, s"q$qid recall")
      assert(r.getAs[Double]("recall_rerank") == hr / 10.0, s"q$qid rerank recall")
      assert(r.getAs[Double]("mean_recall") == ta / (NQ * TopK).toDouble)
      assert(r.getAs[Double]("mean_recall_rerank") == tr / (NQ * TopK).toDouble)
      assert(r.getAs[Double]("compression_x") == 64.0)
    }
  }

  test("q198: reranking the shortlist never loses recall vs raw ADC") {
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_rerank") >= r.getAs[Double]("recall_at10"),
        s"q${r.getAs[Long]("qid")}")
    }
    val mr = rows.head.getAs[Double]("mean_recall_rerank")
    assert(mr > 0.0 && mr <= 1.0)
  }
}
