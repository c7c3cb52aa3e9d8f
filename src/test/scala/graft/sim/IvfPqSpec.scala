package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q199 pinned the same two ways as q198 (PqAdcSpec): the full IVF-PQ
  * pipeline — coarse per-label assignment, residual codebook (hash init
  * + one Lloyd step), per-probed-list ADC tables, candidate ranking,
  * shortlist rerank — re-derived driver-side bit-exact, plus the
  * invariants that reranking never loses recall and probing nprobe=2 of
  * 10 lists scans a strict subset of the corpus.
  */
class IvfPqSpec extends SparkSpec {

  private val M = 8; private val SubDim = 8; private val K = 16
  private val TopK = 10; private val Short = 100; private val NQ = 20
  private val Probes = 2
  private val Fp = 1073741824.0

  private def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def term(a: Double, b: Double): Long =
    math.floor((a - b) * (a - b) * 1.0e12 + 0.5).toLong

  private lazy val rows = SimilarityQueries.q199IvfPqAdc(spark, Sf0001).collect()

  private lazy val raw: Seq[(Long, Int, Array[Double])] =
    graft.sql.Tables(spark, Sf0001).embeddings
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray)).toSeq

  test("q199: every output row matches the driver-side IVF-PQ pipeline bit-exactly") {
    val vecs = raw.map(t => t._1 -> t._3).toMap
    // coarse centroids per label over the full 64 dims
    val coarse: Map[Int, Array[Double]] = raw.groupBy(_._2).map { case (lab, ms) =>
      lab -> Array.tabulate(64) { d =>
        val s = ms.map(m => math.floor(m._3(d) * Fp).toLong).sum
        s.toDouble / (ms.size.toDouble * Fp)
      }
    }
    def coarseD(id: Long): Seq[(Long, Int)] =
      coarse.toSeq.map { case (lab, c) =>
        ((0 until 64).map(d => term(vecs(id)(d), c(d))).sum, lab)
      }.sorted
    val assign: Map[Long, Int] = vecs.keys.map(id => id -> coarseD(id).head._2).toMap
    val res: Map[Long, Array[Double]] = vecs.map { case (id, v) =>
      id -> Array.tabulate(64)(d => v(d) - coarse(assign(id))(d))
    }
    def codebook(asg: Map[(Long, Int), Int]): Map[(Int, Int), Array[Double]] =
      asg.toSeq.groupBy { case ((_, sub), code) => (sub, code) }.map {
        case ((sub, code), ms) =>
          val ids = ms.map(_._1._1)
          (sub, code) -> Array.tabulate(SubDim) { ld =>
            val s = ids.map(id => math.floor(res(id)(sub * SubDim + ld) * Fp).toLong).sum
            s.toDouble / (ids.size.toDouble * Fp)
          }
      }
    def assignUnder(cb: Map[(Int, Int), Array[Double]]): Map[(Long, Int), Int] =
      (for (id <- vecs.keys; sub <- 0 until M) yield {
        val best = cb.collect { case ((s, code), cent) if s == sub =>
          ((0 until SubDim).map(ld => term(res(id)(sub * SubDim + ld), cent(ld))).sum, code)
        }.min
        (id, sub) -> best._2
      }).toMap
    val init = (for (id <- vecs.keys; sub <- 0 until M)
      yield (id, sub) -> (hex60(s"pq:$id") % K).toInt).toMap
    val cb1 = codebook(assignUnder(codebook(init)))
    val codes = assignUnder(cb1)
    val qids = vecs.keys.filter(_ < NQ).toSeq.sorted
    def exactD(qid: Long, id: Long): Long =
      (0 until 64).map(d => term(vecs(id)(d), vecs(qid)(d))).sum
    val perQ = qids.map { qid =>
      val probed = coarseD(qid).take(Probes).map(_._2).toSet
      val cands = vecs.keys.filter(id => id != qid && probed(assign(id))).toSeq
      val adc = (for (lab <- probed; ((sub, code), cent) <- cb1) yield {
        val qr = Array.tabulate(SubDim)(ld =>
          vecs(qid)(sub * SubDim + ld) - coarse(lab)(sub * SubDim + ld))
        (lab, sub, code) -> (0 until SubDim).map(ld => term(qr(ld), cent(ld))).sum
      }).toMap
      val ranked = cands.map(id =>
        ((0 until M).map(sub => adc((assign(id), sub, codes((id, sub))))).sum, id))
        .sorted.map(_._2)
      val atop = ranked.take(TopK).toSet
      val short = ranked.take(Short)
      val etop = vecs.keys.filter(_ != qid).toSeq
        .map(id => (exactD(qid, id), id)).sorted.take(TopK).map(_._2).toSet
      val rr = short.map(id => (exactD(qid, id), id)).sorted.take(TopK).map(_._2).toSet
      qid -> ((cands.size, atop.count(etop), rr.count(etop)))
    }.toMap
    val ta = perQ.values.map(_._2).sum
    val tr = perQ.values.map(_._3).sum
    assert(rows.length == NQ)
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val (nc, ha, hr) = perQ(qid)
      assert(r.getAs[Long]("n_cand") == nc.toLong, s"q$qid candidates")
      assert(r.getAs[Long]("n_hits") == ha.toLong, s"q$qid adc hits")
      assert(r.getAs[Double]("recall_at10") == ha / 10.0, s"q$qid recall")
      assert(r.getAs[Double]("recall_rerank") == hr / 10.0, s"q$qid rerank")
      assert(r.getAs[Double]("mean_recall") == ta / (NQ * TopK).toDouble)
      assert(r.getAs[Double]("mean_recall_rerank") == tr / (NQ * TopK).toDouble)
      assert(r.getAs[Double]("compression_x") == 256.0 / 5.0)
    }
  }

  test("q199: rerank never loses recall; probing scans a strict corpus subset") {
    val n = raw.size
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_rerank") >= r.getAs[Double]("recall_at10"))
      val nc = r.getAs[Long]("n_cand")
      assert(nc > 0 && nc < n - 1, s"q${r.getAs[Long]("qid")}: n_cand $nc of $n")
    }
  }
}
