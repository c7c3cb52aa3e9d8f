package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q176 invariants: the importance scores re-derive exactly from a
  * plain-Scala rebuild of the hashed-bucket likelihood ratios, and the
  * selection gate behaves (selected ⇔ llr > 0; target docs excluded;
  * every raw doc reports). */
class DsirWeightsSpec extends SparkSpec {

  private val B = 64
  private val Mod = 97

  private def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private lazy val rows = TextQueries.q176DsirWeights(spark, Sf0001).collect()

  test("q176: scores re-derive from a driver-side rebuild of the bucket ratios") {
    val docs = graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def buckets(text: String): Seq[Long] =
      text.toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+").toSeq
        .map(w => hex60(w) % B)
    val target = docs.filter(_._1 % Mod == 0).flatMap(d => buckets(d._2))
    val raw = docs.filter(_._1 % Mod != 0)
    val rawB = raw.flatMap(d => buckets(d._2))
    val ct = target.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rawB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = target.size.toLong
    val nr = rawB.size.toLong
    val lr: Map[Long, BigDecimal] = (0L until B).map { b =>
      val v = math.log(
        ((ct.getOrElse(b, 0L) + 1).toDouble * (nr + B)) /
          ((cr.getOrElse(b, 0L) + 1).toDouble * (nt + B)))
      b -> BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.toMap
    val expected = raw.map { case (id, text) =>
      val bs = buckets(text)
      val llr = bs.groupBy(identity).map { case (b, g) => lr(b) * g.size }.sum
      id -> (bs.size.toLong, llr)
    }.toMap

    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected.keySet)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nTok, llr) = expected(id)
      assert(r.getAs[Long]("n_tokens") == nTok, s"doc $id n_tokens")
      assert(BigDecimal(r.getAs[Double]("llr")) == BigDecimal(llr.toDouble),
        s"doc $id llr ${r.getAs[Double]("llr")} vs $llr")
      assert(r.getAs[Boolean]("selected") == (llr > 0), s"doc $id gate")
    }
  }

  test("q176: gate semantics — no target docs, selected iff llr > 0, both classes present") {
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % Mod != 0))
    rows.foreach(r =>
      assert(r.getAs[Boolean]("selected") == (r.getAs[Double]("llr") > 0)))
    // the synthetic corpus has docs on both sides of the gate — if one
    // class vanishes the score collapsed to a constant, which is a bug
    assert(rows.exists(_.getAs[Boolean]("selected")))
    assert(rows.exists(!_.getAs[Boolean]("selected")))
  }
}
