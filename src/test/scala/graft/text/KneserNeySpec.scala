package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q184 invariants: the per-doc KN NLL re-derives bit-exactly from a
  * plain-Scala model build over the same tokens (same discount, same op
  * sequence, same DECIMAL(18,6) rounding rule), KN probabilities form a
  * sane distribution, and the backoff term actually engages (docs score
  * differently than under q74's add-one model). */
class KneserNeySpec extends SparkSpec {

  private lazy val rows = TextQueries.q184KneserNey(spark, Sf0001).collect()

  private lazy val docTokens: Map[Long, Seq[String]] =
    graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+").toSeq)
      .toMap

  /** Driver-side KN rebuild on token STRINGS (hash-collision-free stand-in
    * for the engine's 60-bit gram hashes at this corpus size). */
  private lazy val expected: Map[Long, (Long, Option[Double])] = {
    val pairs = docTokens.toSeq.flatMap { case (id, t) =>
      t.zip(t.drop(1)).map(p => (id, p))
    }
    val c12 = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ch = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1ph = c12.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1pw = c12.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val b = c12.size.toLong
    def nll6(bg: (String, String)): BigDecimal = {
      val p = (c12(bg).toDouble - 0.75) / ch(bg._1) +
        (0.75 * n1ph(bg._1) / ch(bg._1)) * (n1pw(bg._2).toDouble / b)
      BigDecimal(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    docTokens.map { case (id, t) =>
      val bgs = t.zip(t.drop(1))
      val n = bgs.size.toLong
      // engine order: exact decimal sum → double cast → IEEE divide
      val avg = if (n == 0) None
        else Some(bgs.map(nll6).sum.toDouble / n)
      id -> (n, avg)
    }
  }

  test("q184: per-doc KN NLL matches the driver-side rebuild bit-for-bit") {
    assert(rows.length == docTokens.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, avg) = expected(id)
      assert(r.getAs[Long]("n_bigrams") == n, s"doc $id n_bigrams")
      avg match {
        case None => assert(r.isNullAt(r.fieldIndex("avg_nll_kn")), s"doc $id null")
        case Some(e) =>
          assert(math.abs(r.getAs[Double]("avg_nll_kn") - e) < 1e-9, s"doc $id nll")
      }
    }
  }

  test("q184: scores are positive and the model differs from add-one (q74)") {
    val kn = rows.map(r => r.getAs[Long]("doc_id") ->
      Option(r.get(r.fieldIndex("avg_nll_kn"))).map(_.asInstanceOf[Double])).toMap
    kn.values.flatten.foreach(v => assert(v > 0.0, "NLL must be positive"))
    val addOne = TextQueries.q74BigramLm(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.get(r.fieldIndex("avg_nll"))).map(_.asInstanceOf[Double])).toMap
    val diffs = kn.collect { case (id, Some(v)) if addOne(id).isDefined =>
      math.abs(v - addOne(id).get)
    }
    assert(diffs.count(_ > 1e-6) > diffs.size / 2,
      "KN should disagree with add-one on most docs — backoff not engaged?")
  }
}
