package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q168 readability invariants: counts and score match a driver-side
  * recompute with the same regex semantics, bands follow the published
  * cut points, and the floors keep degenerate docs finite. */
class ReadabilitySpec extends SparkSpec {

  private lazy val rows = TextQueries.q168Readability(spark, Sf0001).collect()

  test("q168: counts and score match a driver-side recompute") {
    val docs = graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val words = math.max(text.toLowerCase.trim
        .split("[ \\t\\n\\r\\f\\u000B]+").count(_.nonEmpty), 1)
      val sents = math.max("[.!?]+".r.findAllIn(text).length, 1)
      val syll = math.max("[aeiouy]+".r.findAllIn(text.toLowerCase).length, 1)
      assert(r.getAs[Int]("n_words") == words, s"doc ${r.getAs[Long]("doc_id")} words")
      assert(r.getAs[Int]("n_sentences") == sents)
      assert(r.getAs[Int]("n_syllables") == syll)
      val score = 206.835 - 1.015 * (words.toDouble / sents) - 84.6 * (syll.toDouble / words)
      assert(math.abs(r.getAs[Double]("flesch") - score) < 1e-6)
      val band = if (r.getAs[Double]("flesch") >= 70 - 1e-9) "easy"
                 else if (r.getAs[Double]("flesch") >= 50 - 1e-9) "standard"
                 else "difficult"
      assert(r.getAs[String]("band") == band, s"doc ${r.getAs[Long]("doc_id")} band")
    }
  }

  test("q168: one row per document; the corpus spans more than one band") {
    val total = graft.sql.Tables(spark, Sf0001).documents.count()
    assert(rows.length == total)
    assert(rows.map(_.getAs[String]("band")).distinct.length >= 2,
      "a corpus whose every doc lands in one band exercises nothing")
  }
}
