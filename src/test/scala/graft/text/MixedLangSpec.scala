package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q189 on a planted fixture: a concatenation artifact (English first
  * half, German second half) flags `mixed`, single-language and
  * evidence-free docs do not. */
class MixedLangSpec extends SparkSpec {

  private def doc(id: Long, text: String) = Row(id, text, "en", "fixture", text.length.toLong)

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("mixedlang").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val en = "the cat and the dog is a friend of the house"
    val de = "der hund und die katze das ein der die und"
    val rows = Seq(
      doc(1L, s"$en $de"),          // concatenation artifact -> mixed
      doc(2L, s"$en $en"),          // same language both halves
      doc(3L, "zz yy xx ww vv uu")) // no marker evidence anywhere
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q189: concat artifact flags; pure and evidence-free docs don't") {
    val rows = TextQueries.q189MixedLang(spark, fixtureDir()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = rows(1L)
    assert(r1.getAs[String]("pred_first") == "en")
    assert(r1.getAs[String]("pred_second") == "de")
    assert(r1.getAs[Boolean]("mixed"))
    assert(!rows(2L).getAs[Boolean]("mixed"))
    val r3 = rows(3L)
    assert(!r3.getAs[Boolean]("both_scored") && !r3.getAs[Boolean]("mixed"),
      "evidence-free halves must not flag")
  }

  test("q189: halves that both score agree with q17 on single-lang corpus docs") {
    val mixed = TextQueries.q189MixedLang(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val full = TextQueries.q17LangId(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val flagged = mixed.values.count(_.getAs[Boolean]("mixed"))
    // synthetic corpus is single-language word salad: halves should
    // almost never disagree with evidence on both sides
    assert(flagged <= mixed.size / 20, s"$flagged of ${mixed.size} flagged")
    mixed.values.filter(r => r.getAs[Boolean]("both_scored") && !r.getAs[Boolean]("mixed"))
      .take(50).foreach { r =>
        val id = r.getAs[Long]("doc_id")
        assert(r.getAs[String]("pred_first") == full(id) ||
          r.getAs[String]("pred_second") == full(id),
          s"doc $id: halves ${r.getAs[String]("pred_first")} vs full ${full(id)}")
      }
  }
}
