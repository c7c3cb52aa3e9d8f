package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q186 on a handcrafted corpus with a KNOWN leaked-and-edited eval doc
  * (the sf0.01 oracle run is 0-row on the synthetic corpus, so the value
  * gate alone never exercises a hit — this pins detection, the exact
  * Jaccard, the split semantics, and that sub-threshold overlap stays
  * out). */
class NearDupDecontamSpec extends SparkSpec {

  private def doc(id: Long, text: String) = Row(id, text, "en", "fixture", text.length.toLong)

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("neardupdecontam").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val evalText = (0 until 100).map(i => s"w$i").mkString(" ")
    val leaked = (0 until 99).map(i => s"w$i").mkString(" ") + " changed"
    val partial = (0 until 40).map(i => s"w$i").mkString(" ") +
      " " + (0 until 60).map(i => s"z$i").mkString(" ")
    val rows = Seq(
      doc(0L, evalText),   // EVAL (0 % 97 == 0)
      doc(1L, leaked),     // train: one-token edit of eval 0 → J = 97/99
      doc(2L, partial),    // train: 40% prefix overlap → far below 0.8
      doc(3L, (0 until 100).map(i => s"u$i").mkString(" ")), // train, unrelated
      doc(97L, (0 until 100).map(i => s"v$i").mkString(" "))) // eval, unmatched
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q186: a lightly edited eval leak is caught with its exact Jaccard") {
    val rows = DedupQueries.q186NearDupDecontam(spark, fixtureDir()).collect()
    assert(rows.length == 1, s"expected exactly the planted pair, got ${rows.length}")
    val r = rows.head
    assert(r.getAs[Long]("train_id") == 1L)
    assert(r.getAs[Long]("eval_id") == 0L)
    // the last of 100 tokens changed: exactly one 3-shingle (the one
    // ending at the last position) differs — 97 of 98 shingles shared,
    // union = 98 + 98 - 97
    assert(r.getAs[Double]("jaccard") == 97.0 / 99.0)
  }

  test("q186: every reported pair respects the train/eval split") {
    val rows = DedupQueries.q186NearDupDecontam(spark, Sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("train_id") % 97 != 0)
      assert(r.getAs[Long]("eval_id") % 97 == 0)
      assert(r.getAs[Double]("jaccard") >= 0.8)
    }
  }
}
