package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q76 incremental dedup on a handcrafted corpus where the expected best
  * match is known exactly (the sf0.01 DuckDB oracle is the value gate;
  * this pins the split semantics and the top-1 selection). */
class IncrementalDedupSpec extends SparkSpec {

  private def doc(id: Long, text: String) = Row(id, text, "en", "fixture", text.length.toLong)

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("incdedup").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val base = (0 until 100).map(i => s"w$i").mkString(" ")
    val nearDup = (0 until 99).map(i => s"w$i").mkString(" ") + " changed"
    val other = (0 until 100).map(i => s"x$i").mkString(" ")
    val rows = Seq(
      doc(0L, nearDup),  // NEW (0 % 5 == 0): near-dup of old doc 3
      doc(1L, (0 until 100).map(i => s"a$i").mkString(" ")), // old, unrelated
      doc(2L, (0 until 100).map(i => s"b$i").mkString(" ")), // old, unrelated
      doc(3L, base),     // OLD: the duplicate source
      doc(4L, (0 until 100).map(i => s"c$i").mkString(" ")), // old, unrelated
      doc(10L, other))   // NEW with no old match — must not appear
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q76: new-vs-old split, threshold, and top-1 selection") {
    val rows = DedupQueries.q76IncrementalDedup(spark, fixtureDir()).collect()
    // doc 0 differs from doc 3 in the last of 100 tokens: exactly one
    // 3-shingle (the one ending at position 100) changes, so
    // J = 97 shared / (98 + 98 - 97) union
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("new_doc_id")) == 0L)
    assert(r.getLong(r.fieldIndex("dup_of")) == 3L)
    assert(r.getDouble(r.fieldIndex("jaccard")) == 97.0 / 99.0)
  }

  test("q76: sides of every reported pair respect the corpus split") {
    val rows = DedupQueries.q76IncrementalDedup(spark, Sf0001).collect()
    val newIds = rows.map(r => r.getLong(r.fieldIndex("new_doc_id")))
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("new_doc_id")) % 5 == 0)
      assert(r.getLong(r.fieldIndex("dup_of")) % 5 != 0)
      assert(r.getDouble(r.fieldIndex("jaccard")) >= 0.8)
    }
    assert(newIds.distinct.length == newIds.length, "one row per new doc")
  }
}
