package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q192 on a planted fixture (the sf0.01 corpus has no cross-source
  * exact dups, so the oracle gate alone never exercises a hit): group
  * counting, the count_a × count_b pair mass, whitespace-normalized
  * matching, and the unordered-pair contract. */
class SourceDupFlowSpec extends SparkSpec {

  private def doc(id: Long, src: String, text: String) =
    Row(id, text, "en", src, text.length.toLong)

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("dupflow").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val shared = "alpha beta gamma delta epsilon"
    val rows = Seq(
      doc(1L, "web", shared),
      doc(2L, "web", shared),              // web has it TWICE
      doc(3L, "books", "  alpha beta gamma delta epsilon "), // ws-normalized match
      doc(4L, "papers", shared),
      doc(5L, "web", "unique to web"),
      doc(6L, "books", "unique to books"),
      doc(7L, "web", "other copy"),
      doc(8L, "papers", "other copy"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q192: planted flows come back with exact group and pair counts") {
    val rows = DedupQueries.q192SourceDupFlow(spark, fixtureDir()).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_shared_groups"), r.getAs[Long]("n_cross_pairs"))).toMap
    // shared text: web×2, books×1 (after normalization), papers×1
    // other copy: web×1, papers×1
    assert(rows(("books", "web")) == (1L, 2L),
      "books-web: one group, 1x2 cross pairs (normalized match included)")
    assert(rows(("books", "papers")) == (1L, 1L))
    assert(rows(("papers", "web")) == (2L, 3L),
      "papers-web: shared (1x2) + other copy (1x1)")
    assert(rows.size == 3, s"unordered pairs only, got ${rows.keys}")
    rows.keys.foreach { case (a, b) => assert(a < b, "pairs must be ordered a < b") }
  }
}
