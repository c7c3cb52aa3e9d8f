package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q162 index-build invariants: posting lists parse back to sorted
  * distinct ids that match a driver-side rebuild, the varint ledger is
  * exact, and compression is always a win (every gap costs ≤ 6 bytes
  * against 8 raw). */
class InvertedIndexSpec extends SparkSpec {

  private lazy val rows = SearchQueries.q162InvertedIndex(spark, Sf0001).collect()

  private lazy val rebuilt: Map[String, Seq[(Long, Int)]] = {
    val docs = graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.flatMap { case (id, text) =>
      text.toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+").toSeq.map(t => (t, id))
    }.groupBy(_._1).map { case (t, occ) =>
      t -> occ.groupBy(_._2).map { case (id, g) => (id, g.length) }.toSeq.sortBy(_._1)
    }
  }

  test("q162: posting lists match a driver-side rebuild") {
    assert(rows.nonEmpty)
    val expectedTerms = rebuilt.filter(_._2.length >= 5).keySet
    assert(rows.map(_.getAs[String]("term")).toSet == expectedTerms)
    rows.foreach { r =>
      val term = r.getAs[String]("term")
      val exp = rebuilt(term)
      val postings = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
      assert(postings == exp.map(_._1), s"$term postings")
      assert(r.getAs[Long]("df") == exp.length, s"$term df")
      assert(r.getAs[Long]("cf") == exp.map(_._2).sum, s"$term cf")
    }
  }

  test("q162: varint ledger is exact and compression always wins") {
    rows.foreach { r =>
      val postings = r.getAs[String]("postings").split(",").map(_.toLong)
      // first delta = raw doc_id (gap from the implicit 0 base) — mirrors
      // the engine's q162 coding so a boundary id never overpays a byte
      val deltas = postings.head +: postings.sliding(2).map(p => p(1) - p(0)).toSeq
      def vb(d: Long): Int =
        if (d < 128L) 1 else if (d < 16384L) 2 else if (d < 2097152L) 3
        else if (d < 268435456L) 4 else if (d < 34359738368L) 5 else 6
      assert(r.getAs[Long]("bytes_delta") == deltas.map(vb(_).toLong).sum,
        s"${r.getAs[String]("term")} vbyte ledger")
      assert(r.getAs[Long]("bytes_raw") == 8 * postings.length)
      assert(r.getAs[Long]("bytes_delta") < r.getAs[Long]("bytes_raw"))
      assert(r.getAs[Double]("compression") > 1.0)
    }
  }

  test("q162: a first doc_id exactly on a varint boundary pays no extra byte") {
    // Fixture corpus pinning the gap-from-0 first delta: term "zz" first
    // appears at doc 127 (1-byte boundary), "qq" at 16383 (2-byte
    // boundary). Under the old doc_id+1 base these would cost 2 and 3
    // bytes for their first posting; under gap coding they cost 1 and 2.
    val dir = java.nio.file.Files.createTempDirectory("q162boundary").toString
    import spark.implicits._
    val docs = Seq(
      (127L, "zz"), (128L, "zz"), (200L, "zz"), (300L, "zz"), (400L, "zz"),
      (16383L, "qq"), (16384L, "qq"), (16500L, "qq"), (16600L, "qq"), (16700L, "qq"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/documents.parquet")
    val byTerm = SearchQueries.q162InvertedIndex(spark, dir).collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    // zz deltas: 127,1,72,100,100 -> 1+1+1+1+1 = 5 bytes (old base: 6)
    assert(byTerm("zz").getAs[Long]("bytes_delta") == 5L)
    // qq deltas: 16383,1,116,100,100 -> 2+1+1+1+1 = 6 bytes (old base: 7)
    assert(byTerm("qq").getAs[Long]("bytes_delta") == 6L)
  }
}
