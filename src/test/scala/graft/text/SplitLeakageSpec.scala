package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q98's leak branch is vacuous at the gate SF (no exact-dup content
  * straddles a split boundary there), so this spec crafts the straddle:
  * two doc_ids whose hash buckets land in DIFFERENT splits carry the
  * same content, and both must be flagged leaked; a unique doc must
  * not. */
class SplitLeakageSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def doc(id: Long, text: String) = Row(id, text, "en", "fixture", text.length.toLong)

  /** doc_id → split name under q98's gate, computed with the SAME
    * hex60("split:"+id) % 100 spelling. */
  private def splitsOf(ids: Seq[Long]): Map[Long, String] = {
    import spark.implicits._
    ids.toDF("doc_id")
      .select(col("doc_id"),
        (TextOps.hex60(concat(lit("split:"), col("doc_id").cast("string"))) % 100).as("b"))
      .collect()
      .map { r =>
        val b = r.getLong(1)
        r.getLong(0) -> (if (b < 90) "train" else if (b < 95) "val" else "test")
      }.toMap
  }

  test("q98: duplicate content straddling a split boundary is flagged on both sides") {
    val splits = splitsOf(0L until 200L)
    val (trainId, _) = splits.find(_._2 == "train").get
    val (otherId, otherSplit) = splits.find(kv => kv._2 != "train").get
    val (uniqueId, _) = splits.find(kv => kv._2 == "train" && kv._1 != trainId).get

    val dir = java.nio.file.Files.createTempDirectory("splitleak").toString
    val dup = "the exact same content under two different ids"
    val rows = Seq(doc(trainId, dup), doc(otherId, dup),
      doc(uniqueId, "content that exists exactly once"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = TextQueries.q98SplitLeakage(spark, dir).collect()
      .map(r => r.getString(r.fieldIndex("split")) ->
        ((r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("n_leaked"))))).toMap

    assert(out("train") == (2L, 1L),
      s"train cell: unique doc clean, dup doc leaked — got $out")
    assert(out(otherSplit) == (1L, 1L),
      s"$otherSplit cell: its dup doc must be flagged — got $out")
    assert(out.values.map(_._1).sum == 3L)
  }

  test("q98: fractions per source sum to 1 and deviations to ~0 at gate SF") {
    val rows = TextQueries.q98SplitLeakage(spark, Sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val fracSum = rs.map(_.getDouble(rs.head.fieldIndex("frac"))).sum
      assert(math.abs(fracSum - 1.0) < 1e-4, s"$src fracs sum to $fracSum")
    }
    // deterministic: same assignment on re-run
    val again = TextQueries.q98SplitLeakage(spark, Sf0001).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
