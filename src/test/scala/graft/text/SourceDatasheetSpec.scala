package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q194's claim is that the datasheet NEVER disagrees with the detail
  * cards it summarizes — so pin each column against the owning card's
  * own output on the same corpus. */
class SourceDatasheetSpec extends SparkSpec {

  private lazy val sheet = TextQueries.q194SourceDatasheet(spark, Sf0001).collect()
    .map(r => r.getAs[String]("source") -> r).toMap

  private lazy val srcOf = graft.sql.Tables(spark, Sf0001).documents
    .select(col("doc_id"), col("source")).collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("q194: doc and dup columns re-derive from q19's digest groups") {
    val groups = graft.dedup.DedupQueries.q19DedupExact(spark, Sf0001).collect()
    val dupDocs = groups.filter(_.getAs[Long]("n_docs") >= 2)
    // rebuild per-source doc/dup counts from raw docs + q19's group sizes
    val d = graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("source"), md5(lower(trim(regexp_replace(
        col("text"), "[ \\t\\n\\r\\f\\u000B]+", " ")))).as("h")).collect()
    val dupHashes = dupDocs.map(_.getAs[String]("content_hash")).toSet
    val bySrc = d.groupBy(_.getString(1))
    bySrc.foreach { case (s, rows) =>
      val r = sheet(s)
      assert(r.getAs[Long]("n_docs") == rows.length, s"$s n_docs")
      val nd = rows.count(x => dupHashes.contains(x.getString(2)))
      assert(r.getAs[Double]("dup_rate") == nd.toDouble / rows.length, s"$s dup_rate")
    }
  }

  test("q194: contamination column re-derives from q60's per-doc card") {
    val contam = graft.dedup.DedupQueries.q60Decontaminate(spark, Sf0001).collect()
    val bySrc = contam.groupBy(r => srcOf(r.getAs[Long]("doc_id")))
    sheet.foreach { case (s, r) =>
      val rs = bySrc.getOrElse(s, Array.empty)
      val expected =
        if (rs.isEmpty) None
        else Some(rs.count(_.getAs[Boolean]("contaminated")).toDouble / rs.length)
      expected match {
        case None => assert(r.isNullAt(r.fieldIndex("contam_rate")), s"$s")
        case Some(e) => assert(r.getAs[Double]("contam_rate") == e, s"$s contam_rate")
      }
    }
  }

  test("q194: token mass and quality re-derive from q15/q16") {
    val q15 = TextQueries.q15TextTokens(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens").toLong).toMap
    val q16 = TextQueries.q16TextQuality(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val ids = q15.keys.toSeq.groupBy(srcOf)
    ids.foreach { case (s, ds) =>
      val r = sheet(s)
      assert(r.getAs[Long]("total_tokens") == ds.map(q15).sum, s"$s tokens")
      assert(r.getAs[Double]("mean_quality") == ds.map(q16).sum / ds.size, s"$s quality")
    }
  }
}
