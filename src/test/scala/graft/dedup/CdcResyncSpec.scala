package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q187's reason to exist, demonstrated: after a one-token PREFIX
  * insertion, content-defined boundaries resynchronize and most of the
  * duplicated mass is still found, while q69's fixed grid shifts every
  * chunk and reports zero. Plus a full driver-side re-derivation of the
  * CDC chunking on the fixture. */
class CdcResyncSpec extends SparkSpec {

  private def doc(id: Long, text: String) = Row(id, text, "en", "fixture", text.length.toLong)

  private val base = (0 until 200).map(i => s"w$i").mkString(" ")

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("cdcresync").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      doc(1L, base),
      doc(2L, "inserted " + base), // one-token prefix insertion
      doc(3L, (0 until 200).map(i => s"u$i").mkString(" "))) // unrelated
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }

  /** Driver-side CDC: boundary after token i iff hash60(token) % 8 == 0;
    * chunk digest = md5 of the comma-joined token hashes, first 16 hex. */
  private def cdcChunks(text: String): Seq[(String, Int)] = {
    val hs = text.toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+").toSeq.map(hash60)
    val bounds = hs.zipWithIndex.collect { case (h, i) if h % 8 == 0 => i + 1 }
    val starts = 0 +: bounds
    val ends = bounds :+ hs.size
    starts.zip(ends).filter { case (a, b) => b > a }.map { case (a, b) =>
      val joined = hs.slice(a, b).map(_.toString).mkString(",")
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (d.substring(0, 16), b - a)
    }
  }

  test("q187: engine chunking matches the driver-side CDC re-derivation") {
    val dir = fixtureDir()
    val rows = DedupQueries.q187CdcDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val texts = Map(1L -> base, 2L -> ("inserted " + base),
      3L -> (0 until 200).map(i => s"u$i").mkString(" "))
    val chunks = texts.view.mapValues(cdcChunks).toMap
    val occ = chunks.toSeq.flatMap { case (id, cs) => cs.map(c => (id, c._1)) }
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    texts.keys.foreach { id =>
      val cs = chunks(id)
      val dup = cs.filter(c => occ(c._1) >= 2)
      val r = rows(id)
      assert(r.getAs[Long]("n_chunks") == cs.size, s"doc $id n_chunks")
      assert(r.getAs[Long]("n_dup_chunks") == dup.size, s"doc $id n_dup_chunks")
      assert(r.getAs[Double]("dup_token_frac") ==
        dup.map(_._2).sum.toDouble / cs.map(_._2).sum, s"doc $id mass")
    }
  }

  test("q187 resynchronizes where q69's fixed grid loses everything") {
    val dir = fixtureDir()
    val cdc = DedupQueries.q187CdcDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_token_frac")).toMap
    val fixed = DedupQueries.q69SubstringDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_fraction")).toMap
    // the shifted copy: fixed grid finds nothing, CDC recovers the bulk
    assert(fixed(2L) == 0.0, "fixed grid should lose every shifted chunk")
    assert(cdc(2L) >= 0.5, s"CDC should resync after the insertion, got ${cdc(2L)}")
    // the unrelated doc stays clean under both
    assert(fixed(3L) == 0.0 && cdc(3L) == 0.0)
  }
}
