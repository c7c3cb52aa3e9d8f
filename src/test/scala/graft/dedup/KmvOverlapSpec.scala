package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q213 KMV source overlap: exact-below-k branch pinned by hand on a
  * planted profile, and the estimator branch pinned against q92's exact
  * profile Jaccard at gate scale (k=1024 → ~3% standard error; the spec
  * allows 3σ). */
class KmvOverlapSpec extends SparkSpec {

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("kmvoverlap").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def doc(id: Long, src: String, text: String) =
      Row(id, text, "en", src, text.length.toLong)
    // shingle profiles (k=3 word shingles):
    //   web:   "a b c d e"  -> {abc, bcd, cde}
    //   books: "c d e f g"  -> {cde, def, efg}   |∩|=1 |∪|=5  J=0.2
    //   empty: one two-token doc -> no shingles at all
    val rows = Seq(
      doc(1L, "web", "a b c d e"),
      doc(2L, "web", "a b c"), // duplicate shingle within source: no effect
      doc(3L, "books", "c d e f g"),
      doc(4L, "empty", "x y"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("below k every estimate is exact (sketch = full profile); no-profile source absent") {
    val rows = DedupQueries.q213KmvOverlap(spark, fixtureDir()).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r).toMap
    // a source whose every doc is shorter than the shingle width has no
    // profile at all — it drops from the matrix in BOTH engines (explode
    // of an empty array / unnest of an empty list emit nothing)
    assert(rows.keySet == Set(("books", "web")), s"got ${rows.keys}")
    val wb = rows(("books", "web"))
    assert(wb.getAs[Int]("sk_a") == 3 && wb.getAs[Int]("sk_b") == 3)
    assert(wb.getAs[Int]("n_merged") == 5 && wb.getAs[Int]("n_shared") == 1)
    assert(wb.getAs[Double]("est_a") == 3.0 && wb.getAs[Double]("est_b") == 3.0)
    assert(wb.getAs[Double]("union_est") == 5.0)
    assert(wb.getAs[Double]("jaccard_est") == 0.2)
    assert(wb.getAs[Double]("intersect_est") == 1.0)
  }

  test("estimator branch tracks q92's exact profile Jaccard at sf0.01 (3 sigma of 1/sqrt(k))") {
    val est = DedupQueries.q213KmvOverlap(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r).toMap
    val exact = DedupQueries.q92SourceOverlap(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Double]("profile_jaccard"),
          r.getAs[Long]("n_a") + r.getAs[Long]("n_b") - r.getAs[Long]("n_shared")))
    assert(exact.nonEmpty, "sf0.01 must have overlapping source pairs")
    val tol = 3.0 / math.sqrt(1024.0) // ~0.094 absolute on the Jaccard ratio
    exact.foreach { case (pair, (jExact, uExact)) =>
      val r = est(pair)
      // at least one source profile must exceed k or the branch under
      // test never runs — sf0.01 profiles are ~10^4 shingles
      assert(r.getAs[Int]("sk_a") == 1024 || r.getAs[Int]("sk_b") == 1024,
        s"$pair: estimator branch not exercised")
      val jEst = r.getAs[Double]("jaccard_est")
      assert(math.abs(jEst - jExact) <= tol,
        s"$pair: jaccard_est $jEst vs exact $jExact (tol $tol)")
      val uEst = r.getAs[Double]("union_est")
      assert(math.abs(uEst - uExact) / uExact <= 0.10,
        s"$pair: union_est $uEst vs exact $uExact")
    }
  }
}
