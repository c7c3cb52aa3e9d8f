package graft

/** The SQL surface of the custom expressions (registered through
  * SparkSessionExtensions via GraftSession's spark.sql.extensions). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is callable from SQL (and constant-folds on literals)") {
    val df = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
    assert(df.as[Double].head() == 32.0)
    // over a real column the expression survives into the physical plan
    val cols = spark.range(3).selectExpr(
      "vec_dot(array(CAST(id AS DOUBLE)), array(2.0D)) AS d")
    assert(cols.queryExecution.executedPlan.toString.contains("vec_dot"))
    assert(cols.as[Double].collect().toSeq == Seq(0.0, 2.0, 4.0))
  }

  test("word_shingles / word_shingle_hashes from SQL") {
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','d'), 3) AS s").as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val hs = spark.sql(
      "SELECT word_shingle_hashes(array('a','b','c','d'), 3) AS h").as[Seq[Long]].head()
    assert(hs.length == 2 && hs.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("sorted_intersect_count / hyperplane_sigs / winnow_minima from SQL") {
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .as[Int].head()
    assert(n == 2)
    val sigs = spark.sql(
      "SELECT hyperplane_sigs(array(1.0D, -2.0D, 0.5D), 4, 8, 3) AS s")
      .as[Seq[Int]].head()
    assert(sigs.length == 4 && sigs.forall(s => s >= 0 && s < 256))
    // deterministic across invocations (md5-seeded planes, no RNG state)
    val again = spark.sql(
      "SELECT hyperplane_sigs(array(1.0D, -2.0D, 0.5D), 4, 8, 3) AS s")
      .as[Seq[Int]].head()
    assert(sigs == again)
    val mins = spark.sql(
      "SELECT winnow_minima(array('a','b','c','d','e','f'), 3, 2) AS m")
      .as[Seq[Long]].head()
    assert(mins.nonEmpty && mins == mins.distinct) // winnowed minima, deduped
  }
}
