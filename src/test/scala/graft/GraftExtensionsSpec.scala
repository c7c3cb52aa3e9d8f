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

  test("word_grams / word_gram_hashes from SQL: positional, stride-aware") {
    // sliding bigrams keep DUPLICATE occurrences (positional, not a set)
    val bg = spark.sql(
      "SELECT word_grams(array('a','b','a','b'), 2, 1) AS g").as[Seq[String]].head()
    assert(bg == Seq("a b", "b a", "a b"))
    // stride = k → non-overlapping chunks; trailing partial window dropped
    val ch = spark.sql(
      "SELECT word_grams(array('a','b','c','d','e'), 2, 2) AS g").as[Seq[String]].head()
    assert(ch == Seq("a b", "c d"))
    // fewer than k tokens → empty
    assert(spark.sql("SELECT word_grams(array('a'), 2, 1) AS g")
      .as[Seq[String]].head().isEmpty)
    // hashed mode = hex60 of the same grams
    val hs = spark.sql(
      "SELECT word_gram_hashes(array('a','b','a','b'), 2, 1) AS h").as[Seq[Long]].head()
    val h0 = spark.sql(
      "SELECT ('0x' || substr(md5('a b'), 1, 15)) AS x").as[String].head()
    assert(hs.length == 3 && hs(0) == hs(2) && hs(0) == java.lang.Long.decode(h0))
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
