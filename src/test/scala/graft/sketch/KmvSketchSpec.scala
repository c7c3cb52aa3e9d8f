package graft.sketch

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Error contract for the KMV custom Aggregator (like `ApproxSketchSpec`
  * for the built-in sketches): the estimate must land within the sketch's
  * theoretical relative error (~1/sqrt(k-2), ≈ 6% at k=256; we allow 3σ)
  * of the exact distinct count, it must be exact below k distincts, and
  * per-group aggregation must work through the same partial/merge path. */
class KmvSketchSpec extends SparkSpec {

  test("global estimate within bound; exact below k") {
    val t = Tables_orders
    val hashed = t.select(TextOps.hex60(col("o_custkey").cast("string")).as("h"))
    val exact = t.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val est = hashed.select(KmvSketch.approxDistinct(col("h"), 256).as("d"))
      .head().getDouble(0)
    val err = math.abs(est - exact) / exact
    assert(err <= 0.20, s"exact=$exact est=$est err=$err")

    // fewer than k distinct values → exact by construction
    val small = t.filter(col("o_custkey") < 50)
    val smallExact = small.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val smallEst = small
      .select(TextOps.hex60(col("o_custkey").cast("string")).as("h"))
      .select(KmvSketch.approxDistinct(col("h"), 256).as("d")).head().getDouble(0)
    assert(smallEst == smallExact.toDouble)
  }

  test("per-group estimates within bound (partial-aggregate + merge path)") {
    val t = Tables_orders
    val exact = t.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = t
      .select(col("o_orderpriority"), TextOps.hex60(col("o_custkey").cast("string")).as("h"))
      .groupBy(col("o_orderpriority"))
      .agg(KmvSketch.approxDistinct(col("h"), 256).as("d")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((g, e) <- exact) {
      val err = math.abs(est(g) - e) / e.toDouble
      assert(err <= 0.20, s"group=$g exact=$e est=${est(g)} err=$err")
    }
  }

  test("null inputs are skipped, SQL-style (not a crash)") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, 2L, null, 2L, null, 3L).toDF("h")
    val est = df.select(KmvSketch.approxDistinct(col("h"), 16).as("d")).head().getDouble(0)
    assert(est == 3.0) // below k → exact, nulls ignored
  }

  test("q57 declared query: kmv exact below k per group, and the SQL name resolves") {
    // why q57 can carry a full DuckDB oracle: at small SF every lang group
    // holds fewer than k=256 distinct contents, so the KMV column must
    // EQUAL the exact count it sits next to
    val rows = SketchQueries.q57KmvDistinct(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      assert(exact < 256, s"fixture drifted: ${r.getAs[String]("lang")} has $exact distincts")
      assert(r.getAs[Double]("kmv_distinct") == exact.toDouble)
    }

    // SQL surface (kmv_distinct, registered by the query itself)
    graft.sql.Tables(spark, Sf0001).documents
      .select(TextOps.hex60(col("doc_id").cast("string")).as("h"))
      .createOrReplaceTempView("kmv_hashed")
    val viaSql = spark.sql("SELECT kmv_distinct(h) AS d FROM kmv_hashed")
    val exactIds = spark.sql("SELECT count(DISTINCT h) FROM kmv_hashed").head().getLong(0)
    assert(viaSql.head().getDouble(0) > 0.9 * exactIds)
  }

  test("three-way: KMV and HLL++ both track the exact per-group count") {
    // the sketch-family comparison q57 used to carry inline (HLL++ has no
    // DuckDB oracle, so it gates here instead): both estimators stay
    // within a loose 10% of exact on the fixture corpus, and KMV is
    // bit-exact below k
    val t = graft.sql.Tables(spark, Sf0001).documents
    val rows = t
      .select(col("lang"), TextOps.hex60(col("text")).as("h"))
      .groupBy(col("lang"))
      .agg(
        KmvSketch.approxDistinct(col("h")).as("kmv"),
        approx_count_distinct(col("h")).as("hll"),
        countDistinct(col("h")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact")
      assert(r.getAs[Double]("kmv") == exact.toDouble) // below k → exact
      val hllErr = math.abs(r.getAs[Long]("hll") - exact) / exact.toDouble
      assert(hllErr <= 0.10, s"lang=${r.getAs[String]("lang")} exact=$exact hll=${r.getAs[Long]("hll")}")
    }
  }

  test("state/merge cascade: two-level rollup tracks the one-level estimate past k") {
    // shard by order priority, sketch each shard, then merge ONLY the
    // stored states — must equal the single-level estimate over the same
    // rows (the sketch of a union is the merge of the sketches), at a
    // cardinality (~1k custkeys) well past k=64
    val t = Tables_orders
      .select(col("o_orderpriority").as("shard"),
        graft.text.TextOps.hex60(col("o_custkey").cast("string")).as("h"))
    val oneLevel = t.select(KmvSketch.approxDistinct(col("h"), 64).as("d"))
      .head().getDouble(0)
    val twoLevel = t.groupBy(col("shard"))
      .agg(KmvSketch.sketchState(col("h"), 64).as("sk"))
      .select(KmvSketch.mergeDistinct(col("sk"), 64).as("d"))
      .head().getDouble(0)
    assert(twoLevel == oneLevel, s"cascade broke associativity: $twoLevel != $oneLevel")
    val exact = Tables_orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(exact > 64, "test must exercise the past-k regime")
    assert(math.abs(twoLevel - exact) / exact.toDouble <= 0.5)
  }

  test("q77 declared query: merged shard sketches equal the exact count below k") {
    val rows = SketchQueries.q77SketchRollup(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      assert(r.getAs[Double]("kmv_distinct") == exact.toDouble,
        s"lang=${r.getAs[String]("lang")}: merged sketch not exact below k")
      assert(r.getAs[Long]("n_shards") >= 1)
    }
  }

  private def Tables_orders = graft.sql.Tables(spark, Sf0001).orders
}
