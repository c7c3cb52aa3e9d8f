package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HllSketch]] invariants: agreement with the q144 relational
  * formulation (two independent implementations of one contract), the
  * error envelope past the small-range regime, and the shard-state
  * rollup identity (merge associativity). */
class HllSketchSpec extends SparkSpec {
  import graft.text.TextOps.hex60

  test("hll_distinct agrees with q144's relational estimate per language") {
    val relational = SketchQueries.q144HllDistinct(spark, Sf0001).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("hll_est")).toMap
    val udafEst = graft.sql.Tables(spark, Sf0001).documents
      .select(col("lang"), hex60(graft.text.TextOps.normText(col("text"))).as("h"))
      .groupBy(col("lang")).agg(HllSketch.approxDistinct(col("h")).as("est"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("est")).toMap
    assert(relational.keySet == udafEst.keySet)
    for ((lang, rel) <- relational)
      // q144 sums 2^-M terms through DECIMAL(38,30) (order-free shuffle
      // parity); the aggregator sums exact doubles in register order —
      // the den paths differ below 1e-13, the 6 dp-rounded outputs agree
      assert(math.abs(rel - udafEst(lang)) < 1e-5,
        s"$lang: relational $rel vs aggregator ${udafEst(lang)}")
  }

  test("error envelope: estimate within 40% of truth from 100 to 50k distincts") {
    val spark2 = spark
    import spark2.implicits._
    for (n <- Seq(100L, 2000L, 50000L)) {
      val est = spark.range(n).toDF("i")
        .select(hex60(col("i").cast("string")).as("h"))
        .agg(HllSketch.approxDistinct(col("h"))).collect()(0).getDouble(0)
      // 1.04/√64 = 13% standard error; 40% ≈ 3σ
      assert(math.abs(est - n) <= 0.40 * n, s"n=$n est=$est")
    }
  }

  test("shard-state max-merge rollup equals the direct aggregate exactly") {
    val hashed = graft.sql.Tables(spark, Sf0001).documents
      .select(col("source"), hex60(graft.text.TextOps.normText(col("text"))).as("h"))
    val direct = hashed.agg(HllSketch.approxDistinct(col("h"))).collect()(0).getDouble(0)
    val rolled = hashed
      .groupBy(col("source")).agg(HllSketch.sketchState(col("h")).as("sk"))
      .agg(HllSketch.mergeDistinct(col("sk"))).collect()(0).getDouble(0)
    assert(direct == rolled,
      s"two-level rollup must be bit-identical to the direct sketch: $direct vs $rolled")
  }

  test("SQL registration: hll_distinct callable from SQL") {
    HllSketch.register(spark)
    graft.sql.Tables(spark, Sf0001).documents.createOrReplaceTempView("hll_docs")
    val est = spark.sql(
      "SELECT hll_distinct(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)) FROM hll_docs")
      .collect()(0).getDouble(0)
    assert(est > 0.0)
  }
}
