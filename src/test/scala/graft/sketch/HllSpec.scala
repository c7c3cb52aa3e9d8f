package graft.sketch

import graft.SparkSpec

/** q144 HLL invariants: register-rank bounds, estimator accuracy at the
  * m = 64 error regime, and mergeability (the property that makes the
  * register frame a shard-rollup state like KMV's). */
class HllSpec extends SparkSpec {

  test("q144: register counts bounded by m, estimate within the m=64 error regime") {
    val rows = SketchQueries.q144HllDistinct(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val used = r.getAs[Long]("registers_used")
      val vEmpty = r.getAs[Long]("v_empty")
      assert(used >= 1 && used <= 64, s"registers_used out of range: $used")
      assert(used + vEmpty == 64, "used + empty must cover the register file")
      val est = r.getAs[Double]("hll_est")
      val exact = r.getAs[Long]("exact_distinct")
      assert(est > 0.0)
      // 1.04/√64 ≈ 13% standard error; 35% is the generous 2.7σ gate
      assert(math.abs(est - exact) <= math.max(3.0, 0.35 * exact),
        s"estimate $est too far from exact $exact")
    }
  }

  test("q144: register max-merge of two disjoint shards equals the union's registers") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // the (bucket, rho) kernel over an id set, mirroring the query's hash
    def regs(ids: Seq[Long]) = {
      val df = ids.toDF("v").select(graft.text.TextOps.hex60(col("v").cast("string")).as("h"))
      val rest = shiftright(col("h"), 6)
      val rho = when(rest === 0, lit(55))
        .otherwise(round(log2(rest.bitwiseAND(-rest).cast("double"))).cast("int") + 1)
      df.select((col("h") % 64).as("bucket"), rho.as("rho"))
        .groupBy("bucket").agg(max("rho").as("m"))
        .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("m")).toMap
    }
    val a = regs(0L until 300L)
    val b = regs(300L until 700L)
    val u = regs(0L until 700L)
    val merged = (a.keySet ++ b.keySet).map { k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))
    }.toMap
    assert(merged == u, "elementwise max of shard registers must equal the union's registers")
  }
}
