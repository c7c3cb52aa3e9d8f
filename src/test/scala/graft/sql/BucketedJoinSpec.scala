package graft.sql


import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: both sides written bucketed by the join key
  * land pre-partitioned, so the join plans with NO shuffle exchange — the
  * storage-level co-location strategy for repeatedly-joined 100 TB fact
  * tables (vs paying the shuffle per query). */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // default warehouse dir (./spark-warehouse, gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val t = Tables(spark, Sf0001)
    t.orders.select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    t.lineitem.select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucketed sides satisfy the join's distribution: no ShuffleExchange
    // feeds the join (the only exchange allowed is the final aggregation's)
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("BroadcastHashJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"unexpected shuffle on the bucketed join side:\n$plan")

    val n = joined.agg(sum(col("n"))).head().getLong(0)
    assert(n == t.lineitem.count()) // every lineitem matched its order

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
