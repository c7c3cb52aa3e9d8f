package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join OBSERVED, not just enabled: a fixture with one hot key
  * drives a sort-merge join whose skewed partition AQE must split
  * (`OptimizeSkewedJoin` → `skew=true` in the final adaptive plan), and
  * the same fixture with skew handling off shows the baseline plan — the
  * runtime re-plan the session defaults rely on at 100 TB is proven to
  * fire, with the boundary to q46's manual salt documented there: AQE
  * splits a JOIN's skewed shuffle partitions at runtime, but cannot help
  * skewed AGGREGATIONS, stream-side skew under required output
  * partitioning, or plans that must avoid the skewed shuffle entirely —
  * those still salt in the data. */
class AqeSkewJoinSpec extends SparkSpec {

  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // one hot key holding ~90% of a 200k-row fact side; thresholds lowered
  // so test-scale bytes trip the same detection 256 MB partitions do in
  // production (skew factor and split logic are scale-free)
  private def skewedJoin() = {
    val left = spark.range(200000).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"), col("id").as("v"))
    val right = spark.range(2000).select((col("id") % 500).as("k"), col("id").as("w"))
    left.join(right, "k")
  }

  test("OptimizeSkewedJoin fires: the hot partition is split in the final adaptive plan") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k") {
      val joined = skewedJoin()
      // drive THIS Dataset's own physical plan (count() would plan a new
      // aggregate query and leave joined's adaptive plan unexecuted)
      val n = joined.queryExecution.toRdd.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected the skew-split join in the final adaptive plan\n$plan")
      assert(plan.contains("isFinalPlan=true"), plan)
    }
  }

  test("control: with skew handling off, the same join keeps its unsplit shuffle") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      val joined = skewedJoin()
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(!plan.contains("skew=true"),
        s"skew split must not fire with skewJoin disabled\n$plan")
    }
  }
}
