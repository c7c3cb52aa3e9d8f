package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q102's weight actually biases the selection: with rank = u/n_chars,
  * sampled docs must be longer on average than the corpus (deterministic
  * given the hash — not a flaky statistical assertion), and the plan
  * must run through the custom TopKPerKey operator. */
class WeightedSampleSpec extends SparkSpec {

  test("q102: length-weighted selection over-represents long docs, plan is the native top-k") {
    val df = TextQueries.q102WeightedSample(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"q102 must run through the custom operator\n$plan")

    val sampledMean = df.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val corpusMean = graft.sql.Tables(spark, Sf0001).documents
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean should exceed corpus mean $corpusMean")
  }
}
