package graft.plans

import graft.SparkSpec
import graft.sql.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[TopKWindowRewrite]]: the row_number()<=k idiom plans as the
  * custom heap operator exactly when semantics-preserving, produces the
  * same rows as the unrewritten window, and never fires on rank() or
  * when the rank column survives. */
class TopKRewriteSpec extends SparkSpec {

  private def windowTopK: DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, Sf0001).orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
  }

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("the row_number()<=k idiom plans as TopKPerKeyExec, no window sort") {
    val plan = physical(windowTopK)
    assert(plan.contains("TopKPerKey ["), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("RunningWindowFunction")
      && !plan.contains(" Window "), s"window machinery survived the rewrite:\n$plan")
  }

  test("rewritten rows equal the unrewritten window's rows") {
    val rewritten = windowTopK.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try {
      val plain = windowTopK
      assert(physical(plain).contains("Window"), "kill-switch did not disable the rewrite")
      assert(plain.collect().map(_.toString).sorted.sameElements(rewritten))
    } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  test("rank() is never rewritten (ties can exceed k)") {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc)
    val df = Tables(spark, Sf0001).orders
      .withColumn("rn", rank().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!physical(df).contains("TopKPerKey ["),
      "rank() must keep the window formulation")
  }

  test("a surviving rank column blocks the rewrite (operator cannot emit it)") {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables(spark, Sf0001).orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderkey"), col("rn"))
    assert(!physical(df).contains("TopKPerKey ["),
      "rewrite fired while the rank column was still needed")
  }
}
