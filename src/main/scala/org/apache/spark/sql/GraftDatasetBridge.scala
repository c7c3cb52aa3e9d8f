package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the two `private[sql]` seams a library needs to
  * host a CUSTOM LogicalPlan operator (see `graft.plans.TopKPerKey`):
  * building a DataFrame from a plan (`Dataset.ofRows`) and reading a
  * DataFrame's analyzed plan back out. Lives in `org.apache.spark.sql`
  * solely to satisfy those access modifiers; no Spark behavior is
  * altered or shadowed here. */
object GraftDatasetBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
