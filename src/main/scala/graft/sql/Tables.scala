package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loaders for the driver's synthetic star schema (see /root/repo/TESTDATA.md).
  *
  * Columns are pruned at the call site; parquet scans get pushdown + pruning
  * from Catalyst for free, so these are thin wrappers, not caches.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `ts` is TIMESTAMP(NANOS) in the parquet, which Spark reads as long
    * nanos under `spark.sql.legacy.parquet.nanosAsLong`; convert to micros
    * TimestampType here (integer `div` — double division would lose
    * precision above 2^53 nanos). Truncation toward zero matches DuckDB's
    * `epoch_us` on post-1970 data. */
  def events: DataFrame =
    table("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
