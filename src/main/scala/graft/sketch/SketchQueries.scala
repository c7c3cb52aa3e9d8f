package graft.sketch

import graft.sql.Tables
import graft.text.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared sketch queries — the approximate-distinct surface a 100 TB
  * pipeline swaps in where exact `count(distinct)` would shuffle every
  * value: per-group KMV (the custom UDAF, [[KmvSketch]]) side by side
  * with Spark's built-in HLL++ and the exact count it approximates.
  *
  * Approximate by construction → rows-only driver check (like q25/q45);
  * the accuracy gate lives in `KmvSketchSpec`: exact below k distincts,
  * and the (k−1)/kth-minimum estimator's documented error contract above
  * it. At sf≤0.1 every lang group holds fewer than k=256 distinct
  * contents, so the kmv column is deterministically EXACT there — the
  * spec pins that too.
  */
object SketchQueries {

  // ---------------------------------------------------------------- q57
  /** KMV vs HLL++ vs exact distinct contents per language. One shuffle of
    * ≤ k longs (KMV state) / one HLL register set per group — the shuffle
    * carries sketches, never the 8-byte content hashes themselves. */
  def q57KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    KmvSketch.register(spark)
    Tables(spark, dir).documents
      .select(col("lang"), hex60(normText(col("text"))).as("h"))
      .groupBy(col("lang"))
      .agg(
        KmvSketch.approxDistinct(col("h")).as("kmv_distinct"),
        approx_count_distinct(col("h")).as("hll_distinct"),
        countDistinct(col("h")).as("exact_distinct"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_kmv_distinct" -> (q57KmvDistinct _))

  /** Approximate sketches have no SQL-exact oracle — rows-only check. */
  val oracleSql: Map[String, String] = Map.empty
}
