package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** Normalize `ts` to TimestampType whatever the parquet carries — the
    * generator has shipped it as TIMESTAMP(NANOS) (read as long nanos
    * under `spark.sql.legacy.parquet.nanosAsLong`) and as naive
    * timestamp[us] (read as TIMESTAMP_NTZ) across data drops:
    *   - long nanos → integer `div 1000` then `timestamp_micros` (double
    *     division would lose precision above 2^53 nanos; truncation
    *     toward zero matches DuckDB's `epoch_us` on post-1970 data);
    *   - TIMESTAMP_NTZ → cast to TimestampType, value-preserving under
    *     the session's UTC zone — the same instants DuckDB sees reading
    *     the naive column;
    *   - TimestampType → as-is. */
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalArgumentException(
        s"events.parquet ts: expected long nanos, timestamp_ntz, or timestamp, got $other " +
          "— a new generator drop needs an explicit normalization rule here, not a silent " +
          "pass-through that fails in some downstream comparison")
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** Guide §2.5 (input skew — unsplittable input): the gate-scale tables
    * are single-file, single-ROW-GROUP parquet, so a scan is as
    * unsplittable as a gzip file — one task runs the whole file AND
    * every in-row kernel fused onto it (normText/tokenize/shingle/
    * minhash/gram digests) while the other cores idle. Repartition right
    * after the read ONLY when the source's own partitioning is below the
    * machine's parallelism; a many-split production scan pays no shuffle
    * at all. This is `MediaQueries.spreadIds` (q179's measured 4.4 s →
    * sub-second device) generalized to any frame; values are unaffected
    * — every consumer aggregates/joins/windows on explicit keys.
    *
    * Also correct on MATERIALIZED (localCheckpoint'd) frames, whose
    * partition count is the actual one: an AQE-coalesced tiny exchange
    * feeding a row-multiplying explode (q108's pair generator: 3 tasks
    * for a 64× Generate) spreads the same way, and a production-scale
    * frame with ≥ cores partitions is again untouched. */
  def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
