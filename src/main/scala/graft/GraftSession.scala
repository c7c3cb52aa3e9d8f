package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Tuned for the driver's local[32] harness but every knob is the one you
  * would also set on a real cluster: shuffle partitions sized to cores (not
  * the 200 default), AQE on (runtime coalescing + skew-join splitting),
  * UTC session time zone for oracle parity, micros parquet timestamps so
  * downstream readers (DuckDB/pyarrow) see the same instants.
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // let DSv2 scans that report KeyGroupedPartitioning (the graftpkg
      // connector clusters one-archive-per-partition on pkg_name) satisfy
      // clustered distributions directly — per-package aggregations then
      // run with zero exchange between scan and agg
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // some generator drops ship events.parquet with TIMESTAMP(NANOS), which
      // Spark's reader rejects; read those as raw long nanos and convert at
      // the scan (Tables.events). Other drops ship naive timestamp[us] — for
      // those this config is a no-op and Tables.events casts NTZ→TIMESTAMP.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // this VM exhibits multi-minute whole-machine I/O stalls; the default
      // 120 s heartbeat window marks the (only) local executor dead and
      // wedges the scheduler mid-run. On a real cluster you would keep the
      // defaults and let the driver reschedule — in single-JVM local mode
      // there is nothing to reschedule onto, so wait the stall out.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")

  /** Get-or-create with defaults; used by tests and the local tools. */
  def get(master: String = "local[4]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
