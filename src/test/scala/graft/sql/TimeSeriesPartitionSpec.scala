package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The time-series family over a DAY-PARTITIONED events layout — the
  * storage shape a 100 TB events table actually has. Pins three claims
  * for the representative query (q117 burst z-score):
  *
  *   1. the layout change alone leaves the full-history result
  *      row-identical (the extra `day` partition column is storage, not
  *      semantics);
  *   2. the day-bounded production variant (q117BurstZscoreFrom / q174)
  *      PRUNES the scan to the window's day-directories — partition
  *      filters in the plan, selected partitions counted;
  *   3. the windowed rows are hash-identical to the full query's rows
  *      for the same hours, on both layouts. */
class TimeSeriesPartitionSpec extends SparkSpec {

  private lazy val partDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-byday").toString
    Tables(spark, Sf0001).events
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(s"$dir/events.parquet")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().toSeq

  test("full-history q117 is row-identical across flat and day-partitioned layouts") {
    assert(rows(RelationalQueries.q117BurstZscore(spark, partDir)) ==
      rows(RelationalQueries.q117BurstZscore(spark, Sf0001)))
  }

  test("day-bounded variant prunes the partitioned scan to the window's days") {
    val maxDay = Tables(spark, Sf0001).events
      .agg(max(to_date(col("ts")))).head().getDate(0).toLocalDate
    val fromDay = maxDay.minusDays(13)
    val q = RelationalQueries.q117BurstZscoreFrom(spark, partDir, fromDay.toString)

    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("day#"),
      s"partition filter missing from the scan:\n$plan")
    val scan = q.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }.head
    val allDays = Tables(spark, partDir).events.select("day").distinct().count()
    val windowDays = 15 // 13 scored days + fromDay + one trailing-history day
    assert(scan.selectedPartitions.partitionCount <= windowDays,
      s"scan reads ${scan.selectedPartitions.partitionCount} day-partitions, window is $windowDays")
    assert(scan.selectedPartitions.partitionCount < allDays,
      "scan must not read the full history")
    val files = scan.selectedPartitions.toPartitionArray.map(_.filePath.toString)
    val cutoff = s"day=${fromDay.minusDays(1)}"
    assert(files.nonEmpty && files.forall(_.substring(files.head.indexOf("day=")) >= cutoff),
      s"a read escaped the window: ${files.take(3).mkString(", ")}")
  }

  test("windowed rows are hash-identical to the full query's rows for the same hours, both layouts") {
    // anchor the window at the first SCORED hour: sf0.001 is sparse
    // enough that the 12-trailing-hours gate scores only a handful of
    // hours, and a fixed last-N-days window can miss them all
    val firstHour = RelationalQueries.q117BurstZscore(spark, Sf0001)
      .agg(min(col("hour"))).head().getString(0)
    assume(firstHour != null, "fixture scores no hours at all")
    val fromDay = java.time.LocalDate.parse(firstHour.substring(0, 10))
    val cut = s"$fromDay 00:00:00"
    val full = RelationalQueries.q117BurstZscore(spark, Sf0001)
      .filter(col("hour") >= lit(cut))
    val flat = RelationalQueries.q117BurstZscoreFrom(spark, Sf0001, fromDay.toString)
    val part = RelationalQueries.q117BurstZscoreFrom(spark, partDir, fromDay.toString)
    val expected = rows(full)
    assert(expected.nonEmpty, "window must cover scored hours")
    assert(rows(flat) == expected, "flat-layout window diverges from the full query")
    assert(rows(part) == expected, "partitioned-layout window diverges from the full query")
  }
}
