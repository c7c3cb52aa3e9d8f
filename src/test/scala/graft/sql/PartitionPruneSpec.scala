package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Hive-style partition pruning on a date-partitioned layout — the
  * third leg of the declarative-read stool next to predicate pushdown
  * and column pruning (both pinned in PlanAuditSpec): a day-keyed query
  * against a day-partitioned table must read ONLY that day's files,
  * with the partition filter visible in the scan. */
class PartitionPruneSpec extends SparkSpec {

  test("a day filter on a day-partitioned write prunes to that day's files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ppart").toString
    val days = Tables(spark, Sf0001).events
      .withColumn("day", to_date(col("ts")))
    days.write.partitionBy("day").mode("overwrite").parquet(dir)
    val allDays = days.select(col("day")).distinct().count()
    assert(allDays > 1, "fixture must span multiple days")

    val oneDay = days.select(col("day")).distinct().orderBy(col("day")).head().getDate(0)
    val q = spark.read.parquet(dir).filter(col("day") === lit(oneDay))

    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("day#"),
      s"partition filter missing from the scan:\n$scan")
    // the SCAN selects one day-directory, not the whole table
    // (Dataset.inputFiles reports the unpruned relation — the scan node's
    // selected partitions are what the executors actually read)
    val f = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val parts = f.selectedPartitions
    assert(parts.partitionCount == 1,
      s"expected 1 pruned partition, got ${parts.partitionCount}")
    val files = parts.toPartitionArray.map(_.filePath.toString)
    assert(files.nonEmpty && files.forall(_.contains(s"day=$oneDay")),
      s"read escaped the day partition: ${files.take(3).mkString(", ")}")
    // and the rows are exactly that day's
    assert(q.count() == days.filter(col("day") === lit(oneDay)).count())
  }
}
