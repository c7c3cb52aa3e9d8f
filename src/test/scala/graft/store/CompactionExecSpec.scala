package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q148's compaction manifest, EXECUTED: stage the one-file-per-document
  * layout, run the rewrite, and pin (a) the file-count collapse, (b) byte
  * and row conservation, (c) that the executed output still carries the
  * manifest's exact (source, bin) grouping — the plan and the rewrite
  * share one bin function, and this spec proves the share holds. */
class CompactionExecSpec extends SparkSpec {

  test("compaction rewrite collapses one-file-per-doc to one-file-per-bin, conserving contents") {
    val small = java.nio.file.Files.createTempDirectory("graft-compact-small").toString
    val big = java.nio.file.Files.createTempDirectory("graft-compact-big").toString

    Compaction.stageSmallFiles(spark, Sf0001, small)
    val nDocs = graft.sql.Tables(spark, Sf0001).documents.count()
    val (filesBefore, bytesBefore, _) = Compaction.listingStats(spark, small)
    assert(filesBefore == nDocs, s"staging must write one object per document " +
      s"(docs=$nDocs files=$filesBefore)")

    val nBins = Compaction.execute(spark, small, big)
    val (filesAfter, bytesAfter, _) = Compaction.listingStats(spark, big)
    assert(filesAfter <= nBins, s"rewrite must emit at most one object per bin " +
      s"(bins=$nBins files=$filesAfter)")
    assert(filesAfter < filesBefore / 4,
      s"compaction must collapse the object count (before=$filesBefore after=$filesAfter)")
    // right-sizing, not re-encoding tricks: total bytes shrink (shared
    // footers/dictionaries) but stay the same order
    assert(bytesAfter < bytesBefore && bytesAfter > bytesBefore / 100,
      s"bytes before=$bytesBefore after=$bytesAfter")

    // conservation: rows, byte sum, and id multiset hash all unchanged
    val before = Compaction.contents(spark, small).collect()(0)
    val after = Compaction.contents(spark, big).collect()(0)
    assert(before == after, s"contents drifted: before=$before after=$after")

    // the executed output still groups exactly as the manifest planned:
    // re-derive (source, bin) stats from the compacted table and compare
    // with q148's manifest row for row
    val manifest = graft.sql.RelationalQueries.q148CompactionPlan(spark, Sf0001)
      .collect().map(_.toString).sorted.toSeq
    val rederived = graft.sql.RelationalQueries.withCompactionBin(
        spark.read.parquet(big).select(col("source"), col("doc_id"), col("n_chars")))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bin_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
      .collect().map(_.toString).sorted.toSeq
    assert(rederived == manifest, "executed grouping diverged from the manifest")
  }
}
