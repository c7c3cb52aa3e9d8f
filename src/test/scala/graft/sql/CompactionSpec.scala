package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q148 compaction-plan invariants: the plan is a partition of the file
  * listing (nothing lost, nothing duplicated), bins are contiguous from
  * zero, and next-fit semantics hold — every bin but the last one of its
  * source starts before the target boundary it then crosses. */
class CompactionSpec extends SparkSpec {

  private lazy val plan = RelationalQueries.q148CompactionPlan(spark, Sf0001).collect()

  test("q148: per-source byte and file totals are conserved") {
    val truth = Tables(spark, Sf0001).documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("bytes"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("bytes"))).toMap
    val planned = plan.groupBy(_.getAs[String]("source")).map { case (s, rs) =>
      s -> (rs.map(_.getAs[Long]("n_files")).sum, rs.map(_.getAs[Long]("bin_bytes")).sum)
    }
    assert(planned == truth, "compaction plan must partition the listing exactly")
  }

  test("q148: bins are contiguous from zero and doc ranges are ordered and disjoint per source") {
    for ((_, rs) <- plan.groupBy(_.getAs[String]("source"))) {
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      assert(sorted.map(_.getAs[Long]("bin")).toSeq == (0L until sorted.length).toSeq,
        "bins must be dense from 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("first_doc") <= a.getAs[Long]("last_doc"))
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            "doc ranges must be disjoint and increasing across bins")
        case _ => ()
      }
    }
  }

  test("q148: next-fit — every non-final bin crosses its 2000-byte target boundary") {
    for ((_, rs) <- plan.groupBy(_.getAs[String]("source"))) {
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      var cum = 0L
      sorted.zipWithIndex.foreach { case (r, i) =>
        cum += r.getAs[Long]("bin_bytes")
        // after a non-final bin closes, the running offset has passed
        // that bin's boundary (otherwise the next file would have
        // landed in it)
        if (i < sorted.length - 1)
          assert(cum >= (r.getAs[Long]("bin") + 1) * 2000L,
            s"bin ${r.getAs[Long]("bin")} closed before reaching its boundary")
      }
    }
  }
}
