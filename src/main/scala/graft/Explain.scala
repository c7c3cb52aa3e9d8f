package graft

/** Plan auditor: `runMain graft.Explain <sfDir> [queryName...]` prints the
  * formatted physical plan for each named query (all queries when none
  * named). Used to check scan pruning (ReadSchema/PushedFilters),
  * broadcast-vs-shuffle join choices, and WholeStageCodegen spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(q => names.contains(q._1)).toSeq.sortBy(_._1)
    picked.foreach { case (name, fn) =>
      println(s"\n======== $name ========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
