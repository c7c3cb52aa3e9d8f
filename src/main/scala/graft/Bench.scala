package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Each query is fully materialized through a noop-format write — a bare
  * `count()` would let Catalyst prune every projection and time only the
  * row count (scan→project queries would measure nothing). Failures are
  * surfaced in the JSON (`"errors"`) with a negative timing rather than
  * masquerading as fast queries. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/noop-sink path AND each table's file listing +
    // parquet footers, so the alphabetically-first query doesn't absorb
    // one-time session and scan-setup cost
    spark.range(1000).write.mode("overwrite").format("noop").save()
    val t = graft.sql.Tables(spark, sfDir)
    Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
      t.lineitem, t.events, t.documents, t.embeddings)
      .foreach(df => df.write.mode("overwrite").format("noop").save())
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch {
          case e: Throwable =>
            errors += s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(120)}"
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val errJson = errors.map(e => "\"" + esc(e) + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
