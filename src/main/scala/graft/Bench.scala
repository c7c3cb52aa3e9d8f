package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Each query is fully materialized through a noop-format write — a bare
  * `count()` would let Catalyst prune every projection and time only the
  * row count (scan→project queries would measure nothing). Failures are
  * surfaced in the JSON (`"errors"`) with a negative timing rather than
  * masquerading as fast queries.
  *
  * Variance-proofing (round 5): each query runs REPS times
  * (`SPARK_GRAFT_BENCH_REPS`, default 4). The FIRST run pays whole-stage
  * codegen + janino compilation + plan-cache misses and is reported
  * separately (`"first"`); the headline per-query number (`"queries"`) is
  * the MEDIAN of the remaining warm runs. A single-shot timing cannot
  * distinguish a ±45% machine-variance blip from a real regression — the
  * r4 q21/q22 scare — so every number the 2× gate rides on is a median.
  *
  * Contention-proofing (round 7): a contended capture (the r6 driver run
  * showed q31 at 1.44 s where a quiet run gives 0.31 s) isn't fixed by a
  * median over 3 warm reps — so while a query's warm runs stay unstable
  * (trimmed spread > 50% of the median) it RE-RUNS, up to
  * `SPARK_GRAFT_BENCH_MAX_REPS` (default 12) warm reps. `"spread"` is the
  * (max−min) of the INTERQUARTILE runs (outer quarter dropped from each
  * end once ≥4 reps exist) — a raw max−min can never shrink by adding
  * reps, so it would re-run forever on one early blip; `"warm_reps"`
  * records how many runs each number rests on.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) -1.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "4").toInt)
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

    val maxReps = math.max(reps,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_REPS", "12").toInt)

    final case class QStat(first: Double, warmMedian: Double, spread: Double, warmReps: Int)
    /** the interquartile runs: drop the outer quarter from each end once
      * ≥4 reps exist (a raw max−min can never shrink by re-running) */
    def iqSpread(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val t = if (s.length >= 4) s.slice(s.length / 4, s.length - s.length / 4) else s
      t.max - t.min
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      def recordErr(e: Throwable): Unit =
        errors += s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(120)}"
      // per-rep isolation: a transient failure on a WARM rep must not
      // discard the evidence already gathered (first run + surviving warm
      // reps) — dropping the query entirely would make totals
      // non-comparable run to run, the exact artifact medians exist to fix
      val stat =
        try {
          val first = once()
          val warm = scala.collection.mutable.ArrayBuffer.empty[Double]
          var attempts = 1 // the first run
          def tryOnce(): Unit = {
            attempts += 1
            try warm += once()
            catch { case e: Throwable => recordErr(e); () }
          }
          (1 until reps).foreach(_ => tryOnce())
          // contention re-runs: unstable numbers are re-measured until the
          // interquartile runs agree to within half the median (or the cap)
          while (warm.nonEmpty && attempts < maxReps &&
              iqSpread(warm.toSeq) > 0.5 * median(warm.toSeq))
            tryOnce()
          // all warm reps failed: keep the first-run evidence but report NO
          // warm median (-1 sentinel) — passing the cold time off as a warm
          // median with spread 0 would fake both the number and its stability
          if (warm.isEmpty) QStat(first, -1.0, -1.0, 0)
          else QStat(first, median(warm.toSeq), iqSpread(warm.toSeq), warm.length)
        } catch {
          case e: Throwable => recordErr(e); QStat(-1.0, -1.0, -1.0, 0)
        }
      name -> stat
    }
    def obj(f: QStat => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    def tot(f: QStat => Double): Double =
      results.collect { case (_, v) if f(v) >= 0 => f(v) }.sum
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val errJson = errors.map(e => "\"" + esc(e) + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total_warm_median","value":${tot(_.warmMedian)},"unit":"sec",""" +
        s""""queries":${obj(_.warmMedian)},"first":${obj(_.first)},"spread":${obj(_.spread)},""" +
        s""""warm_reps":${obj(_.warmReps.toDouble)},""" +
        s""""first_total":${tot(_.first)},"reps":$reps,"errors":$errJson,"sf":"$sfDir"}"""
    println(json)
    // the driver's artifact capture keeps only a stdout TAIL — with 64
    // queries that truncates the headline and most of the per-query map —
    // so the full JSON is also persisted to a file the archive picks up
    // whole (committed per round as BENCH_full.json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json"))
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
