package graft.plans

import graft.SparkSpec
import graft.sql.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[TopKWindowRewrite]]: the row_number()<=k idiom plans as the
  * custom heap operator exactly when semantics-preserving, produces the
  * same rows as the unrewritten window, and never fires on rank() or
  * when the rank column survives. */
class TopKRewriteSpec extends SparkSpec {

  private def windowTopK: DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, Sf0001).orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
  }

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("the row_number()<=k idiom plans as TopKPerKeyExec, no window sort") {
    val plan = physical(windowTopK)
    assert(plan.contains("TopKPerKey ["), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("RunningWindowFunction")
      && !plan.contains(" Window "), s"window machinery survived the rewrite:\n$plan")
  }

  test("rewritten rows equal the unrewritten window's rows") {
    val rewritten = windowTopK.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try {
      val plain = windowTopK
      assert(physical(plain).contains("Window"), "kill-switch did not disable the rewrite")
      assert(plain.collect().map(_.toString).sorted.sameElements(rewritten))
    } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  test("rank() is never rewritten (ties can exceed k)") {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc)
    val df = Tables(spark, Sf0001).orders
      .withColumn("rn", rank().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!physical(df).contains("TopKPerKey ["),
      "rank() must keep the window formulation")
  }

  /** Both statistics regimes of the key-cardinality guard, on one
    * analyzed catalog table: the high-cardinality key (o_orderkey,
    * distinct ≈ rows) trips the veto and keeps the native window plan;
    * the dashboard key (o_orderpriority, 5 values) keeps the heap. The
    * bound is conf'd below the fixture's row count so a 1,500-row table
    * exercises the 1M-key regime's decision. */
  test("column statistics veto the rewrite in the high-cardinality regime only") {
    val tbl = "topk_guard_fixture"
    Tables(spark, Sf0001).orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .write.mode("overwrite").saveAsTable(tbl)
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_orderpriority")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set(TopKWindowRewrite.MaxKeysConfKey, "1000")
    try {
      def topkOver(key: String): DataFrame = {
        val w = Window.partitionBy(col(key))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        spark.table(tbl).withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).drop("rn")
      }
      val hi = physical(topkOver("o_orderkey"))
      assert(!hi.contains("TopKPerKey ["),
        s"rewrite fired despite distinct-count evidence above the bound:\n$hi")
      assert(hi.contains("Window"), s"high-cardinality plan lost its window:\n$hi")
      val lo = physical(topkOver("o_orderpriority"))
      assert(lo.contains("TopKPerKey ["),
        s"dashboard regime (5 keys) must keep the heap operator:\n$lo")
    } finally {
      spark.conf.unset(TopKWindowRewrite.MaxKeysConfKey)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("absent statistics, the rewrite fires regardless of actual cardinality") {
    // raw-parquet reads carry no column stats — the guard must not veto
    // on missing evidence (q101/q140's plans depend on this)
    spark.conf.set(TopKWindowRewrite.MaxKeysConfKey, "2")
    try {
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("o_totalprice").desc)
      val df = Tables(spark, Sf0001).orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 1).drop("rn")
      assert(physical(df).contains("TopKPerKey ["),
        "guard vetoed without statistics evidence")
    } finally spark.conf.unset(TopKWindowRewrite.MaxKeysConfKey)
  }

  test("runtime feedback: an executed high-cardinality run vetoes the NEXT planning, no ANALYZE") {
    // raw-parquet read, no column stats anywhere: the first planning
    // rewrites (cap-bounded downside), its execution OBSERVES the key
    // population through TopKRuntimeFeedback, and the second planning of
    // the SAME query keeps the native window — the 1M-key regime
    // self-corrects after one run
    // full reset (not just the in-memory map): a ledger file left by a
    // PREVIOUS test run would otherwise veto the first planning here
    TopKRuntimeFeedback.resetForTest()
    java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    spark.conf.set(TopKWindowRewrite.MaxKeysConfKey, "50")
    try {
      def q: DataFrame = {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
        Tables(spark, Sf0001).lineitem
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 1).drop("rn")
      }
      val first = q
      assert(physical(first).contains("TopKPerKey ["),
        "first planning must rewrite (no evidence yet)")
      first.write.format("noop").mode("overwrite").save() // records observed keys
      info(s"feedback snapshot: ${TopKRuntimeFeedback.snapshot()}")
      val second = physical(q)
      assert(!second.contains("TopKPerKey ["),
        s"second planning must keep the window after observed-cardinality evidence:\n$second")
      assert(second.contains("Window"), s"second plan lost its window:\n$second")
      // an unrelated low-cardinality query is NOT vetoed by that record
      val w2 = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
      val lo = Tables(spark, Sf0001).lineitem
        .withColumn("rn", row_number().over(w2))
        .filter(col("rn") <= 1).drop("rn")
      assert(physical(lo).contains("TopKPerKey ["),
        "feedback for one query shape must not veto another")
    } finally {
      spark.conf.unset(TopKWindowRewrite.MaxKeysConfKey)
      TopKRuntimeFeedback.resetForTest()
      java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    }
  }

  // ------------------------------------------------- persisted ledger
  private def ledgerLocalPath: java.nio.file.Path = {
    val wh = spark.sessionState.conf.warehousePath
    val dir = if (wh.contains(":")) java.nio.file.Paths.get(new java.net.URI(wh))
              else java.nio.file.Paths.get(wh)
    dir.resolve("_graft_meta").resolve("topk_feedback.tsv")
  }

  private def highCardTopK: DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    Tables(spark, Sf0001).lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1).drop("rn")
  }

  test("the observed veto persists to the warehouse ledger and survives a session restart") {
    TopKRuntimeFeedback.resetForTest()
    java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    spark.conf.set(TopKWindowRewrite.MaxKeysConfKey, "50")
    try {
      val first = highCardTopK
      assert(physical(first).contains("TopKPerKey ["),
        "first planning must rewrite (no evidence on disk or in memory)")
      first.write.format("noop").mode("overwrite").save()
      TopKRuntimeFeedback.flushNow(spark.sparkContext)
      assert(java.nio.file.Files.exists(ledgerLocalPath),
        "flush must write the warehouse ledger")
      val lines = java.nio.file.Files.readAllLines(ledgerLocalPath)
      assert(lines.size == 1 && lines.get(0).split('\t').length == 3,
        s"ledger format fp\\tkeys\\tstamp expected, got: $lines")
      // fresh "session": the JVM forgets everything it learned
      TopKRuntimeFeedback.resetForTest()
      val replanned = physical(highCardTopK)
      assert(!replanned.contains("TopKPerKey ["),
        s"ledger evidence must veto the FIRST planning of a fresh session:\n$replanned")
      assert(replanned.contains("Window"), s"fresh-session plan lost its window:\n$replanned")
    } finally {
      spark.conf.unset(TopKWindowRewrite.MaxKeysConfKey)
      TopKRuntimeFeedback.resetForTest()
      java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    }
  }

  test("a stale ledger entry is ignored: the veto must re-earn itself after max age") {
    TopKRuntimeFeedback.resetForTest()
    java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    spark.conf.set(TopKWindowRewrite.MaxKeysConfKey, "50")
    try {
      val first = highCardTopK
      first.write.format("noop").mode("overwrite").save()
      TopKRuntimeFeedback.flushNow(spark.sparkContext)
      // age the entry past the default 168 h window
      val aged = java.nio.file.Files.readAllLines(ledgerLocalPath).get(0)
        .split('\t') match {
          case Array(fp, keys, _) =>
            s"$fp\t$keys\t${System.currentTimeMillis() - 200L * 3600000L}\n"
        }
      java.nio.file.Files.writeString(ledgerLocalPath, aged)
      TopKRuntimeFeedback.resetForTest()
      val replanned = physical(highCardTopK)
      assert(replanned.contains("TopKPerKey ["),
        s"a stale observation must not veto (distributions drift):\n$replanned")
    } finally {
      spark.conf.unset(TopKWindowRewrite.MaxKeysConfKey)
      TopKRuntimeFeedback.resetForTest()
      java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    }
  }

  test("ledgerEnabled=false keeps the feedback in-memory only") {
    TopKRuntimeFeedback.resetForTest()
    java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    spark.conf.set(TopKWindowRewrite.MaxKeysConfKey, "50")
    spark.conf.set(TopKRuntimeFeedback.LedgerEnabledKey, "false")
    try {
      val first = highCardTopK
      assert(physical(first).contains("TopKPerKey ["))
      first.write.format("noop").mode("overwrite").save()
      TopKRuntimeFeedback.flushNow(spark.sparkContext) // no-op: ledger never loaded
      assert(!java.nio.file.Files.exists(ledgerLocalPath),
        "disabled ledger must write nothing")
      // the SAME session still self-corrects from the in-memory record
      assert(!physical(highCardTopK).contains("TopKPerKey ["),
        "in-memory feedback must keep working with the ledger disabled")
    } finally {
      spark.conf.unset(TopKWindowRewrite.MaxKeysConfKey)
      spark.conf.unset(TopKRuntimeFeedback.LedgerEnabledKey)
      TopKRuntimeFeedback.resetForTest()
      java.nio.file.Files.deleteIfExists(ledgerLocalPath)
    }
  }

  test("warehouse switch flushes pending evidence to the OLD ledger and clears the veto maps") {
    // fingerprints are query-shape keyed, not data-keyed: a JVM that
    // touches two warehouses must not let A's cardinality evidence veto
    // the rewrite over B's different data, nor flush into B's ledger
    TopKRuntimeFeedback.resetForTest()
    val whA = java.nio.file.Files.createTempDirectory("graft-topk-whA").toString
    val whB = java.nio.file.Files.createTempDirectory("graft-topk-whB").toString
    val hc = spark.sparkContext.hadoopConfiguration
    val weekMs = 3600000L * 168
    try {
      TopKRuntimeFeedback.ensureLoaded(whA, hc, weekMs)
      TopKRuntimeFeedback.tracker(spark.sparkContext, 42L).add(1234L)
      assert(TopKRuntimeFeedback.observedKeys(42L).contains(1234L))
      TopKRuntimeFeedback.ensureLoaded(whB, hc, weekMs)
      assert(TopKRuntimeFeedback.observedKeys(42L).isEmpty,
        "warehouse A's evidence must not survive into warehouse B's veto")
      val ledgerA = java.nio.file.Paths.get(whA, "_graft_meta", "topk_feedback.tsv")
      assert(java.nio.file.Files.exists(ledgerA),
        "pending evidence must flush to the OLD warehouse's ledger on switch")
      assert(java.nio.file.Files.readString(ledgerA).startsWith("42\t1234\t"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(whB, "_graft_meta", "topk_feedback.tsv")),
        "nothing of A's may land in B's ledger")
      // switching back re-reads A's ledger: the evidence returns
      TopKRuntimeFeedback.ensureLoaded(whA, hc, weekMs)
      assert(TopKRuntimeFeedback.observedKeys(42L).contains(1234L),
        "returning to warehouse A must reload its own ledger")
    } finally TopKRuntimeFeedback.resetForTest()
  }

  test("flush honors the session-supplied staleness window captured at load") {
    // the load path gets maxAge from the SESSION conf; the flush path used
    // to read the SparkConf — a session-level extension of the window was
    // honored when loading but the entry was dropped at the next write
    TopKRuntimeFeedback.resetForTest()
    val wh = java.nio.file.Files.createTempDirectory("graft-topk-whC").toString
    val meta = java.nio.file.Paths.get(wh, "_graft_meta")
    java.nio.file.Files.createDirectories(meta)
    val oldStamp = System.currentTimeMillis() - 200L * 3600000L // 200 h old
    java.nio.file.Files.writeString(meta.resolve("topk_feedback.tsv"),
      s"7\t999\t$oldStamp\n")
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      // user-extended 400 h window, as the rewrite supplies from SQLConf
      TopKRuntimeFeedback.ensureLoaded(wh, hc, 400L * 3600000L)
      assert(TopKRuntimeFeedback.observedKeys(7L).contains(999L),
        "a 200 h entry is live inside a 400 h window")
      TopKRuntimeFeedback.tracker(spark.sparkContext, 8L).add(11L)
      TopKRuntimeFeedback.flushNow(spark.sparkContext)
      val txt = java.nio.file.Files.readString(meta.resolve("topk_feedback.tsv"))
      assert(txt.contains("7\t999\t"),
        s"an entry inside the user-extended window must survive the flush: $txt")
      assert(txt.contains("8\t11\t"), s"the fresh observation must land too: $txt")
    } finally TopKRuntimeFeedback.resetForTest()
  }

  test("a surviving rank column blocks the rewrite (operator cannot emit it)") {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables(spark, Sf0001).orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderkey"), col("rn"))
    assert(!physical(df).contains("TopKPerKey ["),
      "rewrite fired while the rank column was still needed")
  }
}
