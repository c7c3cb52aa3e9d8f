package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.util.LongAccumulator

/** Group top-k as a WHOLE-OPERATOR custom plan — the §7.4 escalation
  * point past custom expressions: a `LogicalPlan` node, a
  * `SparkStrategy` that plans it, and a physical `TopKPerKeyExec` pair,
  * registered through `SparkSessionExtensions`
  * (`GraftExtensions.injectPlannerStrategy`).
  *
  * What the built-ins do: Spark 4 plans `row_number().over(...) <= k`
  * with `WindowGroupLimitExec`, which SORTS each map partition
  * (O(n log n)) and group-limits before the shuffle. This operator
  * replaces the sort with a bounded k-row heap per key on the MAP side
  * (partial exec, no distribution requirement) — O(n log k), no
  * partition sort — then merges heaps on the reduce side (final exec,
  * `ClusteredDistribution`; EnsureRequirements inserts exactly one hash
  * exchange between the two): the partial/final contract a
  * HashAggregate uses, applied to order statistics. Partial memory is
  * capped at [[TopKPerKey.DefaultMaxPartialKeys]] distinct keys per
  * partition; overflow keys' rows ship unreduced (HashAggregate's
  * skip-partial fallback), so memory is bounded at any key cardinality.
  *
  * Measured (local[32], 20M rows, top-3 per key, median of 3 warm,
  * noop sink, vs the WindowGroupLimit-optimized window): 100 keys →
  * 1.8× faster; 10k keys → 1.2×; 1M keys → 0.9× (the capped partial
  * degrades to passthrough and the window's codegen'd sort wins the
  * constant factor). Use this operator when keys-per-partition is well
  * under the cap — the dashboard/top-N-entities regime — and the window
  * when the key space approaches row count.
  *
  * Semantics: per distinct key, the first k rows of `ORDER BY ordering`
  * (ties beyond the ordering are non-deterministic — pass a unique
  * tiebreaker column as the last sort key, as q101 does with
  * o_orderkey). Output rows are unsorted across and within keys; sort
  * downstream for presentation. */
case class TopKPerKey(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys,
    fingerprint: Option[Long] = None) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Partial-side distinct-key cap (per partition). Past it, new keys'
    * rows ship unreduced — the HashAggregate skip-partial fallback:
    * bounded memory always, reduction whenever cardinality allows. */
  val DefaultMaxPartialKeys: Int = 1 << 17
}

/** Runtime cardinality feedback for [[TopKWindowRewrite]]'s veto on
  * un-ANALYZEd tables — the observed half of the statistics ladder. The
  * partial exec OBSERVES what no catalog statistic could promise: the
  * per-partition distinct-key population its heaps actually held (plus
  * every overflow row that shipped unreduced past the key cap), summed
  * across partitions through a [[LongAccumulator]]. The sum upper-bounds
  * global distinct keys but is exactly the operator's own cost driver
  * (heap-insertion population), so it is the honest veto signal. The
  * NEXT planning of the same canonical query consults the record: past
  * the bound, the rewrite keeps the native window — the 1M-key regime
  * self-corrects after one execution, no ANALYZE required. First-run
  * exposure is the operator's documented cap-bounded 0.9× worst case.
  * Keyed by the canonicalized (partition keys, window child) fingerprint,
  * so the map is bounded by distinct query shapes per JVM.
  *
  * PERSISTENCE (round 15): the in-JVM map alone meant every fresh
  * session re-paid one bad planning per un-ANALYZEd high-cardinality
  * site. Observations now also persist to a LEDGER under the session's
  * warehouse dir (`_graft_meta/topk_feedback.tsv`, one
  * `fp \t keys \t epochMillis` line per site): a job-end listener
  * flushes any record whose value changed, and [[ensureLoaded]] (called
  * from the rewrite's veto before it consults evidence) reads the file
  * once per path per JVM — so the veto survives a session restart.
  * Staleness rule: entries older than
  * `spark.graft.topkRewrite.ledgerMaxAgeHours` (default 168 h) are
  * dropped at load AND at write — data distributions drift, and a veto
  * grounded in last-quarter's cardinality should eventually re-earn
  * itself. The file is bounded ([[MaxLedgerEntries]] newest entries)
  * and rewritten whole through a tmp+rename, so concurrent sessions
  * last-writer-win a complete file rather than interleaving lines.
  * Disable with `spark.graft.topkRewrite.ledgerEnabled=false` (the
  * in-memory half keeps working). */
object TopKRuntimeFeedback {
  val LedgerEnabledKey = "spark.graft.topkRewrite.ledgerEnabled"
  val LedgerMaxAgeHoursKey = "spark.graft.topkRewrite.ledgerMaxAgeHours"
  val DefaultLedgerMaxAgeHours = 168L
  val MaxLedgerEntries = 4096
  private val LedgerName = "_graft_meta/topk_feedback.tsv"

  private val records =
    new java.util.concurrent.ConcurrentHashMap[Long, LongAccumulator]()
  // fp -> (observed keys, stamp) loaded from / flushed to the ledger
  private val persisted =
    new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
  private val lastFlushed =
    new java.util.concurrent.ConcurrentHashMap[Long, Long]()
  @volatile private var loadedPath: String = null
  /** Staleness window captured from the SESSION conf at [[ensureLoaded]]
    * time and reused by [[flush]] — the flush listener only has a
    * SparkContext, and reading the SparkConf there would ignore a
    * session-level `spark.conf.set` that the load path honors (entries
    * inside a user-extended window would be dropped at the next write). */
  @volatile private var loadedMaxAgeMs: Long = 3600000L * DefaultLedgerMaxAgeHours
  @volatile private var armedCtx: org.apache.spark.SparkContext = null
  @volatile private var armedListener: org.apache.spark.scheduler.SparkListener = null

  private def ledgerFile(warehouse: String) =
    new org.apache.hadoop.fs.Path(warehouse, LedgerName)

  /** Fresh accumulator for one execution of `fp`'s partial pass; replaces
    * any prior record (latest observation wins). Arms the flush listener
    * on this context the first time through. */
  def tracker(sc: org.apache.spark.SparkContext, fp: Long): LongAccumulator = {
    val acc = sc.longAccumulator(s"graft.topk.partialKeys.$fp")
    records.put(fp, acc)
    synchronized {
      if ((armedCtx ne sc) && loadedPath != null) {
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = flush(sc)
        }
        sc.addSparkListener(l)
        armedCtx = sc; armedListener = l
      }
    }
    acc
  }

  /** Driver-side read of the latest completed observation — this JVM's
    * live records first (freshest), else the loaded ledger (0 while the
    * first execution is still running — planning then proceeds
    * unvetoed, which is the correct no-evidence default). */
  def observedKeys(fp: Long): Option[Long] =
    Option(records.get(fp)).map(_.value.longValue())
      .orElse(Option(persisted.get(fp)).map(_._1))

  /** Loads the warehouse ledger once per path per JVM, dropping entries
    * older than `maxAgeMs`. Called from the rewrite's veto, so it runs
    * before the first planning that could use the evidence. Read
    * failures degrade to the in-memory-only behavior.
    *
    * WAREHOUSE SWITCH (a JVM that touches two warehouses): fingerprints
    * are query-shape keyed, not data-keyed, so warehouse A's cardinality
    * evidence must neither veto the rewrite over B's different data nor
    * flush into B's ledger. On a path change the pending live records
    * flush to the OLD warehouse's ledger first, then every map (live,
    * loaded, watermarks) clears before B's file loads. Alternating
    * warehouses therefore re-reads the ledger per switch — correct by
    * construction, and the file is one small tsv. */
  def ensureLoaded(warehouse: String,
      hadoopConf: org.apache.hadoop.conf.Configuration, maxAgeMs: Long): Unit = {
    loadedMaxAgeMs = maxAgeMs
    if (loadedPath == warehouse) return
    synchronized {
      if (loadedPath == warehouse) return
      if (loadedPath != null) {
        flushTo(loadedPath, hadoopConf, maxAgeMs)
        records.clear(); persisted.clear(); lastFlushed.clear()
      }
      try {
        val f = ledgerFile(warehouse)
        val fs = f.getFileSystem(hadoopConf)
        if (fs.exists(f)) {
          val in = fs.open(f)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          val floor = System.currentTimeMillis() - maxAgeMs
          txt.linesIterator.foreach { line =>
            line.split('\t') match {
              case Array(fp, keys, stamp) if stamp.toLong >= floor =>
                persisted.put(fp.toLong, (keys.toLong, stamp.toLong))
              case _ => // stale or malformed: skip
            }
          }
        }
      } catch { case scala.util.control.NonFatal(_) => }
      loadedPath = warehouse
    }
  }

  /** Merges changed live records into `persisted` and rewrites the
    * ledger (newest [[MaxLedgerEntries]], stale dropped). Job-end-driven;
    * write failures are swallowed (the ledger is an optimization). */
  private def flush(sc: org.apache.spark.SparkContext): Unit = synchronized {
    val warehouse = loadedPath
    if (warehouse == null) return
    // staleness window from the SESSION conf captured at load time — the
    // same source the load path's drop rule reads (see loadedMaxAgeMs)
    flushTo(warehouse, sc.hadoopConfiguration, loadedMaxAgeMs)
  }

  private def flushTo(warehouse: String,
      hadoopConf: org.apache.hadoop.conf.Configuration, maxAgeMs: Long): Unit =
    synchronized {
    val now = System.currentTimeMillis()
    var changed = false
    records.forEach { (fp, acc) =>
      val v = acc.value.longValue()
      if (v > 0 && lastFlushed.getOrDefault(fp, -1L) != v) {
        persisted.put(fp, (v, now)); lastFlushed.put(fp, v); changed = true
      }
    }
    if (!changed) return
    try {
      val floor = now - maxAgeMs
      val keep = persisted.asScala.toSeq
        .filter(_._2._2 >= floor).sortBy(-_._2._2).take(MaxLedgerEntries)
      val dest = ledgerFile(warehouse)
      val fs = dest.getFileSystem(hadoopConf)
      val tmp = new org.apache.hadoop.fs.Path(dest.getParent,
        s".${dest.getName}.tmp")
      val out = fs.create(tmp, true)
      try out.write(keep.map { case (fp, (k, s)) => s"$fp\t$k\t$s\n" }
        .mkString.getBytes("UTF-8"))
      finally out.close()
      fs.delete(dest, false)
      fs.rename(tmp, dest)
    } catch { case scala.util.control.NonFatal(_) => }
  }

  /** Test seams. */
  private[plans] def clear(): Unit = records.clear()
  private[plans] def snapshot(): Map[Long, Long] = {
    import scala.jdk.CollectionConverters._
    records.asScala.map { case (k, v) => (k, v.value.longValue()) }.toMap
  }
  /** Simulates a fresh JVM: forgets live records, loaded ledger, flush
    * watermarks, and the armed listener (removed from its context). */
  private[plans] def resetForTest(): Unit = synchronized {
    records.clear(); persisted.clear(); lastFlushed.clear()
    loadedPath = null
    loadedMaxAgeMs = 3600000L * DefaultLedgerMaxAgeHours
    if (armedCtx != null && armedListener != null)
      try armedCtx.removeSparkListener(armedListener)
      catch { case scala.util.control.NonFatal(_) => }
    armedCtx = null; armedListener = null
  }
  /** Deterministic flush for specs (listener events are async). */
  private[plans] def flushNow(sc: org.apache.spark.SparkContext): Unit = flush(sc)
}

/** Plans [[TopKPerKey]] as partial-over-final [[TopKPerKeyExec]]s. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.keys, t.ordering, t.k, partial = false, t.maxPartialKeys,
        TopKPerKeyExec(t.keys, t.ordering, t.k, partial = true, t.maxPartialKeys,
          planLater(t.child), t.fingerprint)) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heap pass. `partial` runs map-side on whatever
  * partitioning arrives; the final copy declares
  * [[ClusteredDistribution]] on the keys so every key's survivors meet
  * on one reducer. Both sides run the identical heap fold — the merge
  * of two k-bounded heaps is just the fold over their union. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialKeys: Int,
    child: SparkPlan,
    fingerprint: Option[Long] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val order = ordering
    val limit = k
    // partial memory is bounded: past the key cap, new keys' rows ship
    // unreduced (always correct — the final pass is exact regardless).
    // The FINAL side never caps: post-shuffle its state IS the operator
    // output, keys-on-this-reducer × k rows.
    val keyCap = if (partial) maxPartialKeys else Int.MaxValue
    // runtime cardinality feedback (partial side only): observed key
    // population reports to the driver through the accumulator so the
    // NEXT planning of this canonical query can veto the rewrite
    val keysAcc: Option[LongAccumulator] =
      if (partial) fingerprint.map(TopKRuntimeFeedback.tracker(sparkContext, _))
      else None
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd comparator over the bound sort order: "smaller" = earlier
      // in ORDER BY = better; the scala PriorityQueue surfaces the MAX
      // (= current worst) at the head, which is what bounded top-k evicts
      val cmp = RowOrdering.create(order, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      var overflowRows = 0L
      // feedback records at TASK COMPLETION, not in the iterator's lazy
      // tail: a consumer that stops pulling early (limit above the
      // exchange) would otherwise record nothing — leaving exactly the
      // high-cardinality regime the veto exists for unobserved. The
      // listener fires before accumulator collection, so partial
      // populations still report (an under-count is conservative: it can
      // only delay the veto, never mis-fire it).
      keysAcc.foreach { acc =>
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            acc.add(heaps.size().toLong + overflowRows)))
      }
      val passThrough = iter.flatMap { row =>
        val probe = keyProj(row)
        var heap = heaps.get(probe)
        if (heap == null && heaps.size() < keyCap) {
          heap = mutable.PriorityQueue.empty[InternalRow](cmp)
          heaps.put(probe.copy(), heap)
        }
        if (heap == null) { overflowRows += 1; Iterator.single(row) } // overflow key: unreduced
        else {
          if (heap.size < limit) heap.enqueue(row.copy())
          else if (cmp.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
          Iterator.empty
        }
      }
      // lazy ++: heap contents emit only after the input is exhausted
      // (the feedback record fires from the completion listener above —
      // per-partition heap population + every unreduced overflow row,
      // the cost the veto bound is calibrated against)
      passThrough ++ heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public entry: `TopK.perKey(df, keys, Seq(col -> desc, ...), k)`. Key
  * and order columns are resolved by name against `df` through the
  * normal analyzer (the node goes in unresolved, `Dataset.ofRows` runs
  * analysis). */
object TopK {
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int,
      maxPartialKeys: Int = TopKPerKey.DefaultMaxPartialKeys): DataFrame = {
    val keys = keyCols.map(c => UnresolvedAttribute.quoted(c): Expression)
    val so = orderCols.map { case (c, desc) =>
      SortOrder(UnresolvedAttribute.quoted(c), if (desc) Descending else Ascending)
    }
    GraftDatasetBridge.ofRows(df.sparkSession,
      TopKPerKey(keys, so, k, GraftDatasetBridge.analyzedPlan(df), maxPartialKeys))
  }
}
