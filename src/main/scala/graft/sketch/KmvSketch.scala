package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * `Aggregator` — the custom-UDAF point on the §2.6 surface (the built-in
  * sketches cover HLL/quantiles; KMV is the classic alternative with a
  * mergeable fixed-size state and a simple estimator:
  * `D ≈ (k − 1) / max(kth smallest normalized hash)`, Bar-Yossef et al.,
  * RANDOM'02).
  *
  * State is the k smallest distinct 60-bit hashes seen — a sorted primitive
  * array capped at k, so the steady-state per-row cost is ONE comparison
  * against the current kth minimum (reject) and admission is a binary
  * search + arraycopy. Bounded, associative, commutative: exactly the
  * contract Spark needs to partial-aggregate map-side and merge across
  * partitions — the shuffle carries ≤ k longs per group regardless of
  * input size. Inputs are PRE-HASHED longs (e.g. `TextOps.hex60` of the
  * value); NULL inputs are skipped like every SQL aggregate (a null hash
  * means a null value — `md5(null)` is null).
  *
  * `KmvSketchSpec` pins the error contract against exact distinct counts.
  * Unlike HLL, the estimate is DETERMINISTIC given the input hash set
  * (exact count below k; (k−1)/(kth-smallest/2⁶⁰) above), so the q57/q77/
  * q88 oracles mirror the estimator itself in SQL and gate both branches.
  */
object KmvSketch {

  private val HashSpace = (1L << 60).toDouble

  /** Sorted ascending, distinct, length ≤ k. */
  final case class State(mins: Array[Long])

  /** The one estimator definition every surface shares (classic and
    * buffered aggregators, q213's SQL mirror): exact below k, else
    * (k−1) / (kth-smallest / 2⁶⁰) — division order is part of the
    * cross-engine parity contract. */
  private def estimateOf(mins: Array[Long], used: Int, k: Int): Double =
    if (used < k) used.toDouble
    else (k - 1).toDouble / (mins(k - 1).toDouble / HashSpace)

  /** Mutable accumulation buffer for the UDAF surface: an APPEND log of
    * capacity 2k with deferred sort-dedup-truncate compaction. The classic
    * [[KmvAggregator]] keeps its state canonical by a binary-search insert
    * — optimal per ROW in the streaming operators' small-batch folds, but
    * each admission arraycopies the ≤k-long state, and during a scan-side
    * partial aggregation the fill phase admits ~k·ln(n/k) times per
    * (partition × group): at q213's scale that was gigabytes of memcpy
    * (6.5 s → 1.3 s at sf0.1 from this buffer alone). Here admission is
    * an O(1) append; a full buffer sorts, dedups, truncates to the k
    * minima and sets `thr` (the current kth minimum) as the steady-state
    * O(1) reject — ≥ k appends between compactions, so the amortized cost
    * is O(log k) per row. Outputs are IDENTICAL k-min sets by
    * construction ([[KmvBufSpec]] pins buffered ≡ classic, dups, merges
    * and all). `var` fields + Array encode fine through the product
    * encoder (fields are read at serialization points only). Trade-off the
    * encoder can't avoid: it serializes the FULL capacity array, stale
    * slots past `used` included (≤ 2k longs of dead bytes per group at a
    * shuffle/spill boundary, and content-nondeterministic across task
    * retries). Harmless — every reader touches only [0, used) — and not
    * hookable: `Encoders.product` exposes no pre-serialize callback, and
    * trimming inside `reduce` would reintroduce the per-row arraycopy this
    * buffer exists to amortize (serialization points are not observable
    * from the aggregator). The classic [[KmvAggregator]] remains the
    * canonical-bytes choice where shuffle-byte determinism matters. */
  final case class Buf(var arr: Array[Long], var used: Int, var thr: Long)

  private def newBuf(): Buf = Buf(Array.emptyLongArray, 0, Long.MaxValue)

  /** Sort-dedup-truncate `b` to its ≤k minima in place; sets the reject
    * threshold once k distincts exist. */
  private def compact(b: Buf, k: Int): Unit = {
    java.util.Arrays.sort(b.arr, 0, b.used)
    var m = 0
    var i = 0
    while (i < b.used && m < k) {
      if (m == 0 || b.arr(i) != b.arr(m - 1)) { b.arr(m) = b.arr(i); m += 1 }
      i += 1
    }
    b.used = m
    if (m == k) b.thr = b.arr(k - 1)
  }

  private def insertBuf(b: Buf, h: Long, k: Int): Buf = {
    // thr is the CURRENT kth minimum once known: h > thr can never be a
    // k-min; h == thr is a duplicate of the kth value — both reject O(1)
    if (h >= b.thr) return b
    if (b.used == b.arr.length) {
      if (b.arr.length < 2 * k) {
        val n = math.min(math.max(b.arr.length * 2, 64), 2 * k)
        b.arr = java.util.Arrays.copyOf(b.arr, n)
      } else {
        compact(b, k)
        if (h >= b.thr) return b // compaction may have set the threshold
      }
    }
    b.arr(b.used) = h
    b.used += 1
    b
  }

  /** Merge a canonical sorted-distinct array into `a` (two-pointer merge,
    * capped at k) — shared by buffer-buffer and state-buffer merges. */
  private def mergeSorted(a: Buf, mins: Array[Long], mlen: Int, k: Int): Buf = {
    compact(a, k)
    val out = new Array[Long](2 * k)
    var i = 0; var j = 0; var m = 0
    while (m < k && (i < a.used || j < mlen)) {
      val takeA = j >= mlen || (i < a.used && a.arr(i) <= mins(j))
      val next = if (takeA) { val v = a.arr(i); i += 1; v }
                 else { val v = mins(j); j += 1; v }
      // cross-input duplicates surface adjacent in merge order — the
      // last-written check dedups them
      if (m == 0 || out(m - 1) != next) { out(m) = next; m += 1 }
    }
    Buf(out, m, if (m == k) out(k - 1) else Long.MaxValue)
  }

  private def mergeBufs(a: Buf, b: Buf, k: Int): Buf = {
    if (b.used == 0) { compact(a, k); return a }
    if (a.used == 0) { compact(b, k); return b }
    compact(b, k)
    mergeSorted(a, b.arr, b.used, k)
  }

  private def stateOfBuf(b: Buf, k: Int): State = {
    compact(b, k)
    State(java.util.Arrays.copyOf(b.arr, b.used))
  }

  /** Buffered-compaction KMV for the UDAF surface — identical k-min set
    * and estimator as [[KmvAggregator]], amortized O(log k) per row. */
  class KmvBufAggregator(k: Int) extends Aggregator[java.lang.Long, Buf, Double] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: Buf = newBuf()
    override def reduce(b: Buf, h: java.lang.Long): Buf =
      if (h == null) b else insertBuf(b, h.longValue(), k)
    override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, k)
    override def finish(b: Buf): Double = {
      compact(b, k); estimateOf(b.arr, b.used, k)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Buffered state-output variant (the q77/q213 shard-sketch path). */
  class KmvBufStateAggregator(k: Int) extends Aggregator[java.lang.Long, Buf, State] {
    private val inner = new KmvBufAggregator(k)
    override def zero: Buf = inner.zero
    override def reduce(b: Buf, h: java.lang.Long): Buf = inner.reduce(b, h)
    override def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
    override def finish(b: Buf): State = stateOfBuf(b, k)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[State] = Encoders.product[State]
  }

  /** Buffered merge-only re-aggregator (stored [[State]]s → estimate). */
  class KmvBufMergeAggregator(k: Int) extends Aggregator[State, Buf, Double] {
    override def zero: Buf = newBuf()
    override def reduce(b: Buf, in: State): Buf =
      if (in == null || in.mins.isEmpty) b
      else mergeSorted(b, in.mins, in.mins.length, k)
    override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, k)
    override def finish(b: Buf): Double = {
      compact(b, k); estimateOf(b.arr, b.used, k)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  class KmvAggregator(k: Int) extends Aggregator[java.lang.Long, State, Double] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: State = State(Array.emptyLongArray)

    private def insert(s: State, h: Long): State = {
      val m = s.mins
      // steady state: full sketch, hash above the kth minimum → O(1) reject
      if (m.length == k && h >= m(k - 1)) return s
      val pos = java.util.Arrays.binarySearch(m, h)
      if (pos >= 0) return s // already present
      val ins = -pos - 1
      val outLen = math.min(m.length + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(m, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(m, ins, out, ins + 1, outLen - ins - 1)
      State(out)
    }

    override def reduce(s: State, h: java.lang.Long): State =
      if (h == null) s else insert(s, h.longValue()) // nulls skip, SQL-style

    override def merge(a: State, b: State): State =
      if (a.mins.isEmpty) b
      else if (b.mins.isEmpty) a
      else b.mins.foldLeft(a)((s, h) => insert(s, h))

    override def finish(s: State): Double =
      estimateOf(s.mins, s.mins.length, k) // exact below k distincts

    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-level KMV estimator over a pre-hashed 60-bit long column
    * (nullable — nulls are ignored). */
  def approxDistinct(hashed: Column, k: Int = 256): Column =
    udaf(new KmvBufAggregator(k), Encoders.LONG).apply(hashed)

  /** State-output variant: emits the sketch itself (a `mins` struct) so a
    * shard/source-level aggregation can be PERSISTED and re-aggregated
    * later without touching the raw rows — the mergeable-sketch pattern a
    * 100 TB rollup needs (q77). Same reduce/merge as [[KmvAggregator]]. */
  class KmvStateAggregator(k: Int) extends Aggregator[java.lang.Long, State, State] {
    private val inner = new KmvAggregator(k)
    override def zero: State = inner.zero
    override def reduce(s: State, h: java.lang.Long): State = inner.reduce(s, h)
    override def merge(a: State, b: State): State = inner.merge(a, b)
    override def finish(s: State): State = s
    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[State] = Encoders.product[State]
  }

  /** Merge-only re-aggregator: folds stored sketch states (the
    * [[KmvStateAggregator]] output) into the estimate. Associativity of
    * the merge is what makes the two-level cascade exact below k. */
  class KmvMergeAggregator(k: Int) extends Aggregator[State, State, Double] {
    private val inner = new KmvAggregator(k)
    override def zero: State = inner.zero
    override def reduce(s: State, in: State): State =
      if (in == null) s else inner.merge(s, in)
    override def merge(a: State, b: State): State = inner.merge(a, b)
    override def finish(s: State): Double = inner.finish(s)
    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Shard sketch state of a pre-hashed long column. */
  def sketchState(hashed: Column, k: Int = 256): Column =
    udaf(new KmvBufStateAggregator(k), Encoders.LONG).apply(hashed)

  /** Distinct estimate from stored sketch states ([[sketchState]] output).
    * The single-field `State` input encoder flattens to a bare
    * `ARRAY<BIGINT>`, so the struct's `mins` field is what feeds it. */
  def mergeDistinct(state: Column, k: Int = 256): Column =
    udaf(new KmvBufMergeAggregator(k), Encoders.product[State]).apply(state.getField("mins"))

  /** SQL surface: `kmv_distinct(hashed_long)` with the default k=256
    * (UDAFs can't take the sketch size as a per-row argument, so the SQL
    * name pins it). Idempotent per session, like the XmlOps UDFs. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("kmv_distinct", udaf(new KmvBufAggregator(256), Encoders.LONG))
}
