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
      if (s.mins.length < k) s.mins.length.toDouble // exact below k distincts
      else (k - 1).toDouble / (s.mins(k - 1).toDouble / HashSpace)

    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-level KMV estimator over a pre-hashed 60-bit long column
    * (nullable — nulls are ignored). */
  def approxDistinct(hashed: Column, k: Int = 256): Column =
    udaf(new KmvAggregator(k), Encoders.LONG).apply(hashed)

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
    udaf(new KmvStateAggregator(k), Encoders.LONG).apply(hashed)

  /** Distinct estimate from stored sketch states ([[sketchState]] output).
    * The single-field `State` input encoder flattens to a bare
    * `ARRAY<BIGINT>`, so the struct's `mins` field is what feeds it. */
  def mergeDistinct(state: Column, k: Int = 256): Column =
    udaf(new KmvMergeAggregator(k), Encoders.product[State]).apply(state.getField("mins"))

  /** SQL surface: `kmv_distinct(hashed_long)` with the default k=256
    * (UDAFs can't take the sketch size as a per-row argument, so the SQL
    * name pins it). Idempotent per session, like the XmlOps UDFs. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("kmv_distinct", udaf(new KmvAggregator(256), Encoders.LONG))
}
