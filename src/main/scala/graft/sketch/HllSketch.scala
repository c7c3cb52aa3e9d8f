package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog as a typed Spark `Aggregator` — the imperative twin of the
  * q144 relational formulation (same 60-bit hash kernel, same
  * trailing-zero rank, same estimator arithmetic), completing the sketch
  * UDAF family beside [[KmvSketch]]: KMV keeps the k smallest hashes
  * (exact below k, ~1/√k error above, 8k bytes); HLL keeps ONE 6-bit rank
  * per register (fixed [[HllSketch.M]] bytes — memory-optimal, Flajolet
  * et al., AofA 2007). State is a plain byte array; merge is elementwise
  * max — bounded, associative, commutative, so Spark partial-aggregates
  * map-side and the shuffle carries [[HllSketch.M]] bytes per group
  * regardless of input size.
  *
  * `HllSketchSpec` pins the aggregator BIT-IDENTICAL to the q144
  * relational registers/estimate on the same corpus (two independent
  * implementations of one contract), plus the error envelope past the
  * small-range regime and state-merge associativity. Approximate by
  * construction → the UDAF itself carries no DuckDB oracle (q144's
  * relational form is the oracle-gated member, like q57 for KMV). */
object HllSketch {

  /** Registers (p = 6 bucket bits of the 60-bit hash) — q144's HllM. */
  val M = 64
  /** Max rank: 54 post-bucket bits, rho = trailing zeros + 1, all-zero → 55. */
  private val MaxRho = 55

  final case class HState(regs: Array[Byte])

  private def emptyState: HState = HState(new Array[Byte](M))

  private def update(s: HState, h: Long): HState = {
    val bucket = (h % M).toInt
    val rest = h >>> 6
    val rho =
      if (rest == 0L) MaxRho
      else java.lang.Long.numberOfTrailingZeros(rest) + 1
    if (rho > s.regs(bucket)) s.regs(bucket) = rho.toByte
    s
  }

  private def maxMerge(a: HState, b: HState): HState = {
    var i = 0
    while (i < M) {
      if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
      i += 1
    }
    a
  }

  /** The q144 estimator, verbatim: alpha·m²/Σ2^-M_j with the ≤2.5m
    * small-range correction m·ln(m/V) when empty registers remain. */
  private def estimate(s: HState): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / M.toDouble)
    var den = 0.0
    var vEmpty = 0
    var i = 0
    while (i < M) {
      if (s.regs(i) == 0) { vEmpty += 1; den += 1.0 }
      else den += 1.0 / (1L << s.regs(i)).toDouble
      i += 1
    }
    val raw = alpha * (M * M).toDouble / den
    if (raw <= 2.5 * M && vEmpty > 0) M.toDouble * math.log(M.toDouble / vEmpty)
    else raw
  }

  class HllAggregator extends Aggregator[java.lang.Long, HState, Double] {
    override def zero: HState = emptyState
    override def reduce(s: HState, h: java.lang.Long): HState =
      if (h == null) s else update(s, h.longValue()) // nulls skip, SQL-style
    override def merge(a: HState, b: HState): HState = maxMerge(a, b)
    override def finish(s: HState): Double = estimate(s)
    override def bufferEncoder: Encoder[HState] = Encoders.product[HState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** State-output variant for the persisted shard-sketch rollup (q77's
    * pattern: re-sketch only changed shards, max-merge the rest). */
  class HllStateAggregator extends Aggregator[java.lang.Long, HState, HState] {
    private val inner = new HllAggregator
    override def zero: HState = inner.zero
    override def reduce(s: HState, h: java.lang.Long): HState = inner.reduce(s, h)
    override def merge(a: HState, b: HState): HState = inner.merge(a, b)
    override def finish(s: HState): HState = s
    override def bufferEncoder: Encoder[HState] = Encoders.product[HState]
    override def outputEncoder: Encoder[HState] = Encoders.product[HState]
  }

  /** Merge-only re-aggregator over stored register states. */
  class HllMergeAggregator extends Aggregator[HState, HState, Double] {
    private val inner = new HllAggregator
    override def zero: HState = inner.zero
    override def reduce(s: HState, in: HState): HState =
      if (in == null) s else inner.merge(s, in)
    override def merge(a: HState, b: HState): HState = inner.merge(a, b)
    override def finish(s: HState): Double = inner.finish(s)
    override def bufferEncoder: Encoder[HState] = Encoders.product[HState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** HLL estimate over a pre-hashed 60-bit long column (nulls ignored). */
  def approxDistinct(hashed: Column): Column =
    udaf(new HllAggregator, Encoders.LONG).apply(hashed)

  /** Shard register state of a pre-hashed long column. */
  def sketchState(hashed: Column): Column =
    udaf(new HllStateAggregator, Encoders.LONG).apply(hashed)

  /** Distinct estimate from stored register states ([[sketchState]]
    * output; the single-field state flattens to a bare BINARY). */
  def mergeDistinct(state: Column): Column =
    udaf(new HllMergeAggregator, Encoders.product[HState]).apply(state.getField("regs"))

  /** SQL surface: `hll_distinct(hashed_long)`. Idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("hll_distinct", udaf(new HllAggregator, Encoders.LONG))
}
