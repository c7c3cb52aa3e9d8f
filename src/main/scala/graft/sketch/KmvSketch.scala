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
  * State is the k smallest distinct 60-bit hashes seen (a sorted set
  * capped at k) — bounded, associative, commutative: exactly the contract
  * Spark needs to partial-aggregate map-side and merge across partitions,
  * so the shuffle carries ≤ k longs per group regardless of input size.
  * Inputs are PRE-HASHED longs (e.g. `TextOps.hex60` of the value) so the
  * aggregator composes with the engine's cross-engine hashing.
  *
  * `KmvSketchSpec` pins the error contract against exact distinct counts;
  * approximate by construction → no DuckDB oracle (like HLL / q25 / q45).
  */
object KmvSketch {

  private val HashSpace = (1L << 60).toDouble

  final case class State(var mins: List[Long]) // sorted ascending, ≤ k, distinct

  class KmvAggregator(k: Int) extends Aggregator[Long, State, Double] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: State = State(Nil)

    private def insert(s: State, h: Long): State = {
      if (s.mins.contains(h)) return s
      if (s.mins.length < k) State((h :: s.mins).sorted)
      else if (h < s.mins.last) State(((h :: s.mins).sorted).take(k))
      else s
    }

    override def reduce(s: State, h: Long): State = insert(s, h)

    override def merge(a: State, b: State): State =
      State((a.mins ++ b.mins).distinct.sorted.take(k))

    override def finish(s: State): Double =
      if (s.mins.length < k) s.mins.length.toDouble // exact below k distincts
      else (k - 1).toDouble / (s.mins.last.toDouble / HashSpace)

    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-level KMV estimator over a pre-hashed 60-bit long column. */
  def approxDistinct(hashed: Column, k: Int = 256): Column =
    udaf(new KmvAggregator(k), Encoders.scalaLong).apply(hashed)
}
