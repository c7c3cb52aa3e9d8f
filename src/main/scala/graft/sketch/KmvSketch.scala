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
  * `KmvSketchSpec` pins the error contract against exact distinct counts;
  * approximate by construction → no DuckDB oracle (like HLL / q25 / q45).
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

  /** SQL surface: `kmv_distinct(hashed_long)` with the default k=256
    * (UDAFs can't take the sketch size as a per-row argument, so the SQL
    * name pins it). Idempotent per session, like the XmlOps UDFs. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("kmv_distinct", udaf(new KmvAggregator(256), Encoders.LONG))
}
