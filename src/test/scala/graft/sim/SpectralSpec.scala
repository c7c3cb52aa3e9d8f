package graft.sim

import graft.SparkSpec
import graft.sql.Tables
import org.apache.spark.sql.functions.col

/** Pins q137 against an INDEPENDENT full-precision power iteration on the
  * driver — same schedule, no fixed-point quantization — so the card's
  * 2⁻³⁰-per-term quantization contract is verified to stay microscopic,
  * not just cross-engine-consistent. */
class SpectralSpec extends SparkSpec {

  test("q137: loadings match a full-precision driver iteration within quantization noise") {
    val rows = Tables(spark, Sf0001).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val d = rows.head.length
    val n = rows.length
    val mean = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val xc = rows.map(r => Array.tabulate(d)(j => r(j) - mean(j)))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to 2) {
      val w = Array.fill(d)(0.0)
      xc.foreach { x =>
        val s = (0 until d).map(j => x(j) * v(j)).sum
        (0 until d).foreach(j => w(j) += s * x(j))
      }
      lambda = math.sqrt(w.map(t => t * t).sum)
      v = w.map(_ / lambda)
    }
    val got = SpectralQueries.q137PcaPower(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == d)
    // unit norm survives the DECIMAL(18,9) rounding
    val norm = math.sqrt(got.map(t => t._2 * t._2).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"loading norm drifted: $norm")
    // fixed-point quantization (2^-30 per term) must stay microscopic
    got.foreach { case (j, loading, _) =>
      assert(math.abs(loading - v(j)) < 1e-4,
        s"dim $j: engine $loading vs full-precision ${v(j)}")
    }
    assert(math.abs(got.head._3 - lambda) / lambda < 1e-4,
      s"lambda ${got.head._3} vs full-precision $lambda")
    // the top direction explains at least as much variance as any axis:
    // lambda/n >= max per-axis variance (within iteration slack)
    val axisVar = (0 until d).map(j => xc.map(x => x(j) * x(j)).sum / n).max
    assert(got.head._3 / n >= axisVar * 0.9,
      s"top-PC variance ${got.head._3 / n} implausibly below axis max $axisVar")
  }
}
