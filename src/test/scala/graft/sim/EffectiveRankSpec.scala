package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q188 invariants: PR is bounded by [1, d], and the card actually
  * separates the two regimes it exists to distinguish — a rank-1
  * (single-direction) corpus scores PR ≈ 1, an isotropic corpus scores
  * PR ≈ d. */
class EffectiveRankSpec extends SparkSpec {

  private def write(dir: String, vecs: Seq[Array[Float]]): Unit = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toSeq, i % 3) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def run(dir: String) =
    SpectralQueries.q188EffectiveRank(spark, dir).collect().head

  test("q188: bounded on the real corpus") {
    val r = run(Sf0001)
    val d = r.getAs[Int]("d")
    val pr = r.getAs[Double]("effective_rank")
    assert(d == 64)
    assert(pr >= 1.0 && pr <= d, s"PR $pr out of [1, $d]")
    assert(r.getAs[Double]("total_var") > 0)
    assert(r.getAs[Double]("anisotropy_ratio") >= 1.0)
    assert(r.getAs[Double]("top_var_share") > 0 && r.getAs[Double]("top_var_share") <= 1.0)
  }

  test("q188: rank-1 corpus scores PR ~ 1, isotropic corpus scores PR ~ d") {
    val d = 8
    val rank1 = java.nio.file.Files.createTempDirectory("erank1").toString
    // all mass along axis 0, alternating sign so the mean is 0
    write(rank1, (0 until 64).map { i =>
      Array.tabulate(d)(j => if (j == 0) (if (i % 2 == 0) 1f else -1f) else 0f)
    })
    val row1 = run(rank1)
    val r1 = row1.getAs[Double]("effective_rank")
    assert(math.abs(r1 - 1.0) < 0.01, s"rank-1 corpus PR = $r1")
    // zero-variance dims exist: the ratio reports NULL, not an error
    assert(row1.isNullAt(row1.fieldIndex("anisotropy_ratio")))

    val iso = java.nio.file.Files.createTempDirectory("eriso").toString
    // signed standard basis: per-dim variance equal, covariances 0
    write(iso, (0 until 64).map { i =>
      Array.tabulate(d)(j => if (j == i % d) (if ((i / d) % 2 == 0) 1f else -1f) else 0f)
    })
    val ri = run(iso).getAs[Double]("effective_rank")
    assert(math.abs(ri - d) < 0.01, s"isotropic corpus PR = $ri (d = $d)")
  }
}
