package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property: the custom TopKPerKey operator must agree
  * with the window row_number formulation on random frames across
  * (k, partition count, partial key cap) — including caps small enough
  * that most keys overflow into the unreduced-passthrough path, ties in
  * the leading sort value, and keys with fewer than k rows. The custom
  * exec is the riskiest hand-written code in the tree; this is its
  * fuzzer. Fixed seeds (offline cache has no scalatest-plus bridge). */
class TopKPropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val frames: Seq[Seq[(Long, Long, Double)]] = samples(
    for {
      n <- Gen.choose(0, 120)
      nKeys <- Gen.choose(1, 9)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, nKeys.toLong - 1)
        // coarse values force ties in the leading sort column
        v <- Gen.choose(0, 6).map(_.toDouble)
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) },
    25)

  test("TopKPerKey == window row_number for random frames × (k, partitions, cap)") {
    for {
      (rows, fi) <- frames.zipWithIndex
      k <- Seq(1, 3)
      cap <- Seq(1, TopKPerKey.DefaultMaxPartialKeys)
    } {
      val df = rows.toDF("key", "id", "value").repartition(1 + fi % 5)
      val native = TopK.perKey(df, Seq("key"),
          Seq("value" -> true, "id" -> false), k, maxPartialKeys = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val w = Window.partitionBy(col("key")).orderBy(col("value").desc, col("id"))
      val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .drop("rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(native.sameElements(windowed),
        s"frame $fi k=$k cap=$cap: ${native.toSeq} != ${windowed.toSeq}")
    }
  }
}
