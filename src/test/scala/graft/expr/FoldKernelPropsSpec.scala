package graft.expr

import graft.SparkSpec
import graft.text.TextOps.{minhashCoeff, MinHashPrime}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential properties for the r16 in-row fold kernels
  * ([[MinHashSigs]], [[HashBucketCounts]]): each must agree with a
  * straight-line Scala reference of the exploded spelling it replaced —
  * MinHashSigs vs "explode the shingle hashes, derive the base hash per
  * row, min the 96 affine transforms per doc" (the pre-r16 `lshBuckets`
  * aggregate), HashBucketCounts vs "explode the tokens, hex60 each
  * OCCURRENCE, count per bucket" (the pre-r16 q201/q176 fold). The
  * kernels feed q21/q65/q76/q183/q206/q208 and q176/q201; a divergence
  * here silently changes every LSH candidate set / bucket model.
  * Fixed-seed samples, evaluated through real Spark plans. */
class FoldKernelPropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def hex60Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("minhash_sigs ≡ per-element affine min over the shingle hashes") {
    val num = 96
    val as = (0 until num).map(minhashCoeff("a", _))
    val bs = (0 until num).map(minhashCoeff("b", _))
    // 60-bit non-negative hashes, like WordShingles.hashedOf emits
    val hashLists: Seq[Seq[Long]] =
      samples(Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1)), 40) ++
        Seq(Seq(0L), Seq((1L << 60) - 1))
    def ref(hs: Seq[Long]): Seq[Long] =
      (0 until num).map { i =>
        hs.map { h => (((h >> 28) % MinHashPrime) * as(i) + bs(i)) % MinHashPrime }.min
      }
    val out = hashLists.toDF("shh")
      .select(MinHashSigs.of(col("shh"), as, bs, MinHashPrime).as("mh"))
      .as[Seq[Long]].collect()
    hashLists.zip(out).foreach { case (hs, got) =>
      assert(got == ref(hs), s"hashes=$hs")
    }
  }

  test("minhash_sigs: empty array yields null (the empty-group min)") {
    val out = Seq(Seq.empty[Long]).toDF("shh")
      .select(MinHashSigs.of(col("shh"),
        Seq(minhashCoeff("a", 0)), Seq(minhashCoeff("b", 0)), MinHashPrime).as("mh"))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("hash_bucket_counts ≡ per-occurrence hex60-mod counts (memo included)") {
    val buckets = 64
    // heavy repetition exercises the per-row memo path
    val tokenLists: Seq[Seq[String]] =
      samples(Gen.listOf(Gen.oneOf("a", "b", "c", "aa", "b c", "", "Ω", "a")), 40) ++
        Seq(Seq.empty, Seq(""), Seq("x", "x", "x"))
    def ref(toks: Seq[String]): Seq[Long] = {
      val out = new Array[Long](buckets)
      toks.foreach(t => out((hex60Ref(t) % buckets).toInt) += 1L)
      out.toSeq
    }
    val out = tokenLists.toDF("t")
      .select(HashBucketCounts.of(col("t"), buckets).as("c"))
      .as[Seq[Long]].collect()
    tokenLists.zip(out).foreach { case (toks, got) =>
      assert(got == ref(toks), s"toks=$toks")
    }
  }
}
