package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential properties for the positional/distinct gram kernels
  * ([[graft.expr.WordGrams]], [[graft.expr.WordShingles]]): the codegen'd
  * loop must agree with a straight-line Scala reference on random token
  * arrays for every (k, step) — the kernels feed q20/q21/q50/q69/q71/q72/
  * q74, so a windowing off-by-one here would silently skew every
  * dedup/fingerprint result. Samples use fixed seeds (offline cache has no
  * scalatest-plus bridge), evaluated through real Spark plans batched per
  * (k, step) so the whole spec is a handful of jobs. */
class GramPropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val tokenLists: Seq[Seq[String]] =
    samples(Gen.listOf(Gen.oneOf("a", "b", "c", "aa", "b c", "", "Ω")), 60) ++
      Seq(Seq.empty, Seq(""), Seq("lone"))

  private def hex60Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def gramsRef(toks: Seq[String], k: Int, step: Int): Seq[String] =
    if (toks.length < k) Seq.empty
    else (0 to toks.length - k by step).map(i => toks.slice(i, i + k).mkString(" "))

  test("word_grams ≡ sliding/strided window reference for every (k, step)") {
    for (k <- 1 to 3; step <- 1 to 3) {
      val out = tokenLists.toDF("t")
        .select(graft.expr.WordGrams.of(col("t"), k, step).as("g"))
        .as[Seq[String]].collect()
      tokenLists.zip(out).foreach { case (toks, got) =>
        assert(got == gramsRef(toks, k, step), s"toks=$toks k=$k step=$step")
      }
    }
  }

  test("word_gram_hashes ≡ hex60(md5) of each positional gram") {
    for (k <- 1 to 3) {
      val out = tokenLists.toDF("t")
        .select(graft.expr.WordGrams.hashedOf(col("t"), k, 1).as("g"))
        .as[Seq[Long]].collect()
      tokenLists.zip(out).foreach { case (toks, got) =>
        assert(got == gramsRef(toks, k, 1).map(hex60Ref), s"toks=$toks k=$k")
      }
    }
  }

  test("word_shingles ≡ first-occurrence-distinct sliding grams") {
    for (k <- 1 to 3) {
      val out = tokenLists.toDF("t")
        .select(graft.text.TextOps.shingles(col("t"), k).as("g"))
        .as[Seq[String]].collect()
      tokenLists.zip(out).foreach { case (toks, got) =>
        assert(got == gramsRef(toks, k, 1).distinct, s"toks=$toks k=$k")
      }
    }
  }
}
