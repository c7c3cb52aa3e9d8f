package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the shared text primitives feeding q15–q23. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def shingleOf(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(TextOps.shingles(TextOps.tokens(TextOps.normText(col("t")))))
      .as[Seq[String]].head()

  test("shingles: fewer than k tokens → empty, k tokens → one, distinct") {
    assert(shingleOf("one two") == Seq.empty)
    assert(shingleOf("one two three") == Seq("one two three"))
    assert(shingleOf("a b c d") == Seq("a b c", "b c d"))
    assert(shingleOf("x y z x y z x y z") == Seq("x y z", "y z x", "z x y"))
  }

  test("normText collapses all whitespace runs and lowercases") {
    val out = Seq("  A\t\tB\nC   d  ").toDF("t")
      .select(TextOps.normText(col("t"))).as[String].head()
    assert(out == "a b c d")
  }

  test("hex60 is a non-negative 60-bit value, stable across calls") {
    val vals = Seq("x", "x", "y").toDF("t")
      .select(TextOps.hex60(col("t"))).as[Long].collect()
    assert(vals(0) == vals(1))
    assert(vals(0) != vals(2))
    assert(vals.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("hex60 equals DuckDB's ('0x' || substr(md5(x),1,15))::BIGINT recipe") {
    // java-side reimplementation of the oracle expression
    def oracle(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val inputs = Seq("hello world", "", "ünïcødé", "0:shingle text")
    val sparkVals = inputs.toDF("t").select(TextOps.hex60(col("t"))).as[Long].collect()
    assert(sparkVals.toSeq == inputs.map(oracle))
  }
}
