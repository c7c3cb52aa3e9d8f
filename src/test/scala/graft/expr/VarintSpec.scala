package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The varint codec (q191's posting blobs): exact round trip including
  * every 7-bit boundary, the documented byte widths, truncation
  * rejection, and the codegen'd column path agreeing with the kernel.
  * Property samples use fixed seeds (offline cache has no
  * scalatest-plus bridge — the GramPropsSpec device). */
class VarintSpec extends SparkSpec {

  private def roundTrip(xs: Seq[Long]): Seq[Long] = {
    val enc = Varint.encodeArr(new GenericArrayData(xs.toArray))
    Varint.decodeArr(enc).toLongArray.toSeq
  }

  test("boundary values round-trip at the documented widths") {
    val bounds = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 2097151L, 2097152L,
      268435455L, 268435456L, 34359738367L, 34359738368L, Long.MaxValue)
    assert(roundTrip(bounds) == bounds)
    def width(v: Long): Int =
      Varint.encodeArr(new GenericArrayData(Array(v))).length
    assert(width(127L) == 1 && width(128L) == 2)
    assert(width(16383L) == 2 && width(16384L) == 3)
    assert(width(2097151L) == 3 && width(2097152L) == 4)
    assert(width(Long.MaxValue) == 9)
  }

  test("property: any non-negative long sequence round-trips exactly (200 seeded samples)") {
    val gen = Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))
    (0 until 200).foreach { i =>
      val xs = gen(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      assert(roundTrip(xs) == xs, s"seed $i")
    }
  }

  test("a truncated blob throws instead of decoding short") {
    val enc = Varint.encodeArr(new GenericArrayData(Array(300L, 5L)))
    val truncated = enc.dropRight(1) :+ (enc.last | 0x80).toByte
    intercept[IllegalArgumentException](Varint.decodeArr(truncated))
  }

  test("the column path (codegen) agrees with the kernel") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq(0L, 1L, 127L, 128L, 99999L), Seq.empty[Long], Seq(5L))
      .toDF("xs")
      .select(col("xs"), Varint.decode(Varint.encode(col("xs"))).as("rt"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"row $r")
    }
  }
}
