package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q157 BPE invariants: the learned merge table must equal a driver-side
  * from-scratch BPE trainer on the same word-frequency collapse, and the
  * winning pair counts must be non-increasing across rounds (a merged
  * symbol's derived pairs can never outnumber the merge that created
  * it). */
class BpeSpec extends SparkSpec {

  private lazy val rows = BpeQueries.q157BpeMerges(spark, Sf0001).collect()

  private lazy val wordFreq: Map[List[String], Long] = {
    val words = graft.sql.Tables(spark, Sf0001).documents
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")) <= 24)
      .collect().map(_.getString(0))
    words.groupBy(identity).map { case (w, g) =>
      w.toList.map(_.toString) -> g.length.toLong
    }
  }

  test("q157: merge table equals a driver-side BPE replay") {
    var vocab = wordFreq
    val expected = (1 to 3).map { rank =>
      val pairCnt = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => pairCnt(p) = pairCnt.getOrElse(p, 0L) + f)
      }
      val ((a, b), cnt) = pairCnt.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      // greedy leftmost non-overlapping fuse
      def fuse(syms: List[String]): List[String] = syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: fuse(rest)
        case x :: rest                          => x :: fuse(rest)
        case Nil                                => Nil
      }
      vocab = vocab.groupBy { case (syms, _) => fuse(syms) }
        .map { case (s, g) => s -> g.values.sum }
      (rank, a, b, a + b, cnt)
    }
    val got = rows.map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("sym_a"),
      r.getAs[String]("sym_b"), r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    assert(got.toSeq == expected, s"got ${got.toSeq} vs replay $expected")
  }

  test("q157: winning counts are non-increasing across rounds") {
    val cnts = rows.sortBy(_.getAs[Int]("merge_rank")).map(_.getAs[Long]("pair_count"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"counts increased across rounds: ${cnts.toSeq}")
    assert(rows.length == 3)
    rows.foreach(r => assert(
      r.getAs[String]("merged") == r.getAs[String]("sym_a") + r.getAs[String]("sym_b")))
  }
}
