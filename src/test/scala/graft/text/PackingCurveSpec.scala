package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q193 invariants: the curve re-derives from q59's own pack plan at the
  * shared budget (the two cards cannot disagree about 256), and
  * fragmentation is monotone — doubling the budget never splits more
  * documents. */
class PackingCurveSpec extends SparkSpec {

  private lazy val rows = TextQueries.q193PackingCurve(spark, Sf0001).collect()
    .map(r => r.getAs[Long]("budget") -> r).toMap

  test("q193: the 256 point re-derives from q59's pack plan") {
    val pack = TextQueries.q59SequencePack(spark, Sf0001).collect()
    val byLang = pack.groupBy(_.getAs[String]("lang"))
    val expSplit = pack.count { r =>
      val start = r.getAs[Long]("start_offset")
      val end = start + r.getAs[Int]("n_tokens")
      (end - 1) / 256 > start / 256
    }
    val expWindows = byLang.values.map { rs =>
      val total = rs.map(r => r.getAs[Long]("start_offset") + r.getAs[Int]("n_tokens")).max
      (total + 255) / 256
    }.sum
    val r = rows(256L)
    assert(r.getAs[Long]("n_docs") == pack.length)
    assert(r.getAs[Long]("n_docs_split") == expSplit, "split count vs q59 plan")
    assert(r.getAs[Long]("n_windows") == expWindows, "window count vs q59 plan")
  }

  test("q193: fragmentation is monotone in the budget") {
    val grid = Seq(128L, 256L, 512L, 1024L)
    assert(rows.keySet == grid.toSet)
    grid.zip(grid.tail).foreach { case (a, b) =>
      assert(rows(a).getAs[Long]("n_windows") >= rows(b).getAs[Long]("n_windows"),
        s"windows must shrink from $a to $b")
      assert(rows(a).getAs[Double]("mean_fragments") >= rows(b).getAs[Double]("mean_fragments"),
        s"fragments must not grow from $a to $b")
    }
    rows.values.foreach { r =>
      assert(r.getAs[Double]("split_frac") >= 0.0 && r.getAs[Double]("split_frac") <= 1.0)
      assert(r.getAs[Double]("mean_fragments") >= 1.0)
    }
  }
}
