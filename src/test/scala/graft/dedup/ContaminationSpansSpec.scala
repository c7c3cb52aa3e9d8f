package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q175 invariants: the span map re-derives exactly from a plain-Scala
  * gaps-and-islands over the raw text, and spans are internally
  * consistent (end − start + 1 = longest, dirty ≥ longest, every
  * reported doc is contaminated per q60's shingle-overlap rule). */
class ContaminationSpansSpec extends SparkSpec {

  private val BenchMod = 97

  private lazy val rows = DedupQueries.q175ContaminationSpans(spark, Sf0001).collect()

  private lazy val expected: Map[Long, (Long, Long, Long, Long, Long)] = {
    val docs = graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def trigrams(text: String): Seq[String] = {
      val t = text.toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+").toSeq
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    }
    val bench = docs.filter(_._1 % BenchMod == 0).flatMap(d => trigrams(d._2)).toSet
    docs.filter(_._1 % BenchMod != 0).flatMap { case (id, text) =>
      val flags = trigrams(text).zipWithIndex
        .collect { case (s, i) if bench(s) => i + 1L } // 1-based positions
      if (flags.isEmpty) None
      else {
        // gaps-and-islands driver-side: group consecutive positions
        val spans = flags.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.reverse
        val longest = spans.map(sp => sp._2 - sp._1 + 1).max
        val best = spans.filter(sp => sp._2 - sp._1 + 1 == longest).map(_._1).min
        Some(id -> (flags.length.toLong, spans.length.toLong, longest, best,
          best + longest - 1))
      }
    }.toMap
  }

  test("q175: span map matches the driver-side gaps-and-islands rebuild") {
    assert(rows.nonEmpty, "fixture must contain contaminated docs")
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected.keySet)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val e = expected(id)
      assert((r.getAs[Long]("n_dirty"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("longest_span"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end")) == e, s"doc $id span map")
    }
  }

  test("q175: internal consistency and no benchmark docs in the report") {
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % BenchMod != 0)
      assert(r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1 ==
        r.getAs[Long]("longest_span"))
      assert(r.getAs[Long]("n_dirty") >= r.getAs[Long]("longest_span"))
      assert(r.getAs[Long]("n_spans") >= 1)
    }
  }
}
