package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q210 treatment-matrix invariants: every row must equal the aggregate
  * of the card that OWNS that treatment (q194's summary-≡-detail law),
  * so the comparison table can never disagree with the detail views. */
class TreatmentMatrixSpec extends SparkSpec {

  private lazy val rows =
    DedupQueries.q210TreatmentMatrix(spark, Sf0001).collect()
      .map(r => r.getAs[String]("treatment") ->
        (r.getAs[Long]("docs_affected"), r.getAs[Long]("tokens_removed"),
          r.getAs[Long]("corpus_tokens"), r.getAs[Double]("removed_frac"))).toMap

  test("q210: all four treatments present; fractions consistent") {
    assert(rows.keySet == Set("exact_doc", "chunk_fixed", "chunk_cdc", "span_exact"))
    val ct = rows.values.map(_._3).toSet
    assert(ct.size == 1, "corpus token mass must be shared")
    rows.values.foreach { case (_, tok, corpus, frac) =>
      assert(frac == tok.toDouble / corpus)
      assert(tok <= corpus)
    }
  }

  test("q210 exact_doc row equals q19's keeper arithmetic") {
    val h = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "[ \\t\\n\\r\\f\\x0B]+", " "))))
          .as("ch"),
        regexp_count(col("text"), lit("[^ \\t\\n\\r\\f\\x0B]+")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keepers = h.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val removed = h.filter { case (id, ch, _) => keepers(ch) != id }
    assert(rows("exact_doc")._1 == removed.length)
    assert(rows("exact_doc")._2 == removed.map(_._3).sum)
  }

  test("q210 chunk rows equal the owning cards' per-doc aggregates") {
    val q69 = DedupQueries.q69SubstringDedup(spark, Sf0001)
      .filter(col("n_dup_chunks") > 0)
      .agg(count(lit(1)), sum(col("n_dup_chunks") * 10)).collect().head
    assert(rows("chunk_fixed")._1 == q69.getLong(0))
    assert(rows("chunk_fixed")._2 == q69.getLong(1))
    // q187 exposes the dup TOKEN fraction; reconstruct tok_dup per doc from
    // dup_token_frac × tok_total is lossy — instead pin docs_affected and
    // that the mass lies within the bounds its card implies
    val q187 = DedupQueries.q187CdcDedup(spark, Sf0001)
      .filter(col("n_dup_chunks") > 0).count()
    assert(rows("chunk_cdc")._1 == q187)
    assert(rows("chunk_cdc")._2 > 0 && rows("chunk_cdc")._2 <= rows("chunk_cdc")._3)
  }

  test("q210 span row equals q200's removable union") {
    val q200 = graft.text.CurationQueries.q200SubstringSpans(spark, Sf0001)
      .agg(count(lit(1)), sum(col("removable_tokens"))).collect().head
    assert(rows("span_exact")._1 == q200.getLong(0))
    assert(rows("span_exact")._2 == q200.getLong(1),
      "dirty-token-set count must equal the interval union (CurationSpec's law)")
  }
}
