package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q197's claim is that the funnel is EXACTLY the composition of the
  * cards that own each stage — so rebuild every document's drop stage
  * driver-side from q17 (lang agreement), q16 (quality), q15 (tokens),
  * q60 (contamination) and a raw md5-of-normalized-text recompute, fold
  * the funnel by hand, and require the table to match column-for-column.
  *
  * The driver corpus contains NO exact-dup group (q19 finds none at any
  * SF) and every contaminated doc fails an earlier gate, so stages 4/5
  * legitimately drop nothing there; a 7-doc synthetic corpus with one
  * exact dup pair and one contaminated survivor pins those two stages'
  * drop paths end-to-end.
  */
class FilterFunnelSpec extends SparkSpec {

  private val BenchMod = 97

  private lazy val funnel = TextQueries.q197FilterFunnel(spark, Sf0001).collect()

  /** doc_id -> (n_tokens, lang_ok, quality, hash, contaminated) */
  private lazy val docs: Map[Long, (Long, Boolean, Double, String, Boolean)] = {
    val lang = TextQueries.q17LangId(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Int]("agree") == 1)).toMap
    val qual = TextQueries.q16TextQuality(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val toks = TextQueries.q15TextTokens(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens").toLong).toMap
    val contam = graft.dedup.DedupQueries.q60Decontaminate(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    val hashes = graft.sql.Tables(spark, Sf0001).documents
      .select(col("doc_id"), md5(lower(trim(regexp_replace(
        col("text"), "[ \\t\\n\\r\\f\\u000B]+", " ")))).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hashes.map { case (id, h) =>
      id -> ((toks(id), lang(id), qual(id), h, contam.getOrElse(id, false)))
    }
  }

  private lazy val dropStage: Map[Long, Int] = {
    val s3 = docs.collect { case (id, (_, ok, q, h, _))
      if id % BenchMod != 0 && ok && q >= 0.75 => id -> h }
    val keeper = s3.groupBy(_._2).map { case (h, ids) => h -> ids.keys.min }
    docs.map { case (id, (_, ok, q, h, c)) =>
      id -> (if (id % BenchMod == 0) 1
             else if (!ok) 2
             else if (q < 0.75) 3
             else if (id != keeper(h)) 4
             else if (c) 5
             else 6)
    }
  }

  test("q197: every stage row matches the hand-folded funnel exactly") {
    assert(funnel.map(_.getAs[Long]("stage")).toSeq == (0L to 5L))
    val names = Seq("ingest", "eval_holdout", "lang_id", "quality",
      "exact_dedup", "decontam")
    val tDocs = docs.size.toLong
    val tTokens = docs.values.map(_._1).sum
    funnel.foreach { r =>
      val s = r.getAs[Long]("stage").toInt
      assert(r.getAs[String]("stage_name") == names(s))
      // toSeq before mapping to counts: a Set would dedup equal counts
      val surv = docs.keys.toSeq.filter(id => dropStage(id) > s)
      val nd = surv.size.toLong
      val nt = surv.map(id => docs(id)._1).sum
      assert(r.getAs[Long]("n_docs") == nd, s"stage $s n_docs")
      assert(r.getAs[Long]("n_tokens") == nt, s"stage $s n_tokens")
      assert(r.getAs[Long]("n_dropped") ==
        docs.keys.count(id => dropStage(id) == s).toLong, s"stage $s n_dropped")
      assert(r.getAs[Double]("doc_frac") == nd.toDouble / tDocs, s"stage $s doc_frac")
      assert(r.getAs[Double]("token_frac") == nt.toDouble / tTokens, s"stage $s token_frac")
    }
  }

  test("q197: funnel telescopes — n_docs(s) = n_docs(s-1) - n_dropped(s)") {
    funnel.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getAs[Long]("n_docs") ==
        prev.getAs[Long]("n_docs") - cur.getAs[Long]("n_dropped"))
    }
    assert(funnel.head.getAs[Long]("n_docs") == docs.size.toLong)
    assert(funnel.head.getAs[Long]("n_dropped") == 0L)
    // the scalar gates are all exercised at this corpus (dedup/decontam
    // can't fire here — see class doc; the fixture test covers them)
    funnel.slice(1, 4).foreach { r =>
      assert(r.getAs[Long]("n_dropped") > 0,
        s"stage ${r.getAs[String]("stage_name")} dropped nothing")
    }
  }

  test("q197: exact-dedup and decontam stages drop on a corpus that has them") {
    // 7 docs: 97 = eval holdout; 5 = lang mismatch (labeled de, English
    // text); 6 = low quality (short); 1,2 = exact dup pair (2 dropped);
    // 3 = shares a 12-token run with bench doc 97 (10 of ~24 shingles hit
    // >= 10%, dropped as contaminated); 1,4 survive.
    val dup = "the silver river winds through quiet valleys and carries small " +
      "boats toward distant harbors where traders gather every morning to " +
      "exchange grain cloth and stories of faraway mountain villages"
    val benchRun = "recorded wind speed and wave height in leather journals " +
      "every single evening"
    val rows = Seq(
      (1L, dup, "en"),
      (2L, dup, "en"),
      (3L, "coastal monitoring stations later automated what the old keepers " +
        s"once did as they $benchRun", "en"),
      (4L, "desert caravans navigate by starlight across endless dunes while " +
        "merchants guard precious cargo of spice and silk destined for " +
        "markets in cities beyond the far horizon tonight", "en"),
      (5L, "travelers crossing high mountain passes depend on sturdy ropes " +
        "and careful planning to survive sudden weather changes that sweep " +
        "down from the icy peaks each afternoon", "de"),
      (6L, "tiny doc here", "en"),
      (97L, s"ancient lighthouse keepers $benchRun before the great storm of " +
        "the northern winter arrived without warning", "en"))
    val dir = java.nio.file.Files.createTempDirectory("funnel_fx").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("fx"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fx = TextQueries.q197FilterFunnel(spark, dir).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dropped")))
    assert(fx.toSeq == Seq((0L, 7L, 0L), (1L, 6L, 1L), (2L, 5L, 1L),
      (3L, 4L, 1L), (4L, 3L, 1L), (5L, 2L, 1L)))
  }
}
