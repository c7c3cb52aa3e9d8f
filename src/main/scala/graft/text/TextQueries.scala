package graft.text

import graft.sql.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language identification, and document fingerprinting.
  *
  * These are the per-document scalar stages of a training-data pipeline:
  * embarrassingly parallel, no shuffle (the per-doc outputs are computed in
  * the scan stage; only the final presentation `orderBy` sorts). At 100 TB
  * each of these runs as a single narrow pass over the corpus — the plan is
  * scan → project → sort(doc_id), and the sort exists only because the
  * correctness harness wants deterministic output order.
  *
  * All expressions are Spark built-ins (codegen'd, no UDFs) with exact
  * DuckDB oracle equivalents (see the *Sql vals).
  */
object TextQueries {
  import TextOps._

  private val stopList = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  private def sqlCountIn(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  // ---------------------------------------------------------------- q15
  /** Token counting: whitespace tokens, alpha words, BPE-ish lexer tokens
    * (letter runs | digit runs | single non-alnum), mean token length. */
  def q15TextTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    d.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        nTokens(col("text")).as("n_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z]+")).as("n_alpha"),
        regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9" + WsChars + "]")).as("n_bpe"),
        (length(regexp_replace(col("text"), Ws + "+", "")).cast(DoubleType) /
          nullif(nTokens(col("text")), lit(0))).as("mean_token_len"))
      .orderBy(col("doc_id"))
  }

  val q15Sql: String =
    s"""SELECT doc_id,
      | length(text) AS n_chars,
      | ${nTokensSql("text")} AS n_tokens,
      | len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_alpha,
      | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9$WsChars]')) AS n_bpe,
      | CAST(length(regexp_replace(text, '$WsSql+', '', 'g')) AS DOUBLE)
      |   / nullif(${nTokensSql("text")}, 0) AS mean_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** The 0..1 additive quality score of a text column (shared with q44's
    * dedup representative selection). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(normText(text))
    val nChars = length(text)
    val nTokens = size(toks)
    val stopRatio = (countIn(toks, stopList).cast(DoubleType) / nullif(nTokens, lit(0)))
    val punctRatio = (regexp_count(text, lit("[^a-zA-Z0-9" + WsChars + "]")).cast(DoubleType) /
      nullif(nChars, lit(0)))
    when(nChars.between(100, 20000), 0.25).otherwise(0.0) +
      when(nTokens >= 20, 0.25).otherwise(0.0) +
      when(stopRatio.between(0.01, 0.5), 0.25).otherwise(0.0) +
      when(punctRatio < 0.1, 0.25).otherwise(0.0)
  }

  /** The same score as a DuckDB SQL expression over a column named `text`. */
  val qualityScoreSql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    val stop = s"CAST(${sqlCountIn(toks, stopList)} AS DOUBLE) / nullif(len($toks), 0)"
    val punct = s"CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9$WsChars]')) AS DOUBLE) / nullif(length(text), 0)"
    s"""(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN len($toks) >= 20 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN $stop BETWEEN 0.01 AND 0.5 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN $punct < 0.1 THEN 0.25 ELSE 0.0 END)""".stripMargin
  }

  /** Quality scoring: length band, token count, stopword ratio, punctuation
    * ratio → additive 0..1 score. The classic pre-training corpus filter. */
  def q16TextQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val toks = tokens(normText(col("text")))
    val nChars = length(col("text"))
    val nTokens = size(toks)
    val stopRatio = (countIn(toks, stopList).cast(DoubleType) / nullif(nTokens, lit(0)))
    val punctRatio = (regexp_count(col("text"), lit("[^a-zA-Z0-9" + WsChars + "]")).cast(DoubleType) /
      nullif(nChars, lit(0)))
    d.select(
        col("doc_id"),
        nChars.as("n_chars"),
        nTokens.as("n_tokens"),
        stopRatio.as("stop_ratio"),
        punctRatio.as("punct_ratio"),
        qualityScore(col("text")).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val q16Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    val stop = s"CAST(${sqlCountIn(toks, stopList)} AS DOUBLE) / nullif(len($toks), 0)"
    val punct = s"CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9$WsChars]')) AS DOUBLE) / nullif(length(text), 0)"
    s"""SELECT doc_id,
       | length(text) AS n_chars,
       | len($toks) AS n_tokens,
       | $stop AS stop_ratio,
       | $punct AS punct_ratio,
       | (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 0.25 ELSE 0.0 END
       |  + CASE WHEN len($toks) >= 20 THEN 0.25 ELSE 0.0 END
       |  + CASE WHEN $stop BETWEEN 0.01 AND 0.5 THEN 0.25 ELSE 0.0 END
       |  + CASE WHEN $punct < 0.1 THEN 0.25 ELSE 0.0 END) AS quality_score
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q17
  /** Language ID: marker-stopword voting with a fixed tie-break priority
    * (en > de > es > fr > zh). `agree` compares against the dataset's label
    * column. A real system swaps the marker lists for n-gram profiles; the
    * plan shape (narrow per-doc scoring) is identical. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "y", "las", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** The shared per-doc prediction frame (doc_id, lang, pred_lang) — q17
    * formats it, q167 evaluates it (shared kernel so the eval can never
    * diverge from the classifier — the q146/q153 rule). */
  private def langScored(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val toks = tokens(normText(col("text")))
    val scored = d.select(
      (col("doc_id") +: col("lang") +:
        markers.map { case (l, ws) => countIn(toks, ws).as(s"s_$l") } :+
        regexp_count(col("text"), lit("[\\u4e00-\\u9fff]")).as("s_zh")): _*)
    val langs = markers.map(_._1) :+ "zh"
    // first language (in priority order) whose score >= all others
    val pred = langs.dropRight(1).foldRight(lit(langs.last)) { (l, rest) =>
      val ge = langs.filter(_ != l).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(l)).otherwise(rest)
    }
    scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
  }

  def q17LangId(spark: SparkSession, dir: String): DataFrame =
    langScored(spark, dir)
      .withColumn("agree", (col("lang") === col("pred_lang")).cast("int"))
      .orderBy(col("doc_id"))

  /** The shared scored subquery, DuckDB side (SELECT doc_id, lang,
    * pred_lang) — q17 and q167 both build on this exact text. */
  private val langScoredSql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    val scores = markers.map { case (l, ws) => s"${sqlCountIn(toks, ws)} AS s_$l" } :+
      s"len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS s_zh"
    val langs = markers.map(_._1) :+ "zh"
    val pred = langs.dropRight(1).foldRight(s"'${langs.last}'") { (l, rest) =>
      val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"CASE WHEN $ge THEN '$l' ELSE $rest END"
    }
    s"""SELECT doc_id, lang, $pred AS pred_lang
       |      FROM (SELECT doc_id, lang, ${scores.mkString(", ")} FROM documents)""".stripMargin
  }

  val q17Sql: String =
    s"""SELECT doc_id, lang, pred_lang, CAST(lang = pred_lang AS INT) AS agree
       |FROM ($langScoredSql)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q167
  /** Classifier evaluation of q17's language-ID against the dataset's
    * label column: per true language, support, prediction count, true
    * positives, precision / recall / F1, plus overall accuracy and
    * macro-F1 — the eval card a deployed classifier ships with (the
    * q154-for-q147 pattern applied to q17; together the eval family now
    * covers a forecaster (q153), a probabilistic classifier (q154), and
    * a hard classifier (q167)). F1 uses the 2·TP/(n_pred + n_true)
    * identity — one fixed-shape division instead of a p,r chain.
    *
    * 100 TB shape: the per-doc scoring is q17's narrow codegen'd pass;
    * the confusion collapse is ONE map-side-combinable (lang, pred)
    * aggregate bounded by the language-pair domain; every metric runs on
    * that ≤|langs|²-row frame. Parity: counts are exact; precision/
    * recall/accuracy are raw IEEE divisions; F1 rounds through
    * DECIMAL(18,6) because macro-F1 must SUM the F1s (order-free decimal
    * sum, then one division). Zero-prediction languages yield NULL
    * precision/F1 via nullif on both engines. */
  def q167LangIdEval(spark: SparkSession, dir: String): DataFrame = {
    val cells = langScored(spark, dir)
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // read three ways: by-true, by-pred, grand
    val byTrue = cells.groupBy(col("lang"))
      .agg(sum(col("n")).as("n_true"),
        sum(when(col("pred_lang") === col("lang"), col("n")).otherwise(0L)).as("tp"))
    val byPred = cells.groupBy(col("pred_lang"))
      .agg(sum(col("n")).as("n_pred"))
    val d6 = DecimalType(18, 6)
    val perLang = byTrue
      .join(byPred, col("lang") === col("pred_lang"), "left")
      .select(col("lang"), col("n_true"), coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        col("tp"))
      .withColumn("precision",
        col("tp").cast(DoubleType) / nullif(col("n_pred"), lit(0)).cast(DoubleType))
      .withColumn("recall", col("tp").cast(DoubleType) / col("n_true").cast(DoubleType))
      .withColumn("f1",
        ((lit(2L) * col("tp")).cast(DoubleType) /
          nullif(col("n_pred") + col("n_true"), lit(0)).cast(DoubleType)).cast(d6))
      .localCheckpoint(true) // read twice: lang rows + the grand fold
    val grand = perLang.agg(
      (sum(col("tp")).cast(DoubleType) / sum(col("n_true")).cast(DoubleType)).as("accuracy"),
      (sum(col("f1")).cast(DoubleType) / count(col("f1")).cast(DoubleType)).as("macro_f1"))
    perLang
      .select(col("lang"), col("n_true"), col("n_pred"), col("tp"),
        col("precision"), col("recall"), col("f1").cast(DoubleType).as("f1"))
      .crossJoin(broadcast(grand))
      .orderBy(col("lang"))
  }

  val q167Sql: String =
    s"""WITH sc AS ($langScoredSql),
       |cells AS (SELECT lang, pred_lang, count(*) AS n FROM sc GROUP BY 1, 2),
       |bt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true,
       |    CAST(sum(CASE WHEN pred_lang = lang THEN n ELSE 0 END) AS BIGINT) AS tp
       |  FROM cells GROUP BY 1),
       |bp AS (SELECT pred_lang, CAST(sum(n) AS BIGINT) AS n_pred FROM cells GROUP BY 1),
       |pl AS (SELECT lang, n_true, coalesce(n_pred, 0) AS n_pred, tp,
       |    CAST(tp AS DOUBLE) / CAST(nullif(coalesce(n_pred, 0), 0) AS DOUBLE) AS precision,
       |    CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall,
       |    CAST(CAST(2 * tp AS DOUBLE)
       |      / CAST(nullif(coalesce(n_pred, 0) + n_true, 0) AS DOUBLE) AS DECIMAL(18,6)) AS f1
       |  FROM bt LEFT JOIN bp ON bt.lang = bp.pred_lang),
       |g AS (SELECT CAST(sum(tp) AS DOUBLE) / CAST(sum(n_true) AS DOUBLE) AS accuracy,
       |    CAST(sum(f1) AS DOUBLE) / CAST(count(f1) AS DOUBLE) AS macro_f1 FROM pl)
       |SELECT lang, n_true, n_pred, tp, precision, recall,
       |  CAST(f1 AS DOUBLE) AS f1, accuracy, macro_f1
       |FROM pl CROSS JOIN g ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Flesch reading-ease readability per document (206.835 − 1.015·ASL −
    * 84.6·ASW, Flesch 1948/Kincaid's constants), with sentence counts
    * from terminal-punctuation runs and syllables from vowel-group runs
    * — the standard readability heuristic a curation pipeline uses to
    * band corpora by audience (and the missing member of the quality
    * family: q16 gates on structure, q67 composes gates, q168 scores
    * READABILITY — a different axis: high-quality text can still be
    * graduate-level dense). Bands follow Flesch's published cut points
    * (≥70 easy, ≥50 standard, else difficult).
    *
    * 100 TB shape: one narrow codegen'd regex pass per document — no
    * shuffle except the presentation sort (q15's shape). Parity: the
    * three counts are exact integers from the SAME regex semantics in
    * both engines ([aeiouy]+ runs never cross the whitespace the shared
    * tokenizer splits on; sentences = [.!?]+ runs, floored at 1); the
    * score is a fixed-shape double chain over two IEEE ratios, rounded
    * through DECIMAL(18,6) for the band compare so a knife-edge score
    * can never band differently across engines. */
  def q168Readability(spark: SparkSession, dir: String): DataFrame = {
    val nWords = greatest(size(tokens(normText(col("text")))), lit(1))
    val nSents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
    val nSyll = greatest(regexp_count(lower(col("text")), lit("[aeiouy]+")), lit(1))
    val score = (lit(206.835)
      - lit(1.015) * (nWords.cast(DoubleType) / nSents.cast(DoubleType))
      - lit(84.6) * (nSyll.cast(DoubleType) / nWords.cast(DoubleType)))
      .cast(DecimalType(18, 6))
    Tables(spark, dir).documents
      .select(col("doc_id"), nWords.as("n_words"), nSents.as("n_sentences"),
        nSyll.as("n_syllables"), score.cast(DoubleType).as("flesch"),
        when(score >= 70, "easy").when(score >= 50, "standard")
          .otherwise("difficult").as("band"))
      .orderBy(col("doc_id"))
  }

  val q168Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""SELECT doc_id, n_words, n_sentences, n_syllables,
       |  CAST(fl AS DOUBLE) AS flesch,
       |  CASE WHEN fl >= 70 THEN 'easy' WHEN fl >= 50 THEN 'standard'
       |       ELSE 'difficult' END AS band
       |FROM (SELECT doc_id, n_words, n_sentences, n_syllables,
       |    CAST(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
       |       - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
       |      AS DECIMAL(18,6)) AS fl
       |  FROM (SELECT doc_id,
       |      greatest(len($toks), 1) AS n_words,
       |      greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
       |      greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS n_syllables
       |    FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q18
  /** Document fingerprinting: content hash of normalized text, shingle-set
    * signature (order-independent), shingle count, and min shingle hash
    * (a 1-permutation MinHash — the building block q21 scales up). */
  def q18Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val norm = normText(col("text"))
    val sh = shingles(tokens(norm))
    d.select(
        col("doc_id"),
        md5(norm).as("fp_content"),
        md5(concat_ws("|", array_sort(sh))).as("fp_shingle_set"),
        size(sh).as("n_shingles"),
        array_min(shingleHashes(tokens(norm))).as("min_shingle_hash"))
      .orderBy(col("doc_id"))
  }

  val q18Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    val sh = s"list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)])"
    s"""WITH s AS (
       |  SELECT doc_id, lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))) AS norm, $sh AS sh
       |  FROM (SELECT doc_id, text, $toks AS t FROM documents))
       |SELECT doc_id,
       | md5(norm) AS fp_content,
       | md5(array_to_string(list_sort(sh), '|')) AS fp_shingle_set,
       | len(sh) AS n_shingles,
       | list_min([('0x' || substr(md5(x), 1, 15))::BIGINT for x in sh]) AS min_shingle_hash
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q50
  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): hash every POSITIONAL token 3-gram (ordered, not the
    * distinct set), take the minimum of each sliding window of
    * [[WinnowWindow]] consecutive gram hashes, and keep the distinct
    * minima as the document's fingerprint. Guarantees any shared run of
    * ≥ (window + gram − 1) tokens contributes a common fingerprint —
    * the position-robust containment detector that set-based shingles
    * (q18/q20) can't give.
    *
    * One narrow pass per document (the HOF chain is per-row, no shuffle
    * except the presentation sort); emitted as scalar columns (count,
    * digest, extrema) so the oracle hash-compares exactly. */
  private val WinnowWindow = 4

  def q50TextWinnow(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprints(Tables(spark, dir).documents)

  /** The winnowing core over any (doc_id, text) DataFrame: sorted distinct
    * window minima as an array column ([[graft.expr.WinnowMinima]], one
    * codegen'd kernel pass — the HOF chain was 22 s at sf0.1, see the
    * expression's scaladoc) — public so `WinnowSpec` can pin the
    * shared-run containment guarantee by set intersection. */
  def winnowFingerprintSets(d: DataFrame): DataFrame = {
    val toks = tokens(normText(col("text")))
    val n = size(toks)
    d.select(col("doc_id"),
      greatest(n - 2, lit(0)).as("n_grams"),
      graft.expr.WinnowMinima.of(toks, 3, WinnowWindow).as("fp"))
  }

  /** Scalar projection of [[winnowFingerprintSets]] for the oracle gate. */
  def winnowFingerprints(d: DataFrame): DataFrame =
    winnowFingerprintSets(d)
      .select(
        col("doc_id"), col("n_grams"),
        size(col("fp")).as("n_fp"),
        md5(concat_ws(",", transform(col("fp"), x => x.cast("string")))).as("fp_digest"),
        try_element_at(col("fp"), lit(1)).as("fp_min"),
        try_element_at(col("fp"), lit(-1)).as("fp_max"))
      .orderBy(col("doc_id"))

  /** The winnowing fingerprint-set derivation as a DuckDB CTE chain ending
    * in `f(doc_id, n_grams, fp)` — shared by the q50 oracle and the
    * winnow-overlap pair oracle (q72, in DedupQueries). */
  val winnowSqlCte: String = {
    val w = WinnowWindow
    val toksSql = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (SELECT doc_id,
       |  CASE WHEN len(t) >= 3
       |       THEN list_transform(range(1, len(t)-1),
       |              i -> ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15))::BIGINT)
       |       ELSE []::BIGINT[] END AS hs
       |  FROM tk),
       |m AS (SELECT doc_id, len(hs) AS n_grams,
       |  CASE WHEN len(hs) >= $w
       |       THEN list_transform(range(1, len(hs) - ${w - 2}), j -> list_min(hs[j:j+${w - 1}]))
       |       WHEN len(hs) >= 1 THEN [list_min(hs)]
       |       ELSE []::BIGINT[] END AS mins
       |  FROM g),
       |f AS (SELECT doc_id, n_grams, list_sort(list_distinct(mins)) AS fp FROM m)""".stripMargin
  }

  val q50Sql: String =
    s"""$winnowSqlCte
       |SELECT doc_id, n_grams, len(fp) AS n_fp,
       |  md5(array_to_string(list_transform(fp, x -> CAST(x AS VARCHAR)), ',')) AS fp_digest,
       |  fp[1] AS fp_min, fp[-1] AS fp_max
       |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Deterministic stratified sampling — the data-mixing step of a
    * training pipeline: each language keeps a configured fraction of its
    * documents, selected by a salted 60-bit md5 hash of the doc id
    * (`hash % 1000 < rate‰`). Unlike `DataFrame.sample`/`sampleBy` (RNG
    * state, non-reproducible across runs/engines), the hash gate is a
    * pure per-row predicate: replayable, pushdown-friendly, and exactly
    * reproducible by the oracle. Per-lang admission counts + an id-sum
    * checksum pin the SELECTION, not just its size. */
  private val SampleRates: Seq[(String, Int)] = // per-mille by language
    Seq("en" -> 1000, "de" -> 500, "es" -> 250, "fr" -> 100, "zh" -> 50)

  def q53StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("lang"))
    val rate = SampleRates.foldRight(lit(0)) { case ((l, r), rest) =>
      when(col("lang") === l, lit(r)).otherwise(rest)
    }
    val gate = hex60(concat(lit("samp:"), col("doc_id").cast("string"))) % 1000 < rate
    d.withColumn("sampled", gate)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("sampled"), 1)).as("n_sampled"),
        sum(when(col("sampled"), col("doc_id"))).as("sampled_id_sum"))
      .orderBy(col("lang"))
  }

  val q53Sql: String = {
    val rate = SampleRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH g AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5('samp:' || doc_id), 1, 15))::BIGINT % 1000 < ($rate) AS sampled
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |  count(CASE WHEN sampled THEN 1 END) AS n_sampled,
       |  CAST(sum(CASE WHEN sampled THEN doc_id END) AS BIGINT) AS sampled_id_sum
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q58
  /** PII scrubbing — the redaction pass every training corpus runs before
    * the tokenizer: detect and replace emails, IPv4 addresses, and
    * (+44-style) phone numbers, reporting per-doc counts and the md5 of
    * the scrubbed text. One narrow codegen'd regex pass; at 100 TB this
    * rides the same scan as q15–q18.
    *
    * The synthetic corpus carries no PII, so the query injects a
    * deterministic payload per doc_id first (same truth-table gate style
    * as q31–q35: both engines enumerate identical inputs). Patterns stay
    * in the Java-regex ∩ RE2 common dialect — classes, bounded
    * quantifiers, no lookaround — so Spark and DuckDB agree match for
    * match; counts are taken on the ORIGINAL text, replacements applied
    * email → ip → phone (the replacement tokens contain no digits, so
    * later patterns cannot match earlier rewrites). */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val PhoneRe = "\\+44[0-9]{9}"

  def q58PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val id = col("doc_id").cast("string")
    val pii = concat(col("text"),
      lit(" contact user"), id, lit("@example.com"),
      lit(" from 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), ((col("doc_id") / 256).cast("long") % 256).cast("string"),
      when(col("doc_id") % 3 === 0, concat(lit(" call +44"), lpad(id, 9, "0")))
        .otherwise(lit("")))
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(pii, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    d.select(
        col("doc_id"),
        regexp_count(pii, lit(EmailRe)).as("n_email"),
        regexp_count(pii, lit(Ipv4Re)).as("n_ip"),
        regexp_count(pii, lit(PhoneRe)).as("n_phone"),
        md5(scrubbed).as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  val q58Sql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com'
       |      || ' from 10.' || (doc_id % 256) || '.0.' || ((doc_id // 256) % 256)
       |      || CASE WHEN doc_id % 3 = 0
       |              THEN ' call +44' || lpad(CAST(doc_id AS VARCHAR), 9, '0')
       |              ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$EmailRe')) AS n_email,
       |  len(regexp_extract_all(t, '$Ipv4Re')) AS n_ip,
       |  len(regexp_extract_all(t, '$PhoneRe')) AS n_phone,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_md5
       |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Sequence-packing plan — assigning documents to fixed-token-budget
    * context windows for training-batch assembly: per language, documents
    * stream in doc_id order and a document belongs to the pack its START
    * offset falls in (offset-based packing: a doc crossing the boundary
    * spills its tail into the next window, the standard concat-then-chunk
    * scheme). One window partitioned by lang; the partition key IS the
    * parallelism — at 100 TB packing runs per (lang, shard) so every
    * cumulative sum stays bounded, and the plan (doc → pack, offset) is
    * what the downstream batch writer consumes. */
  private val PackBudget = 256 // tokens per context window

  def q59SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.select(col("doc_id"), col("lang"),
        nTokens(col("text")).as("n_tokens"))
      .withColumn("end_offset", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", col("end_offset") - col("n_tokens"))
      .withColumn("pack_id", floor(col("start_offset") / PackBudget).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("start_offset"), col("pack_id"))
      .orderBy(col("doc_id"))
  }

  val q59Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    ${nTokensSql("text")} AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_offset
       |  FROM t)
       |SELECT doc_id, lang, n_tokens,
       |  CAST(end_offset - n_tokens AS BIGINT) AS start_offset,
       |  CAST((end_offset - n_tokens) // $PackBudget AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Data-mixture shares — the per-(source, lang) token and document
    * shares a training run's sampling weights are derived from. One
    * narrow token-count pass, one small groupBy, and an unpartitioned
    * window over the HANDFUL of grouped rows for the global totals (the
    * single-partition window touches ~|sources×langs| rows, never the
    * corpus). Shares are exact-integer divisions evaluated in double —
    * deterministic across engines, no pow()/temperature math whose last
    * ulp could differ. */
  def q62MixtureShares(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val grouped = d
      .select(col("source"), col("lang"),
        nTokens(col("text")).cast("long").as("n_tok"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grouped
      .withColumn("doc_share",
        col("n_docs").cast(DoubleType) / sum(col("n_docs")).over(all))
      .withColumn("token_share",
        col("n_tokens").cast(DoubleType) / sum(col("n_tokens")).over(all))
      .orderBy(col("source"), col("lang"))
  }

  val q62Sql: String =
    s"""WITH g AS (
       |  SELECT source, lang, count(*) AS n_docs,
       |    sum(${nTokensSql("text")}) AS n_tokens
       |  FROM documents GROUP BY source, lang)
       |SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER () AS DOUBLE) AS doc_share,
       |  CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE) AS token_share
       |FROM g ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Deterministic training-shuffle plan — the order documents are fed to
    * a trainer: a salted md5 key gives every document a reproducible
    * pseudo-random global order with NO RNG state (replayable from any
    * checkpoint, same property as q53's sampling gate); `% NumShards`
    * assigns the output shard and a per-shard window numbers the
    * positions. At scale the shard IS the partition key — each shard
    * sorts independently, nothing global ever materializes. */
  private val NumShards = 8

  def q63ShuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val key = hex60(concat(lit("shuffle:"), col("doc_id").cast("string")))
    d.select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("shard", (col("shuffle_key") % NumShards).cast("int"))
      .withColumn("pos_in_shard", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("shuffle_key"), col("doc_id"))))
      .orderBy(col("doc_id"))
  }

  val q63Sql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5('shuffle:' || doc_id), 1, 15))::BIGINT AS shuffle_key
       |  FROM documents)
       |SELECT doc_id, shuffle_key,
       |  CAST(shuffle_key % $NumShards AS INT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY shuffle_key % $NumShards
       |    ORDER BY shuffle_key, doc_id) AS INT) AS pos_in_shard
       |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Overlapping chunk plan — fixed token windows with stride, the
    * RAG/training-prep splitter: doc of n tokens → chunks starting every
    * [[ChunkStride]] tokens, each [[ChunkSize]] long (the last one
    * clipped). Pure integer plan math (`div`, no float ceil) + one
    * `explode(sequence(...))` — narrow, shuffle-free, the chunk count per
    * doc is data-independent of the text bytes. Docs with zero tokens
    * produce zero chunks (filtered BEFORE the sequence: Spark's
    * `sequence(0, -1)` counts DOWN instead of being empty — the
    * DuckDB-`range` asymmetry the filter sidesteps). */
  // sized to the synthetic corpus (10–99 tokens/doc) so the stride and
  // last-chunk clip paths actually execute under the gate; a real corpus
  // uses e.g. 1024/768
  private val ChunkSize = 32
  private val ChunkStride = 24 // 8-token overlap

  def q64ChunkPlan(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val n = nTokens(col("text")).cast("long")
    d.select(col("doc_id"), n.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("n_chunks", when(col("n_tokens") <= ChunkSize, lit(1L))
        .otherwise(expr(s"(n_tokens - $ChunkSize + $ChunkStride - 1) div $ChunkStride") + 1))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("n_tokens"), col("chunk_id"),
        (col("chunk_id") * ChunkStride).as("start_tok"),
        least(col("chunk_id") * ChunkStride + ChunkSize, col("n_tokens")).as("end_tok"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val q64Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(${nTokensSql("text")} AS BIGINT) AS n_tokens
       |  FROM documents WHERE ${nTokensSql("text")} > 0),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_tokens <= $ChunkSize THEN 1
       |         ELSE (n_tokens - $ChunkSize + $ChunkStride - 1) // $ChunkStride + 1
       |         END AS n_chunks
       |  FROM t)
       |SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS chunk_id,
       |  CAST(i * $ChunkStride AS BIGINT) AS start_tok,
       |  CAST(least(i * $ChunkStride + $ChunkSize, n_tokens) AS BIGINT) AS end_tok
       |FROM c, unnest(range(0, n_chunks)) AS u(i)
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Gopher-style HARD quality gates — the pass/fail filter battery run
    * before the additive score (q16): token-count band, mean-token-length
    * band, alphabetic-token fraction, longest-token cap, and
    * ≥2-distinct-stopwords. Reports every gate so a corpus dashboard can
    * attribute rejections; `keep` is their conjunction. Narrow single
    * pass, all integer-exact ratios (one double division each — bit-stable
    * across engines). */
  private val GateMinTokens = 50L
  private val GateMaxTokens = 100000L
  private val GateMaxTokenLen = 20

  def q67QualityGates(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val toks = tokens(normText(col("text")))
    val nTok = size(toks).cast("long")
    val meanLen = length(array_join(toks, "")).cast(DoubleType) / nullif(size(toks), lit(0))
    val alphaFrac = size(filter(toks, x => x.rlike("^[a-z]+$"))).cast(DoubleType) /
      nullif(size(toks), lit(0))
    val maxLen = array_max(transform(toks, t => length(t)))
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopList.map(lit): _*)))
    d.select(col("doc_id"), nTok.as("n_tokens"), meanLen.as("mean_token_len"),
        alphaFrac.as("alpha_frac"), maxLen.as("max_token_len"),
        nStop.cast("long").as("n_stop_distinct"))
      .withColumn("g_tokens", col("n_tokens").between(GateMinTokens, GateMaxTokens))
      .withColumn("g_mean_len", coalesce(col("mean_token_len").between(3.0, 10.0), lit(false)))
      .withColumn("g_alpha", coalesce(col("alpha_frac") >= 0.8, lit(false)))
      .withColumn("g_max_len", col("max_token_len") <= GateMaxTokenLen)
      .withColumn("g_stop", col("n_stop_distinct") >= 2)
      .withColumn("keep",
        col("g_tokens") && col("g_mean_len") && col("g_alpha") &&
          col("g_max_len") && col("g_stop"))
      .orderBy(col("doc_id"))
  }

  val q67Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    val stopArr = stopList.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH m AS (SELECT doc_id,
       |  CAST(len($toks) AS BIGINT) AS n_tokens,
       |  CAST(length(array_to_string($toks, '')) AS DOUBLE) / nullif(len($toks), 0) AS mean_token_len,
       |  CAST(len(list_filter($toks, x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE)
       |    / nullif(len($toks), 0) AS alpha_frac,
       |  list_max(list_transform($toks, x -> length(x))) AS max_token_len,
       |  CAST(len(list_intersect(list_distinct($toks), $stopArr)) AS BIGINT) AS n_stop_distinct
       |  FROM documents)
       |SELECT doc_id, n_tokens, mean_token_len, alpha_frac, max_token_len, n_stop_distinct,
       |  n_tokens BETWEEN $GateMinTokens AND $GateMaxTokens AS g_tokens,
       |  coalesce(mean_token_len BETWEEN 3.0 AND 10.0, false) AS g_mean_len,
       |  coalesce(alpha_frac >= 0.8, false) AS g_alpha,
       |  max_token_len <= $GateMaxTokenLen AS g_max_len,
       |  n_stop_distinct >= 2 AS g_stop,
       |  (n_tokens BETWEEN $GateMinTokens AND $GateMaxTokens)
       |    AND coalesce(mean_token_len BETWEEN 3.0 AND 10.0, false)
       |    AND coalesce(alpha_frac >= 0.8, false)
       |    AND max_token_len <= $GateMaxTokenLen
       |    AND n_stop_distinct >= 2 AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q71
  /** Top-K bigram coverage — a lexical boilerplate signal: how much of a
    * document is built from the corpus's [[TopBigrams]] most frequent
    * bigrams (count desc, bigram asc tie-break, so the cut is
    * deterministic). High coverage → templated/boilerplate text; low →
    * novel phrasing. Complements q61 (WITHIN-doc repetition) with a
    * cross-corpus frequency view.
    *
    * Scale shape: the bigram kernel is narrow and runs once (digest-only
    * checkpoint); the top-K is a global count + TakeOrdered (tiny), which
    * then BROADCASTS into a semi-join — the corpus's bigram positions
    * never shuffle. */
  private val TopBigrams = 100

  def q71BigramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(normText(col("text")))
    // positional (occurrence-counted) bigrams in one codegen'd kernel pass,
    // pre-hashed to hex60 longs — the HOF spelling was 7.1 s warm at sf0.1
    // (CodegenFallback + per-element re-eval of the token split), and
    // hashing means the count shuffle and the top-K broadcast carry longs
    val bgs = graft.expr.WordGrams.hashedOf(toks, 2, 1)
    val base = Tables(spark, dir).documents
      .select(col("doc_id"), bgs.as("bgs")).localCheckpoint(true)
    val ex = base.select(col("doc_id"), explode(col("bgs")).as("bg"))
    val top = ex.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg")).limit(TopBigrams)
    val hits = ex.join(broadcast(top.select(col("bg"))), Seq("bg"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_top_positions"))
    base.select(col("doc_id"), size(col("bgs")).cast("long").as("n_bigrams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_top_positions"), lit(0L)).as("n_top_positions"),
        (coalesce(col("n_top_positions"), lit(0L)).cast(DoubleType) /
          nullif(col("n_bigrams"), lit(0L))).as("top_coverage"))
      .orderBy(col("doc_id"))
  }

  val q71Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
       |b AS (SELECT doc_id,
       |  CASE WHEN len(t) >= 2
       |  THEN [('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT for i in range(1, len(t))]
       |  ELSE []::BIGINT[] END AS bgs FROM tk),
       |ex AS (SELECT doc_id, unnest(bgs) AS bg FROM b),
       |top AS (SELECT bg FROM ex GROUP BY bg ORDER BY count(*) DESC, bg LIMIT $TopBigrams),
       |hits AS (SELECT doc_id, count(*) AS n_top FROM ex
       |         WHERE bg IN (SELECT bg FROM top) GROUP BY doc_id)
       |SELECT b.doc_id, CAST(len(bgs) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(n_top, 0) AS BIGINT) AS n_top_positions,
       |  CAST(coalesce(n_top, 0) AS DOUBLE) / nullif(len(bgs), 0) AS top_coverage
       |FROM b LEFT JOIN hits ON b.doc_id = hits.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q73
  /** Tokenizer-vocabulary coverage curve: per language, the number of
    * distinct words needed to cover 50% / 95% of all token occurrences —
    * the statistic that sizes a tokenizer vocab (or a stopword list) for a
    * corpus. Rank words by frequency (ties broken lexically), take the
    * cumulative-count prefix.
    *
    * 100 TB shape: the only corpus-sized stage is explode → partial-agg
    * (map-side combine collapses each partition to its local vocab before
    * the (lang, word) shuffle). The rank/cumsum windows run over the
    * DISTINCT vocabulary — Zipf-bounded, orders of magnitude smaller than
    * the corpus — partitioned by lang. The 95th-percentile thresholds are
    * integer arithmetic (`20·cum ≥ 19·tot`), not doubles, so the oracle
    * compare is exact by construction.
    */
  def q73VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val ex = d.select(col("lang"), explode(tokens(normText(col("text")))).as("w"))
    val cnt = ex.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
    val byFreq = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("w"))
    val whole  = Window.partitionBy(col("lang"))
    cnt
      .withColumn("rk", row_number().over(byFreq).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(byFreq))
      .withColumn("tot", sum(col("cnt")).over(whole))
      .groupBy(col("lang"))
      .agg(
        max(col("rk")).as("vocab_size"),
        max(col("tot")).as("tokens_total"),
        min(when(col("cum") * 2 >= col("tot"), col("rk"))).as("vocab_half"),
        min(when(col("cum") * 20 >= col("tot") * 19, col("rk"))).as("vocab_p95"))
      .orderBy(col("lang"))
  }

  val q73Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT lang, unnest($toks) AS w FROM documents),
       |cnt AS (SELECT lang, w, count(*) AS cnt FROM tk GROUP BY 1, 2),
       |cum AS (SELECT lang, cnt,
       |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, w) AS rk,
       |  sum(cnt)     OVER (PARTITION BY lang ORDER BY cnt DESC, w) AS cum,
       |  sum(cnt)     OVER (PARTITION BY lang) AS tot
       |  FROM cnt)
       |SELECT lang,
       |  CAST(max(rk) AS BIGINT) AS vocab_size,
       |  CAST(max(tot) AS BIGINT) AS tokens_total,
       |  CAST(min(CASE WHEN cum * 2  >= tot      THEN rk END) AS BIGINT) AS vocab_half,
       |  CAST(min(CASE WHEN cum * 20 >= tot * 19 THEN rk END) AS BIGINT) AS vocab_p95
       |FROM cum GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q74
  /** Bigram language-model scoring: train an add-one-smoothed bigram LM on
    * the corpus itself, then score every document's average negative
    * log-likelihood — the classic KenLM-style quality signal (junk and
    * boilerplate score high, fluent text low), self-contained because the
    * corpus is its own training set.
    *
    *   P(w2|w1) = (C(w1 w2) + 1) / (C(w1·) + V)
    *
    * with C(w1·) = occurrences of w1 as a bigram history and V = distinct
    * tokens corpus-wide. Both gram streams come from ONE [[WordGrams]]
    * kernel pass each (hex60 longs), so the model shuffles carry 8-byte
    * keys.
    *
    * 100 TB shape: per-doc duplicate bigrams collapse BEFORE the model
    * joins (groupBy (doc, history, bigram) with map-side combine), so join
    * input is bounded by distinct-bigrams-per-doc; the two model joins are
    * key-key shuffles on long keys (broadcastable under AQE when the Zipf
    * head fits, a clean df-floor backoff otherwise); V folds to one
    * broadcast row. Cross-engine float parity: each -ln P is rounded
    * through DECIMAL(18,6) (the q66 BM25 rule — ln is 1 ulp off between
    * engines), decimal-summed exactly, and the single final double
    * division is bit-stable.
    */
  /** The q74 per-doc score frame, unordered — shared kernel for the gate
    * query (q74) and the pruning-curve card (q177). */
  private[text] def bigramNllScored(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(normText(col("text")))
    // referenced three times (V, model training, scoring) — materialize
    // the gram kernel once (see docShingleHashes rationale in dedup).
    // r16: Tables.spread TRIED here and reverted — the gram kernel is
    // ~0.3 s of CPU at gate scale, and the added exchange+stage cost
    // more than the parallelism bought (q74 1.22 → 1.62 s measured;
    // same verdict as q178's no-spread note in media)
    val base = Tables(spark, dir).documents
      .select(col("doc_id"),
        graft.expr.WordGrams.hashedOf(toks, 1, 1).as("uh"),
        graft.expr.WordGrams.hashedOf(toks, 2, 1).as("bh"))
      .localCheckpoint(true)
    val ex = base
      .filter(size(col("bh")) > 0)
      .select(col("doc_id"),
        explode(zip_with(slice(col("uh"), lit(1), size(col("bh"))), col("bh"),
          (h, b) => struct(h.as("hh"), b.as("bg")))).as("z"))
      .select(col("doc_id"), col("z.hh").as("hh"), col("z.bg").as("bg"))
      .groupBy(col("doc_id"), col("hh"), col("bg")).agg(count(lit(1)).as("occ"))
    val bc = ex.groupBy(col("bg")).agg(sum(col("occ")).as("c12"))
    val hc = ex.groupBy(col("hh")).agg(sum(col("occ")).as("ch"))
    val vv = base.select(explode(col("uh")).as("u"))
      .agg(countDistinct(col("u")).as("v"))
    val nllTerm = (-log(
        (col("c12") + lit(1)).cast(DoubleType) /
          (col("ch").cast(DoubleType) + col("v"))))
      .cast(DecimalType(18, 6))
    val scored = ex
      .join(bc, "bg").join(hc, "hh")
      .crossJoin(broadcast(vv))
      .select(col("doc_id"), (nllTerm * col("occ")).as("term"))
      .groupBy(col("doc_id")).agg(sum(col("term")).as("nll_dec"))
    base
      .select(col("doc_id"), size(col("bh")).cast("long").as("n_bigrams"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        (col("nll_dec").cast(DoubleType) / nullif(col("n_bigrams"), lit(0L)))
          .as("avg_nll"))
  }

  def q74BigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramNllScored(spark, dir).orderBy(col("doc_id"))

  /** The q74 CTE chain up to the per-doc score fold — shared verbatim by
    * q74Sql and q177Sql so the card can never diverge from the scorer. */
  private[text] val bigramNllCtesSql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
       |g AS (SELECT doc_id,
       |  CASE WHEN len(t) >= 2
       |    THEN [('0x' || substr(md5(t[i]), 1, 15))::BIGINT for i in range(1, len(t))]
       |    ELSE []::BIGINT[] END AS uh1,
       |  CASE WHEN len(t) >= 2
       |    THEN [('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT for i in range(1, len(t))]
       |    ELSE []::BIGINT[] END AS bh,
       |  [('0x' || substr(md5(t[i]), 1, 15))::BIGINT for i in range(1, len(t)+1)] AS uall
       |  FROM tk),
       |ex0 AS (SELECT doc_id, unnest(uh1) AS hh, unnest(bh) AS bg FROM g),
       |ex AS (SELECT doc_id, hh, bg, count(*) AS occ FROM ex0 GROUP BY 1, 2, 3),
       |bc AS (SELECT bg, CAST(sum(occ) AS BIGINT) AS c12 FROM ex GROUP BY 1),
       |hc AS (SELECT hh, CAST(sum(occ) AS BIGINT) AS ch FROM ex GROUP BY 1),
       |vv AS (SELECT count(DISTINCT u) AS v
       |       FROM (SELECT unnest(uall) AS u FROM g)),
       |s AS (SELECT doc_id,
       |  CAST(-ln(CAST(c12 + 1 AS DOUBLE) / (CAST(ch AS DOUBLE) + v)) AS DECIMAL(18,6)) * occ AS term
       |  FROM ex JOIN bc USING (bg) JOIN hc USING (hh) CROSS JOIN vv),
       |sc AS (SELECT doc_id, sum(term) AS nll_dec FROM s GROUP BY 1)""".stripMargin
  }

  val q74Sql: String =
    s"""$bigramNllCtesSql
       |SELECT g.doc_id, CAST(len(bh) AS BIGINT) AS n_bigrams,
       |  CAST(nll_dec AS DOUBLE) / nullif(len(bh), 0) AS avg_nll
       |FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id
       |ORDER BY g.doc_id""".stripMargin

  // ---------------------------------------------------------------- q177
  /** Perplexity pruning curve (the CCNet head/middle/tail treatment):
    * docs bucketed into NLL deciles under q74's own bigram LM (decile 1 =
    * most fluent), reporting per decile the doc/token mass, mean NLL, the
    * cumulative token fraction a "keep deciles 1..k" prune retains, and
    * the head/middle/tail band — the curve a quality-pruning decision is
    * actually made from (how much data does each quality bar cost?).
    *
    * Shares q74's scoring kernel verbatim (Spark frame AND oracle CTEs),
    * so the curve can never diverge from the scorer. Zero-bigram docs
    * are excluded (they have no LM score; q74 reports them as null).
    *
    * Scale note: the decile assignment is ONE global window over the
    * per-DOC score frame — exact by design, because the gate needs exact
    * deciles, and doc-cardinality (not token-cardinality) keeps it
    * viable at audit scale. A 100 TB production run replaces ntile with
    * the q105 sketch-quantile cut points broadcast into a scan-stage
    * projection — same output contract, no global sort — and that path
    * is EXECUTABLE and gated as [[q211SketchDecileGate]], which measures
    * its agreement against this exact assignment (99.6% at the 10×
    * replica, misassignments adjacent-decile only). Everything after
    * the assignment is 10-row-bounded. Parity: per-doc avg_nll quantizes to integer
    * MICROS via floor(x·10⁶ + 0.5) before bucketing and summing (exact,
    * order-free; floor on the bit-identical double avoids the
    * cross-engine double→DECIMAL conversion split at .5e-6 edges);
    * mean/fraction are fixed-shape IEEE divisions off integer
    * aggregates. */
  def q177PplPruneCurve(spark: SparkSession, dir: String): DataFrame = {
    val pd = bigramNllScored(spark, dir)
      .filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("n_bigrams"),
        // integer micros via floor(x·10⁶ + 0.5), NOT a DECIMAL cast: the
        // double→decimal conversion paths differ cross-engine at .5e-6
        // edges (Spark rounds the shortest decimal repr of the double,
        // DuckDB the binary value); floor on the identical double is
        // bit-identical in both
        floor(col("avg_nll") * lit(1000000.0) + lit(0.5)).as("nll_u"))
    val dt = pd.withColumn("decile",
      ntile(10).over(Window.orderBy(col("nll_u"), col("doc_id"))).cast("long"))
    val db = dt.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bigrams")).as("n_tokens"),
        sum(col("nll_u")).as("nll_sum"))
    val tot = db.agg(sum(col("n_tokens")).as("tt"))
    db.crossJoin(broadcast(tot))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(Window.orderBy(col("decile"))))
      .select(col("decile"), col("n_docs"), col("n_tokens"),
        (col("nll_sum").cast(DoubleType) / lit(1000000.0) / col("n_docs")).as("mean_nll"),
        (col("cum_tokens").cast(DoubleType) / col("tt")).as("cum_token_frac"),
        when(col("decile") <= 3, lit("head"))
          .when(col("decile") <= 7, lit("middle"))
          .otherwise(lit("tail")).as("band"))
      .orderBy(col("decile"))
  }

  val q177Sql: String =
    s"""$bigramNllCtesSql,
       |pd AS (SELECT g.doc_id, CAST(len(bh) AS BIGINT) AS n_bigrams,
       |    CAST(floor(CAST(nll_dec AS DOUBLE) / nullif(len(bh), 0) * 1000000.0 + 0.5) AS BIGINT) AS nll_u
       |  FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id
       |  WHERE len(bh) > 0),
       |dt AS (SELECT doc_id, n_bigrams, nll_u,
       |    CAST(ntile(10) OVER (ORDER BY nll_u, doc_id) AS BIGINT) AS decile FROM pd),
       |db AS (SELECT decile, count(*) AS n_docs, sum(n_bigrams) AS n_tokens,
       |    sum(nll_u) AS nll_sum FROM dt GROUP BY 1),
       |tot AS (SELECT sum(n_tokens) AS tt FROM db)
       |SELECT decile, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(nll_sum AS DOUBLE) / 1000000.0 / n_docs AS mean_nll,
       |  CAST(sum(n_tokens) OVER (ORDER BY decile) AS DOUBLE) / tt AS cum_token_frac,
       |  CASE WHEN decile <= 3 THEN 'head' WHEN decile <= 7 THEN 'middle'
       |       ELSE 'tail' END AS band
       |FROM db, tot ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q194
  /** Per-source DATASHEET — the summary table a corpus release actually
    * publishes (Gebru et al.'s "Datasheets for Datasets" reduced to the
    * measurable row): per source, document/token/char mass, mean quality
    * score (q16's additive gate score), exact-duplicate rate (fraction
    * of docs whose q19 content hash appears ≥ 2× corpus-wide), and
    * eval-contamination rate (q60's ≥ 10%-shingle-overlap rule over
    * non-eval docs). Every metric reuses the exact kernel of the card
    * that owns it, so the datasheet can never disagree with the detail
    * views it summarizes.
    *
    * 100 TB shape: three aggregation-shaped passes that all exist
    * elsewhere already — the narrow per-doc scalar scan, q19's 16-byte
    * digest fold, and q60's distinct-shingle semi-join (eval side 1/97
    * of the corpus) — joined at doc granularity and folded to the
    * source dimension with map-side combine. Parity: integer counts and
    * an exact-0.25-step quality sum (every partial is a binary-exact
    * multiple of 0.25, so double summation is order-free); rates are
    * one int/int IEEE division each. */
  def q194SourceDatasheet(spark: SparkSession, dir: String): DataFrame = {
    import graft.dedup.DedupQueries.{BenchMod, ContamPct}
    val d = Tables(spark, dir).documents
    val toks = tokens(normText(col("text")))
    val base = d.select(col("doc_id"), col("source"),
      size(toks).cast(LongType).as("n_tokens"),
      length(col("text")).cast(LongType).as("n_chars"),
      qualityScore(col("text")).as("quality"),
      md5(normText(col("text"))).as("h"))
    val dupHash = base.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("h"))
    val shh = d.select(col("doc_id"),
      shingleHashes(tokens(normText(col("text")))).as("shh"))
      .filter(size(col("shh")) > 0)
    val ex = shh.select(col("doc_id"), explode(col("shh")).as("s"))
    val benchSh = ex.filter(col("doc_id") % BenchMod === 0).select(col("s")).distinct()
    val contam = ex.filter(col("doc_id") % BenchMod =!= 0)
      .join(benchSh, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .join(shh.select(col("doc_id"), size(col("shh")).cast(LongType).as("n_sh")), "doc_id")
      .filter(col("n_hits") > 0 && col("n_hits") * 100 >= col("n_sh") * ContamPct)
      .select(col("doc_id"))
    base
      .join(dupHash.withColumn("is_dup", lit(1L)), Seq("h"), "left")
      .join(contam.withColumn("is_contam", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("quality")).as("q_sum"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"),
        sum(when(col("doc_id") % BenchMod =!= 0, 1L).otherwise(0L)).as("n_noneval"),
        sum(coalesce(col("is_contam"), lit(0L))).as("n_contam"))
      .select(col("source"), col("n_docs"), col("total_tokens"), col("total_chars"),
        (col("q_sum") / col("n_docs")).as("mean_quality"),
        (col("n_dup").cast(DoubleType) / col("n_docs")).as("dup_rate"),
        (col("n_contam").cast(DoubleType) / nullif(col("n_noneval"), lit(0L)))
          .as("contam_rate"))
      .orderBy(col("source"))
  }

  val q194Sql: String = {
    import graft.dedup.DedupQueries.{BenchMod, ContamPct}
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH base AS (SELECT doc_id, source,
       |    CAST(len($toks) AS BIGINT) AS n_tokens,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    $qualityScoreSql AS quality,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS h
       |  FROM documents),
       |duph AS (SELECT h FROM base GROUP BY h HAVING count(*) >= 2),
       |shs AS (SELECT doc_id,
       |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sh
       |  FROM (SELECT doc_id, $toks AS t FROM documents)),
       |sh AS (SELECT doc_id, sh FROM shs WHERE len(sh) > 0),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % $BenchMod = 0),
       |hits AS (SELECT doc_id, count(*) AS n_hits
       |  FROM ex WHERE doc_id % $BenchMod != 0 AND s IN (SELECT s FROM bench)
       |  GROUP BY doc_id),
       |contam AS (SELECT h.doc_id FROM hits h JOIN sh ON h.doc_id = sh.doc_id
       |  WHERE n_hits > 0 AND n_hits * 100 >= len(sh.sh) * $ContamPct)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  sum(quality) / count(*) AS mean_quality,
       |  CAST(sum(CASE WHEN base.h IN (SELECT h FROM duph) THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS dup_rate,
       |  CAST(sum(CASE WHEN base.doc_id IN (SELECT doc_id FROM contam) THEN 1 ELSE 0 END) AS DOUBLE)
       |    / nullif(sum(CASE WHEN base.doc_id % $BenchMod != 0 THEN 1 ELSE 0 END), 0)
       |    AS contam_rate
       |FROM base GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q197
  /** Pipeline attrition FUNNEL — the end-to-end view a curation run is
    * judged by: documents and tokens surviving each successive filter
    * stage, in realistic order: (0) ingest → (1) eval-holdout split
    * (q60's 1/97 bench set leaves the train side) → (2) language-ID
    * agreement (q17's kernel: predicted language must match the declared
    * one) → (3) quality ≥ 0.75 (q16's additive gate) → (4) exact-dup
    * canonicalization AMONG SURVIVORS (q19's digest, min-doc_id keeper —
    * dedup after the cheap scalar gates, the order production pipelines
    * use because dedup is the expensive stage) → (5) eval-set
    * decontamination (q60's ≥10%-shingle-overlap rule). Per stage:
    * surviving docs/tokens, docs dropped AT the stage, and doc/token
    * retention vs ingest. Every stage reuses the exact kernel of the
    * card that owns it, so the funnel can never disagree with q17, q16,
    * q19's groups, or q60's per-doc verdicts.
    *
    * 100 TB shape: the corpus folds ONCE to a ≤7-row (drop_stage, docs,
    * tokens) frame with map-side combine; the stage expansion is
    * arithmetic on that 7-row broadcast. Per-doc inputs are the scalar
    * scan plus two narrow doc_id-keyed joins that exist elsewhere
    * already: q19's 16-byte digest fold (restricted to stage-3
    * survivors) and q60's distinct-shingle semi-join (eval side 1/97 of
    * the corpus). Parity: all counts integer, quality is exact 0.25
    * steps, the two retention columns are one int/int IEEE division
    * each. */
  private val FunnelQuality = 0.75

  def q197FilterFunnel(spark: SparkSession, dir: String): DataFrame = {
    import graft.dedup.DedupQueries.{BenchMod, ContamPct}
    val d = Tables(spark, dir).documents
    val lang = langScored(spark, dir)
      .select(col("doc_id"), (col("lang") === col("pred_lang")).as("lang_ok"))
    val base = d.select(col("doc_id"),
        nTokens(col("text")).cast(LongType).as("n_tokens"),
        qualityScore(col("text")).as("quality"),
        md5(normText(col("text"))).as("h"))
      .join(lang, Seq("doc_id"))
    val shh = d.select(col("doc_id"),
        shingleHashes(tokens(normText(col("text")))).as("shh"))
      .filter(size(col("shh")) > 0)
    val ex = shh.select(col("doc_id"), explode(col("shh")).as("s"))
    val benchSh = ex.filter(col("doc_id") % BenchMod === 0).select(col("s")).distinct()
    val contam = ex.filter(col("doc_id") % BenchMod =!= 0)
      .join(benchSh, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .join(shh.select(col("doc_id"), size(col("shh")).cast(LongType).as("n_sh")), "doc_id")
      .filter(col("n_hits") > 0 && col("n_hits") * 100 >= col("n_sh") * ContamPct)
      .select(col("doc_id")).withColumn("is_contam", lit(1L))
    // the dedup keeper is computed among stage-3 survivors only: dedup
    // sees the corpus AFTER the holdout/lang/quality gates, as deployed
    val s3 = base.filter(col("doc_id") % BenchMod =!= 0 &&
      col("lang_ok") && col("quality") >= FunnelQuality)
    val keeper = s3.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
    val staged = base
      .join(keeper, Seq("h"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("drop_stage",
        when(col("doc_id") % BenchMod === 0, 1L)
          .when(!col("lang_ok"), 2L)
          .when(col("quality") < FunnelQuality, 3L)
          .when(col("doc_id") =!= col("keep_id"), 4L)
          .when(col("is_contam").isNotNull, 5L)
          .otherwise(6L))
    val byDrop = staged.groupBy(col("drop_stage"))
      .agg(count(lit(1)).as("c"), sum(col("n_tokens")).as("tk"))
    val stages = spark.range(1).select(
      explode(array((0L to 5L).map(lit): _*)).as("stage"))
    val tot = byDrop.agg(sum(col("c")).as("t_docs"), sum(col("tk")).as("t_tokens"))
    byDrop.crossJoin(broadcast(stages))
      .groupBy(col("stage"))
      .agg(sum(when(col("drop_stage") > col("stage"), col("c")).otherwise(0L)).as("n_docs"),
        sum(when(col("drop_stage") > col("stage"), col("tk")).otherwise(0L)).as("n_tokens"),
        sum(when(col("drop_stage") === col("stage"), col("c")).otherwise(0L)).as("n_dropped"))
      .crossJoin(broadcast(tot))
      .select(col("stage"),
        when(col("stage") === 0, "ingest").when(col("stage") === 1, "eval_holdout")
          .when(col("stage") === 2, "lang_id").when(col("stage") === 3, "quality")
          .when(col("stage") === 4, "exact_dedup").otherwise("decontam")
          .as("stage_name"),
        col("n_docs"), col("n_tokens"), col("n_dropped"),
        (col("n_docs").cast(DoubleType) / col("t_docs")).as("doc_frac"),
        (col("n_tokens").cast(DoubleType) / col("t_tokens")).as("token_frac"))
      .orderBy(col("stage"))
  }

  val q197Sql: String = {
    import graft.dedup.DedupQueries.{BenchMod, ContamPct}
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH lang AS (SELECT doc_id, (lang = pred_lang) AS lang_ok FROM ($langScoredSql)),
       |base AS (SELECT doc_id, CAST(${nTokensSql("text")} AS BIGINT) AS n_tokens,
       |    $qualityScoreSql AS quality,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS h
       |  FROM documents),
       |shs AS (SELECT doc_id,
       |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sh
       |  FROM (SELECT doc_id, $toks AS t FROM documents)),
       |sh AS (SELECT doc_id, sh FROM shs WHERE len(sh) > 0),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % $BenchMod = 0),
       |hits AS (SELECT doc_id, count(*) AS n_hits
       |  FROM ex WHERE doc_id % $BenchMod != 0 AND s IN (SELECT s FROM bench)
       |  GROUP BY doc_id),
       |contam AS (SELECT h.doc_id FROM hits h JOIN sh ON h.doc_id = sh.doc_id
       |  WHERE n_hits > 0 AND n_hits * 100 >= len(sh.sh) * $ContamPct),
       |s3 AS (SELECT b.doc_id, b.h FROM base b JOIN lang USING (doc_id)
       |  WHERE b.doc_id % $BenchMod != 0 AND lang_ok AND quality >= $FunnelQuality),
       |keeper AS (SELECT h, min(doc_id) AS keep_id FROM s3 GROUP BY h),
       |staged AS (SELECT b.doc_id, b.n_tokens,
       |    CASE WHEN b.doc_id % $BenchMod = 0 THEN 1
       |         WHEN NOT lang_ok THEN 2
       |         WHEN quality < $FunnelQuality THEN 3
       |         WHEN b.doc_id != k.keep_id THEN 4
       |         WHEN b.doc_id IN (SELECT doc_id FROM contam) THEN 5
       |         ELSE 6 END AS drop_stage
       |  FROM base b JOIN lang USING (doc_id) LEFT JOIN keeper k ON b.h = k.h),
       |bd AS (SELECT drop_stage, count(*) AS c, sum(n_tokens) AS tk
       |  FROM staged GROUP BY 1),
       |st AS (SELECT unnest([0, 1, 2, 3, 4, 5]) AS stage),
       |tot AS (SELECT sum(c) AS t_docs, sum(tk) AS t_tokens FROM bd),
       |f AS (SELECT stage,
       |    sum(CASE WHEN drop_stage > stage THEN c ELSE 0 END) AS n_docs,
       |    sum(CASE WHEN drop_stage > stage THEN tk ELSE 0 END) AS n_tokens,
       |    sum(CASE WHEN drop_stage = stage THEN c ELSE 0 END) AS n_dropped
       |  FROM st CROSS JOIN bd GROUP BY stage)
       |SELECT CAST(stage AS BIGINT) AS stage,
       |  CASE stage WHEN 0 THEN 'ingest' WHEN 1 THEN 'eval_holdout'
       |       WHEN 2 THEN 'lang_id' WHEN 3 THEN 'quality'
       |       WHEN 4 THEN 'exact_dedup' ELSE 'decontam' END AS stage_name,
       |  CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_dropped AS BIGINT) AS n_dropped,
       |  CAST(n_docs AS DOUBLE) / t_docs AS doc_frac,
       |  CAST(n_tokens AS DOUBLE) / t_tokens AS token_frac
       |FROM f CROSS JOIN tot ORDER BY stage""".stripMargin
  }

  // ---------------------------------------------------------------- q193
  /** Context-budget fragmentation curve — the decision table for picking
    * a training context length: q59's concat-then-chunk packing evaluated
    * at budgets 128/256/512/1024 tokens in ONE pass. Offset packing
    * wastes zero padding but SPLITS documents at window boundaries
    * (fragment count per doc = crossings + 1), and fragmentation is the
    * real cost knob — a split document trains on truncated context. Per
    * budget: window count, documents split, split fraction, and mean
    * fragments per document.
    *
    * 100 TB shape: ONE lang-partitioned cumulative-sum pass (q59's
    * window, the partition key is the parallelism) feeds all four
    * budgets via a 4-row broadcast cross join; everything after is a
    * 4-key fold. Parity: crossings are pure integer floor arithmetic;
    * the two rates are one int/int IEEE division each. */
  private val PackBudgets = Seq(128L, 256L, 512L, 1024L)

  def q193PackingCurve(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = d.select(col("doc_id"), col("lang"), nTokens(col("text")).as("n"))
      .withColumn("end_off", sum(col("n")).over(w))
      .withColumn("start_off", col("end_off") - col("n"))
    val budgets = spark.range(1).select(
      explode(array(PackBudgets.map(lit): _*)).as("budget"))
    val crossings = floor((col("end_off") - 1) / col("budget")) -
      floor(col("start_off") / col("budget"))
    val perDoc = offsets.crossJoin(broadcast(budgets))
      .select(col("budget"), col("lang"), col("n"), col("end_off"),
        crossings.cast(LongType).as("crossings"))
    val perLang = perDoc.groupBy(col("budget"), col("lang"))
      .agg(max(col("end_off")).as("lang_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("crossings") > 0, 1L).otherwise(0L)).as("n_split"),
        sum(col("crossings")).as("total_crossings"))
    perLang.groupBy(col("budget"))
      .agg(sum(ceil(col("lang_tokens").cast(DoubleType) / col("budget")).cast(LongType))
          .as("n_windows"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_split")).as("n_docs_split"),
        sum(col("total_crossings")).as("crossings"))
      .select(col("budget"), col("n_windows"), col("n_docs"), col("n_docs_split"),
        (col("n_docs_split").cast(DoubleType) / col("n_docs")).as("split_frac"),
        ((col("n_docs") + col("crossings")).cast(DoubleType) / col("n_docs"))
          .as("mean_fragments"))
      .orderBy(col("budget"))
  }

  val q193Sql: String = {
    val budgets = PackBudgets.mkString(", ")
    s"""WITH o AS (SELECT doc_id, lang, ${nTokensSql("text")} AS n,
       |    sum(${nTokensSql("text")}) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS end_off
       |  FROM documents),
       |b AS (SELECT unnest([$budgets]) AS budget),
       |pd AS (SELECT budget, lang, n, end_off,
       |    CAST(floor(CAST(end_off - 1 AS DOUBLE) / budget)
       |      - floor(CAST(end_off - n AS DOUBLE) / budget) AS BIGINT) AS crossings
       |  FROM o CROSS JOIN b),
       |pl AS (SELECT budget, lang, max(end_off) AS lang_tokens, count(*) AS n_docs,
       |    sum(CASE WHEN crossings > 0 THEN 1 ELSE 0 END) AS n_split,
       |    sum(crossings) AS total_crossings
       |  FROM pd GROUP BY 1, 2)
       |SELECT CAST(budget AS BIGINT) AS budget,
       |  CAST(sum(CAST(ceil(CAST(lang_tokens AS DOUBLE) / budget) AS BIGINT)) AS BIGINT)
       |    AS n_windows,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_split) AS BIGINT) AS n_docs_split,
       |  CAST(sum(n_split) AS DOUBLE) / sum(n_docs) AS split_frac,
       |  CAST(sum(n_docs) + sum(total_crossings) AS DOUBLE) / sum(n_docs) AS mean_fragments
       |FROM pl GROUP BY 1 ORDER BY budget""".stripMargin
  }

  // ---------------------------------------------------------------- q190
  /** Per-source quantile-normalized perplexity gating — CCNet's actual
    * design point: raw LM scores are not comparable ACROSS sources (a
    * fluent forum post and a fluent paper sit at different absolute
    * NLLs), so the keep decision uses the WITHIN-SOURCE percent rank,
    * not a global threshold. Per doc: q74's NLL, its within-source and
    * global percent ranks, both keep decisions at the 60% bar, and
    * `disagree` — the documents where global gating would make a
    * different call, i.e. the per-source-normalization evidence (a
    * globally-gated corpus silently over-prunes its hardest source).
    * Completes the pruning family: q177 global curve, q190 per-source
    * gate — both on q74's kernel verbatim, so none can diverge.
    *
    * 100 TB shape: q74's schedule plus one doc-cardinality join for
    * `source` and two rank windows over the per-DOC frame — the
    * per-source window partitions naturally; the global window is q177's
    * audit-scale device (production swaps in the q105-style sketch cut
    * points — the executable, gated path is [[q211SketchDecileGate]]).
    * Parity: percent_rank is (rank−1)/(n−1) on integer ranks with a
    * (nll_u, doc_id) total order over q177's integer-micro NLL —
    * deterministic in both engines. */
  def q190SourceQuantileGate(spark: SparkSession, dir: String): DataFrame = {
    val pd = bigramNllScored(spark, dir)
      .filter(col("n_bigrams") > 0)
      // integer micros, not a DECIMAL cast — q177's cross-engine rule
      .select(col("doc_id"),
        floor(col("avg_nll") * lit(1000000.0) + lit(0.5)).as("nll_u"))
    val src = Tables(spark, dir).documents.select(col("doc_id"), col("source"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("nll_u"), col("doc_id"))
    val wAll = Window.orderBy(col("nll_u"), col("doc_id"))
    pd.join(src, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        (col("nll_u").cast(DoubleType) / lit(1000000.0)).as("avg_nll"),
        percent_rank().over(wSrc).as("src_rank"),
        percent_rank().over(wAll).as("global_rank"))
      .withColumn("keep_src", col("src_rank") <= 0.6)
      .withColumn("keep_global", col("global_rank") <= 0.6)
      .withColumn("disagree", col("keep_src") =!= col("keep_global"))
      .orderBy(col("doc_id"))
  }

  val q190Sql: String =
    s"""$bigramNllCtesSql,
       |pd AS (SELECT g.doc_id,
       |    CAST(floor(CAST(nll_dec AS DOUBLE) / nullif(len(bh), 0) * 1000000.0 + 0.5) AS BIGINT) AS nll_u
       |  FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id
       |  WHERE len(bh) > 0),
       |pr AS (SELECT pd.doc_id, d.source, CAST(nll_u AS DOUBLE) / 1000000.0 AS avg_nll,
       |    percent_rank() OVER (PARTITION BY d.source ORDER BY nll_u, pd.doc_id) AS src_rank,
       |    percent_rank() OVER (ORDER BY nll_u, pd.doc_id) AS global_rank
       |  FROM pd JOIN documents d ON pd.doc_id = d.doc_id)
       |SELECT doc_id, source, avg_nll, src_rank, global_rank,
       |  src_rank <= 0.6 AS keep_src,
       |  global_rank <= 0.6 AS keep_global,
       |  (src_rank <= 0.6) <> (global_rank <= 0.6) AS disagree
       |FROM pr ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q211
  /** The sketch-quantile PRODUCTION path for the global-rank cards —
    * executable, gated, and measured (closing the one prose-only scale
    * story q177/q190/q203 carried): decile assignment WITHOUT the global
    * sort. The sketch side is q105's mergeable-histogram device applied
    * to q74's per-doc NLL: a [[SketchRankBins]]-bin count vector over the
    * integer-micro score (merging shards is elementwise addition — the
    * only cross-shard state at 100 TB is `bins` longs per shard), nine
    * decile cut points read off the cumulative counts, broadcast, and
    * every document assigned its decile as a SCAN-STAGE projection (nine
    * integer comparisons in-row — no window, no sort, no doc-level
    * shuffle). The exact side is q177's ntile. The card reports, per
    * exact decile: doc mass under both assignments, the doc- and
    * token-mass deltas, and the agreement fraction — the number that
    * licenses swapping the sketch in at scale (measured, hash-gated at
    * all three: overall agreement 99.6% at sf0.01, 98.8% at sf0.1,
    * 99.6% at the 10× replica; worst single decile 94.4%; the largest
    * doc-mass delta is 55 docs of a 5,000-doc decile at 10× — ±1.1% —
    * and every misassignment is to the ADJACENT decile, the crossing
    * bin's tie mass).
    *
    * ALL-INTEGER by construction: scores are q177's integer micros, the
    * bin index is `(nll_u − lo)·bins div span` (exact integral division
    * in both engines — never the IEEE quotient, whose floor can differ
    * at just-below-integer edges), cut points are integer bin indices,
    * and agreement counts are integers; the one division per row of
    * output is the agreement fraction.
    *
    * 100 TB shape: ONE narrow pass over the scored frame for the
    * histogram (map-side combinable into ≤ bins rows), a 9-value
    * broadcast back, and one more scan-stage pass to assign — versus the
    * exact path's single-partition global window. The exact side here
    * exists only as the validation arm; production gates on the sketch
    * decile alone. */
  private val SketchRankBins = 4096L

  def q211SketchDecileGate(spark: SparkSession, dir: String): DataFrame = {
    val pd = bigramNllScored(spark, dir)
      .filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("n_bigrams"),
        floor(col("avg_nll") * lit(1000000.0) + lit(0.5)).cast(LongType).as("nll_u"))
      // the NLL kernel feeds the bounds, the histogram AND the
      // assignment — materialize the doc-cardinality narrow frame once
      .localCheckpoint()
    val bounds = pd.agg(min(col("nll_u")).as("lo"),
      (max(col("nll_u")) - min(col("nll_u")) + lit(1L)).as("span"))
    val binned = pd.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"((nll_u - lo) * $SketchRankBins) div span"))
    val hist = binned.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    // ≤ SketchRankBins rows: the single-partition cumulative window is
    // bin-cardinality, never doc-cardinality
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = pd.agg(count(lit(1)).as("tot"))
    val cutCols = (1 to 9).map(k =>
      min(when(col("cum") * 10 >= col("tot") * k, col("bin"))).as(s"c$k"))
    val cuts = cum.crossJoin(broadcast(tot)).agg(cutCols.head, cutCols.tail: _*)
    val sketchDecile = (1 to 9)
      .map(k => when(col("bin") > col(s"c$k"), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    val assigned = binned.crossJoin(broadcast(cuts))
      .withColumn("sketch_decile", sketchDecile.cast(LongType))
      .withColumn("exact_decile",
        ntile(10).over(Window.orderBy(col("nll_u"), col("doc_id"))).cast(LongType))
    val byExact = assigned.groupBy(col("exact_decile").as("decile"))
      .agg(count(lit(1)).as("n_docs_exact"),
        sum(when(col("sketch_decile") === col("exact_decile"), 1L).otherwise(0L))
          .as("n_agree"),
        sum(col("n_bigrams")).as("tokens_exact"))
    val bySketch = assigned.groupBy(col("sketch_decile").as("decile"))
      .agg(count(lit(1)).as("n_docs_sketch"), sum(col("n_bigrams")).as("tokens_sketch"))
    byExact.join(bySketch, Seq("decile"), "full")
      .select(col("decile"),
        coalesce(col("n_docs_exact"), lit(0L)).as("n_docs_exact"),
        coalesce(col("n_docs_sketch"), lit(0L)).as("n_docs_sketch"),
        (coalesce(col("n_docs_sketch"), lit(0L)) -
          coalesce(col("n_docs_exact"), lit(0L))).as("doc_mass_delta"),
        (coalesce(col("tokens_sketch"), lit(0L)) -
          coalesce(col("tokens_exact"), lit(0L))).as("token_mass_delta"),
        coalesce(col("n_agree"), lit(0L)).as("n_agree"),
        (coalesce(col("n_agree"), lit(0L)).cast(DoubleType) /
          nullif(coalesce(col("n_docs_exact"), lit(0L)).cast(DoubleType), lit(0.0)))
          .as("agree_frac"))
      .orderBy(col("decile"))
  }

  val q211Sql: String =
    s"""$bigramNllCtesSql,
       |pd AS MATERIALIZED (SELECT g.doc_id, CAST(len(bh) AS BIGINT) AS n_bigrams,
       |    CAST(floor(CAST(nll_dec AS DOUBLE) / nullif(len(bh), 0) * 1000000.0 + 0.5) AS BIGINT) AS nll_u
       |  FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id
       |  WHERE len(bh) > 0),
       |bd AS (SELECT min(nll_u) AS lo, max(nll_u) - min(nll_u) + 1 AS span FROM pd),
       |bn AS MATERIALIZED (SELECT pd.*, ((nll_u - lo) * $SketchRankBins) // span AS bin
       |  FROM pd, bd),
       |h AS (SELECT bin, count(*) AS cnt FROM bn GROUP BY 1),
       |c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
       |tt AS (SELECT count(*) AS tot FROM pd),
       |cuts AS (SELECT
       |    ${(1 to 9).map(k =>
              s"min(CASE WHEN cum * 10 >= tot * $k THEN bin END) AS c$k").mkString(",\n       |    ")}
       |  FROM c, tt),
       |asg AS MATERIALIZED (SELECT doc_id, n_bigrams,
       |    CAST(1 + ${(1 to 9).map(k =>
              s"(CASE WHEN bin > c$k THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS sketch_decile,
       |    CAST(ntile(10) OVER (ORDER BY nll_u, doc_id) AS BIGINT) AS exact_decile
       |  FROM bn, cuts),
       |be AS (SELECT exact_decile AS decile, count(*) AS n_docs_exact,
       |    sum(CASE WHEN sketch_decile = exact_decile THEN 1 ELSE 0 END) AS n_agree,
       |    sum(n_bigrams) AS tokens_exact FROM asg GROUP BY 1),
       |bs AS (SELECT sketch_decile AS decile, count(*) AS n_docs_sketch,
       |    sum(n_bigrams) AS tokens_sketch FROM asg GROUP BY 1)
       |SELECT coalesce(be.decile, bs.decile) AS decile,
       |  CAST(coalesce(n_docs_exact, 0) AS BIGINT) AS n_docs_exact,
       |  CAST(coalesce(n_docs_sketch, 0) AS BIGINT) AS n_docs_sketch,
       |  CAST(coalesce(n_docs_sketch, 0) - coalesce(n_docs_exact, 0) AS BIGINT) AS doc_mass_delta,
       |  CAST(coalesce(tokens_sketch, 0) - coalesce(tokens_exact, 0) AS BIGINT) AS token_mass_delta,
       |  CAST(coalesce(n_agree, 0) AS BIGINT) AS n_agree,
       |  CAST(coalesce(n_agree, 0) AS DOUBLE)
       |    / nullif(CAST(coalesce(n_docs_exact, 0) AS DOUBLE), 0.0) AS agree_frac
       |FROM be FULL JOIN bs ON be.decile = bs.decile
       |ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q189
  /** Mixed-language document detection — the fastText-pipeline gate that
    * drops documents whose halves disagree on language (concatenation
    * artifacts, boilerplate wrappers, template injection): the token
    * array splits at the midpoint and each half is language-ID'd with
    * q17's OWN marker-voting kernel (same markers, same priority
    * tie-break — a half with zero marker evidence votes the priority
    * default exactly like q17 does on evidence-free docs). `mixed` =
    * halves disagree AND both halves carry at least one marker hit (no
    * flag on evidence-free noise).
    *
    * 100 TB shape: q17's — one narrow per-doc pass, the half scoring is
    * in-row HOF arithmetic on the token array, nothing shuffles but the
    * presentation sort. */
  def q189MixedLang(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val toks = tokens(normText(col("text")))
    val langs = markers.map(_._1) :+ "zh"
    def pred(prefix: String): Column =
      langs.dropRight(1).foldRight(lit(langs.last)) { (l, rest) =>
        val ge = langs.filter(_ != l)
          .map(o => col(s"${prefix}_$l") >= col(s"${prefix}_$o")).reduce(_ && _)
        when(ge, lit(l)).otherwise(rest)
      }
    def zhScore(ts: Column): Column =
      regexp_count(array_join(ts, " "), lit("[\\u4e00-\\u9fff]"))
    val half = (size(col("t")) / 2).cast("int")
    val scored = d.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        slice(col("t"), lit(1), half).as("ta"),
        slice(col("t"), half + 1, size(col("t")) - half).as("tb"))
      .select((col("doc_id") +:
        (markers.map { case (l, ws) => countIn(col("ta"), ws).as(s"a_$l") } :+
          zhScore(col("ta")).as("a_zh")) ++:
        (markers.map { case (l, ws) => countIn(col("tb"), ws).as(s"b_$l") } :+
          zhScore(col("tb")).as("b_zh"))): _*)
    val evA = langs.map(l => col(s"a_$l")).reduce(_ + _) > 0
    val evB = langs.map(l => col(s"b_$l")).reduce(_ + _) > 0
    scored.select(col("doc_id"),
        pred("a").as("pred_first"), pred("b").as("pred_second"),
        (evA && evB).as("both_scored"))
      .withColumn("mixed",
        col("both_scored") && col("pred_first") =!= col("pred_second"))
      .orderBy(col("doc_id"))
  }

  val q189Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    val langs = markers.map(_._1) :+ "zh"
    def pred(prefix: String): String =
      langs.dropRight(1).foldRight(s"'${langs.last}'") { (l, rest) =>
        val ge = langs.filter(_ != l).map(o => s"${prefix}_$l >= ${prefix}_$o").mkString(" AND ")
        s"CASE WHEN $ge THEN '$l' ELSE $rest END"
      }
    def scores(prefix: String, arr: String): Seq[String] =
      markers.map { case (l, ws) => s"${sqlCountIn(arr, ws)} AS ${prefix}_$l" } :+
        s"len(regexp_extract_all(array_to_string($arr, ' '), '[\\x{4e00}-\\x{9fff}]')) AS ${prefix}_zh"
    val ev = (p: String) => langs.map(l => s"${p}_$l").mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
       |hv AS (SELECT doc_id,
       |    t[1:len(t)//2] AS ta, t[len(t)//2+1:len(t)] AS tb FROM tk),
       |sc AS (SELECT doc_id,
       |    ${(scores("a", "ta") ++ scores("b", "tb")).mkString(",\n|    ")}
       |  FROM hv),
       |pr AS (SELECT doc_id,
       |    ${pred("a")} AS pred_first, ${pred("b")} AS pred_second,
       |    (${ev("a")}) > 0 AND (${ev("b")}) > 0 AS both_scored
       |  FROM sc)
       |SELECT doc_id, pred_first, pred_second, both_scored,
       |  both_scored AND pred_first <> pred_second AS mixed
       |FROM pr ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q184
  /** Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
    * 1999 eq. 4.27): per-doc average NLL under
    * p(w₂|w₁) = (c(w₁w₂) − D)/c(w₁) + (D·N₁₊(w₁,•)/c(w₁))·N₁₊(•,w₂)/B
    * with absolute discount D = 0.75 — the algorithmic upgrade over q74's
    * add-one smoothing: the backoff mass goes to words by how many
    * DISTINCT contexts they follow (continuation counts), not raw
    * frequency, which is what makes KN the standard n-gram baseline.
    * Scoring the training corpus itself means every scored bigram has
    * c ≥ 1, so the discounted term never clips at zero.
    *
    * 100 TB shape: q74's schedule — ONE token-kernel pass, per-doc
    * (h₁, h₂) pairs collapse to `occ` counts BEFORE any corpus join, and
    * every model frame (bigram types, history stats, continuation
    * counts) lives on the Zipf-bounded DISTINCT-bigram frame, which is
    * `localCheckpoint`ed once so its three consumers (history fold,
    * continuation fold, scoring join) don't re-run the corpus subtree.
    * Only 8-byte hash pairs ever shuffle.
    *
    * Parity: D = 0.75 is exact in binary; p is ONE fixed IEEE op
    * sequence ((c12−0.75)/ch + ((0.75·n1ph)/ch)·(n1pw/B), left-assoc in
    * both engines); −ln rounds through DECIMAL(18,6) (q74's rule) and
    * per-doc sums are exact decimal. */
  private val KnDiscount = 0.75

  def q184KneserNey(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(normText(col("text")))
    // referenced twice (pair explode + per-doc bigram count): one kernel
    // pass, checkpointed (q74's rationale)
    val base = Tables(spark, dir).documents
      .select(col("doc_id"), graft.expr.WordGrams.hashedOf(toks, 1, 1).as("uh"))
      .localCheckpoint(true)
    val ex = base
      .filter(size(col("uh")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("uh"), lit(1), size(col("uh")) - 1),
          slice(col("uh"), lit(2), size(col("uh")) - 1),
          (a, b) => struct(a.as("h1"), b.as("h2")))).as("z"))
      .select(col("doc_id"), col("z.h1").as("h1"), col("z.h2").as("h2"))
      .groupBy(col("doc_id"), col("h1"), col("h2")).agg(count(lit(1)).as("occ"))
    // the distinct-bigram (model) frame: Zipf-bounded, three consumers
    val bgc = ex.groupBy(col("h1"), col("h2")).agg(sum(col("occ")).as("c12"))
      .localCheckpoint(true)
    val hc = bgc.groupBy(col("h1"))
      .agg(sum(col("c12")).as("ch"), count(lit(1)).as("n1ph"))
    val cc = bgc.groupBy(col("h2")).agg(count(lit(1)).as("n1pw"))
    val bb = bgc.agg(count(lit(1)).as("b"))
    val p = (col("c12").cast(DoubleType) - lit(KnDiscount)) / col("ch") +
      (lit(KnDiscount) * col("n1ph") / col("ch")) *
        (col("n1pw").cast(DoubleType) / col("b"))
    val scored = ex
      .join(bgc, Seq("h1", "h2")).join(hc, "h1").join(cc, "h2")
      .crossJoin(broadcast(bb))
      .select(col("doc_id"),
        ((-log(p)).cast(DecimalType(18, 6)) * col("occ")).as("term"))
      .groupBy(col("doc_id")).agg(sum(col("term")).as("nll_dec"))
    base
      .select(col("doc_id"),
        greatest(size(col("uh")) - 1, lit(0)).cast("long").as("n_bigrams"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        (col("nll_dec").cast(DoubleType) / nullif(col("n_bigrams"), lit(0L)))
          .as("avg_nll_kn"))
      .orderBy(col("doc_id"))
  }

  val q184Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
       |g AS (SELECT doc_id,
       |  [('0x' || substr(md5(t[i]), 1, 15))::BIGINT for i in range(1, len(t)+1)] AS uh
       |  FROM tk),
       |px AS (SELECT doc_id, unnest(uh[1:len(uh)-1]) AS h1, unnest(uh[2:len(uh)]) AS h2
       |       FROM g WHERE len(uh) >= 2),
       |ex AS (SELECT doc_id, h1, h2, count(*) AS occ FROM px GROUP BY 1, 2, 3),
       |bgc AS (SELECT h1, h2, CAST(sum(occ) AS BIGINT) AS c12 FROM ex GROUP BY 1, 2),
       |hc AS (SELECT h1, CAST(sum(c12) AS BIGINT) AS ch, count(*) AS n1ph FROM bgc GROUP BY 1),
       |cc AS (SELECT h2, count(*) AS n1pw FROM bgc GROUP BY 1),
       |bb AS (SELECT count(*) AS b FROM bgc),
       |s AS (SELECT doc_id,
       |  CAST(-ln((CAST(c12 AS DOUBLE) - 0.75) / ch
       |    + (0.75 * n1ph / ch) * (CAST(n1pw AS DOUBLE) / b)) AS DECIMAL(18,6)) * occ AS term
       |  FROM ex JOIN bgc USING (h1, h2) JOIN hc USING (h1) JOIN cc USING (h2) CROSS JOIN bb),
       |sc AS (SELECT doc_id, sum(term) AS nll_dec FROM s GROUP BY 1)
       |SELECT g.doc_id, CAST(greatest(len(uh) - 1, 0) AS BIGINT) AS n_bigrams,
       |  CAST(nll_dec AS DOUBLE) / nullif(greatest(len(uh) - 1, 0), 0) AS avg_nll_kn
       |FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id
       |ORDER BY g.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q180
  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
    * Data Mixtures"): one multiplicative-weights round over per-domain
    * clipped excess loss. The proxy model is q74's corpus bigram LM; the
    * reference is an add-one-smoothed unigram model over the same token
    * stream; per position the excess is max(0, nll_bigram − nll_unigram)
    * (clipped at zero, as DoReMi does), token-averaged per source. The new
    * domain weight is the exp-reweighted baseline share,
    *
    *   w_d ∝ share_d · exp(excess_d),   share_d = tokens_d / Σ tokens
    *
    * (η = 1, one round) — domains where the context-aware model still
    * loses the most over a context-free baseline get upweighted: the
    * "hardest residual signal" treatment for choosing a pretraining
    * mixture.
    *
    * 100 TB shape: q74's exactly, plus one more vocab-keyed model join
    * (unigram counts) — per-doc duplicate (history, bigram, next) triples
    * collapse before any join, model joins key on 8-byte hashes
    * (AQE-broadcastable Zipf head), and everything after the per-source
    * fold is domain-cardinality (20 rows here; thousands at most in a
    * production mixture — always a broadcast dimension). The n_docs count
    * folds from the doc-cardinality base frame, never the exploded one.
    *
    * Parity: each −ln P rounds through DECIMAL(18,6) (the q66/q74 rule);
    * clipping and both folds are exact decimal/integer; exp rounds
    * through DECIMAL(18,9); the weight numerator share·exp rounds through
    * DECIMAL(18,12) so its 20-row sum is exact and every decimal→double
    * cast stays under 2⁵³. */
  def q180DoremiWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(normText(col("text")))
    val base = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        graft.expr.WordGrams.hashedOf(toks, 1, 1).as("uh"),
        graft.expr.WordGrams.hashedOf(toks, 2, 1).as("bh"))
      .localCheckpoint(true)
    val ex = base
      .filter(size(col("bh")) > 0)
      .select(col("doc_id"), col("source"), col("uh"), posexplode(col("bh")))
      .select(col("doc_id"), col("source"),
        element_at(col("uh"), col("pos") + 1).as("hh"),
        col("col").as("bg"),
        element_at(col("uh"), col("pos") + 2).as("u2"))
      .groupBy(col("doc_id"), col("source"), col("hh"), col("bg"), col("u2"))
      .agg(count(lit(1)).as("occ"))
    val bc = ex.groupBy(col("bg")).agg(sum(col("occ")).as("c12"))
    val hc = ex.groupBy(col("hh")).agg(sum(col("occ")).as("ch"))
    val ua = base.select(explode(col("uh")).as("u"))
    val uc = ua.groupBy(col("u")).agg(count(lit(1)).as("cu"))
    val tv = ua.agg(count(lit(1)).as("t"), countDistinct(col("u")).as("v"))
    val termB = (-log((col("c12") + lit(1)).cast(DoubleType) /
      (col("ch").cast(DoubleType) + col("v")))).cast(DecimalType(18, 6))
    val termU = (-log((col("cu") + lit(1)).cast(DoubleType) /
      (col("t").cast(DoubleType) + col("v")))).cast(DecimalType(18, 6))
    val dom = ex
      .join(bc, "bg").join(hc, "hh").join(uc, col("u2") === uc("u"))
      .crossJoin(broadcast(tv))
      .select(col("source"), col("occ"),
        // occ multiplies as DECIMAL(12,0): a bigint factor degrades the
        // oracle engine's product to double (order-dependent float sum)
        (greatest(termB - termU, lit(0)) * col("occ").cast(DecimalType(12, 0)))
          .as("excess"))
      .groupBy(col("source"))
      .agg(sum(col("occ")).as("n_tokens"), sum(col("excess")).as("excess_sum"))
    val nd = base.filter(size(col("bh")) > 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = dom.agg(sum(col("n_tokens")).as("tt"))
    val wr = dom.join(nd, "source")
      .crossJoin(broadcast(tot))
      .withColumn("baseline_share", col("n_tokens").cast(DoubleType) / col("tt"))
      // divide exactly-scaled integers (both < 2^53) — decimal→double cast
      // of a wide sum is not guaranteed correctly rounded in every engine
      .withColumn("excess_loss",
        (col("excess_sum").cast(DecimalType(18, 6)) * lit(1000000L))
          .cast(LongType).cast(DoubleType) /
          (col("n_tokens").cast(DoubleType) * lit(1000000.0)))
      .withColumn("numer",
        (col("baseline_share") *
          exp(col("excess_loss")).cast(DecimalType(18, 9)).cast(DoubleType))
          .cast(DecimalType(18, 12)))
      // materialize the domain-cardinality frame (20 rows) so the
      // normalization sum does not recompute the corpus-sized model subtree
      .localCheckpoint(true)
    val dn = wr.agg(sum(col("numer")).as("dnm"))
    wr.crossJoin(broadcast(dn))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("baseline_share"), col("excess_loss"),
        (col("numer").cast(DoubleType) / col("dnm").cast(DoubleType)).as("weight"))
      .orderBy(col("source"))
  }

  val q180Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT doc_id, source, $toks AS t FROM documents),
       |g AS (SELECT doc_id, source,
       |  CASE WHEN len(t) >= 2
       |    THEN [('0x' || substr(md5(t[i]), 1, 15))::BIGINT for i in range(1, len(t))]
       |    ELSE []::BIGINT[] END AS uh1,
       |  CASE WHEN len(t) >= 2
       |    THEN [('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT for i in range(1, len(t))]
       |    ELSE []::BIGINT[] END AS bh,
       |  CASE WHEN len(t) >= 2
       |    THEN [('0x' || substr(md5(t[i+1]), 1, 15))::BIGINT for i in range(1, len(t))]
       |    ELSE []::BIGINT[] END AS u2s,
       |  [('0x' || substr(md5(t[i]), 1, 15))::BIGINT for i in range(1, len(t)+1)] AS uall
       |  FROM tk),
       |ex0 AS (SELECT doc_id, source, unnest(uh1) AS hh, unnest(bh) AS bg, unnest(u2s) AS u2 FROM g),
       |ex AS (SELECT doc_id, source, hh, bg, u2, count(*) AS occ FROM ex0 GROUP BY 1, 2, 3, 4, 5),
       |bc AS (SELECT bg, CAST(sum(occ) AS BIGINT) AS c12 FROM ex GROUP BY 1),
       |hc AS (SELECT hh, CAST(sum(occ) AS BIGINT) AS ch FROM ex GROUP BY 1),
       |ua AS (SELECT unnest(uall) AS u FROM g),
       |uc AS (SELECT u, count(*) AS cu FROM ua GROUP BY 1),
       |tv AS (SELECT count(*) AS t, count(DISTINCT u) AS v FROM ua),
       |terms AS (SELECT source, occ,
       |    CAST(-ln(CAST(c12 + 1 AS DOUBLE) / (CAST(ch AS DOUBLE) + v)) AS DECIMAL(18,6)) AS tb,
       |    CAST(-ln(CAST(cu + 1 AS DOUBLE) / (CAST(t AS DOUBLE) + v)) AS DECIMAL(18,6)) AS tu
       |  FROM ex JOIN bc USING (bg) JOIN hc USING (hh) JOIN uc ON ex.u2 = uc.u CROSS JOIN tv),
       |dom AS (SELECT source, CAST(sum(occ) AS BIGINT) AS n_tokens,
       |    sum(greatest(tb - tu, 0) * CAST(occ AS DECIMAL(12,0))) AS excess_sum
       |  FROM terms GROUP BY 1),
       |nd AS (SELECT source, count(*) AS n_docs FROM g WHERE len(bh) > 0 GROUP BY 1),
       |tot AS (SELECT sum(n_tokens) AS tt FROM dom),
       |wr AS (SELECT source, n_docs, n_tokens,
       |    CAST(n_tokens AS DOUBLE) / tt AS baseline_share,
       |    CAST(CAST(excess_sum AS DECIMAL(18,6)) * 1000000 AS BIGINT)
       |      / (CAST(n_tokens AS DOUBLE) * 1000000) AS excess_loss
       |  FROM dom JOIN nd USING (source) CROSS JOIN tot),
       |wn AS (SELECT *, CAST(baseline_share *
       |    CAST(CAST(exp(excess_loss) AS DECIMAL(18,9)) AS DOUBLE) AS DECIMAL(18,12)) AS numer
       |  FROM wr),
       |dn AS (SELECT sum(numer) AS dnm FROM wn)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens, baseline_share,
       |  excess_loss, CAST(numer AS DOUBLE) / CAST(dnm AS DOUBLE) AS weight
       |FROM wn, dn ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q181
  /** Data-constrained epoch allocation (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"): spend a token budget across
    * sources when repeating data has diminishing value. Each source s has
    * n_tokens_s and a diversity score ttr_s (type-token ratio); the e-th
    * epoch of s is worth ttr_s · 2^−(e−1) per token (value halves per
    * repeat, capped at 4 epochs). The plan is the greedy fill: rank all
    * (source, epoch) candidates by marginal per-token utility, take whole
    * epochs until the budget B = 2 · Σ n_tokens is hit, split the
    * straddling epoch fractionally — the fractional-knapsack optimum for
    * this concave utility, i.e. the mixture a budget-bound pretraining
    * run should actually schedule.
    *
    * 100 TB shape: corpus-sized work is ONE token explode folded to
    * (source, token) with map-side combine, then to the source dimension;
    * the candidate frame is sources × 4 rows — always broadcast-scale, so
    * the global ranking window is a driver-trivial sort, not a corpus
    * sort. (Exact per-source distinct counts come from the (source,
    * token) fold; a production run at higher source cardinality swaps in
    * the q144 HLL sketch, which this exact card validates against.)
    *
    * Parity: ttr and every division here divide integers < 2⁵³ (IEEE
    * bit-stable); epoch decay multiplies by exact powers of two; the
    * per-source fold adds one integer count to at most ONE nonzero
    * fractional term, so no float-summation-order ambiguity exists. */
  private val MaxEpochs = 4

  def q181EpochAllocation(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables(spark, dir).documents
      .select(col("source"), explode(tokens(normText(col("text")))).as("w"))
    val tw = ex.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val st = tw.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("distinct_tokens"))
    val bud = st.agg((sum(col("n_tokens")) * 2).as("b"))
    val wOrd = Window.orderBy(col("u").desc, col("source"), col("epoch"))
    val cand = st.crossJoin(broadcast(bud))
      .withColumn("ttr", col("distinct_tokens").cast(DoubleType) / col("n_tokens"))
      .select(col("*"), explode(array((1 to MaxEpochs).map(lit): _*)).as("epoch"))
      .withColumn("u", col("ttr") / pow(lit(2.0), col("epoch") - 1))
      .withColumn("cum", sum(col("n_tokens")).over(wOrd))
      .withColumn("cum_before", col("cum") - col("n_tokens"))
      .withColumn("frac",
        when(col("cum") <= col("b"), lit(1.0))
          .when(col("cum_before") >= col("b"), lit(0.0))
          .otherwise((col("b") - col("cum_before")).cast(DoubleType) / col("n_tokens")))
    cand
      .groupBy(col("source"), col("n_tokens"), col("distinct_tokens"), col("ttr"), col("b"))
      .agg(
        sum(when(col("frac") === 1.0, 1L).otherwise(0L)).as("full_epochs"),
        sum(when(col("frac") > 0.0 && col("frac") < 1.0, col("frac")).otherwise(lit(0.0)))
          .as("frac_part"))
      .select(col("source"), col("n_tokens"), col("distinct_tokens"), col("ttr"),
        (col("full_epochs") + col("frac_part")).as("epochs_alloc"),
        ((col("n_tokens") * col("full_epochs")).cast(DoubleType) +
          col("n_tokens").cast(DoubleType) * col("frac_part")).as("alloc_tokens"),
        (((col("n_tokens") * col("full_epochs")).cast(DoubleType) +
          col("n_tokens").cast(DoubleType) * col("frac_part")) /
          col("b").cast(DoubleType)).as("budget_share"))
      .orderBy(col("source"))
  }

  val q181Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH ex AS (SELECT source, unnest($toks) AS w FROM documents),
       |tw AS (SELECT source, w, count(*) AS c FROM ex GROUP BY 1, 2),
       |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    count(*) AS distinct_tokens FROM tw GROUP BY 1),
       |bud AS (SELECT 2 * sum(n_tokens) AS b FROM st),
       |cand AS (SELECT source, n_tokens, distinct_tokens, b,
       |    CAST(distinct_tokens AS DOUBLE) / n_tokens AS ttr, e AS epoch
       |  FROM st CROSS JOIN bud, unnest([1, 2, 3, 4]) AS t(e)),
       |r AS (SELECT *, ttr / power(2, epoch - 1) AS u FROM cand),
       |c AS (SELECT *, sum(n_tokens) OVER (ORDER BY u DESC, source, epoch) AS cum FROM r),
       |f AS (SELECT *,
       |    CASE WHEN cum <= b THEN CAST(1.0 AS DOUBLE)
       |         WHEN cum - n_tokens >= b THEN CAST(0.0 AS DOUBLE)
       |         ELSE CAST(b - (cum - n_tokens) AS DOUBLE) / n_tokens END AS frac FROM c),
       |a AS (SELECT source, n_tokens, distinct_tokens, ttr, b,
       |    CAST(sum(CASE WHEN frac = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS full_epochs,
       |    sum(CASE WHEN frac > 0 AND frac < 1 THEN frac ELSE CAST(0 AS DOUBLE) END) AS frac_part
       |  FROM f GROUP BY 1, 2, 3, 4, 5)
       |SELECT source, n_tokens, CAST(distinct_tokens AS BIGINT) AS distinct_tokens, ttr,
       |  full_epochs + frac_part AS epochs_alloc,
       |  CAST(n_tokens * full_epochs AS DOUBLE) + CAST(n_tokens AS DOUBLE) * frac_part
       |    AS alloc_tokens,
       |  (CAST(n_tokens * full_epochs AS DOUBLE) + CAST(n_tokens AS DOUBLE) * frac_part)
       |    / CAST(b AS DOUBLE) AS budget_share
       |FROM a ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q182
  /** n-gram novelty spectrum: for gram orders n ∈ {1, 2, 4, 8}, how much
    * of the corpus is globally novel at that order — total/distinct gram
    * positions, singleton counts, and the derived rates (distinct ratio,
    * novel fraction = positions whose gram occurs exactly once corpus-
    * wide, duplicated-mass fraction). The repetition fingerprint used to
    * judge corpus quality before training: natural text keeps high
    * novelty at n = 8 while boilerplate/template corpora collapse, and
    * the spectrum is the standard before/after evidence for dedup
    * treatments (complements q19/q61: corpus-global and order-resolved
    * where those are doc-local or single-order).
    *
    * 100 TB shape: ONE documents scan — all four gram streams come from
    * one [[graft.expr.WordGrams]] kernel pass each, tagged and
    * concatenated in-row, so the corpus explodes once; the (n, gram) fold
    * is map-side combinable onto 8-byte keys (the Zipf head collapses
    * before the shuffle) and the final fold is 4 rows. Parity: counts are
    * integers; each rate is one int/int IEEE division under 2⁵³. */
  private val NoveltyOrders = Seq(1, 2, 4, 8)

  def q182NgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(normText(col("text")))
    val tagged = NoveltyOrders.map { n =>
      transform(graft.expr.WordGrams.hashedOf(toks, n, 1),
        g => struct(lit(n).as("n"), g.as("g")))
    }
    Tables(spark, dir).documents
      .select(explode(concat(tagged: _*)).as("z"))
      .select(col("z.n").as("n"), col("z.g").as("g"))
      .groupBy(col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("n"))
      .agg(sum(col("c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("singletons"))
      .select(col("n"), col("total_ngrams"), col("distinct_ngrams"), col("singletons"),
        (col("distinct_ngrams").cast(DoubleType) / col("total_ngrams")).as("distinct_ratio"),
        (col("singletons").cast(DoubleType) / col("total_ngrams")).as("novel_frac"),
        ((col("total_ngrams") - col("singletons")).cast(DoubleType) / col("total_ngrams"))
          .as("dup_mass_frac"))
      .orderBy(col("n"))
  }

  val q182Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    def grams(n: Int) =
      s"[('0x' || substr(md5(array_to_string(t[i:i+${n - 1}], ' ')), 1, 15))::BIGINT" +
        s" for i in range(1, len(t) - ${n - 1} + 1)]"
    val arms = NoveltyOrders
      .map(n => s"SELECT $n AS n, unnest(${grams(n)}) AS g FROM tk")
      .mkString("\n|  UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
       |gx AS ($arms),
       |gc AS (SELECT n, g, count(*) AS c FROM gx GROUP BY 1, 2),
       |agg AS (SELECT n, CAST(sum(c) AS BIGINT) AS total_ngrams,
       |    count(*) AS distinct_ngrams,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons
       |  FROM gc GROUP BY 1)
       |SELECT n, total_ngrams, CAST(distinct_ngrams AS BIGINT) AS distinct_ngrams,
       |  singletons,
       |  CAST(distinct_ngrams AS DOUBLE) / total_ngrams AS distinct_ratio,
       |  CAST(singletons AS DOUBLE) / total_ngrams AS novel_frac,
       |  CAST(total_ngrams - singletons AS DOUBLE) / total_ngrams AS dup_mass_frac
       |FROM agg ORDER BY n""".stripMargin
  }

  // ---------------------------------------------------------------- q78
  /** TF-IDF keyword extraction: the top-3 terms per document by
    * tf · ln(N/df) — the standard corpus-relative salience signal (topic
    * tagging, index keys, weak labels). Ubiquitous terms get idf → 0 and
    * drop out without a stopword list.
    *
    * 100 TB shape: the only corpus-sized stage is the (doc, term) tf
    * aggregation (map-side combine). df derives from the tf table (one
    * row per distinct (doc, term)), so the corpus is scanned once; the
    * tf⋈df join keys on the term — vocab-sized build side, AQE broadcasts
    * when the Zipf head fits; the top-3 window runs over each doc's
    * distinct terms. Scores round through DECIMAL(18,6) (ln parity, the
    * q66 rule), and ranking compares the rounded decimal with a term
    * tie-break, so the cut is deterministic cross-engine.
    */
  def q78TfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val ex = d.select(col("doc_id"), explode(tokens(normText(col("text")))).as("w"))
    val tf = ex.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val ndocs = d.agg(count(lit(1)).as("n"))
    val scoreDec = (col("tf").cast(DoubleType) *
      log(col("n").cast(DoubleType) / col("df"))).cast(DecimalType(18, 6))
    val top = Window.partitionBy(col("doc_id")).orderBy(col("score_dec").desc, col("w"))
    tf.join(dfT, "w")
      .crossJoin(broadcast(ndocs))
      .withColumn("score_dec", scoreDec)
      .withColumn("rank", row_number().over(top).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("w").as("term"),
        col("score_dec").cast(DoubleType).as("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val q78Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT doc_id, unnest($toks) AS w FROM documents),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM tk GROUP BY 1, 2),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |s AS (SELECT doc_id, w,
       |  CAST(CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / df) AS DECIMAL(18,6)) AS score
       |  FROM tf JOIN df USING (w) CROSS JOIN n),
       |r AS (SELECT doc_id, w, score,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk
       |  FROM s)
       |SELECT doc_id, CAST(rk AS BIGINT) AS rank, w AS term,
       |  CAST(score AS DOUBLE) AS tfidf
       |FROM r WHERE rk <= 3 ORDER BY doc_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q79
  /** Temperature-scaled mixture sampling weights: per-source token counts
    * reweighted by w_s ∝ tokens_s^0.5 (α = 0.5 — the Pile/LLaMA-style
    * rebalancing that upsamples small high-quality sources), plus the
    * per-source epoch count a 1M-token budget implies (epochs > 1 =
    * upsampled source).
    *
    * 100 TB shape: one narrow token-count pass with map-side combine into
    * a source-cardinality aggregate; everything after the per-source
    * collapse is O(#sources). Parity: sqrt is correctly rounded in IEEE
    * 754 (both engines bit-equal), each sqrt rounds through
    * DECIMAL(18,6), and the normalizer is a DECIMAL sum — exact and
    * summation-ORDER-free, which a double sum across groups would not be.
    */
  def q79MixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables(spark, dir).documents
      .groupBy(col("source"))
      .agg(sum(nTokens(col("text")).cast("long")).as("tokens"))
      .withColumn("sqrt_dec",
        sqrt(col("tokens").cast(DoubleType)).cast(DecimalType(18, 6)))
    val tot = perSource.agg(sum(col("sqrt_dec")).as("tot_dec"))
    val weight = col("sqrt_dec").cast(DoubleType) / col("tot_dec").cast(DoubleType)
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        weight.as("weight"),
        (weight * lit(1000000.0) / col("tokens")).as("epochs_at_1m"))
      .orderBy(col("source"))
  }

  val q79Sql: String =
    s"""WITH t AS (SELECT source,
       |    CAST(sum(${nTokensSql("text")}) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1),
       |s AS (SELECT source, tokens,
       |    CAST(sqrt(CAST(tokens AS DOUBLE)) AS DECIMAL(18,6)) AS sd FROM t),
       |g AS (SELECT sum(sd) AS tot FROM s)
       |SELECT source, tokens,
       |  CAST(sd AS DOUBLE) / CAST(tot AS DOUBLE) AS weight,
       |  CAST(sd AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000.0 / tokens AS epochs_at_1m
       |FROM s, g ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q176
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw-corpus
    * document by how target-like its hashed-token distribution is. The
    * target is the deterministic `doc_id % 176Mod == 0` slice (the q60
    * benchmark convention — a stand-in for the real target domain);
    * features are tokens hashed into [[DsirBuckets]] buckets; each
    * bucket carries the Laplace-smoothed log-likelihood ratio
    * ln(p_target(b)/p_raw(b)), and a document's log-importance is the
    * count-weighted sum of its buckets' ratios, reported raw (`llr`) and
    * length-normalized (`score`), with `selected` = more target-like
    * than raw (llr > 0) — the resampling gate.
    *
    * 100 TB shape: the bucket dimension is FIXED (64 rows) — both
    * distribution folds are map-side-combinable aggregates onto it, the
    * per-doc pass groups on (doc_id, bucket) riding the doc-keyed scan,
    * and the ratio dimension broadcasts back. Nothing corpus-sized
    * shuffles except the (doc, bucket) fold the narrow scan feeds.
    * Parity: counts/totals are integers; each bucket's ln is ONE IEEE
    * double op on exact integer products, rounded through
    * DECIMAL(18,9) (q74's rule); per-doc sums are then exact decimal
    * count × ratio products — summation-order-free in both engines;
    * `score` is one final IEEE division. */
  private final val DsirBuckets = 64
  private final val DsirTargetMod = 97 // the q60 benchmark-slice convention

  def q176DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r16: in-row bucket-count kernel (q201's device — see
    // [[graft.expr.HashBucketCounts]]): same hex60-mod fold per token,
    // but the corpus scan is never multiplied by tokens-per-doc and the
    // three consumers below aggregate ≤64 rows/doc instead of one row
    // per token OCCURRENCE; sums over in-row counts are bit-identical
    // to counts over the explode
    val tok = Tables(spark, dir).documents
      .select(col("doc_id"), posexplode(graft.expr.HashBucketCounts.of(
        tokens(normText(col("text"))), DsirBuckets)).as(Seq("b0", "n_b")))
      .filter(col("n_b") > 0)
      .select(col("doc_id"), col("b0").cast(LongType).as("b"), col("n_b"))
      .localCheckpoint(true) // referenced three times (tc, rc, per-doc)
    val isTarget = col("doc_id") % DsirTargetMod === 0
    val tc = tok.filter(isTarget).groupBy(col("b")).agg(sum(col("n_b")).as("ct"))
    val rc = tok.filter(!isTarget).groupBy(col("b")).agg(sum(col("n_b")).as("cr"))
    // complete the fixed bucket grid so smoothing covers empty buckets
    val grid = spark.range(DsirBuckets).toDF("b")
    val dims = grid.join(tc, Seq("b"), "left").join(rc, Seq("b"), "left")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tots = dims.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lrDim = dims.crossJoin(broadcast(tots))
      .select(col("b"), log(
          ((col("ct") + 1).cast(DoubleType) * (col("nr") + DsirBuckets)) /
            ((col("cr") + 1).cast(DoubleType) * (col("nt") + DsirBuckets)))
        .cast(DecimalType(18, 9)).as("lr"))
    tok.filter(!isTarget)
      .join(broadcast(lrDim), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_b").cast(DecimalType(10, 0)) * col("lr")).as("llr_dec"),
        sum(col("n_b")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        col("llr_dec").cast(DoubleType).as("llr"),
        (col("llr_dec").cast(DoubleType) / col("n_tokens")).as("score"),
        (col("llr_dec") > 0).as("selected"))
      .orderBy(col("doc_id"))
  }

  val q176Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS w FROM documents),
       |tb AS (SELECT doc_id,
       |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $DsirBuckets AS b FROM tok),
       |grid AS (SELECT range AS b FROM range(0, $DsirBuckets)),
       |tc AS (SELECT b, count(*) AS ct FROM tb WHERE doc_id % $DsirTargetMod = 0 GROUP BY 1),
       |rc AS (SELECT b, count(*) AS cr FROM tb WHERE doc_id % $DsirTargetMod != 0 GROUP BY 1),
       |d AS (SELECT g.b, coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
       |      FROM grid g LEFT JOIN tc ON g.b = tc.b LEFT JOIN rc ON g.b = rc.b),
       |t AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM d),
       |lr AS (SELECT b, CAST(ln(
       |    (CAST(ct + 1 AS DOUBLE) * (nr + $DsirBuckets)) /
       |    (CAST(cr + 1 AS DOUBLE) * (nt + $DsirBuckets))) AS DECIMAL(18,9)) AS lr
       |  FROM d, t),
       |pd AS (SELECT doc_id, b, count(*) AS n_b FROM tb
       |       WHERE doc_id % $DsirTargetMod != 0 GROUP BY 1, 2),
       |sc AS (SELECT doc_id, sum(CAST(n_b AS DECIMAL(10,0)) * lr) AS llr,
       |       sum(n_b) AS n_tokens FROM pd JOIN lr USING (b) GROUP BY 1)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(llr AS DOUBLE) AS llr,
       |  CAST(llr AS DOUBLE) / n_tokens AS score,
       |  llr > 0 AS selected
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q80
  /** JSONL export formatting — the interchange format every LLM training
    * stack ingests. One narrow pass: each doc serializes to a compact
    * single-line JSON object with a FIXED field order (to_json follows
    * struct field order in both engines) plus the line's md5 — the
    * manifest digest a 100 TB export writes next to each shard so
    * downstream consumers can verify integrity without re-reading. The
    * cross-engine oracle proves the export is byte-identical to DuckDB's
    * to_json of the same struct (same key order, spacing, and escaping).
    */
  def q80JsonlExport(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("source"), col("text")))
          .as("jsonl"))
      .select(col("doc_id"), col("jsonl"),
        length(col("jsonl")).cast("long").as("n_chars"),
        md5(col("jsonl")).as("line_md5"))
      .orderBy(col("doc_id"))
  }

  val q80Sql: String =
    """WITH j AS (SELECT doc_id,
      |    to_json(struct_pack(doc_id := doc_id, lang := lang,
      |                        source := source, text := text)) AS jsonl
      |  FROM documents)
      |SELECT doc_id, jsonl, CAST(length(jsonl) AS BIGINT) AS n_chars,
      |  md5(jsonl) AS line_md5
      |FROM j ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Log₂-bucketed document-length histogram per language — the data-card
    * length distribution (tokenizer batch sizing, truncation-rate
    * estimates). The bucket is `length(bin(n_chars))` = ⌊log₂ n⌋ + 1,
    * INTEGER-exact in both engines — a float `floor(log2(x))` would sit a
    * ulp below an integer at exact powers of two and mis-bucket. One
    * narrow pass into a (lang × ~30 buckets)-cardinality aggregate. */
  def q82LengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents
      .groupBy(col("lang"),
        length(bin(col("n_chars"))).cast("long").as("log2_bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("log2_bucket"))
  }

  val q82Sql: String =
    """SELECT lang, CAST(length(bin(n_chars)) AS BIGINT) AS log2_bucket,
      |  count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2 ORDER BY lang, log2_bucket""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Per-source language-mix entropy — the data-card diversity statistic
    * (a monolingual crawl scores 0; a uniform 5-language mix ln 5 ≈ 1.61).
    * One corpus pass collapses to (source × lang) counts; the entropy
    * window runs over that tiny table. Parity: each p·ln p term rounds
    * through DECIMAL(18,12) (ln is 1 ulp off cross-engine) and the
    * per-source sum is an exact, order-free decimal sum. */
  def q86LangEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables(spark, dir).documents
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
    val bySrc = Window.partitionBy(col("source"))
    val p = col("c").cast(DoubleType) / col("tot")
    cnt
      .withColumn("tot", sum(col("c")).over(bySrc))
      .withColumn("term", (p * log(p)).cast(DecimalType(18, 12)))
      .groupBy(col("source"))
      .agg(max(col("tot")).as("n_docs"), count(lit(1)).as("n_langs"),
        (-sum(col("term"))).cast(DoubleType).as("lang_entropy"))
      .orderBy(col("source"))
  }

  val q86Sql: String =
    """WITH cnt AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
      |t AS (SELECT source, c, sum(c) OVER (PARTITION BY source) AS tot FROM cnt),
      |s AS (SELECT source, tot,
      |  CAST(CAST(c AS DOUBLE) / tot * ln(CAST(c AS DOUBLE) / tot) AS DECIMAL(18,12)) AS term
      |  FROM t)
      |SELECT source, CAST(max(tot) AS BIGINT) AS n_docs, count(*) AS n_langs,
      |  CAST(-sum(term) AS DOUBLE) AS lang_entropy
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q90
  /** JSONL round-trip: q80 proves the engine WRITES the interchange
    * format byte-exactly; this proves it READS it back losslessly —
    * serialize each doc to a JSONL line, re-parse with a typed schema
    * (`from_json`), and count field-exact recoveries. A training stack
    * that exports through q80 and re-ingests through this path loses
    * nothing. One narrow pass (serialize + parse live in the same
    * projection), collapsing to a single audit row. */
  def q90JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Tables(spark, dir).documents
      .withColumn("line",
        to_json(struct(col("doc_id"), col("lang"), col("source"), col("text"))))
      .withColumn("r", from_json(col("line"), schema))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(
          col("r.doc_id") === col("doc_id") && col("r.lang") === col("lang") &&
            col("r.source") === col("source") && col("r.text") === col("text"),
          1)).as("n_lossless"))
  }

  val q90Sql: String =
    """WITH j AS (SELECT doc_id, lang, source, text,
      |    to_json(struct_pack(doc_id := doc_id, lang := lang,
      |                        source := source, text := text)) AS line
      |  FROM documents)
      |SELECT count(*) AS n_lines,
      |  count(CASE WHEN CAST(json_extract_string(line, '$.doc_id') AS BIGINT) = doc_id
      |         AND json_extract_string(line, '$.lang') = lang
      |         AND json_extract_string(line, '$.source') = source
      |         AND json_extract_string(line, '$.text') = text THEN 1 END) AS n_lossless
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Mixture materialization — the step after q79: expand each source's
    * epoch count into a deterministic per-document copy count for a
    * 1M-token training budget. Full epochs copy every doc; the fractional
    * epoch admits each doc independently by a salted hash threshold
    * (`u(doc) < frac`), so the expansion needs NO ranking, NO shuffle,
    * and resamples identically on every run and any cluster — the
    * property a reproducible training run needs from its sampler. At
    * 100 TB: one broadcast of the #sources-row epoch table into a narrow
    * corpus pass.
    *
    * Expected tokens from the plan ≈ budget by construction (the hash
    * admission is an unbiased Bernoulli per doc); exactness of the COUNTS
    * is what the oracle pins — both engines compute the identical salted
    * hash and the identical double threshold chain (sqrt → DECIMAL →
    * division, see q79). */
  def q91MixtureExpand(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables(spark, dir).documents
      .groupBy(col("source"))
      .agg(sum(nTokens(col("text")).cast("long")).as("tokens"))
      .withColumn("sqrt_dec",
        sqrt(col("tokens").cast(DoubleType)).cast(DecimalType(18, 6)))
    val tot = perSource.agg(sum(col("sqrt_dec")).as("tot_dec"))
    val weight = col("sqrt_dec").cast(DoubleType) / col("tot_dec").cast(DoubleType)
    val epochs = perSource.crossJoin(broadcast(tot))
      .select(col("source"),
        (weight * lit(1000000.0) / col("tokens")).as("epochs"))
    val u = (hex60(concat(lit("sample:"), col("doc_id"))) % lit(1000000L))
      .cast(DoubleType) / lit(1000000.0)
    Tables(spark, dir).documents
      .select(col("doc_id"), col("source"))
      .join(broadcast(epochs), Seq("source"))
      .select(col("doc_id"), col("source"),
        (floor(col("epochs")) +
          when(u < col("epochs") - floor(col("epochs")).cast(DoubleType), 1L)
            .otherwise(0L)).cast("long").as("n_copies"))
      .orderBy(col("doc_id"))
  }

  val q91Sql: String = {
    val uSql = """CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS DOUBLE) / 1000000.0"""
    s"""WITH t AS (SELECT source,
       |    CAST(sum(${nTokensSql("text")}) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1),
       |s AS (SELECT source, tokens,
       |    CAST(sqrt(CAST(tokens AS DOUBLE)) AS DECIMAL(18,6)) AS sd FROM t),
       |g AS (SELECT sum(sd) AS tot FROM s),
       |e AS (SELECT source,
       |    CAST(sd AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000.0 / tokens AS epochs
       |  FROM s, g)
       |SELECT d.doc_id, d.source,
       |  CAST(floor(epochs) +
       |    CASE WHEN $uSql < epochs - floor(epochs) THEN 1 ELSE 0 END AS BIGINT) AS n_copies
       |FROM documents d JOIN e ON d.source = e.source
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q98
  /** Train/val/test split + cross-split leakage audit. Assignment is a
    * pure per-row hash gate (`hex60("split:"+doc_id) % 100` against the
    * 90/5/5 bounds) — like q53's sampler it is replayable on any cluster
    * and stable under repartitioning, which is the leakage-PROOF half.
    * The leakage-AUDIT half is what a deterministic doc_id split cannot
    * guarantee: the same CONTENT arriving under two doc_ids can land in
    * train and test. Grouping the exact-dup digest (q19's content hash)
    * and counting distinct splits per digest flags every such doc.
    *
    * Scale shape: assignment + digest ride the one corpus scan; leakage
    * is a digest-keyed agg (exactly q19's shuffle) whose output joins
    * back on the same key — co-partitioned, no second wide shuffle; the
    * report is a (source × split)-cardinality map-side-combinable agg.
    * Fractions and deviations round through DECIMAL(18,6) before the
    * final double cast so they are bit-stable cross-engine. */
  private val SplitBounds: Seq[(String, Int, Int)] = // (name, upper %, target %)
    Seq(("train", 90, 90), ("val", 95, 5), ("test", 100, 5))

  def q98SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val bucket = hex60(concat(lit("split:"), col("doc_id").cast("string"))) % 100
    val split = SplitBounds.init.foldRight(lit(SplitBounds.last._1)) {
      case ((name, upper, _), rest) => when(bucket < upper, lit(name)).otherwise(rest)
    }
    val target = SplitBounds.foldRight(lit(null).cast(DecimalType(18, 6))) {
      case ((name, _, pct), rest) =>
        when(col("split") === name, lit(pct / 100.0).cast(DecimalType(18, 6))).otherwise(rest)
    }
    val assigned = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        hex60(normText(col("text"))).as("ch"), split.as("split"))
    val perDigest = assigned.groupBy(col("ch"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assigned.join(perDigest, Seq("ch"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("n_splits") > 1, 1)).as("n_leaked"))
      .withColumn("src_total",
        sum(col("n_docs")).over(Window.partitionBy(col("source"))))
      .withColumn("frac_dec",
        (col("n_docs").cast(DecimalType(18, 6)) / col("src_total"))
          .cast(DecimalType(18, 6)))
      .select(col("source"), col("split"), col("n_docs"), col("n_leaked"),
        col("frac_dec").cast(DoubleType).as("frac"),
        (col("frac_dec") - target).cast(DecimalType(18, 6))
          .cast(DoubleType).as("target_deviation"))
      .orderBy(col("source"), col("split"))
  }

  val q98Sql: String = {
    val splitCase = SplitBounds.init
      .map { case (n, u, _) => s"WHEN b < $u THEN '$n'" }
      .mkString("CASE ", " ", s" ELSE '${SplitBounds.last._1}' END")
    val targetCase = SplitBounds
      .map { case (n, _, p) => s"WHEN split = '$n' THEN CAST(${p / 100.0} AS DECIMAL(18,6))" }
      .mkString("CASE ", " ", " END")
    s"""WITH a AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(md5(lower(trim(regexp_replace(text, '${graft.text.TextOps.WsSql}+', ' ', 'g')))), 1, 15))::BIGINT AS ch,
       |    ('0x' || substr(md5('split:' || doc_id), 1, 15))::BIGINT % 100 AS b
       |  FROM documents),
       |s AS (SELECT doc_id, source, ch, $splitCase AS split FROM a),
       |pd AS (SELECT ch, count(DISTINCT split) AS n_splits FROM s GROUP BY 1),
       |g AS (SELECT source, split, count(*) AS n_docs,
       |        count(CASE WHEN pd.n_splits > 1 THEN 1 END) AS n_leaked
       |      FROM s JOIN pd USING (ch) GROUP BY 1, 2),
       |w AS (SELECT *, sum(n_docs) OVER (PARTITION BY source) AS src_total,
       |        CAST(CAST(n_docs AS DECIMAL(18,6)) / sum(n_docs) OVER (PARTITION BY source)
       |          AS DECIMAL(18,6)) AS frac_dec
       |      FROM g)
       |SELECT source, split, n_docs, n_leaked,
       |  CAST(frac_dec AS DOUBLE) AS frac,
       |  CAST(CAST(frac_dec - ($targetCase) AS DECIMAL(18,6)) AS DOUBLE) AS target_deviation
       |FROM w ORDER BY source, split""".stripMargin
  }

  // ---------------------------------------------------------------- q102
  /** Weighted priority sampling, per source: keep the k docs with the
    * smallest `u / w` where `u` is a deterministic per-doc uniform (the
    * salted 60-bit hash, q53's device) and `w = n_chars` — selection is
    * pairwise-proportional to length (P(a beats b) = w_a/(w_a+w_b)),
    * the sampling step a mixture pipeline runs when it wants LONG
    * documents over-represented without an RNG. This is the
    * scaled-uniform cousin of Efraimidis–Spirakis exponential clocks
    * (−ln(u)/w); the log is deliberately avoided: `(h+1)/w` is one IEEE
    * division of exact integers, so the rank — and therefore the
    * SELECTION — is bit-identical in any engine, no rounding, no ulp
    * tie-break risk.
    *
    * The per-source top-k runs through the custom [[graft.plans.TopK]]
    * whole-operator plan (q101's bounded-heap partial/final pair) — the
    * operator's first in-pipeline deployment: 5 sources ≪ the partial
    * key cap, exactly its winning regime, so the shuffle carries ≤
    * sources × k rows per map partition instead of the corpus. */
  private val WSampleK = 5

  def q102WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val ranked = Tables(spark, dir).documents
      .filter(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        ((hex60(concat(lit("wsamp:"), col("doc_id").cast("string"))) + 1).cast(DoubleType)
          / col("n_chars").cast(DoubleType)).as("rank"))
    graft.plans.TopK.perKey(ranked, Seq("source"),
        Seq("rank" -> false, "doc_id" -> false), WSampleK)
      .orderBy(col("source"), col("rank"), col("doc_id"))
  }

  val q102Sql: String =
    s"""WITH r AS (
       |  SELECT source, doc_id, n_chars,
       |    CAST(('0x' || substr(md5('wsamp:' || doc_id), 1, 15))::BIGINT + 1 AS DOUBLE)
       |      / CAST(n_chars AS DOUBLE) AS rank
       |  FROM documents WHERE n_chars > 0),
       |t AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY rank, doc_id) AS rn
       |      FROM r)
       |SELECT source, doc_id, n_chars, rank FROM t
       |WHERE rn <= $WSampleK ORDER BY source, rank, doc_id""".stripMargin

  // ---------------------------------------------------------------- q119
  /** Zipf-law fit per language: least-squares slope of ln(count) over
    * ln(rank) across the top [[ZipfRanks]] word ranks — the corpus
    * statistic that says how head-heavy a language's token distribution
    * is (natural text ≈ −1; templated/boilerplate corpora skew steeper,
    * tag soup flatter). Complements q73 (coverage CURVE points) with the
    * distribution's fitted EXPONENT, and q86 (lang entropy) with a
    * shape, not just a dispersion, parameter.
    *
    * 100 TB shape: the only corpus-sized stage is the (lang, word) count
    * (map-side combine); rank + fit run over the top-[[ZipfRanks]] rows
    * per language — constant-bounded, window partitioned by lang. Float
    * parity: ln(rank)/ln(count) each round through DECIMAL(18,6) (the
    * q66/q74 ln rule), the five regression sums are EXACT decimal sums
    * of exact decimal products, and slope/intercept are fixed-shape
    * double expressions over those sums, re-rounded before output. */
  private val ZipfRanks = 1000

  def q119ZipfFit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val cnt = d.select(col("lang"), explode(tokens(normText(col("text")))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
    val byFreq = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("w"))
    val terms = cnt
      .withColumn("rk", row_number().over(byFreq))
      .filter(col("rk") <= ZipfRanks)
      .select(col("lang"),
        log(col("rk")).cast(DecimalType(18, 6)).as("x"),
        log(col("cnt")).cast(DecimalType(18, 6)).as("y"))
    val nd  = col("n").cast(DoubleType)
    val sx  = col("sx").cast(DoubleType)
    val sy  = col("sy").cast(DoubleType)
    val sxy = col("sxy").cast(DoubleType)
    val sxx = col("sxx").cast(DoubleType)
    val slopeDec = ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)).cast(DecimalType(18, 6))
    terms.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("lang"), col("n").as("n_ranks"),
        slopeDec.cast(DoubleType).as("zipf_slope"),
        (((sy - slopeDec.cast(DoubleType) * sx) / nd).cast(DecimalType(18, 6)))
          .cast(DoubleType).as("intercept"))
      .orderBy(col("lang"))
  }

  val q119Sql: String = {
    val toks = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT lang, unnest($toks) AS w FROM documents),
       |g AS (SELECT lang, w, count(*) AS cnt FROM tk GROUP BY 1, 2),
       |r AS (SELECT lang, cnt,
       |        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, w) AS rk
       |      FROM g),
       |t AS (SELECT lang, CAST(ln(rk) AS DECIMAL(18,6)) AS x,
       |             CAST(ln(cnt) AS DECIMAL(18,6)) AS y
       |      FROM r WHERE rk <= $ZipfRanks),
       |a AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |             sum(x * y) AS sxy, sum(x * x) AS sxx
       |      FROM t GROUP BY 1),
       |s AS (SELECT lang, n,
       |        CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |          AS DECIMAL(18,6)) AS slope_dec,
       |        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
       |      FROM a)
       |SELECT lang, CAST(n AS BIGINT) AS n_ranks,
       |  CAST(slope_dec AS DOUBLE) AS zipf_slope,
       |  CAST(CAST((syd - CAST(slope_dec AS DOUBLE) * sxd) / CAST(n AS DOUBLE)
       |       AS DECIMAL(18,6)) AS DOUBLE) AS intercept
       |FROM s ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q122
  /** Population-Stability-Index drift monitor: for each source, how far
    * its document-length distribution drifts from the REST of the corpus
    * — the standard ML-ops gate for "did this feed change shape". Global
    * deciles of `n_chars` (q39's integer-threshold device: smallest
    * value with 10·cum ≥ i·tot, exact in both engines), each source's
    * per-decile share vs the complement's, PSI = Σ (pₐ−pᵦ)·ln(pₐ/pᵦ)
    * with Laplace-smoothed shares ((cnt+1)/(n+10) — integer smoothing,
    * so zero buckets are deterministic, never −∞).
    *
    * 100 TB shape: one corpus scan feeds the value-cardinality count
    * table; the 9 thresholds fold into ONE array row that broadcasts
    * back, so bucket assignment is a scan-stage projection
    * (`size(filter(...))` over a 9-element array); everything after is
    * source×decile-sized. Parity: counts/thresholds are integers, each
    * smoothed share is one double division, each ln rounds through
    * DECIMAL(18,6) (the q66/q74 rule) and terms decimal-sum. */
  def q122PsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("source"), col("n_chars"))
    // global decile thresholds t1..t9 (counts → cumulative → integer cut)
    val cnt = d.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val cum = cnt
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy()))
    val thresholds = (1 to 9).map(i =>
      min(when(col("cum") * 10 >= col("tot") * i, col("n_chars"))).as(s"t$i"))
    val tarr = cum.agg(thresholds.head, thresholds.tail: _*)
      .select(array((1 to 9).map(i => col(s"t$i")): _*).as("ts"))
    val bucketed = d.crossJoin(broadcast(tarr))
      .select(col("source"),
        (size(filter(col("ts"), t => col("n_chars") > t)) + 1).as("b"))
    val bySrc = bucketed.groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // complement counts: total per bucket minus own; spine = source × decile
    // so empty buckets exist (the Laplace smoothing then scores them)
    val byBucket = bySrc.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val srcTot = bySrc.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val allTot = byBucket.agg(sum(col("cb")).as("n"))
    val spine = bySrc.select(col("source")).distinct()
      .crossJoin(spark.range(1, 11).select(col("id").cast("int").as("b")))
    val terms = spine
      .join(bySrc, Seq("source", "b"), "left")
      .join(broadcast(byBucket), Seq("b"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(allTot))
      .select(col("source"), col("ns"),
        (coalesce(col("c"), lit(0L)) + 1).cast(DoubleType)
          ./(col("ns") + 10).as("pa"),
        ((col("cb") - coalesce(col("c"), lit(0L))) + 1).cast(DoubleType)
          ./((col("n") - col("ns")) + 10).as("pb"))
      .select(col("source"), col("ns"),
        ((col("pa") - col("pb")) * log(col("pa") / col("pb")))
          .cast(DecimalType(18, 6)).as("term"))
    terms.groupBy(col("source"))
      .agg(max(col("ns")).as("n_docs"),
        sum(col("term")).cast(DecimalType(18, 6)).cast(DoubleType).as("psi"))
      .orderBy(col("source"))
  }

  val q122Sql: String =
    """WITH d AS (SELECT source, n_chars FROM documents),
      |cnt AS (SELECT n_chars, count(*) AS cnt FROM d GROUP BY 1),
      |cum AS (SELECT n_chars, cnt,
      |    sum(cnt) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cnt) OVER () AS tot FROM cnt),
      |tarr AS (SELECT [
      |    min(CASE WHEN cum * 10 >= tot * 1 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 2 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 3 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 4 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 5 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 6 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 7 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 8 THEN n_chars END),
      |    min(CASE WHEN cum * 10 >= tot * 9 THEN n_chars END)] AS ts FROM cum),
      |bk AS (SELECT source, 1 + len(list_filter(ts, t -> n_chars > t)) AS b
      |       FROM d CROSS JOIN tarr),
      |bs AS (SELECT source, b, count(*) AS c FROM bk GROUP BY 1, 2),
      |bb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM bs GROUP BY 1),
      |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM bs GROUP BY 1),
      |at AS (SELECT CAST(sum(cb) AS BIGINT) AS n FROM bb),
      |sp AS (SELECT st.source, g.b FROM st CROSS JOIN (SELECT unnest(range(1, 11)) AS b) g),
      |tm AS (SELECT sp.source, st.ns,
      |    CAST((CAST(coalesce(bs.c, 0) + 1 AS DOUBLE) / (st.ns + 10)
      |          - CAST((bb.cb - coalesce(bs.c, 0)) + 1 AS DOUBLE) / ((at.n - st.ns) + 10))
      |      * ln((CAST(coalesce(bs.c, 0) + 1 AS DOUBLE) / (st.ns + 10))
      |           / (CAST((bb.cb - coalesce(bs.c, 0)) + 1 AS DOUBLE) / ((at.n - st.ns) + 10)))
      |      AS DECIMAL(18,6)) AS term
      |  FROM sp
      |  LEFT JOIN bs ON sp.source = bs.source AND sp.b = bs.b
      |  JOIN bb ON sp.b = bb.b
      |  JOIN st ON sp.source = st.source
      |  CROSS JOIN at)
      |SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
      |  CAST(CAST(sum(term) AS DECIMAL(18,6)) AS DOUBLE) AS psi
      |FROM tm GROUP BY source ORDER BY source""".stripMargin

  // ----------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_psi_drift"       -> (q122PsiDrift _),
    "q119_zipf_fit"        -> (q119ZipfFit _),
    "q102_weighted_sample" -> (q102WeightedSample _),
    "q98_split_leakage"    -> (q98SplitLeakage _),
    "q64_chunk_plan"       -> (q64ChunkPlan _),
    "q63_shuffle_shards"   -> (q63ShuffleShards _),
    "q62_mixture_shares"   -> (q62MixtureShares _),
    "q53_stratified_sample" -> (q53StratifiedSample _),
    "q15_text_tokens"      -> (q15TextTokens _),
    "q16_text_quality"     -> (q16TextQuality _),
    "q168_readability"     -> (q168Readability _),
    "q17_text_langid"      -> (q17LangId _),
    "q167_langid_eval"     -> (q167LangIdEval _),
    "q18_text_fingerprint" -> (q18Fingerprint _),
    "q50_text_winnow"      -> (q50TextWinnow _),
    "q58_pii_scrub"        -> (q58PiiScrub _),
    "q59_sequence_pack"    -> (q59SequencePack _),
    "q67_quality_gates"    -> (q67QualityGates _),
    "q71_bigram_coverage"  -> (q71BigramCoverage _),
    "q73_vocab_coverage"   -> (q73VocabCoverage _),
    "q74_bigram_lm"        -> (q74BigramLm _),
    "q78_tfidf_keywords"   -> (q78TfidfKeywords _),
    "q79_mixture_weights"  -> (q79MixtureWeights _),
    "q176_dsir_weights"    -> (q176DsirWeights _),
    "q177_ppl_prune_curve" -> (q177PplPruneCurve _),
    "q180_doremi_weights"  -> (q180DoremiWeights _),
    "q181_epoch_allocation" -> (q181EpochAllocation _),
    "q182_ngram_novelty"   -> (q182NgramNovelty _),
    "q184_kneser_ney"      -> (q184KneserNey _),
    "q189_mixed_lang"      -> (q189MixedLang _),
    "q190_source_quantile_gate" -> (q190SourceQuantileGate _),
    "q211_sketch_decile_gate" -> (q211SketchDecileGate _),
    "q193_packing_curve"   -> (q193PackingCurve _),
    "q194_source_datasheet" -> (q194SourceDatasheet _),
    "q197_filter_funnel"   -> (q197FilterFunnel _),
    "q80_jsonl_export"     -> (q80JsonlExport _),
    "q82_length_histogram" -> (q82LengthHistogram _),
    "q86_lang_entropy"     -> (q86LangEntropy _),
    "q90_jsonl_roundtrip"  -> (q90JsonlRoundtrip _),
    "q91_mixture_expand"   -> (q91MixtureExpand _))

  val oracleSql: Map[String, String] = Map(
    "q122_psi_drift"       -> q122Sql,
    "q119_zipf_fit"        -> q119Sql,
    "q102_weighted_sample" -> q102Sql,
    "q98_split_leakage"    -> q98Sql,
    "q64_chunk_plan"       -> q64Sql,
    "q63_shuffle_shards"   -> q63Sql,
    "q62_mixture_shares"   -> q62Sql,
    "q53_stratified_sample" -> q53Sql,
    "q15_text_tokens"      -> q15Sql,
    "q16_text_quality"     -> q16Sql,
    "q168_readability"     -> q168Sql,
    "q17_text_langid"      -> q17Sql,
    "q167_langid_eval"     -> q167Sql,
    "q18_text_fingerprint" -> q18Sql,
    "q50_text_winnow"      -> q50Sql,
    "q58_pii_scrub"        -> q58Sql,
    "q59_sequence_pack"    -> q59Sql,
    "q67_quality_gates"    -> q67Sql,
    "q71_bigram_coverage"  -> q71Sql,
    "q73_vocab_coverage"   -> q73Sql,
    "q74_bigram_lm"        -> q74Sql,
    "q78_tfidf_keywords"   -> q78Sql,
    "q79_mixture_weights"  -> q79Sql,
    "q176_dsir_weights"    -> q176Sql,
    "q177_ppl_prune_curve" -> q177Sql,
    "q180_doremi_weights"  -> q180Sql,
    "q181_epoch_allocation" -> q181Sql,
    "q182_ngram_novelty"   -> q182Sql,
    "q184_kneser_ney"      -> q184Sql,
    "q189_mixed_lang"      -> q189Sql,
    "q190_source_quantile_gate" -> q190Sql,
    "q211_sketch_decile_gate" -> q211Sql,
    "q193_packing_curve"   -> q193Sql,
    "q194_source_datasheet" -> q194Sql,
    "q197_filter_funnel"   -> q197Sql,
    "q80_jsonl_export"     -> q80Sql,
    "q82_length_histogram" -> q82Sql,
    "q86_lang_entropy"     -> q86Sql,
    "q90_jsonl_roundtrip"  -> q90Sql,
    "q91_mixture_expand"   -> q91Sql)
}
