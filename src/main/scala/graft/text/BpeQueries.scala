package graft.text

import graft.sql.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Byte-pair-encoding merge learning over the document corpus — the
  * tokenizer-TRAINING operator (Sennrich et al., ACL 2016): the first
  * [[BpeQueries.MergeRounds]] merge rules a BPE tokenizer would learn,
  * each round picking the globally most frequent adjacent symbol pair
  * (occurrence-weighted) and fusing it corpus-wide. q73/q74 consume a
  * tokenizer's output; this card is how the tokenizer itself is built —
  * the piece of an LLM data pipeline that turns a curated corpus into a
  * vocabulary.
  */
object BpeQueries {

  /** Merge rounds learned (each = one argmax + one corpus-wide fuse). */
  val MergeRounds = 3

  /** Words longer than this are excluded (fan-out guard on the per-word
    * symbol explode — production BPE trainers cap or pre-split rare
    * monster tokens the same way; mirrored in the oracle). */
  val MaxWordLen = 24

  // ---------------------------------------------------------------- q157
  /** The learned merge table: (merge_rank, sym_a, sym_b, merged,
    * pair_count) for rounds 1…[[MergeRounds]].
    *
    * 100 TB shape: ONE corpus scan explodes alpha words and collapses
    * them to the DISTINCT-WORD frame with occurrence counts (map-side
    * combinable; vocabulary cardinality is Zipf-bounded — q73's
    * argument). Every merge round then runs on that word-cardinality
    * frame, never on corpus rows: adjacent-pair counts explode locally
    * from each word's symbol sequence (bounded by [[MaxWordLen]]),
    * map-side combine to ≤ symbol² rows, and the round's winner is a
    * 1-row argmax whose two symbols ferry to the driver as bounded
    * scalars (the pageRank-`n` rule). The fuse is a narrow projection
    * over the word frame, `localCheckpoint`ed per round so round k+1
    * reads materialized vocabulary, not a growing lineage (the
    * connectedComponents rule). This word-collapse schedule is exactly
    * how corpus-scale BPE trainers are built.
    *
    * Parity: counts are exact integers; the winner's total order
    * (count DESC, sym_a, sym_b) is engine-independent; the fuse is pure
    * literal string surgery — the boundary-safe space-doubling device
    * makes `replace`'s left-to-right non-overlapping scan implement the
    * greedy leftmost BPE application identically in the JVM and DuckDB
    * (" a  b " can never match across a symbol boundary, and adjacent
    * occurrences never share a separator). Nothing floats. */
  /** The shared trainer loop: the word-frequency collapse per merge
    * stage (index 0 = pre-merge … [[MergeRounds]] = all merges applied)
    * and the per-round winner frames — q157 formats the winners, q170
    * backtests the stages (the q146/q153 shared-kernel rule). */
  private[text] def trainedStages(spark: SparkSession, dir: String)
      : (Seq[DataFrame], Seq[DataFrame]) = {
    var words = Tables(spark, dir).documents
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
      .filter(length(col("w")) <= MaxWordLen)
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("seq"))
      .groupBy(col("seq")).agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    val stages = Seq.newBuilder[DataFrame]
    stages += words

    val winners = (1 to MergeRounds).map { rank =>
      val syms = split(col("seq"), " ")
      val pairs = transform(
        sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b")))
      val winner = words
        .filter(size(syms) >= 2) // sequence(1, 0) would run DESCENDING
        .select(explode(pairs).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .localCheckpoint(true) // read twice: output row + driver ferry
      // the driver FERRIES the winning pair (two bounded scalars)
      val row = winner.collect()(0)
      val (a, b) = (row.getString(0), row.getString(1))
      // corpus-wide fuse: boundary-safe doubled-space literal replace
      val padded = concat(lit(" "), replace(col("seq"), lit(" "), lit("  ")), lit(" "))
      val fused = trim(replace(
        replace(padded, lit(s" $a  $b "), lit(s" $a$b ")), lit("  "), lit(" ")))
      words = words.select(fused.as("seq"), col("freq")).localCheckpoint(true)
      stages += words
      winner.select(lit(rank).as("merge_rank"), col("a").as("sym_a"),
        col("b").as("sym_b"), concat(col("a"), col("b")).as("merged"),
        col("cnt").as("pair_count"))
    }
    (stages.result(), winners)
  }

  def q157BpeMerges(spark: SparkSession, dir: String): DataFrame =
    trainedStages(spark, dir)._2.reduce(_ unionByName _).orderBy(col("merge_rank"))

  // ---------------------------------------------------------------- q170
  /** BPE compression backtest — what each learned merge actually BOUGHT:
    * per merge stage (0 = characters … [[MergeRounds]] = all merges),
    * vocabulary size, total word occurrences, total TOKENS the corpus
    * encodes to under that stage's rules, tokens-per-word, and the
    * cumulative compression vs the character baseline. The eval card to
    * q157's trainer (q153's backtest pattern): a tokenizer deployment
    * decides its merge budget from exactly this curve.
    *
    * 100 TB shape: reads the trainer's ALREADY-materialized per-stage
    * vocab frames (shared kernel — zero extra corpus passes beyond
    * q157's own); each stage folds to ONE row (token count = Σ freq ×
    * symbols-per-word on the word-cardinality frame). Parity: symbol
    * counts are exact integers (size(split)); tokens_per_word and
    * compression are single IEEE divisions of exact longs. */
  def q170BpeCompression(spark: SparkSession, dir: String): DataFrame = {
    val stages = trainedStages(spark, dir)._1
    val perStage = stages.zipWithIndex.map { case (words, k) =>
      words.agg(
        count(lit(1)).as("vocab_size"),
        sum(col("freq")).as("total_words"),
        sum(col("freq") * size(split(col("seq"), " "))).as("total_tokens"))
        .select(lit(k).as("n_merges"), col("vocab_size"), col("total_words"),
          col("total_tokens"))
    }
    val curve = perStage.reduce(_ unionByName _).localCheckpoint(true)
    val base = curve.filter(col("n_merges") === 0)
      .select(col("total_tokens").as("base_tokens"))
    curve.crossJoin(broadcast(base))
      .select(col("n_merges"), col("vocab_size"), col("total_words"),
        col("total_tokens"),
        (col("total_tokens").cast(DoubleType) / col("total_words").cast(DoubleType))
          .as("tokens_per_word"),
        (col("base_tokens").cast(DoubleType) / col("total_tokens").cast(DoubleType))
          .as("compression"))
      .orderBy(col("n_merges"))
  }

  val q170Sql: String = {
    val stages = (0 to MergeRounds).map(k =>
      s"""SELECT $k AS n_merges, CAST(count(*) AS BIGINT) AS vocab_size,
         |  CAST(sum(freq) AS BIGINT) AS total_words,
         |  CAST(sum(freq * len(string_split(seq, ' '))) AS BIGINT) AS total_tokens
         |FROM w$k""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH w0 AS (
       |  SELECT seq, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
       |    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |    WHERE len(w) <= $MaxWordLen) GROUP BY 1),
       |${(1 to MergeRounds).map(roundSql).mkString(",\n")},
       |curve AS ($stages),
       |b AS (SELECT total_tokens AS base_tokens FROM curve WHERE n_merges = 0)
       |SELECT n_merges, vocab_size, total_words, total_tokens,
       |  CAST(total_tokens AS DOUBLE) / CAST(total_words AS DOUBLE) AS tokens_per_word,
       |  CAST(base_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS compression
       |FROM curve CROSS JOIN b ORDER BY n_merges""".stripMargin
  }

  /** One DuckDB merge round (pairs → winner → fuse) — shared by the
    * q157 and q170 oracles so the trainer chain is literally the same
    * text in both gates. */
  private def roundSql(k: Int): String =
    s"""t${k - 1} AS (SELECT string_split(seq, ' ') AS l, freq FROM w${k - 1}),
       |p$k AS (SELECT l[i] AS a, l[i+1] AS b, sum(freq) AS cnt
       |       FROM t${k - 1}, unnest(generate_series(1, len(t${k - 1}.l) - 1)) AS u(i)
       |       GROUP BY 1, 2),
       |m$k AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM p$k
       |       ORDER BY cnt DESC, a, b LIMIT 1),
       |w$k AS (SELECT trim(replace(replace(' ' || replace(seq, ' ', '  ') || ' ',
       |         ' ' || a || '  ' || b || ' ', ' ' || a || b || ' '), '  ', ' ')) AS seq,
       |         freq
       |       FROM w${k - 1} CROSS JOIN m$k)""".stripMargin

  val q157Sql: String = {
    def round(k: Int): String = roundSql(k)
    val out = (1 to MergeRounds).map(k =>
      s"SELECT $k AS merge_rank, a AS sym_a, b AS sym_b, a || b AS merged, cnt AS pair_count FROM m$k")
      .mkString("\nUNION ALL\n")
    s"""WITH w0 AS (
       |  SELECT seq, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
       |    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |    WHERE len(w) <= $MaxWordLen) GROUP BY 1),
       |${(1 to MergeRounds).map(round).mkString(",\n")}
       |SELECT * FROM ($out) ORDER BY merge_rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q157_bpe_merges" -> (q157BpeMerges _),
      "q170_bpe_compression" -> (q170BpeCompression _))

  val oracleSql: Map[String, String] =
    Map("q157_bpe_merges" -> q157Sql,
      "q170_bpe_compression" -> q170Sql)
}
