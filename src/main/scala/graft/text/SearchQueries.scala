package graft.text

import graft.sql.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Ranked keyword retrieval over the `documents` table: Okapi BM25
  * (k1 = 1.2, b = 0.75) for a fixed conjunctive term set, top-k by score.
  *
  * Scale shape (100 TB): two narrow passes over the corpus —
  *   1. a per-document (dl, tf_t…) projection folded into ONE global
  *      aggregate row (N, Σdl, df_t…); the fold is map-side partial, the
  *      shuffle carries one row per partition;
  *   2. the same projection re-scanned and scored against the broadcast
  *      stats row (a 1-row broadcast nested-loop join — free), then a
  *      global top-k (TakeOrdered, no full sort).
  * Re-scanning beats materializing the tokenized corpus: the token kernel
  * is cheap and the intermediate would be corpus-sized.
  *
  * Cross-engine float parity: `ln` is NOT bit-stable between the JVM and
  * DuckDB (measured 1 ulp off for 1/500 idf arguments), so each per-term
  * score is rounded through DECIMAL(18,6) before the terms are summed —
  * decimal addition is exact in both engines, and the final
  * decimal→double cast is correctly rounded in both. Ranking compares the
  * rounded decimal, so order is deterministic too.
  */
object SearchQueries {
  import TextOps._

  /** Fixed query term set: one rare term ('dup', df≈5% — high idf) and
    * four common ones, so scores exercise both idf regimes. */
  private val Terms = Seq("dup", "spark", "vector", "merge", "key")
  private val TopK  = 20

  def q66Bm25(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(normText(col("text")))
    def base = Tables(spark, dir).documents.select(
      col("doc_id") +: size(toks).cast(LongType).as("dl") +:
        Terms.map(t => size(filter(toks, x => x === t)).cast(LongType).as(s"tf_$t")): _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sum_dl") +:
        Terms.map(t => count(when(col(s"tf_$t") > 0, 1)).as(s"df_$t")): _*)
    def scoreT(t: String): Column = {
      val tf  = col(s"tf_$t").cast(DoubleType)
      val dfc = col(s"df_$t").cast(DoubleType)
      val idf = log((col("n").cast(DoubleType) - dfc + lit(0.5)) / (dfc + lit(0.5)) + lit(1.0))
      val tfc = (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) / col("avgdl")))
      (idf * tfc).cast(DecimalType(18, 6))
    }
    val scoreDec = Terms.map(scoreT).reduce(_ + _)
    base
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast(DoubleType) / col("n"))
      .withColumn("score_dec", scoreDec)
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(TopK)
      .select(col("doc_id"), col("dl"), col("score_dec").cast(DoubleType).as("score"))
  }

  val q66Sql: String = {
    val toksSql = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
    val tfCols = Terms
      .map(t => s"CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n|  ")
    val dfCols = Terms
      .map(t => s"count(CASE WHEN tf_$t > 0 THEN 1 END) AS df_$t")
      .mkString(", ")
    def scoreSql(t: String): String =
      s"""CAST(ln((CAST(n AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)
         | * ((CAST(tf_$t AS DOUBLE) * 2.2)
         |    / (CAST(tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
         | AS DECIMAL(18,6))""".stripMargin
    val sCols = Terms.map(t => s"${scoreSql(t)} AS s_$t").mkString(",\n|")
    val sSum  = Terms.map(t => s"s_$t").mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
       |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       |  $tfCols
       |  FROM tk),
       |stats AS (SELECT count(*) AS n, sum(dl) AS sum_dl, $dfCols FROM base),
       |j AS (SELECT base.*, stats.*, CAST(sum_dl AS DOUBLE) / n AS avgdl FROM base, stats),
       |s AS (SELECT doc_id, dl,
       |$sCols
       |FROM j)
       |SELECT doc_id, dl, CAST($sSum AS DOUBLE) AS score
       |FROM s ORDER BY $sSum DESC, doc_id LIMIT $TopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q66_bm25_search" -> (q66Bm25 _))

  val oracleSql: Map[String, String] =
    Map("q66_bm25_search" -> q66Sql)
}
