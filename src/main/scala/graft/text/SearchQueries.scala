package graft.text

import graft.sql.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Ranked retrieval over the `documents` table: Okapi BM25 (k1 = 1.2,
  * b = 0.75) for a fixed conjunctive term set (q66), and reciprocal-rank
  * fusion of that lexical ranking with a semantic cosine ranking over the
  * document embeddings (q143) — the standard hybrid-search combiner
  * (Cormack, Clarke & Buettcher, SIGIR 2009).
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

  /** The shared BM25 kernel: (doc_id, dl, score_dec DECIMAL(18,6)) for
    * every document — q66 takes its global top-k, q143's lexical arm its
    * top-[[FuseN]]. Both consumers end in a TakeOrdered, so the kernel
    * itself never sorts. */
  private def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
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
  }

  def q66Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25Scored(spark, dir)
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(TopK)
      .select(col("doc_id"), col("dl"), col("score_dec").cast(DoubleType).as("score"))

  /** The q66 scored-documents CTE chain, DuckDB side, ending in a CTE
    * named `s` with (doc_id, dl, s_&lt;term&gt;… DECIMAL(18,6)) — shared by the
    * q66 and q143 oracles so the lexical arithmetic can never diverge. */
  private val bm25CtesSql: String = {
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
    s"""tk AS (SELECT doc_id, $toksSql AS t FROM documents),
       |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       |  $tfCols
       |  FROM tk),
       |stats AS (SELECT count(*) AS n, sum(dl) AS sum_dl, $dfCols FROM base),
       |j AS (SELECT base.*, stats.*, CAST(sum_dl AS DOUBLE) / n AS avgdl FROM base, stats),
       |s AS (SELECT doc_id, dl,
       |$sCols
       |FROM j)""".stripMargin
  }

  private val sSumSql = Terms.map(t => s"s_$t").mkString(" + ")

  val q66Sql: String =
    s"""WITH $bm25CtesSql
       |SELECT doc_id, dl, CAST($sSumSql AS DOUBLE) AS score
       |FROM s ORDER BY $sSumSql DESC, doc_id LIMIT $TopK""".stripMargin

  // ---------------------------------------------------------------- q143
  /** Reciprocal-rank fusion of the BM25 ranking with a semantic cosine
    * ranking (query = the embedding of vec_id [[QueryVec]], corpus = the
    * document embeddings joined on doc_id = vec_id): each arm contributes
    * 1/([[RrfK]] + rank) for its top-[[FuseN]] list, fused scores rank the
    * final top-[[TopK]]. RRF is the rank-only combiner hybrid search
    * deploys when lexical and semantic scores live on incomparable scales
    * — no score normalization, no tuned mixture weight.
    *
    * 100 TB shape: each arm is its existing scale story (BM25 = two
    * narrow corpus passes + TakeOrdered; cosine = a 1-row broadcast query
    * against a corpus scan + TakeOrdered — q24's schedule with one query)
    * and the fusion itself touches only 2×[[FuseN]] rows: rank windows run
    * AFTER the top-N cut, on constant-bounded frames, then one full-outer
    * join on doc_id over those frames. The corpus is scanned twice and
    * never shuffled.
    *
    * Parity: ranks are integers (both arms tie-break on doc_id; the
    * lexical arm orders by the DECIMAL score, the semantic arm by the
    * 4 dp-rounded sim — q24's rule); each RRF term is one IEEE division
    * `1.0/(k+rank)` and the fused score one fixed-shape two-term sum —
    * identical in both engines, no libm anywhere. */
  private val RrfK     = 60
  private val FuseN    = 100
  private val QueryVec = 0

  private def dot(a: Column, b: Column): Column = graft.expr.VecDot.dot(a, b)

  def q143RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val lexTop = bm25Scored(spark, dir)
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(FuseN)
    val lex = lexTop
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score_dec").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    val e = Tables(spark, dir).embeddings
    val qv = e.filter(col("vec_id") === QueryVec)
      .select(col("embedding").as("qv"))
    val sim = dot(col("qv"), col("cv")) /
      (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv"))))
    val semTop = e.select(col("vec_id").as("doc_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(qv))
      .select(col("doc_id"), round(sim, 4).as("sim"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(FuseN)
    val sem = semTop
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("sim").desc, col("doc_id"))))
      .select(col("doc_id"), col("sem_rank"))
    val term: Column => Column = r => coalesce(lit(1.0) / (lit(RrfK) + r.cast(DoubleType)), lit(0.0))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        (term(col("lex_rank")) + term(col("sem_rank"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(TopK)
  }

  val q143Sql: String =
    s"""WITH $bm25CtesSql,
       |lex AS (SELECT doc_id, row_number() OVER (ORDER BY $sSumSql DESC, doc_id) AS lex_rank
       |        FROM s ORDER BY $sSumSql DESC, doc_id LIMIT $FuseN),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = $QueryVec),
       |sims AS (SELECT vec_id AS doc_id,
       |    round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) AS sim
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings), q),
       |sem AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS sem_rank
       |        FROM sims ORDER BY sim DESC, doc_id LIMIT $FuseN),
       |f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
       |        coalesce(1.0 / (CAST($RrfK AS DOUBLE) + CAST(lex_rank AS DOUBLE)), CAST(0.0 AS DOUBLE))
       |          + coalesce(1.0 / (CAST($RrfK AS DOUBLE) + CAST(sem_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf
       |      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, lex_rank, sem_rank, rrf
       |FROM f ORDER BY rrf DESC, doc_id LIMIT $TopK""".stripMargin

  // ---------------------------------------------------------------- q162
  /** Inverted-index BUILD with a varint-delta compression audit — the
    * materialization step between a curated corpus and the q66/q143
    * search layer: per term (df ≥ [[IndexMinDf]]), document frequency,
    * collection frequency, the sorted posting list, and the byte cost of
    * storing it delta+varint-encoded vs raw 8-byte ids (the
    * Zobel–Moffat index-compression ledger). A search stack consumes
    * exactly this artifact; the bytes columns are the capacity-planning
    * numbers an index deployment is sized with.
    *
    * 100 TB shape: one corpus scan explodes tokens and collapses to the
    * (term, doc) posting frame — map-side combinable, the only
    * corpus-sized shuffle, keyed by term so the per-term window and the
    * final fold reuse its partitioning (subset satisfaction). Deltas
    * come from ONE lag window over posting rows (posting-cardinality,
    * term-partitioned — never global); the varint cost is an exact
    * integer CASE ladder (doc-id gaps < 128⁵ here; extend the ladder for
    * wider id spaces). Postings serialize via string_agg/concat_ws —
    * deterministic in both engines because the list is sorted by the
    * window's order. All-integer — nothing floats except the one
    * compression-ratio division.
    *
    * Parity: counts/deltas/byte costs are exact integers; the posting
    * string is the same comma-join of the same sorted ids; ratio =
    * CAST(raw AS DOUBLE)/CAST(delta AS DOUBLE), one IEEE division. */
  private val IndexMinDf = 5

  def q162InvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val postings = d
      .select(col("doc_id"), explode(graft.text.TextOps.tokens(
        graft.text.TextOps.normText(col("text")))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    val withDelta = postings
      // first posting's delta = raw doc_id (gap from an implicit 0 base,
      // the conventional gap coding) — an id sitting exactly on a varint
      // boundary (127, 16383, …) must not pay an extra byte
      .withColumn("delta", coalesce(col("doc_id") - lag(col("doc_id"), 1).over(w),
        col("doc_id")))
      .withColumn("vbytes",
        when(col("delta") < 128L, 1)
          .when(col("delta") < 16384L, 2)
          .when(col("delta") < 2097152L, 3)
          .when(col("delta") < 268435456L, 4)
          .when(col("delta") < 34359738368L, 5)
          .otherwise(6))
    withDelta.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"),
        sum(col("vbytes")).as("bytes_delta"))
      .filter(col("df") >= IndexMinDf)
      .select(col("term"), col("df"), col("cf"), col("postings"),
        col("bytes_delta"), (col("df") * 8).as("bytes_raw"),
        ((col("df") * 8).cast(DoubleType) / col("bytes_delta").cast(DoubleType))
          .as("compression"))
      .orderBy(col("term"))
  }

  val q162Sql: String = {
    val toks =
      s"string_split(lower(trim(regexp_replace(text, '${graft.text.TextOps.WsSql}+', ' ', 'g'))), ' ')"
    s"""WITH p AS (SELECT term, doc_id, count(*) AS tf FROM (
       |    SELECT doc_id, unnest($toks) AS term FROM documents)
       |  GROUP BY 1, 2),
       |wd AS (SELECT term, doc_id, tf,
       |    coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
       |             doc_id) AS delta
       |  FROM p),
       |vb AS (SELECT term, doc_id, tf,
       |    CASE WHEN delta < 128 THEN 1 WHEN delta < 16384 THEN 2
       |         WHEN delta < 2097152 THEN 3 WHEN delta < 268435456 THEN 4
       |         WHEN delta < 34359738368 THEN 5 ELSE 6 END AS vbytes
       |  FROM wd)
       |SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings,
       |  CAST(sum(vbytes) AS BIGINT) AS bytes_delta,
       |  CAST(count(*) * 8 AS BIGINT) AS bytes_raw,
       |  CAST(count(*) * 8 AS DOUBLE) / CAST(sum(vbytes) AS DOUBLE) AS compression
       |FROM vb GROUP BY term HAVING count(*) >= $IndexMinDf
       |ORDER BY term""".stripMargin
  }

  // ---------------------------------------------------------------- q191
  /** Index-BACKED conjunctive retrieval: q162 sized the varint ledger —
    * this card BUILDS it as real bytes and answers a query through it.
    * Every term's posting list packs into two varint blobs
    * ([[graft.expr.Varint]] — doc-id GAPS and in-order term frequencies,
    * Lucene's VInt shape), then the fixed 3-term AND-query is answered
    * entirely FROM the blobs: decode → prefix-sum the gaps back to
    * doc_ids → intersect (count = all terms) → rank by Σtf. The oracle
    * recomputes the answer from RAW documents, so a hash match proves
    * encode → decode → reconstruct ≡ ground truth end to end — the
    * index round trip is load-bearing, not decorative.
    *
    * 100 TB shape: the index build is q162's one corpus explode +
    * (term, doc) fold; blobs pack IN-ROW (codegen'd expressions, no
    * shuffle grows); the query side touches ONLY the query terms' rows —
    * posting decode + prefix sum explode df-bounded rows per term. The
    * in-plan prefix sum is a per-term window over those df-bounded rows
    * (3 partitions here; a production decoder would emit doc_ids
    * directly in the generator). */
  private val QueryTerms = Seq("join", "filter", "window")

  def q191IndexRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val postings = d
      .select(col("doc_id"), explode(graft.text.TextOps.tokens(
        graft.text.TextOps.normText(col("text")))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    // the index frame: per term, sorted (doc_id, tf) packed as two blobs
    val ids = transform(col("ps"), p => p.getField("doc_id"))
    val gaps = zip_with(ids,
      concat(array(lit(0L)), slice(ids, lit(1), size(col("ps")) - 1)),
      (a, b) => a - b)
    val idx = postings
      .groupBy(col("term"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
      .select(col("term"),
        graft.expr.Varint.encode(gaps).as("id_blob"),
        graft.expr.Varint.encode(
          transform(col("ps"), p => p.getField("tf"))).as("tf_blob"))
    // the query side reads ONLY the blobs
    val decoded = idx.filter(col("term").isin(QueryTerms: _*))
      .select(col("term"),
        posexplode(arrays_zip(
          graft.expr.Varint.decode(col("id_blob")).as("gap"),
          graft.expr.Varint.decode(col("tf_blob")).as("tf"))))
      .select(col("term"), col("pos"),
        col("col.gap").as("gap"), col("col.tf").as("tf"))
      .withColumn("doc_id", sum(col("gap")).over(
        Window.partitionBy(col("term")).orderBy(col("pos"))))
    decoded.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("score"))
      .filter(col("n_terms") === QueryTerms.size)
      .select(col("doc_id"), col("score"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast(LongType))
      .orderBy(col("rank"))
  }

  /** Ground truth from RAW documents — matching it proves the blob round
    * trip, not a parallel implementation of the same decode. */
  val q191Sql: String = {
    val toks =
      s"string_split(lower(trim(regexp_replace(text, '${graft.text.TextOps.WsSql}+', ' ', 'g'))), ' ')"
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest($toks) AS term FROM documents)
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |m AS (SELECT doc_id, count(*) AS nt, sum(tf) AS score FROM tf GROUP BY 1)
       |SELECT doc_id, CAST(score AS BIGINT) AS score,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |FROM m WHERE nt = ${QueryTerms.size} ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q66_bm25_search" -> (q66Bm25 _),
      "q143_rrf_fusion" -> (q143RrfFusion _),
      "q162_inverted_index" -> (q162InvertedIndex _),
      "q191_index_retrieval" -> (q191IndexRetrieval _))

  val oracleSql: Map[String, String] =
    Map("q66_bm25_search" -> q66Sql,
      "q143_rrf_fusion" -> q143Sql,
      "q162_inverted_index" -> q162Sql,
      "q191_index_retrieval" -> q191Sql)
}
