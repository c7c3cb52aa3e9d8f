package graft.sim

import graft.sql.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Scale design:
  *   - q24 is the exact baseline: a broadcast of the (small) query set
  *     against the full corpus — one narrow pass per corpus partition, then
  *     a per-query top-k. At 100 TB the corpus never shuffles; only
  *     (qid, cid, sim) survivors do.
  *   - q25 is the scale path: random-hyperplane LSH buckets the corpus so
  *     each query probes L buckets instead of the whole corpus. Hyperplanes
  *     are md5-seeded literals — fully deterministic, no RNG state.
  *   - q26 (all-pairs near-dup) is exact here because the oracle must
  *     reproduce it; at 100 TB the same verify step runs on q25-style
  *     LSH candidates instead of the full cross product.
  *
  * Dot products fold left-to-right in double (float inputs widened
  * exactly), matching DuckDB's `list_dot_product` on `DOUBLE[]`; emitted
  * scores are rounded to 4 dp so last-ulp accumulation differences can't
  * flip the compare, and ranks tie-break on vec_id.
  */
object SimilarityQueries {

  /** Codegen'd dot product (see [[graft.expr.VecDot]]) — same
    * double-widening left-fold as DuckDB `list_dot_product`. */
  private def dot(a: Column, b: Column): Column = graft.expr.VecDot.dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private val simSqlExpr =
    "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"

  // ---------------------------------------------------------------- q24
  /** Exact cosine top-5 for each of the first 20 vectors as queries:
    * broadcast queries × corpus scan, per-query top-k window. */
  private val NumQueries = 20
  private val TopK = 5

  def q24CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val qs = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    corpus.join(broadcast(qs), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  val q24Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
       |s AS (SELECT qid, cid, $simSqlExpr AS sim FROM q, c WHERE cid != qid),
       |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
       |SELECT qid, rank, cid, round(sim, 4) AS sim FROM r WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- q25
  /** LSH-bucketed approximate top-5: L=16 tables × 6 md5-seeded random
    * hyperplanes, with distance-1 MULTIPROBE on the query side — each
    * query also probes the 6 buckets one sign-flip away, which buys the
    * recall of ~7× more tables while the CORPUS still stores exactly one
    * bucket row per table (n×L rows — the side that matters at 100 TB;
    * the probe fan-out rides on the tiny broadcast query set).
    * The bucketing is md5-deterministic, so the oracle ([[q25Sql]])
    * reproduces the FULL contract and the gate is hash-exact; the
    * SimilarityRecallSpec asserts recall@5 ≥ 0.9 against exact q24. */
  private val Tables_ = 16
  private val BitsPerTable = 6
  private val Dim = 64

  /** All table signatures in one kernel pass (plane matrix lives in the
    * expression, not as plan literals) — see [[graft.expr.HyperplaneSigs]]. */
  private def allSigs(v: Column): Column =
    graft.expr.HyperplaneSigs.of(v, Tables_, BitsPerTable, Dim)

  def q25AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    // corpus: exactly one (table, sig) bucket row per table
    def withBuckets(df: DataFrame, vcol: String): DataFrame =
      df.select(col("*"), posexplode(allSigs(col(vcol))).as(Seq("t", "sig")))
    // queries: the exact bucket plus every bucket one sign-flip away
    def withProbes(df: DataFrame, vcol: String): DataFrame =
      df.select(col("*"), posexplode(allSigs(col(vcol))).as(Seq("t", "sig0")))
        .select(col("*"), explode(array((-1 until BitsPerTable).map { b =>
          if (b < 0) col("sig0") else col("sig0").bitwiseXOR(lit(1 << b))
        }: _*)).as("sig"))
        .drop("sig0")
    val corpusBase = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val queryBase = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val corpus = withBuckets(corpusBase.select("cid", "cv"), "cv").select("cid", "t", "sig")
    val qs = withProbes(queryBase.select("qid", "qv"), "qv").select("qid", "t", "sig")
    // dedup candidate IDs first — the shuffle carries (qid, cid) pairs,
    // never vectors; vectors re-attach once per surviving candidate
    val cands = corpus.join(broadcast(qs), Seq("t", "sig"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"))
      .dropDuplicates("qid", "cid")
      .join(corpusBase, "cid")
      .join(broadcast(queryBase), "qid")
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    cands
      .select(col("qid"), col("cid"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** DuckDB mirror of the FULL q25 LSH contract — the same md5-seeded
    * hyperplane matrix ([[graft.expr.HyperplaneSigs.component]]: first 4
    * md5("t:b:d") bytes big-endian as a fraction of 2³² minus 0.5 — the
    * `'0x'||substr(md5,1,8)` cast parses exactly those 4 bytes), the same
    * strict left-fold dot products (`list_reduce` over an in-order list
    * comprehension ≡ the kernel's sequential `acc += v(i)·plane(i)`, so
    * the `acc > 0` sign bit is bit-identical), the same distance-1
    * multiprobe, candidate dedup, and top-5 window. The approximation
    * itself is deterministic, so `hash_match` gates the whole bucketing
    * path; `SimilarityRecallSpec` keeps gating QUALITY (recall@5 ≥ 0.9
    * vs exact q24). */
  val q25Sql: String =
    s"""WITH pl AS (
       |  SELECT t, b, list(comp ORDER BY d) AS plane
       |  FROM (
       |    SELECT tb.t AS t, tb.b AS b, d.range AS d,
       |      CAST(concat('0x', substr(md5(tb.t || ':' || tb.b || ':' || d.range), 1, 8)) AS UBIGINT)
       |        / 4294967296.0 - 0.5 AS comp
       |    FROM (SELECT t.range AS t, b.range AS b FROM range($Tables_) t, range($BitsPerTable) b) tb, range($Dim) d)
       |  GROUP BY t, b),
       |csig AS (
       |  SELECT vec_id AS cid, t, CAST(sum(CASE WHEN acc > 0 THEN (1 << b) ELSE 0 END) AS INT) AS sig
       |  FROM (
       |    SELECT e.vec_id, pl.t, pl.b,
       |      list_reduce(list_prepend(0.0,
       |        [CAST(e.embedding[i+1] AS DOUBLE) * pl.plane[i+1] for i in range(0, $Dim)]),
       |        (a, x) -> a + x) AS acc
       |    FROM embeddings e, pl)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT cid AS qid, t,
       |    CASE WHEN pr.p = -1 THEN sig ELSE xor(sig, CAST(1 << pr.p AS INT)) END AS sig
       |  FROM csig, (SELECT range AS p FROM range(-1, $BitsPerTable)) pr
       |  WHERE cid < $NumQueries),
       |cand AS (
       |  SELECT DISTINCT p.qid, c.cid
       |  FROM csig c JOIN probes p ON c.t = p.t AND c.sig = p.sig
       |  WHERE c.cid <> p.qid),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
       |s AS (
       |  SELECT cand.qid, cand.cid, $simSqlExpr AS sim
       |  FROM cand JOIN q USING (qid) JOIN c USING (cid)),
       |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
       |SELECT qid, rank, cid, round(sim, 4) AS sim FROM r WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Embedding near-duplicate pairs: cosine ≥ 0.4, via [[NearDup.pairs]]'s
    * threshold-dispatched strategy.
    *
    * This query's 0.4 threshold selects the EXACT all-pairs fallback —
    * deliberately: on THIS corpus the true pairs sit at 0.40–0.48 cosine
    * with background pairs just below, where a sign-LSH candidate
    * front-end cannot separate (p_bit ≈ 0.64 vs 0.5 baseline) and the
    * oracle must be reproduced exactly. At the thresholds real near-dup
    * dedup operates (≥ [[NearDup.DispatchThreshold]]) the SAME entry point
    * routes to LSH-banded candidates + exact verify — no cross product —
    * pinned by `NearDupDispatchSpec` on a synthesized high-similarity
    * corpus. */
  private val NearDupThreshold = 0.4

  def q26EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    NearDup.pairs(
      Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding")),
      NearDupThreshold)

  /** Mirrors the engine's normalize-then-dot order exactly (unit vectors
    * first, one dot per pair) so border-line rounding agrees. */
  val q26Sql: String =
    s"""WITH v AS (SELECT vec_id,
       |  list_transform(embedding::DOUBLE[],
       |    x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS u
       |  FROM embeddings),
       |s AS (SELECT a.vec_id AS ida, b.vec_id AS idb, list_dot_product(a.u, b.u) AS sim
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
       |SELECT ida, idb, round(sim, 4) AS sim FROM s WHERE sim >= $NearDupThreshold
       |ORDER BY ida, idb""".stripMargin

  // ---------------------------------------------------------------- q45
  /** IVF (inverted-file) ANN: a coarse quantizer assigns every corpus
    * vector to its nearest of [[IvfLists]] centroid lists; a query scores
    * only the [[IvfProbes]] lists whose centroids are closest (classic
    * IVF-Flat). Centroids are deterministic — the first K corpus vectors
    * refined by two Lloyd iterations computed ONCE driver-side on a tiny
    * sample — so the partition layout is reproducible run to run.
    *
    * Scale shape: corpus assignment is one narrow pass (K small dots per
    * row via [[graft.expr.VecDot]]); each list is a hash-partition key, so
    * at 100 TB the inverted file IS the partitioning and a query touches
    * probes/K of the data. The quantizer is deterministic, so the oracle
    * ([[q45Sql]]) re-derives it and the gate is hash-exact;
    * SimilarityRecallSpec pins recall@5 ≥ 0.9 against exact q24. */
  private val IvfLists = 16
  // these embeddings are near-uniform (little cluster structure), so IVF
  // needs half the lists probed for recall ≥ 0.9; on genuinely clustered
  // embeddings probes << lists is the norm and the ratio is the speedup
  private val IvfProbes = 8
  private val IvfSample = 512

  /** Deterministic coarse quantizer shared by q45 and q185: seed with the
    * first [[IvfLists]] sample vectors, then two Lloyd iterations over a
    * bounded driver-side sample. Extracted so the recall-curve card
    * (q185) audits EXACTLY the centroids production IVF (q45) uses. */
  private def ivfCentroids(spark: SparkSession, dir: String): Seq[(Int, Seq[Double])] = {
    val e = Tables(spark, dir).embeddings
    val sample = e.filter(col("vec_id") < IvfSample)
      .orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var centroids = sample.take(IvfLists)
    for (_ <- 0 until 2) {
      val assign = sample.map { v =>
        centroids.zipWithIndex.minBy { case (c, i) =>
          var d = 0.0; var j = 0
          while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
          (d, i)
        }._2
      }
      centroids = (0 until IvfLists).map { k =>
        val members = sample.zip(assign).collect { case (v, a) if a == k => v }
        if (members.isEmpty) centroids(k)
        else {
          val acc = new Array[Double](members.head.length)
          members.foreach(v => { var j = 0; while (j < v.length) { acc(j) += v(j); j += 1 } })
          acc.map(_ / members.length)
        }
      }.toArray
    }
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
  }

  /** The n closest centroid list-ids for a vector column, in distance
    * order: v·v is constant across centroids so d = c·c − 2·v·c ranks
    * identically; c·c is a plan-time constant. */
  private def nearestIvfLists(
      cents: Seq[(Int, Seq[Double])], v: Column, n: Int): Column = {
    val dists = array(cents.map { case (i, c) =>
      val cc = c.map(x => x * x).sum
      struct(
        (lit(cc) - lit(2.0) * dot(v, typedLit(c))).as("d"),
        lit(i).as("i"))
    }: _*)
    slice(transform(array_sort(dists), s => s.getField("i")), 1, n)
  }

  def q45SimIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val cents = ivfCentroids(spark, dir)
    def nearestLists(v: Column, n: Int): Column = nearestIvfLists(cents, v, n)

    val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("list_id", element_at(nearestLists(col("cv"), 1), 1))
    val qs = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv")))
      .select(col("qid"), col("qv"), col("qn"),
        explode(nearestLists(col("qv"), IvfProbes)).as("list_id"))

    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    corpus.join(broadcast(qs), Seq("list_id"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** DuckDB mirror of the FULL q45 IVF contract. The coarse quantizer is
    * re-derived in SQL exactly as the driver derives it: seeds = first
    * [[IvfLists]] sample vectors in vec_id order, then the two Lloyd
    * iterations UNROLLED as CTE pairs (assign aᵢ / re-center cᵢ). Every
    * float-sensitive step pins the engine's evaluation order — assignment
    * distances and centroid sums are strict left-folds over vec_id- /
    * dim-ordered lists (≡ the driver's sequential loops), means divide by
    * the member count exactly once, empty clusters keep the previous
    * centroid (the `coalesce`), and argmin ties break to the smallest
    * list id — so centroids, list assignment, probe sets, and therefore
    * the candidate set are bit-identical and `hash_match` gates the whole
    * path. `SimilarityRecallSpec` still gates recall quality. */
  /** Shared q45/q185 oracle prefix: quantizer + corpus assignment + the
    * FULL probe ranking (probe_rank = 1…[[IvfLists]]); consumers filter
    * probe_rank down to their probe budget. */
  private val ivfCtesSql: String = {
    // one Lloyd iteration: assign sample → nearest of `prev`, re-center
    def lloyd(assign: String, prev: String, next: String): String =
      s"""$assign AS (
         |  SELECT vec_id, k FROM (
         |    SELECT s.vec_id, $prev.k,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY
         |        list_reduce(list_prepend(0.0,
         |          [(s.v[i+1] - $prev.c[i+1]) * (s.v[i+1] - $prev.c[i+1]) for i in range(0, $Dim)]),
         |          (a, x) -> a + x), $prev.k) AS rn
         |    FROM samp s, $prev)
         |  WHERE rn = 1),
         |$next AS (
         |  SELECT $prev.k, coalesce(m.c, $prev.c) AS c
         |  FROM $prev LEFT JOIN (
         |    SELECT k, list(mean ORDER BY dim) AS c FROM (
         |      SELECT $assign.k, d.range AS dim,
         |        list_reduce(list_prepend(0.0, list(s.v[d.range + 1] ORDER BY s.vec_id)),
         |          (a, x) -> a + x) / count(*) AS mean
         |      FROM $assign JOIN samp s USING (vec_id), range($Dim) d
         |      GROUP BY $assign.k, d.range)
         |    GROUP BY k) m ON $prev.k = m.k)""".stripMargin
    s"""WITH samp AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < $IvfSample),
       |c0 AS (
       |  SELECT rn - 1 AS k, v AS c FROM (
       |    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM samp)
       |  WHERE rn <= $IvfLists),
       |${lloyd("a1", "c0", "c1")},
       |${lloyd("a2", "c1", "c2")},
       |cents AS (
       |  SELECT k, c,
       |    list_reduce(list_prepend(0.0, list_transform(c, x -> x * x)), (a, x) -> a + x) AS cc
       |  FROM c2),
       |cd AS (
       |  SELECT e.vec_id, ct.k,
       |    ct.cc - 2.0 * list_reduce(list_prepend(0.0,
       |      [CAST(e.embedding[i+1] AS DOUBLE) * ct.c[i+1] for i in range(0, $Dim)]),
       |      (a, x) -> a + x) AS d
       |  FROM embeddings e, cents ct),
       |ranked AS (
       |  SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn FROM cd),
       |corpus AS (SELECT vec_id AS cid, k AS list_id FROM ranked WHERE rn = 1),
       |qprobe AS (SELECT vec_id AS qid, k AS list_id, rn AS probe_rank
       |           FROM ranked WHERE vec_id < $NumQueries),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings)""".stripMargin
  }

  val q45Sql: String =
    s"""$ivfCtesSql,
       |s AS (
       |  SELECT qp.qid, co.cid, $simSqlExpr AS sim
       |  FROM corpus co JOIN qprobe qp USING (list_id) JOIN q ON qp.qid = q.qid JOIN c ON co.cid = c.cid
       |  WHERE co.cid <> qp.qid AND qp.probe_rank <= $IvfProbes),
       |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
       |SELECT qid, rank, cid, round(sim, 4) AS sim FROM r WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- q185
  /** IVF recall-vs-nprobe curve (q183's audit pattern applied to q45):
    * for probe budgets 1/2/4/8, recall@[[TopK]] of the production IVF
    * against the exact cosine top-k, plus the fraction of the corpus each
    * budget actually scores — the quality/compute tradeoff curve an ANN
    * deployment picks nprobe from. Uses q45's OWN quantizer and probe
    * ranking ([[ivfCentroids]] / [[nearestIvfLists]] / the shared
    * `qprobe` CTE), so the card measures the production index, not a
    * reimplementation; at nprobe = [[IvfProbes]] the measured recall is
    * exactly q45-vs-q24 agreement (`IvfRecallCurveSpec` pins that
    * identity).
    *
    * 100 TB shape: the corpus never shuffles — centroids and the 20-row
    * query-probe frame broadcast into one candidate join (probe_rank ≤
    * max budget), and each budget's ranking is a window over the
    * ALREADY-bounded candidate frame tagged 4 ways; the exact arm is the
    * same broadcast-queries brute-force scan q24 ships (the audit cost —
    * a production run computes the curve on a query sample). Parity:
    * hits and candidate counts are integers; recall and scan fraction
    * are one int/int IEEE division each. */
  private val IvfProbeGrid = Seq(1, 2, 4, 8)

  def q185IvfRecallCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val cents = ivfCentroids(spark, dir)
    val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("list_id", element_at(nearestIvfLists(cents, col("cv"), 1), 1))
    val queryBase = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val qprobe = queryBase.select(col("qid"), col("qv"), col("qn"),
        posexplode(nearestIvfLists(cents, col("qv"), IvfLists)))
      .withColumnRenamed("col", "list_id")
      .withColumn("probe_rank", col("pos") + 1)
    val sim = dot(col("qv"), col("cv")) / (col("qn") * col("cn"))

    val exTop = corpus.crossJoin(broadcast(queryBase))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), sim.as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("cid"))
    val cand = corpus.join(broadcast(qprobe), Seq("list_id"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), col("probe_rank"), sim.as("sim"))
    val np = spark.range(1).select(
      explode(array(IvfProbeGrid.map(lit): _*)).as("nprobe"))
    val iv = cand.crossJoin(broadcast(np))
      .filter(col("probe_rank") <= col("nprobe"))
    val tops = iv.withColumn("rank", row_number().over(
        Window.partitionBy(col("nprobe"), col("qid"))
          .orderBy(col("sim").desc, col("cid"))))
      .filter(col("rank") <= TopK)
      .select(col("nprobe"), col("qid"), col("cid"))
    val hits = tops.join(exTop, Seq("qid", "cid"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("hits"))
    val scans = iv.groupBy(col("nprobe")).agg(count(lit(1)).as("nscan"))
    val tot = e.agg(count(lit(1)).as("n"))
    np.join(hits, Seq("nprobe"), "left").join(scans, Seq("nprobe"), "left")
      .crossJoin(broadcast(tot))
      .select(col("nprobe"),
        coalesce(col("nscan"), lit(0L)).as("n_candidates"),
        (coalesce(col("hits"), lit(0L)).cast(DoubleType) / (NumQueries * TopK))
          .as("recall_at_k"),
        (coalesce(col("nscan"), lit(0L)).cast(DoubleType) /
          (lit(NumQueries) * (col("n") - 1))).as("scan_frac"))
      .orderBy(col("nprobe"))
  }

  val q185Sql: String =
    s"""$ivfCtesSql,
       |ex0 AS (SELECT q.qid, c.cid, $simSqlExpr AS sim FROM q, c WHERE c.cid <> q.qid),
       |ext AS (SELECT qid, cid FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
       |    FROM ex0) WHERE rank <= $TopK),
       |cand AS (
       |  SELECT qp.qid, co.cid, qp.probe_rank, $simSqlExpr AS sim
       |  FROM corpus co JOIN qprobe qp USING (list_id) JOIN q ON qp.qid = q.qid JOIN c ON co.cid = c.cid
       |  WHERE co.cid <> qp.qid),
       |np AS (SELECT unnest([${IvfProbeGrid.mkString(", ")}]) AS nprobe),
       |iv AS (SELECT np.nprobe, cand.* FROM np JOIN cand ON cand.probe_rank <= np.nprobe),
       |tops AS (SELECT nprobe, qid, cid FROM (
       |    SELECT nprobe, qid, cid,
       |      row_number() OVER (PARTITION BY nprobe, qid ORDER BY sim DESC, cid) AS rank
       |    FROM iv) WHERE rank <= $TopK),
       |hits AS (SELECT nprobe, count(*) AS hits FROM tops JOIN ext USING (qid, cid) GROUP BY 1),
       |scans AS (SELECT nprobe, count(*) AS nscan FROM iv GROUP BY 1),
       |tot AS (SELECT count(*) AS n FROM embeddings)
       |SELECT np.nprobe, CAST(coalesce(nscan, 0) AS BIGINT) AS n_candidates,
       |  CAST(coalesce(hits, 0) AS DOUBLE) / (${NumQueries * TopK}) AS recall_at_k,
       |  CAST(coalesce(nscan, 0) AS DOUBLE) / ($NumQueries * (n - 1)) AS scan_frac
       |FROM np LEFT JOIN hits USING (nprobe) LEFT JOIN scans USING (nprobe) CROSS JOIN tot
       |ORDER BY np.nprobe""".stripMargin

  // ---------------------------------------------------------------- q195
  /** Inter-centroid distance matrix — the cluster-separation map over
    * q68's per-label centroids: Euclidean distance for every label pair,
    * the table that says WHICH classes sit dangerously close in
    * embedding space (confusion risk, label-noise hotspots, merge
    * candidates). Complements q83 (within-cluster dispersion) with the
    * between-cluster half of the separability story, on the SAME
    * fixed-point centroid contract, so the two cards compose into
    * silhouette-style ratios downstream.
    *
    * 100 TB shape: everything after q68's d-key fixed-point fold is
    * label-dimension arithmetic — the centroid frame is labels×d (tiny,
    * broadcast both sides of the pair join), so the card costs ONE
    * corpus pass regardless of label count. Parity: centroids are
    * exact-decimal→double (q68's rule); the squared-distance fold runs
    * in dim order in both engines (array fold ≡ list_reduce) and sqrt
    * is correctly rounded everywhere. */
  def q195CentroidDistances(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        floor(col("x").cast(DoubleType) * lit(FpScale)).cast("decimal(38,0)").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .select(col("label"), col("dim"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))).as("c"))
    val arr = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        s => s.getField("c")).as("v"))
    val dist = sqrt(aggregate(
      zip_with(col("a.v"), col("b.v"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, z) => acc + z))
    arr.as("a").join(arr.as("b"), col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        dist.as("dist"))
      .orderBy(col("label_a"), col("label_b"))
  }

  // lazy: centroidSqlCte initializes later in the object (q68's section)
  lazy val q195Sql: String =
    s"""$centroidSqlCte,
       |arr AS (SELECT label, list(centroid ORDER BY dim) AS v FROM c GROUP BY label)
       |SELECT a.label AS label_a, b.label AS label_b,
       |  sqrt(list_reduce(list_prepend(0.0,
       |    [(a.v[i+1] - b.v[i+1]) * (a.v[i+1] - b.v[i+1]) for i in range(0, len(a.v))]),
       |    (x, y) -> x + y)) AS dist
       |FROM arr a JOIN arr b ON a.label < b.label
       |ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------- q196
  /** Per-label simplified silhouette (Hruschka et al.'s centroid
    * silhouette): per vector, a = distance to its OWN label centroid,
    * b = distance to the NEAREST other centroid, s = (b − a)/max(a, b);
    * per label the mean of each. The separability score that combines
    * q83's within-cluster story and q195's between-cluster matrix into
    * the one number per class a labeling audit reads (s → 1 compact and
    * far, s ≤ 0 overlapping into a neighbor).
    *
    * 100 TB shape: q70's schedule verbatim — the labels×d centroid
    * frame broadcasts as one row, the corpus is scanned ONCE and never
    * shuffled before the label-dimension fold; per-row work is a
    * d-bounded fold per centroid. Parity: distance folds run in dim
    * order on bit-exact centroids (q68's contract), sqrt is correctly
    * rounded everywhere, per-vector a/b/s round through DECIMAL(18,9)
    * (the q74 rule) so the per-label means are exact-sum order-free. */
  def q196Silhouette(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val dists = transform(col("cents"), c => struct(
      aggregate(
        zip_with(col("embedding"), c.getField("carr"),
          (x, cc) => (x.cast(DoubleType) - cc) * (x.cast(DoubleType) - cc)),
        lit(0.0), (acc, z) => acc + z).as("dist2"),
      c.getField("clabel").as("clabel")))
    val a = sqrt(element_at(
      filter(col("ds"), d => d.getField("clabel") === col("label")), 1)
      .getField("dist2"))
    val b = sqrt(array_min(transform(
      filter(col("ds"), d => d.getField("clabel") =!= col("label")),
      d => d.getField("dist2"))))
    val dec = (c: Column) => c.cast(DecimalType(18, 9))
    e.select(col("label"), col("embedding"))
      .crossJoin(broadcast(centroidRow(spark, dir)))
      .withColumn("ds", dists)
      .select(col("label"), dec(a).as("a"), dec(b).as("b"),
        dec((b - a) / greatest(a, b)).as("s"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"), sum(col("s")).as("ss"))
      .select(col("label"), col("n_vectors"),
        (col("sa").cast(DoubleType) / col("n_vectors")).as("mean_a"),
        (col("sb").cast(DoubleType) / col("n_vectors")).as("mean_b"),
        (col("ss").cast(DoubleType) / col("n_vectors")).as("mean_silhouette"))
      .orderBy(col("label"))
  }

  lazy val q196Sql: String =
    s"""$centroidSqlCte,
       |ca AS (SELECT label AS clabel, list(centroid ORDER BY dim) AS carr
       |       FROM c GROUP BY label),
       |d AS (SELECT e.vec_id, e.label, ca.clabel,
       |        list_reduce(list_prepend(0.0,
       |          [(CAST(e.embedding[i+1] AS DOUBLE) - ca.carr[i+1])
       |             * (CAST(e.embedding[i+1] AS DOUBLE) - ca.carr[i+1])
       |           for i in range(0, len(e.embedding))]),
       |          (a, b) -> a + b) AS dist2
       |      FROM embeddings e, ca),
       |v AS (SELECT vec_id, label,
       |        sqrt(min(CASE WHEN clabel = label THEN dist2 END)) AS a,
       |        sqrt(min(CASE WHEN clabel <> label THEN dist2 END)) AS b
       |      FROM d GROUP BY 1, 2),
       |sv AS (SELECT label,
       |        CAST(a AS DECIMAL(18,9)) AS a9, CAST(b AS DECIMAL(18,9)) AS b9,
       |        CAST((b - a) / greatest(a, b) AS DECIMAL(18,9)) AS s9
       |      FROM v)
       |SELECT label, count(*) AS n_vectors,
       |  CAST(sum(a9) AS DOUBLE) / count(*) AS mean_a,
       |  CAST(sum(b9) AS DOUBLE) / count(*) AS mean_b,
       |  CAST(sum(s9) AS DOUBLE) / count(*) AS mean_silhouette
       |FROM sv GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Embedding int8 quantization — the storage-compression step a vector
    * corpus runs before indexing (4× smaller than float32): symmetric
    * per-vector scaling (`scale = max|x| / 127`), quantize with
    * `floor(x/scale + 0.5)` (round-half-up — spelled identically in both
    * engines; `round()` differs between them on halves and Spark `bround`
    * has no cheap DuckDB twin), then the per-vector fidelity report: max
    * absolute reconstruction error and the cosine between the original
    * and the dequantized vector. Narrow per-row pass over MATERIALIZED
    * array columns (each projection step binds its arrays before the next
    * HOF consumes them — interpreted lambdas re-evaluate unmaterialized
    * free subexpressions per element); the quantized corpus itself would
    * carry (scale, int8[64]) instead of float[64]. */
  def q54EmbeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val withV = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val withScale = withV.select(col("vec_id"), col("v"),
      (greatest(aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))), lit(1e-12))
        / 127.0).as("scale"))
    val withDq = withScale.select(col("vec_id"), col("v"), col("scale"),
      transform(col("v"), x => floor(x / col("scale") + 0.5) * col("scale")).as("dq"))
    withDq.select(
        col("vec_id"),
        round(col("scale"), 6).as("scale"),
        round(aggregate(zip_with(col("v"), col("dq"), (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x)), 6).as("max_abs_err"),
        round(dot(col("v"), col("dq")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("dq"), col("dq")))), 4).as("cos_fidelity"))
      .orderBy(col("vec_id"))
  }

  val q54Sql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS scale
      |  FROM v),
      |q AS (SELECT vec_id, v, scale,
      |  list_transform(v, x -> floor(x / scale + 0.5) * scale) AS dq
      |  FROM s)
      |SELECT vec_id, round(scale, 6) AS scale,
      |  round(list_max([abs(v[i] - dq[i]) for i in range(1, len(v) + 1)]), 6) AS max_abs_err,
      |  round(list_dot_product(v, dq)
      |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dq, dq))), 4) AS cos_fidelity
      |FROM q ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Per-label embedding centroids (long form: one row per (label, dim)) —
    * the building block for class prototypes, IVF coarse quantizers, and
    * drift monitoring.
    *
    * Deterministic at ANY scale without sorting: each component is
    * accumulated in FIXED-POINT — `floor(x · 2³⁰)` (the 2³⁰ scaling is a
    * power of two, so the multiply is exact in double) summed as
    * DECIMAL(38,0). Integer addition is associative, so the sum is
    * bit-identical regardless of partitioning or merge order — the
    * reproducibility float summation can't give distributedly. The
    * quantization bias is < 2⁻³⁰ per element, deterministic, and part of
    * the operator's contract. Shuffle carries (label, dim, partial-sum)
    * rows only — map-side combine applies. */
  private val FpScale = 1073741824.0 // 2^30

  def q68EmbeddingCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val ex = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        floor(col("x").cast(DoubleType) * lit(FpScale)).cast("decimal(38,0)").as("q"))
    ex.groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .select(col("label"), col("dim"), col("n"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))).as("centroid"))
      .orderBy(col("label"), col("dim"))
  }

  /** The q68 fixed-point centroid as a CTE chain ending in
    * `c(label, dim, centroid)` — shared by the q68 and q70 oracles. */
  private val centroidSqlCte: String =
    """WITH ex AS (
      |  SELECT label,
      |    unnest([{'d': i, 'q': CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))}
      |            for i in range(0, len(embedding))]) AS u
      |  FROM embeddings),
      |g AS (SELECT label, u.d AS dim, count(*) AS n, sum(u.q) AS s
      |      FROM ex GROUP BY 1, 2),
      |c AS (SELECT label, dim, n,
      |        CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1073741824.0) AS centroid
      |      FROM g)""".stripMargin

  val q68Sql: String =
    s"""$centroidSqlCte
      |SELECT label, dim, n, centroid FROM c ORDER BY label, dim""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Nearest-centroid assignment — the k-means E-step / pseudo-labeling
    * pass: squared distance from every vector to each of q68's per-label
    * centroids, argmin with smallest-label tie-break, plus whether it
    * agrees with the vector's own label.
    *
    * Scale shape: the centroid table is labels × dims (tiny — it
    * BROADCASTS as one array-of-structs row), so the corpus is scanned
    * once, never shuffled; the per-row argmin is `array_min` over a
    * (dist², label) struct array — no window, no per-vector shuffle. The
    * distance fold runs left-to-right over dims in both engines on the
    * bit-exact centroids, so `dist2` itself is compared unrounded. */
  /** q68's centroids folded to ONE broadcastable row
    * `cents: array<struct<clabel, carr>>` — shared by q70 and q96. */
  private def centroidRow(spark: SparkSession, dir: String): DataFrame =
    q68EmbeddingCentroids(spark, dir)
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("dim"), col("centroid")))).as("dc"))
      .select(col("label").as("clabel"),
        transform(col("dc"), x => x.getField("centroid")).as("carr"))
      .agg(sort_array(collect_list(struct(col("clabel"), col("carr")))).as("cents"))

  /** Nearest centroid of `emb` against the broadcast `cents` column:
    * struct(dist2, clabel) argmin with smallest-label tie-break. */
  private def nearestOf(emb: Column): Column =
    array_min(transform(col("cents"), c =>
      struct(
        aggregate(
          zip_with(emb, c.getField("carr"),
            (x, cc) => (x.cast(DoubleType) - cc) * (x.cast(DoubleType) - cc)),
          lit(0.0), (a, b) => a + b).as("dist2"),
        c.getField("clabel").as("clabel"))))

  def q70CentroidAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val best = nearestOf(col("embedding"))
    e.select(col("vec_id"), col("label"), col("embedding"))
      .crossJoin(broadcast(centroidRow(spark, dir)))
      .select(col("vec_id"), col("label"),
        best.getField("clabel").as("nearest_label"),
        best.getField("dist2").as("dist2"))
      .withColumn("correct", col("label") === col("nearest_label"))
      .orderBy(col("vec_id"))
  }

  val q70Sql: String =
    s"""$centroidSqlCte,
      |ca AS (SELECT label AS clabel, list(centroid ORDER BY dim) AS carr
      |       FROM c GROUP BY label),
      |d AS (SELECT e.vec_id, e.label, ca.clabel,
      |        list_reduce(list_prepend(0.0,
      |          [(CAST(e.embedding[i+1] AS DOUBLE) - ca.carr[i+1])
      |             * (CAST(e.embedding[i+1] AS DOUBLE) - ca.carr[i+1])
      |           for i in range(0, len(e.embedding))]),
      |          (a, b) -> a + b) AS dist2
      |      FROM embeddings e, ca),
      |r AS (SELECT vec_id, label, clabel, dist2,
      |        row_number() OVER (PARTITION BY vec_id ORDER BY dist2, clabel) AS rn
      |      FROM d)
      |SELECT vec_id, label, clabel AS nearest_label, dist2,
      |  label = clabel AS correct
      |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q198
  /** Product quantization ADC recall — the memory-compression end of the
    * ANN family (Jégou et al., TPAMI 2011): d=64 splits into M=8
    * subspaces of 8 dims; per subspace a K=16-codeword codebook is
    * trained (deterministic hash-seeded init partition → one Lloyd
    * refinement: assign to nearest init centroid, re-average); every
    * vector encodes to 8 code nibbles (4 bytes vs 256 — 64× compression);
    * queries rank the corpus by ASYMMETRIC DISTANCE (ADC): per query a
    * tiny (M×K) table of query-subvector-to-codeword distances, approx
    * dist = Σ_sub table[sub, code] — 8 lookups per corpus vector, no
    * float math against the corpus at all. Output: per query, overlap of
    * ADC top-10 with exact L2 top-10 (raw ADC recall), AND the deployed
    * two-stage path — ADC top-100 shortlist fetched and exact-reranked —
    * whose recall is what a PQ store actually serves. Completes the path
    * brute (q24) → LSH (q25) → IVF (q45/q185) → PQ.
    *
    * 100 TB shape: codebook training is two corpus scans folding onto
    * (sub, code, ld) ≤ 1024 keys with map-side combine (q68's
    * fixed-point device, exact decimal sums); assignment/encoding scans
    * join only the BROADCAST 1024-double codebook; the ADC pass touches
    * 4-byte codes, never the vectors — the property that lets a corpus
    * 64× larger than RAM serve ANN. The exact-L2 side exists to GATE the
    * estimator (audit-scale; production keeps only codes + codebook).
    * Parity: every distance fold quantizes each squared-diff term to
    * integer 1e-12 units via floor(t·10¹² + 0.5) on bit-identical
    * doubles and sums LONGS — order-free, no cross-engine double→decimal
    * path (the q177 rule); argmins tie-break on code/vec_id; centroid
    * doubles come from exact fixed-point sums (q68). Empty codebook
    * cells (an init partition or Lloyd cell receiving no vectors) simply
    * vanish from the broadcast table in BOTH engines — fewer codewords,
    * same contract. */
  private val PqM = 8
  private val PqSubDim = 8 // = Dim / PqM
  private val PqK = 16
  private val PqTopK = 10
  private val PqShortlist = 100 // ADC candidates fetched for exact rerank

  /** (vec_id, xs: array<double>) — the PQ family's array-form corpus
    * frame. Distance passes (assignment, ADC tables, the exact-L2 gate)
    * run directly on these arrays via the codegen'd [[graft.expr.QuantL2]]
    * fold instead of exploding to one row per dimension: the exploded
    * spelling pays a 64× row blow-up plus an exchange + hash-aggregate
    * per distance pass, all to compute sums that are order-free exact
    * longs either way (r16; measured q198 6.9 → and q199 7.9 → see
    * OPTIMIZATION_r16.md). The exploded frame survives only where it is
    * the right shape: the ≤1024-key codebook-averaging folds. */
  private def pqVecs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("xs"))

  /** (vec_id, sub, ld, x, q): the subspace-exploded frame DERIVED from an
    * array-form (vec_id, xs) frame — feeds the fixed-point codebook
    * folds. Same values as the historical direct explode: posexplode
    * position IS the dimension. */
  private def pqExplodedOf(va: DataFrame): DataFrame =
    va.select(col("vec_id"), posexplode(col("xs")).as(Seq("dim", "x")))
      .select(col("vec_id"),
        floor(col("dim") / lit(PqSubDim.toDouble)).cast("int").as("sub"),
        pmod(col("dim"), lit(PqSubDim)).as("ld"),
        col("x"),
        floor(col("x") * lit(FpScale)).cast("decimal(38,0)").as("q"))

  /** Per-subspace slices of an array-form frame: every column of `df`
    * except `xs`, plus (sub, sv: array<double>[PqSubDim]). */
  private def pqSubVecs(df: DataFrame): DataFrame =
    df.select(col("*"),
      posexplode(transform(sequence(lit(0), lit(PqM - 1)),
        s => slice(col("xs"), s * lit(PqSubDim) + lit(1), lit(PqSubDim))))
        .as(Seq("sub", "sv")))
      .drop("xs")

  /** Squared-diff term as integer 1e-12 units (order-free long sums). */
  private def pqTerm(a: Column, b: Column): Column =
    floor((a - b) * (a - b) * lit(1.0e12) + lit(0.5))

  /** (sub, code, ld, cent) codebook → (sub, code, cv: array<double>) with
    * cv ordered by ld. A populated (sub, code) cell always carries ALL
    * [[PqSubDim]] lds (every assigned vector contributes every ld), so
    * empty cells vanish whole — the same contract as the join-based
    * spelling. ld is unique per (sub, code), so the struct sort is a
    * total order and the collect order cannot leak in. */
  private def pqCbArr(cb: DataFrame): DataFrame =
    cb.groupBy(col("sub"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("ld"), col("cent")))),
        s => s.getField("cent")).as("cv"))

  /** Nearest-codeword assignment, array-native: per (vec, sub) argmin of
    * the quantized distance over the broadcast ≤[[PqK]]-codeword
    * codebook. min_by on struct(dp, code) is the row_number(dp, code)
    * tie-break — total because codes are unique within a group. */
  private def pqAssignArr(sub8: DataFrame, cbArr: DataFrame): DataFrame =
    sub8.join(broadcast(cbArr), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"),
        graft.expr.QuantL2.of(col("sv"), col("cv")).as("dp"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), struct(col("dp"), col("code"))).as("code"))

  /** (sub, code, ld, cent) centroids of an assignment (exact fixed-point). */
  private def pqCodebook(ex: DataFrame, assign: DataFrame): DataFrame =
    ex.join(assign, Seq("vec_id", "sub"))
      .groupBy(col("sub"), col("code"), col("ld"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .select(col("sub"), col("code"), col("ld"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))).as("cent"))

  def q198PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val va = pqVecs(spark, dir).localCheckpoint(true) // read by every pass
    val ex = pqExplodedOf(va)       // codebook-averaging folds only
    val sub8 = pqSubVecs(va)        // assignment/encode slices
    val init = ex.withColumn("code",
      (graft.text.TextOps.hex60(concat(lit("pq:"), col("vec_id").cast("string"))) % PqK)
        .cast("int"))
    val cb0 = init.groupBy(col("sub"), col("code"), col("ld"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .select(col("sub"), col("code"), col("ld"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))).as("cent"))
    val cb1 = pqCodebook(ex, pqAssignArr(sub8, pqCbArr(cb0)))
      .localCheckpoint(true) // encode + ADC
    val cb1Arr = pqCbArr(cb1)
    val codes = pqAssignArr(sub8, cb1Arr)
    val qsub8 = pqSubVecs(va.filter(col("vec_id") < NumQueries)
      .withColumnRenamed("vec_id", "qid"))
    // per-query ADC lookup table: one quantized distance per (sub, code),
    // computed directly on the 8-dim slices (no per-ld fold needed)
    val adc = qsub8.join(broadcast(cb1Arr), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"),
        graft.expr.QuantL2.of(col("sv"), col("cv")).as("adp"))
    val approxAll = codes.join(broadcast(adc), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id")).agg(sum(col("adp")).as("ap"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ap"), col("vec_id"))))
      .localCheckpoint(true) // read twice: raw ADC top-k + rerank shortlist
    val atop = approxAll.filter(col("rank") <= PqTopK)
    val short = approxAll.filter(col("rank") <= PqShortlist)
    // exact ground truth: corpus arrays × broadcast query arrays, one
    // codegen'd fold per pair — the corpus never explodes or shuffles
    val qv = va.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("xs").as("qxs"))
    val exactAll = va.join(broadcast(qv), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.expr.QuantL2.of(col("xs"), col("qxs")).as("dp"))
      .localCheckpoint(true) // read twice: ground-truth top-k + rerank
    val etop = exactAll
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dp"), col("vec_id"))))
      .filter(col("rank") <= PqTopK)
      .select(col("qid"), col("vec_id"))
    // deployment path: exact distances only on the fetched shortlist
    val rerank = short.select(col("qid"), col("vec_id"))
      .join(exactAll, Seq("qid", "vec_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dp"), col("vec_id"))))
      .filter(col("rank") <= PqTopK)
    def hitsOf(df: DataFrame, as: String): DataFrame =
      df.join(etop, Seq("qid", "vec_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as(as))
    val base = qv.select(col("qid"))
    val perQ = base
      .join(hitsOf(atop, "h_adc"), Seq("qid"), "left")
      .join(hitsOf(rerank, "h_rr"), Seq("qid"), "left")
      .select(col("qid"), coalesce(col("h_adc"), lit(0L)).as("h_adc"),
        coalesce(col("h_rr"), lit(0L)).as("h_rr"))
    val tot = perQ.agg(sum(col("h_adc")).as("ta"), sum(col("h_rr")).as("tr"))
    val denom = lit((NumQueries * PqTopK).toDouble)
    perQ.crossJoin(broadcast(tot))
      .select(col("qid"), col("h_adc").as("n_hits"),
        (col("h_adc").cast(DoubleType) / lit(PqTopK.toDouble)).as("recall_at10"),
        (col("h_rr").cast(DoubleType) / lit(PqTopK.toDouble)).as("recall_rerank"),
        (col("ta").cast(DoubleType) / denom).as("mean_recall"),
        (col("tr").cast(DoubleType) / denom).as("mean_recall_rerank"),
        lit((Dim * 4).toDouble / (PqM * 4 / 8).toDouble).as("compression_x"))
      .orderBy(col("qid"))
  }

  val q198Sql: String = {
    val term = (a: String, b: String) =>
      s"CAST(floor(($a - $b) * ($a - $b) * 1000000000000.0 + 0.5) AS BIGINT)"
    s"""WITH ex AS (SELECT vec_id,
       |    CAST(floor(u.d / $PqSubDim.0) AS INT) AS sub, u.d % $PqSubDim AS ld,
       |    u.x AS x, u.q AS q
       |  FROM (SELECT vec_id,
       |      unnest([{'d': i, 'x': CAST(embedding[i+1] AS DOUBLE),
       |               'q': CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))}
       |             for i in range(0, len(embedding))]) AS u
       |    FROM embeddings)),
       |p0 AS (SELECT vec_id,
       |    CAST(('0x' || substr(md5('pq:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % $PqK AS INT) AS code
       |  FROM embeddings),
       |cb0 AS (SELECT sub, code, ld,
       |    CAST(sum(q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS cent
       |  FROM ex JOIN p0 USING (vec_id) GROUP BY 1, 2, 3),
       |d1 AS (SELECT e.vec_id, e.sub, c.code, sum(${term("e.x", "c.cent")}) AS dp
       |  FROM ex e JOIN cb0 c ON e.sub = c.sub AND e.ld = c.ld GROUP BY 1, 2, 3),
       |a1 AS (SELECT vec_id, sub, code FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dp, code) AS rn FROM d1)
       |  WHERE rn = 1),
       |cb1 AS (SELECT e.sub, a.code, e.ld,
       |    CAST(sum(e.q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS cent
       |  FROM ex e JOIN a1 a ON e.vec_id = a.vec_id AND e.sub = a.sub GROUP BY 1, 2, 3),
       |d2 AS (SELECT e.vec_id, e.sub, c.code, sum(${term("e.x", "c.cent")}) AS dp
       |  FROM ex e JOIN cb1 c ON e.sub = c.sub AND e.ld = c.ld GROUP BY 1, 2, 3),
       |codes AS (SELECT vec_id, sub, code FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dp, code) AS rn FROM d2)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, sub, ld, x AS qx FROM ex WHERE vec_id < $NumQueries),
       |adc AS (SELECT q.qid, c.sub, c.code, sum(${term("q.qx", "c.cent")}) AS adp
       |  FROM qs q JOIN cb1 c ON q.sub = c.sub AND q.ld = c.ld GROUP BY 1, 2, 3),
       |ap AS (SELECT a.qid, co.vec_id, sum(a.adp) AS ap
       |  FROM codes co JOIN adc a ON co.sub = a.sub AND co.code = a.code
       |  WHERE co.vec_id != a.qid GROUP BY 1, 2),
       |ar AS (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY ap, vec_id) AS rank FROM ap),
       |atop AS (SELECT qid, vec_id FROM ar WHERE rank <= $PqTopK),
       |short AS (SELECT qid, vec_id FROM ar WHERE rank <= $PqShortlist),
       |exd AS (SELECT q.qid, e.vec_id, sum(${term("e.x", "q.qx")}) AS dp
       |  FROM ex e JOIN qs q ON e.sub = q.sub AND e.ld = q.ld
       |  WHERE e.vec_id != q.qid GROUP BY 1, 2),
       |etop AS (SELECT qid, vec_id FROM (SELECT *,
       |    row_number() OVER (PARTITION BY qid ORDER BY dp, vec_id) AS rank FROM exd)
       |  WHERE rank <= $PqTopK),
       |rr AS (SELECT qid, vec_id FROM (SELECT s.qid, s.vec_id, x.dp,
       |    row_number() OVER (PARTITION BY s.qid ORDER BY x.dp, s.vec_id) AS rank
       |  FROM short s JOIN exd x ON s.qid = x.qid AND s.vec_id = x.vec_id)
       |  WHERE rank <= $PqTopK),
       |ha AS (SELECT a.qid, count(*) AS h_adc
       |  FROM atop a JOIN etop e ON a.qid = e.qid AND a.vec_id = e.vec_id GROUP BY 1),
       |hr AS (SELECT r.qid, count(*) AS h_rr
       |  FROM rr r JOIN etop e ON r.qid = e.qid AND r.vec_id = e.vec_id GROUP BY 1),
       |pq AS (SELECT qid, coalesce(h_adc, 0) AS h_adc, coalesce(h_rr, 0) AS h_rr
       |  FROM (SELECT DISTINCT qid FROM qs) b
       |  LEFT JOIN ha USING (qid) LEFT JOIN hr USING (qid)),
       |tot AS (SELECT sum(h_adc) AS ta, sum(h_rr) AS tr FROM pq)
       |SELECT qid, CAST(h_adc AS BIGINT) AS n_hits,
       |  CAST(h_adc AS DOUBLE) / $PqTopK.0 AS recall_at10,
       |  CAST(h_rr AS DOUBLE) / $PqTopK.0 AS recall_rerank,
       |  CAST(ta AS DOUBLE) / ${NumQueries * PqTopK}.0 AS mean_recall,
       |  CAST(tr AS DOUBLE) / ${NumQueries * PqTopK}.0 AS mean_recall_rerank,
       |  ${(Dim * 4).toDouble / (PqM * 4 / 8).toDouble} AS compression_x
       |FROM pq CROSS JOIN tot ORDER BY qid""".stripMargin
  }

  // ---------------------------------------------------------------- q199
  /** IVF-PQ residual encoding — q45's inverted lists COMBINED with q198's
    * codes, the way a production vector store (Faiss IVFPQ) actually
    * ships: a coarse quantizer (q68's 10 per-label centroids) assigns
    * every vector to a list; PQ encodes the RESIDUAL x − coarse_centroid
    * (residuals concentrate near 0, so the same 4-bit-per-subspace budget
    * quantizes them finer than raw vectors); a query probes its
    * nprobe=2 nearest lists and ADC-ranks ONLY those lists' members,
    * with a per-(query, probed-list) lookup table built from the query's
    * residual against THAT list's centroid. Output per query: candidates
    * scanned (the IVF selectivity), raw-ADC recall@10 vs the global
    * exact L2 top-10, and the deployed shortlist-rerank recall — the
    * recall/compute/compression operating point the q185 curve and q198
    * card bracket from either side.
    *
    * 100 TB shape: the coarse assign is q70's broadcast-centroid scan;
    * residual codebook training is q198's two ≤1024-key folds; search
    * touches only the probed lists' 4-byte codes (~nprobe/nlists of the
    * corpus) plus a 2×(M×K) per-query table — both the memory AND the
    * scan fraction shrink, which is the entire point of the combination.
    * Parity: identical quantization rules to q198 (squared-diff terms →
    * integer 1e-12 units, exact fixed-point centroid sums, code/label
    * tie-breaks); hash-exact at sf0.01 and sf0.1. */
  private val IvfPqProbes = 2

  def q199IvfPqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val va = pqVecs(spark, dir).localCheckpoint(true) // read by every pass
    // coarse per-label centroids over (sub, ld) — q68's fixed-point
    // device — folded once, then pivoted to dim-ordered arrays (the
    // pqCbArr device: (sub, ld) is unique within a label, every label
    // carries all dims, so the struct sort is total and cells can't
    // reorder). Checkpointed: assign, residuals, and the probe tables
    // all read it, and it is ≤ #labels rows.
    val coarseArr = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("label").as("clabel"),
        floor(col("dim") / lit(PqSubDim.toDouble)).cast("int").as("sub"),
        pmod(col("dim"), lit(PqSubDim)).as("ld"),
        floor(col("xf").cast(DoubleType) * lit(FpScale)).cast("decimal(38,0)").as("q"))
      .groupBy(col("clabel"), col("sub"), col("ld"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .select(col("clabel"), col("sub"), col("ld"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))).as("ccent"))
      .groupBy(col("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("ld"), col("ccent")))),
        s => s.getField("ccent")).as("cs"))
      .localCheckpoint(true)
    // nearest coarse list per vector: corpus arrays × broadcast centroid
    // arrays, one codegen'd quantized fold per (vector, list)
    val coarseD = va.crossJoin(broadcast(coarseArr))
      .select(col("vec_id"), col("clabel"),
        graft.expr.QuantL2.of(col("xs"), col("cs")).as("dp"))
      .localCheckpoint(true) // vectors assign (argmin); queries probe (rn<=2)
    val assign = coarseD.groupBy(col("vec_id"))
      .agg(min_by(col("clabel"), struct(col("dp"), col("clabel"))).as("clabel"))
    // residual frame: r = x − ccent of the OWN list (array form)
    val res = va.join(assign, Seq("vec_id"))
      .join(broadcast(coarseArr), Seq("clabel"))
      .select(col("vec_id"), col("clabel"),
        zip_with(col("xs"), col("cs"), (a, b) => a - b).as("xs"))
      .localCheckpoint(true)
    val rex = pqExplodedOf(res.select(col("vec_id"), col("xs")))
    val rsub8 = pqSubVecs(res.select(col("vec_id"), col("xs")))
    val init = rex.withColumn("code",
      (graft.text.TextOps.hex60(concat(lit("pq:"), col("vec_id").cast("string"))) % PqK)
        .cast("int"))
    val cb0 = init.groupBy(col("sub"), col("code"), col("ld"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .select(col("sub"), col("code"), col("ld"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))).as("cent"))
    val cb1 = pqCodebook(rex, pqAssignArr(rsub8, pqCbArr(cb0))).localCheckpoint(true)
    val cb1Arr = pqCbArr(cb1)
    val codes = pqAssignArr(rsub8, cb1Arr).join(assign, Seq("vec_id"))
    // query side: probe the 2 nearest lists, table per (qid, list) —
    // the query's residual against THAT list's centroid, sliced to
    // subspaces, one quantized fold per (sub, code)
    val probes = coarseD.filter(col("vec_id") < NumQueries)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dp"), col("clabel"))))
      .filter(col("rn") <= IvfPqProbes)
      .select(col("vec_id").as("qid"), col("clabel"))
    val qv = va.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("xs"))
    val qres = probes.join(qv, Seq("qid"))
      .join(broadcast(coarseArr), Seq("clabel"))
      .select(col("qid"), col("clabel"),
        zip_with(col("xs"), col("cs"), (a, b) => a - b).as("xs"))
    val adc = pqSubVecs(qres).join(broadcast(cb1Arr), Seq("sub"))
      .select(col("qid"), col("clabel"), col("sub"), col("code"),
        graft.expr.QuantL2.of(col("sv"), col("cv")).as("adp"))
    // candidates = members of probed lists; ADC over their codes
    val approxAll = codes.join(broadcast(adc), Seq("clabel", "sub", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id")).agg(sum(col("adp")).as("ap"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ap"), col("vec_id"))))
      .localCheckpoint(true) // top-k, shortlist, and the candidate count
    val nCand = approxAll.groupBy(col("qid")).agg(count(lit(1)).as("n_cand"))
    val atop = approxAll.filter(col("rank") <= PqTopK)
    val short = approxAll.filter(col("rank") <= PqShortlist)
    // exact ground truth on the arrays (the q198 device)
    val qvx = qv.withColumnRenamed("xs", "qxs")
    val exactAll = va.join(broadcast(qvx), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.expr.QuantL2.of(col("xs"), col("qxs")).as("dp"))
      .localCheckpoint(true)
    val etop = exactAll
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dp"), col("vec_id"))))
      .filter(col("rank") <= PqTopK)
      .select(col("qid"), col("vec_id"))
    val rerank = short.select(col("qid"), col("vec_id"))
      .join(exactAll, Seq("qid", "vec_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dp"), col("vec_id"))))
      .filter(col("rank") <= PqTopK)
    def hitsOf(df: DataFrame, as: String): DataFrame =
      df.join(etop, Seq("qid", "vec_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as(as))
    val base = qv.select(col("qid"))
    val perQ = base
      .join(nCand, Seq("qid"), "left")
      .join(hitsOf(atop, "h_adc"), Seq("qid"), "left")
      .join(hitsOf(rerank, "h_rr"), Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("h_adc"), lit(0L)).as("h_adc"),
        coalesce(col("h_rr"), lit(0L)).as("h_rr"))
    val tot = perQ.agg(sum(col("h_adc")).as("ta"), sum(col("h_rr")).as("tr"))
    val denom = lit((NumQueries * PqTopK).toDouble)
    perQ.crossJoin(broadcast(tot))
      .select(col("qid"), col("n_cand"), col("h_adc").as("n_hits"),
        (col("h_adc").cast(DoubleType) / lit(PqTopK.toDouble)).as("recall_at10"),
        (col("h_rr").cast(DoubleType) / lit(PqTopK.toDouble)).as("recall_rerank"),
        (col("ta").cast(DoubleType) / denom).as("mean_recall"),
        (col("tr").cast(DoubleType) / denom).as("mean_recall_rerank"),
        lit((Dim * 4).toDouble / (PqM * 4 / 8 + 1).toDouble).as("compression_x"))
      .orderBy(col("qid"))
  }

  val q199Sql: String = {
    val term = (a: String, b: String) =>
      s"CAST(floor(($a - $b) * ($a - $b) * 1000000000000.0 + 0.5) AS BIGINT)"
    s"""WITH ex AS (SELECT vec_id,
       |    CAST(floor(u.d / $PqSubDim.0) AS INT) AS sub, u.d % $PqSubDim AS ld,
       |    u.x AS x, u.q AS q
       |  FROM (SELECT vec_id,
       |      unnest([{'d': i, 'x': CAST(embedding[i+1] AS DOUBLE),
       |               'q': CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))}
       |             for i in range(0, len(embedding))]) AS u
       |    FROM embeddings)),
       |coarse AS (SELECT label AS clabel,
       |    CAST(floor(u.d / $PqSubDim.0) AS INT) AS sub, u.d % $PqSubDim AS ld,
       |    CAST(sum(u.q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS ccent
       |  FROM (SELECT label,
       |      unnest([{'d': i,
       |               'q': CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))}
       |             for i in range(0, len(embedding))]) AS u
       |    FROM embeddings) GROUP BY 1, 2, 3),
       |cd AS (SELECT e.vec_id, c.clabel, sum(${term("e.x", "c.ccent")}) AS dp
       |  FROM ex e JOIN coarse c ON e.sub = c.sub AND e.ld = c.ld GROUP BY 1, 2),
       |asg AS (SELECT vec_id, clabel FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dp, clabel) AS rn FROM cd)
       |  WHERE rn = 1),
       |res AS (SELECT e.vec_id, a.clabel, e.sub, e.ld, e.x - c.ccent AS x,
       |    CAST(floor((e.x - c.ccent) * 1073741824.0) AS DECIMAL(38,0)) AS q
       |  FROM ex e JOIN asg a ON e.vec_id = a.vec_id
       |  JOIN coarse c ON a.clabel = c.clabel AND e.sub = c.sub AND e.ld = c.ld),
       |p0 AS (SELECT vec_id,
       |    CAST(('0x' || substr(md5('pq:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % $PqK AS INT) AS code
       |  FROM embeddings),
       |cb0 AS (SELECT sub, code, ld,
       |    CAST(sum(q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS cent
       |  FROM res JOIN p0 USING (vec_id) GROUP BY 1, 2, 3),
       |d1 AS (SELECT r.vec_id, r.sub, c.code, sum(${term("r.x", "c.cent")}) AS dp
       |  FROM res r JOIN cb0 c ON r.sub = c.sub AND r.ld = c.ld GROUP BY 1, 2, 3),
       |a1 AS (SELECT vec_id, sub, code FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dp, code) AS rn FROM d1)
       |  WHERE rn = 1),
       |cb1 AS (SELECT r.sub, a.code, r.ld,
       |    CAST(sum(r.q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS cent
       |  FROM res r JOIN a1 a ON r.vec_id = a.vec_id AND r.sub = a.sub GROUP BY 1, 2, 3),
       |d2 AS (SELECT r.vec_id, r.sub, c.code, sum(${term("r.x", "c.cent")}) AS dp
       |  FROM res r JOIN cb1 c ON r.sub = c.sub AND r.ld = c.ld GROUP BY 1, 2, 3),
       |codes AS (SELECT k.vec_id, k.sub, k.code, a.clabel
       |  FROM (SELECT vec_id, sub, code FROM (SELECT *,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dp, code) AS rn FROM d2)
       |    WHERE rn = 1) k JOIN asg a ON k.vec_id = a.vec_id),
       |probes AS (SELECT vec_id AS qid, clabel FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dp, clabel) AS rn FROM cd)
       |  WHERE rn <= $IvfPqProbes AND vec_id < $NumQueries),
       |qx AS (SELECT vec_id AS qid, sub, ld, x AS qraw FROM ex WHERE vec_id < $NumQueries),
       |adc AS (SELECT p.qid, p.clabel, b.sub, b.code,
       |    sum(${term("(q.qraw - c.ccent)", "b.cent")}) AS adp
       |  FROM probes p JOIN qx q ON p.qid = q.qid
       |  JOIN coarse c ON p.clabel = c.clabel AND q.sub = c.sub AND q.ld = c.ld
       |  JOIN cb1 b ON q.sub = b.sub AND q.ld = b.ld
       |  GROUP BY 1, 2, 3, 4),
       |ap AS (SELECT a.qid, co.vec_id, sum(a.adp) AS ap
       |  FROM codes co JOIN adc a ON co.clabel = a.clabel AND co.sub = a.sub AND co.code = a.code
       |  WHERE co.vec_id != a.qid GROUP BY 1, 2),
       |ar AS (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY ap, vec_id) AS rank FROM ap),
       |nc AS (SELECT qid, count(*) AS n_cand FROM ap GROUP BY 1),
       |atop AS (SELECT qid, vec_id FROM ar WHERE rank <= $PqTopK),
       |short AS (SELECT qid, vec_id FROM ar WHERE rank <= $PqShortlist),
       |exd AS (SELECT q.qid, e.vec_id, sum(${term("e.x", "q.qx")}) AS dp
       |  FROM ex e JOIN (SELECT vec_id AS qid, sub, ld, x AS qx FROM ex WHERE vec_id < $NumQueries) q
       |    ON e.sub = q.sub AND e.ld = q.ld
       |  WHERE e.vec_id != q.qid GROUP BY 1, 2),
       |etop AS (SELECT qid, vec_id FROM (SELECT *,
       |    row_number() OVER (PARTITION BY qid ORDER BY dp, vec_id) AS rank FROM exd)
       |  WHERE rank <= $PqTopK),
       |rr AS (SELECT qid, vec_id FROM (SELECT s.qid, s.vec_id, x.dp,
       |    row_number() OVER (PARTITION BY s.qid ORDER BY x.dp, s.vec_id) AS rank
       |  FROM short s JOIN exd x ON s.qid = x.qid AND s.vec_id = x.vec_id)
       |  WHERE rank <= $PqTopK),
       |ha AS (SELECT a.qid, count(*) AS h_adc
       |  FROM atop a JOIN etop e ON a.qid = e.qid AND a.vec_id = e.vec_id GROUP BY 1),
       |hr AS (SELECT r.qid, count(*) AS h_rr
       |  FROM rr r JOIN etop e ON r.qid = e.qid AND r.vec_id = e.vec_id GROUP BY 1),
       |pq AS (SELECT qid, coalesce(n_cand, 0) AS n_cand,
       |    coalesce(h_adc, 0) AS h_adc, coalesce(h_rr, 0) AS h_rr
       |  FROM (SELECT DISTINCT vec_id AS qid FROM embeddings WHERE vec_id < $NumQueries) b
       |  LEFT JOIN nc USING (qid) LEFT JOIN ha USING (qid) LEFT JOIN hr USING (qid)),
       |tot AS (SELECT sum(h_adc) AS ta, sum(h_rr) AS tr FROM pq)
       |SELECT qid, CAST(n_cand AS BIGINT) AS n_cand, CAST(h_adc AS BIGINT) AS n_hits,
       |  CAST(h_adc AS DOUBLE) / $PqTopK.0 AS recall_at10,
       |  CAST(h_rr AS DOUBLE) / $PqTopK.0 AS recall_rerank,
       |  CAST(ta AS DOUBLE) / ${NumQueries * PqTopK}.0 AS mean_recall,
       |  CAST(tr AS DOUBLE) / ${NumQueries * PqTopK}.0 AS mean_recall_rerank,
       |  ${(Dim * 4).toDouble / (PqM * 4 / 8 + 1).toDouble} AS compression_x
       |FROM pq CROSS JOIN tot ORDER BY qid""".stripMargin
  }

  // ----------------------------------------------------------------

  // ---------------------------------------------------------------- q83
  /** Per-label dispersion vs separation — the embedding-space quality
    * card (a Davies–Bouldin-flavored diagnostic): within-class variance
    * (trace of the per-dim variances around q68's centroid) against the
    * squared distance to the NEAREST other centroid. ratio ≫ 1 means the
    * classes overlap; drift monitoring watches this per ingest batch.
    *
    * Determinism at any scale, same playbook as q68: per-dim x and x²
    * accumulate in fixed point (DECIMAL(38,0) of floor(x·2³⁰) /
    * floor(x²·2³⁰)), so partial aggregation is associative; per-dim
    * variances then round through DECIMAL(18,12) and decimal-sum into the
    * trace (order-free); centroid separations round per-dim the same way.
    * The label×label separation table is tiny (labels², computed from the
    * bit-exact centroids) and never touches the corpus — one scan total.
    */
  def q83EmbeddingDispersion(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val ex = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        floor(col("x").cast(DoubleType) * lit(FpScale)).cast("decimal(38,0)").as("q"),
        floor(col("x").cast(DoubleType) * col("x").cast(DoubleType) * lit(FpScale))
          .cast("decimal(38,0)").as("q2"))
    val perDim = ex.groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"), sum(col("q2")).as("s2"))
      .select(col("label"), col("dim"), col("n"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale)))
          .as("centroid"),
        (col("s2").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale)) -
          (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))) *
          (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))))
          .as("var_dim"))
    val disp = perDim.groupBy(col("label"))
      .agg(max(col("n")).as("n_vectors"),
        sum(col("var_dim").cast("decimal(18,12)")).as("trace_dec"))
    val sep = perDim.select(col("label").as("la"), col("dim"), col("centroid").as("ca"))
      .join(perDim.select(col("label").as("lb"), col("dim"), col("centroid").as("cb")),
        Seq("dim"))
      .filter(col("la") =!= col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(((col("ca") - col("cb")) * (col("ca") - col("cb")))
        .cast("decimal(18,12)")).as("sep_dec"))
      .groupBy(col("la"))
      .agg(min(col("sep_dec").cast(DoubleType)).as("min_sep2"))
    disp.join(sep, col("label") === col("la"))
      .select(col("label"), col("n_vectors"),
        col("trace_dec").cast(DoubleType).as("trace_var"),
        col("min_sep2"),
        (col("trace_dec").cast(DoubleType) / col("min_sep2")).as("overlap_ratio"))
      .orderBy(col("label"))
  }

  val q83Sql: String =
    """WITH ex AS (
      |  SELECT label,
      |    unnest([{'d': i,
      |             'q':  CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0)),
      |             'q2': CAST(floor(CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))}
      |            for i in range(0, len(embedding))]) AS u
      |  FROM embeddings),
      |g AS (SELECT label, u.d AS dim, count(*) AS n, sum(u.q) AS s, sum(u.q2) AS s2
      |      FROM ex GROUP BY 1, 2),
      |pd AS (SELECT label, dim, n,
      |        CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1073741824.0) AS centroid,
      |        CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1073741824.0) -
      |          (CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1073741824.0)) *
      |          (CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1073741824.0)) AS var_dim
      |      FROM g),
      |disp AS (SELECT label, max(n) AS n_vectors,
      |           sum(CAST(var_dim AS DECIMAL(18,12))) AS trace_dec
      |         FROM pd GROUP BY 1),
      |sep AS (SELECT a.label AS la, min(CAST(sep_dec AS DOUBLE)) AS min_sep2
      |        FROM (SELECT a.label, b.label AS lb,
      |                sum(CAST((a.centroid - b.centroid) * (a.centroid - b.centroid) AS DECIMAL(18,12))) AS sep_dec
      |              FROM pd a JOIN pd b ON a.dim = b.dim AND a.label <> b.label
      |              GROUP BY 1, 2) a
      |        GROUP BY 1)
      |SELECT label, n_vectors, CAST(trace_dec AS DOUBLE) AS trace_var, min_sep2,
      |  CAST(trace_dec AS DOUBLE) / min_sep2 AS overlap_ratio
      |FROM disp JOIN sep ON label = la ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q96
  /** SemDeDup — semantic deduplication the way it ships at corpus scale
    * (Abbas et al. 2023, arXiv:2303.09540): partition the embedding space
    * into clusters, then search for near-duplicate pairs ONLY within each
    * cluster, turning the N² all-pairs cost into Σ|cluster|². Clusters
    * here are q68/q70's deterministic nearest-centroid assignment (a
    * 1-row broadcast, corpus never shuffles to be labeled); within a
    * cluster, unit-vector cosine ≥ [[SemDupThreshold]] marks a duplicate
    * and the deterministic keep rule retains the LOWEST vec_id of each
    * similar pair — one pass, no sequential state, stable under any
    * partitioning (a chain a~b~c may drop both b and c where greedy
    * sequential keeps c; that stricter-but-deterministic contract is
    * documented here and pinned by `SemDedupSpec`).
    *
    * Scale shape: assignment is a broadcast probe (q70's plan); the pair
    * stage is an equi-self-join on the cluster key, so the shuffle
    * carries each unit vector once per side keyed by cluster and the
    * quadratic blow-up is bounded per cluster (k is chosen at deployment
    * so |cluster| ≈ N/k keeps Σ|cluster|² tractable — 100k clusters for
    * 100M docs in the paper). Cross-cluster near-dups are missed BY
    * DESIGN (the paper's approximation); q26 is the exact-global
    * comparison point at the same threshold. */
  private val SemDupThreshold = 0.4 // q26's regime: true pairs sit at 0.40-0.48 here

  /** (vec_id, vlabel, cluster, u): nearest-centroid assignment + unit
    * normalization in ONE narrow pass over the broadcast centroid row,
    * materialized (localCheckpoint) because every caller self-joins it —
    * shared by q96 (SemDeDup) and q99 (1-NN purity). */
  private def clusterAssigned(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label").as("vlabel"),
        col("embedding"), norm(col("embedding")).as("nn"))
      .crossJoin(broadcast(centroidRow(spark, dir)))
      .select(col("vec_id"), col("vlabel"),
        nearestOf(col("embedding")).getField("clabel").as("cluster"),
        transform(col("embedding"), x => x.cast(DoubleType) / col("nn")).as("u"))
      .localCheckpoint(true)

  def q96SemDedup(spark: SparkSession, dir: String): DataFrame = {
    val clustered = clusterAssigned(spark, dir)
    val pairs = clustered.select(col("cluster"), col("vec_id").as("ida"), col("u").as("ua"))
      .join(clustered.select(col("cluster"), col("vec_id").as("idb"), col("u").as("ub")),
        Seq("cluster"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), dot(col("ua"), col("ub")).as("sim"))
      .filter(col("sim") >= SemDupThreshold)
    val drops = pairs
      .groupBy(col("idb").as("vec_id"))
      .agg(count(lit(1)).as("n_smaller_dups"), max(round(col("sim"), 4)).as("max_sim"))
    clustered.select(col("vec_id"), col("cluster"))
      .join(drops, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("n_smaller_dups"), lit(0L)).as("n_smaller_dups"),
        col("max_sim"), // null when no smaller-id duplicate exists
        (coalesce(col("n_smaller_dups"), lit(0L)) === 0).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** The DuckDB mirror of [[clusterAssigned]]: CTE `cl` =
    * (vec_id, vlabel, cluster, u) — shared by q96 and q99. */
  private val clusterSqlCte: String =
    s"""$centroidSqlCte,
       |ca AS (SELECT label AS clabel, list(centroid ORDER BY dim) AS carr
       |       FROM c GROUP BY label),
       |d AS (SELECT e.vec_id, ca.clabel,
       |        list_reduce(list_prepend(0.0,
       |          [(CAST(e.embedding[i+1] AS DOUBLE) - ca.carr[i+1])
       |             * (CAST(e.embedding[i+1] AS DOUBLE) - ca.carr[i+1])
       |           for i in range(0, len(e.embedding))]),
       |          (a, b) -> a + b) AS dist2
       |      FROM embeddings e, ca),
       |r AS (SELECT vec_id, clabel,
       |        row_number() OVER (PARTITION BY vec_id ORDER BY dist2, clabel) AS rn
       |      FROM d),
       |cl AS (SELECT r.vec_id, e.label AS vlabel, r.clabel AS cluster,
       |         list_transform(e.embedding::DOUBLE[],
       |           x -> x / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS u
       |       FROM r JOIN embeddings e ON r.vec_id = e.vec_id WHERE r.rn = 1)""".stripMargin

  val q96Sql: String =
    s"""$clusterSqlCte,
       |p AS (SELECT a.vec_id AS ida, b.vec_id AS idb, list_dot_product(a.u, b.u) AS sim
       |      FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
       |dup AS (SELECT idb AS vec_id, count(*) AS n_smaller_dups, max(round(sim, 4)) AS max_sim
       |      FROM p WHERE sim >= $SemDupThreshold GROUP BY 1)
       |SELECT cl.vec_id, cl.cluster,
       |  CAST(coalesce(dup.n_smaller_dups, 0) AS BIGINT) AS n_smaller_dups,
       |  dup.max_sim,
       |  coalesce(dup.n_smaller_dups, 0) = 0 AS kept
       |FROM cl LEFT JOIN dup ON cl.vec_id = dup.vec_id ORDER BY cl.vec_id""".stripMargin

  // ---------------------------------------------------------------- q99
  /** 1-NN label purity — the label-noise / embedding-quality audit run
    * before trusting labels for curation: for each vector, find its
    * nearest neighbor (cosine) and report, per label, the fraction whose
    * neighbor shares the label. Low purity for a label means its region
    * of embedding space is entangled — the signal that label-conditioned
    * filtering or classifier training on these embeddings will be noisy.
    *
    * The search is cluster-bucketed exactly like q96 (nearest-centroid
    * buckets from the shared [[clusterAssigned]] pass; neighbors are
    * searched only within the vector's own cluster), and the ORACLE
    * implements the same bucketed contract — so the gate is hash-exact on
    * the approximation itself, not on a looser rows-only check. Vectors
    * alone in their cluster have no neighbor and are reported in
    * `n_isolated`, not silently dropped. Similarities round to 6 decimals
    * BEFORE the per-vector argmax (ties then break to the smallest
    * neighbor id) so the winner is bit-stable cross-engine.
    *
    * Scale shape: identical to q96 — broadcast assignment, equi-self-join
    * on the cluster key (Σ|cluster|² bounded per cluster), then a
    * label-cardinality aggregate. The argmax is `max(struct(sim, -id))`,
    * map-side combinable — no per-vector window over the pair stream. */
  def q99NeighborPurity(spark: SparkSession, dir: String): DataFrame = {
    val clustered = clusterAssigned(spark, dir)
    val pairs = clustered
      .select(col("cluster"), col("vec_id").as("ida"), col("vlabel").as("la"), col("u").as("ua"))
      .join(clustered
        .select(col("cluster"), col("vec_id").as("idb"), col("vlabel").as("lb"), col("u").as("ub")),
        Seq("cluster"))
      .filter(col("ida") =!= col("idb"))
      .select(col("ida"), col("la"),
        round(dot(col("ua"), col("ub")), 6).as("sim"), col("idb"), col("lb"))
    val nn1 = pairs.groupBy(col("ida"), col("la"))
      .agg(max(struct(col("sim").as("s"), (-col("idb")).as("nid"), col("lb").as("nlb"))).as("best"))
    val perLabel = nn1.groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        count(when(col("best").getField("nlb") === col("la"), 1)).as("n_pure"))
    val totals = clustered.groupBy(col("vlabel").as("label"))
      .agg(count(lit(1)).as("n_total"))
    perLabel.join(totals, Seq("label"))
      .select(col("label"), col("n_vecs"),
        (col("n_total") - col("n_vecs")).as("n_isolated"), col("n_pure"),
        (col("n_pure").cast(DecimalType(18, 6)) / col("n_vecs"))
          .cast(DecimalType(18, 6)).cast(DoubleType).as("purity"))
      .orderBy(col("label"))
  }

  val q99Sql: String =
    s"""$clusterSqlCte,
       |p AS (SELECT a.vec_id AS ida, a.vlabel AS la, b.vec_id AS idb, b.vlabel AS lb,
       |        round(list_dot_product(a.u, b.u), 6) AS sim
       |      FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
       |r1 AS (SELECT *, row_number() OVER (PARTITION BY ida ORDER BY sim DESC, idb) AS rn
       |       FROM p),
       |n AS (SELECT ida, la, lb FROM r1 WHERE rn = 1),
       |t AS (SELECT vlabel AS label, count(*) AS n_total FROM cl GROUP BY 1),
       |pg AS (SELECT la AS label, count(*) AS n_vecs,
       |        count(CASE WHEN lb = la THEN 1 END) AS n_pure FROM n GROUP BY 1)
       |SELECT label, n_vecs, n_total - n_vecs AS n_isolated, n_pure,
       |  CAST(CAST(CAST(n_pure AS DECIMAL(18,6)) / n_vecs AS DECIMAL(18,6)) AS DOUBLE) AS purity
       |FROM pg JOIN t USING (label) ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q150
  /** Dimension-truncation fidelity (the Matryoshka/MRL deployment
    * question): per query, the top-[[TopK]] cosine neighbor set under the
    * full 64-dim embedding vs under its first [[TruncDims]] dimensions
    * (renormalized), reported as neighbor-set recall. This is the audit a
    * pipeline runs before shipping truncated vectors to cut index memory
    * 2× — recall here is what the cheaper index actually retains.
    *
    * 100 TB shape: exactly two q24 schedules (broadcast query set ×
    * corpus scan + per-query top-k; the corpus never shuffles) — the
    * truncated arm reads the SAME column and slices in-row, no second
    * materialized corpus; the set compare joins two (queries×k)-row
    * frames. Parity: both arms inherit q24's determinism contract (4 dp
    * sim rounding, vec_id tie-breaks); recall is count/k, one division. */
  private val TruncDims = 32

  def q150TruncationRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    def arm(proj: Column => Column, qn: String, cn: String): DataFrame = {
      val corpus = e.select(col("vec_id").as("cid"), proj(col("embedding")).as(cn))
        .withColumn("cnorm", norm(col(cn)))
      val qs = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), proj(col("embedding")).as(qn))
        .withColumn("qnorm", norm(col(qn)))
      val sim = dot(col(qn), col(cn)) / (col("qnorm") * col("cnorm"))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
      corpus.join(broadcast(qs), col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), round(sim, 4).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("cid"))
    }
    val full  = arm(identity, "qv", "cv")
    val trunc = arm(c => slice(c, 1, TruncDims), "qvt", "cvt")
      .withColumnRenamed("qid", "tqid").withColumnRenamed("cid", "tcid")
    full
      .join(trunc, col("qid") === col("tqid") && col("cid") === col("tcid"), "left_outer")
      .groupBy(col("qid"))
      .agg(count(col("tcid")).as("n_overlap"))
      .select(col("qid"), col("n_overlap"),
        (col("n_overlap").cast(DoubleType) / lit(TopK.toDouble)).as("recall"))
      .orderBy(col("qid"))
  }

  val q150Sql: String = {
    def armSql(name: String, qv: String, cv: String): String =
      s"""$name AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
         |    FROM (SELECT qid, cid,
         |            round(list_dot_product($qv, $cv)
         |              / (sqrt(list_dot_product($qv, $qv)) * sqrt(list_dot_product($cv, $cv))), 4) AS sim
         |          FROM q, c WHERE cid != qid))
         |  WHERE rank <= $TopK)""".stripMargin
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
       |             (embedding::DOUBLE[])[1:$TruncDims] AS qvt
       |           FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv,
       |        (embedding::DOUBLE[])[1:$TruncDims] AS cvt
       |      FROM embeddings),
       |${armSql("fl", "qv", "cv")},
       |${armSql("tr", "qvt", "cvt")}
       |SELECT fl.qid, count(tr.cid) AS n_overlap,
       |  CAST(count(tr.cid) AS DOUBLE) / ${TopK.toDouble} AS recall
       |FROM fl LEFT JOIN tr ON fl.qid = tr.qid AND fl.cid = tr.cid
       |GROUP BY fl.qid ORDER BY fl.qid""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q150_truncation_recall" -> (q150TruncationRecall _),
    "q99_neighbor_purity"    -> (q99NeighborPurity _),
    "q96_semdedup"           -> (q96SemDedup _),
    "q83_embedding_dispersion" -> (q83EmbeddingDispersion _),
    "q24_sim_cosine_topk"    -> (q24CosineTopK _),
    "q25_sim_ann_lsh"        -> (q25AnnLsh _),
    "q26_sim_embedding_neardup" -> (q26EmbeddingNearDup _),
    "q45_sim_ivf"            -> (q45SimIvf _),
    "q185_ivf_recall_curve"  -> (q185IvfRecallCurve _),
    "q198_pq_adc"            -> (q198PqAdc _),
    "q199_ivfpq_adc"         -> (q199IvfPqAdc _),
    "q195_centroid_distances" -> (q195CentroidDistances _),
    "q196_silhouette"        -> (q196Silhouette _),
    "q54_embedding_quantize" -> (q54EmbeddingQuantize _),
    "q68_embedding_centroids" -> (q68EmbeddingCentroids _),
    "q70_centroid_assign"    -> (q70CentroidAssign _))

  /** q25/q45 are approximate vs q24's exact answer, but the approximation
    * CONTRACT (bucket assignment + probe set) is deterministic in both
    * engines, so they hash-gate like everything else; recall quality is
    * gated separately by `SimilarityRecallSpec`. */
  val oracleSql: Map[String, String] = Map(
    "q150_truncation_recall" -> q150Sql,
    "q99_neighbor_purity"    -> q99Sql,
    "q96_semdedup"           -> q96Sql,
    "q83_embedding_dispersion" -> q83Sql,
    "q24_sim_cosine_topk"    -> q24Sql,
    "q25_sim_ann_lsh"        -> q25Sql,
    "q45_sim_ivf"            -> q45Sql,
    "q185_ivf_recall_curve"  -> q185Sql,
    "q198_pq_adc"            -> q198Sql,
    "q199_ivfpq_adc"         -> q199Sql,
    "q195_centroid_distances" -> q195Sql,
    "q196_silhouette"        -> q196Sql,
    "q26_sim_embedding_neardup" -> q26Sql,
    "q54_embedding_quantize" -> q54Sql,
    "q68_embedding_centroids" -> q68Sql,
    "q70_centroid_assign"    -> q70Sql)
}
