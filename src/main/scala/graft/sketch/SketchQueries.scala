package graft.sketch

import graft.sql.Tables
import graft.text.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declared sketch queries — the approximate-distinct surface a 100 TB
  * pipeline swaps in where exact `count(distinct)` would shuffle every
  * value: per-group KMV (the custom UDAF, [[KmvSketch]]) beside the
  * exact count it approximates.
  *
  * The KMV estimator is EXACT below k distincts by construction (the
  * sketch simply holds every hash), and DETERMINISTIC above k given the
  * hash set — (k−1)/(kth-smallest/2⁶⁰) — so the DuckDB oracle mirrors
  * BOTH branches (a window over the distinct-hash set picks the kth
  * minimum): the gate is hash-exact at sf0.01 (exact branch) AND at
  * sf0.1, where lang groups exceed k=256 and the estimator branch is
  * the one under test. The error-vs-exact contract (and the HLL++
  * three-way comparison) stays pinned by `KmvSketchSpec`, which drives
  * cardinalities past the sketch size. */
object SketchQueries {

  // ---------------------------------------------------------------- q57
  /** KMV vs exact distinct contents per language. One shuffle of ≤ k
    * longs (KMV state) per group — the shuffle carries sketches, never
    * the per-row content hashes themselves. */
  def q57KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    KmvSketch.register(spark)
    Tables(spark, dir).documents
      .select(col("lang"), hex60(normText(col("text"))).as("h"))
      .groupBy(col("lang"))
      .agg(
        KmvSketch.approxDistinct(col("h")).as("kmv_distinct"),
        countDistinct(col("h")).as("exact_distinct"))
      .orderBy(col("lang"))
  }

  /** The shared hex60(normText(text)) spelling, DuckDB side — built from
    * [[graft.text.TextOps.WsSql]] so the whitespace class can never
    * silently diverge from the Spark-side normText. */
  private val hSql =
    s"('0x' || substr(md5(lower(trim(regexp_replace(text, '${graft.text.TextOps.WsSql}+', ' ', 'g')))), 1, 15))::BIGINT"

  /** The KMV estimate, mirrored in SQL: exact count below k distincts
    * (the sketch holds every hash), else (k−1) / (kth-smallest-hash /
    * 2⁶⁰) — the estimator is DETERMINISTIC given the hash set, so the
    * oracle gates BOTH branches (at sf0.1 the lang groups exceed k and
    * the estimator branch is the one under test). The division order
    * matches [[KmvSketch.KmvAggregator.finish]] exactly: both engines
    * compute 255.0 / (CAST(kth AS DOUBLE) / 2⁶⁰), so the doubles are
    * bit-identical. */
  private def kmvCaseSql(nd: String, kth: String): String =
    s"""CASE WHEN $nd < 256 THEN CAST($nd AS DOUBLE)
       |       ELSE 255.0 / (CAST($kth AS DOUBLE) / 1152921504606846976.0) END""".stripMargin

  val q57Sql: String =
    s"""WITH d AS (SELECT DISTINCT lang, $hSql AS h FROM documents),
       |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
       |             count(*) OVER (PARTITION BY lang) AS nd FROM d),
       |a AS (SELECT lang, max(nd) AS nd,
       |             max(CASE WHEN rn = 256 THEN h END) AS kth FROM r GROUP BY lang)
       |SELECT lang,
       |  ${kmvCaseSql("nd", "kth")} AS kmv_distinct,
       |  nd AS exact_distinct
       |FROM a ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Two-level mergeable-sketch rollup: per-(source, lang) KMV sketch
    * STATES first (the shard sketches a 100 TB pipeline persists next to
    * each ingested shard), then a merge-ONLY re-aggregation to per-lang
    * distinct estimates — the raw rows are touched exactly once, and the
    * second level shuffles ≤ k longs per shard regardless of corpus size.
    * This is the pattern that makes corpus-wide distinct counts cheap to
    * keep fresh: re-sketch only the shards that changed, re-merge the
    * rest from storage.
    *
    * Oracle contract as q57: the two-level cascade equals the one-level
    * sketch (each of the union's k smallest hashes is necessarily within
    * its own shard's k smallest — merge = capped sorted-set union), so
    * the same kth-minimum SQL mirror gates both branches at both SFs.
    * The error contract past k is additionally pinned by `KmvSketchSpec`
    * (which also drives the state/merge cascade past k). The
    * exact_distinct column shares the single hash kernel pass with the
    * sketch level. */
  def q77SketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val hashed = Tables(spark, dir).documents
      .select(col("source"), col("lang"), hex60(normText(col("text"))).as("h"))
    val shard = hashed
      .groupBy(col("source"), col("lang"))
      .agg(KmvSketch.sketchState(col("h")).as("sk"))
    val merged = shard
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_shards"),
        KmvSketch.mergeDistinct(col("sk")).as("kmv_distinct"))
    val exact = hashed.groupBy(col("lang"))
      .agg(countDistinct(col("h")).as("exact_distinct"))
    merged.join(exact, Seq("lang"))
      .select(col("lang"), col("n_shards"), col("kmv_distinct"), col("exact_distinct"))
      .orderBy(col("lang"))
  }

  val q77Sql: String =
    s"""WITH d AS (SELECT DISTINCT lang, $hSql AS h FROM documents),
       |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
       |             count(*) OVER (PARTITION BY lang) AS nd FROM d),
       |a AS (SELECT lang, max(nd) AS nd,
       |             max(CASE WHEN rn = 256 THEN h END) AS kth FROM r GROUP BY lang),
       |sh AS (SELECT lang, count(DISTINCT source) AS n_shards FROM documents GROUP BY lang)
       |SELECT lang, n_shards,
       |  ${kmvCaseSql("nd", "kth")} AS kmv_distinct,
       |  nd AS exact_distinct
       |FROM a JOIN sh USING (lang) ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Rolling 7-day active users (WAU) from DAILY sketches — the canonical
    * mergeable-sketch deployment: a trailing-window distinct is NOT
    * decomposable from per-day exact counts (users repeat across days),
    * so the naive form re-deduplicates raw events per window. Here each
    * day folds once into a ≤k-long KMV state and the trailing window
    * merges 7 STATES per day — the raw corpus is touched once, and the
    * window input is day-cardinality, not event-cardinality. The daily
    * exact DAU rides along from the same single pass.
    *
    * Oracle contract as q57/q77: the per-day-sketch merge equals the
    * one-level sketch of the window's users (capped sorted-set union),
    * so the kth-minimum SQL mirror gates both branches — exact below k,
    * the (k−1)/(kth/2⁶⁰) estimate above it (at sf0.1 every trailing
    * window exceeds k and the estimator branch is the one gated).
    * `KmvSketchSpec`'s cascade test additionally covers the error
    * contract. The global (unpartitioned) day window is deliberate: its
    * input is one row per day. */
  def q88RollingActives(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(to_date(col("ts")).as("day"),
        hex60(col("user_id").cast("string")).as("uh"))
    val daily = e.groupBy(col("day"))
      .agg(countDistinct(col("uh")).as("dau"),
        KmvSketch.sketchState(col("uh")).as("sk"))
      .withColumn("day_i", datediff(col("day"), lit("1970-01-01").cast("date")))
    val trailing = Window.orderBy(col("day_i")).rangeBetween(-6, 0)
    daily
      .withColumn("wau_kmv", KmvSketch.mergeDistinct(col("sk")).over(trailing))
      // day as STRING: pandas renders engine-native dates differently
      // (datetime64 vs date) even when equal — the ISO string is canonical
      .select(col("day").cast("string").as("day"), col("dau"), col("wau_kmv"))
      .orderBy(col("day"))
  }

  private val uhSql = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"

  val q88Sql: String =
    s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, $uhSql AS uh FROM events),
       |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
       |wd AS (SELECT DISTINCT d.day AS day, du.uh
       |      FROM (SELECT DISTINCT day FROM du) d
       |      JOIN du ON du.day BETWEEN d.day - 6 AND d.day),
       |r AS (SELECT day, uh, row_number() OVER (PARTITION BY day ORDER BY uh) AS rn,
       |             count(*) OVER (PARTITION BY day) AS nd FROM wd),
       |a AS (SELECT day, max(nd) AS nd,
       |             max(CASE WHEN rn = 256 THEN uh END) AS kth FROM r GROUP BY day)
       |SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau,
       |  ${kmvCaseSql("a.nd", "a.kth")} AS wau_kmv
       |FROM dau JOIN a ON dau.day = a.day ORDER BY dau.day""".stripMargin

  // ---------------------------------------------------------------- q95
  /** CountMin heavy hitters — token frequency estimated from a FIXED
    * [[CmsRows]]×[[CmsWidth]] counter grid and validated against the exact
    * top-K counts. The sketch build is one narrow pass + a groupBy on
    * (row, cell): hash partial aggregation collapses each map task's
    * output to ≤ rows×width cells, so the shuffle is bounded by the SKETCH
    * size regardless of corpus size — the property that lets a 100 TB scan
    * keep frequency state in kilobytes. Probes reuse the token's existing
    * hex60 hash (shift+mask per row, zero extra hashing — q94's trick) and
    * the estimate is the min over rows, so `n_est ≥ n_exact` always (CMS
    * never undercounts); `overestimate` materializes the collision error
    * the min is there to suppress.
    *
    * The exact side (one shuffle keyed on token) exists to GATE the
    * estimator; at 100 TB the deployment keeps only the grid + a
    * per-partition candidate heap. Width 64 is sized to the gate corpus's
    * vocabulary so collisions are present but sparse — production sizing
    * is w = ⌈e/ε⌉ for an ε·N error bound, still kilobytes at w = 2²⁰. */
  private val CmsWidth = 64
  private val CmsShifts = Seq(0, 15, 30) // 3 rows probed from disjoint hex60 bit ranges
  private val CmsRows = CmsShifts.length
  private val TopK = 20

  def q95HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(explode(tokens(normText(col("text")))).as("tok"))
      .select(col("tok"), hex60(col("tok")).as("h"))
    val cells = CmsShifts.zipWithIndex.map { case (s, r) =>
      struct(lit(r).as("r"), (shiftright(col("h"), s) % CmsWidth).as("p"))
    }
    val counters = toks
      .select(explode(array(cells: _*)).as("rp"))
      .groupBy(col("rp.r").as("r"), col("rp.p").as("p"))
      .agg(count(lit(1)).as("c"))
    val topk = toks.groupBy(col("tok"), col("h"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok")) // token tie-break: deterministic K
      .limit(TopK)
    // probes explode from the ONE top-k subtree — a union of per-row
    // selects would re-run the exact aggregation (and its shuffle) once
    // per sketch row
    val probeCells = CmsShifts.zipWithIndex.map { case (s, r) =>
      struct(lit(r).as("r"), (shiftright(col("h"), s) % CmsWidth).as("p"))
    }
    val probes = topk
      .select(col("tok"), col("n_exact"), explode(array(probeCells: _*)).as("rp"))
      .select(col("tok"), col("n_exact"), col("rp.r").as("r"), col("rp.p").as("p"))
    probes
      .join(broadcast(counters), Seq("r", "p")) // grid is ≤ rows×width cells
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .select(col("tok").as("token"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overestimate"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  private val toksSql =
    s"string_split(lower(trim(regexp_replace(text, '${graft.text.TextOps.WsSql}+', ' ', 'g'))), ' ')"

  val q95Sql: String =
    s"""WITH tk AS (SELECT unnest($toksSql) AS tok FROM documents),
       |ex AS (SELECT tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tk),
       |cnt AS (SELECT r, p, count(*) AS c FROM (
       |  ${CmsShifts.zipWithIndex
            .map { case (s, r) => s"SELECT $r AS r, (h >> $s) % $CmsWidth AS p FROM ex" }
            .mkString("\n  UNION ALL ")}) GROUP BY 1, 2),
       |topk AS (SELECT tok, h, count(*) AS n_exact FROM ex GROUP BY 1, 2
       |         ORDER BY n_exact DESC, tok LIMIT $TopK),
       |probes AS (
       |  ${CmsShifts.zipWithIndex
            .map { case (s, r) =>
              s"SELECT tok, n_exact, $r AS r, (h >> $s) % $CmsWidth AS p FROM topk" }
            .mkString("\n  UNION ALL ")}),
       |est AS (SELECT tok, n_exact, min(c.c) AS n_est
       |        FROM probes JOIN cnt c USING (r, p) GROUP BY 1, 2)
       |SELECT tok AS token, n_exact, n_est, n_est - n_exact AS overestimate
       |FROM est ORDER BY n_exact DESC, token""".stripMargin

  // ---------------------------------------------------------------- q105
  /** Histogram quantile sketch vs exact — completing the sketch family
    * (distinct = KMV q57, frequency = CountMin q95, quantiles = this):
    * per event_type, p50/p95 estimated from a FIXED 128-bin histogram
    * over the global value range, beside the exact discrete percentiles
    * (q39's counts→cumulative-window device) and the estimator error.
    * The histogram is the simplest MERGEABLE quantile state — merging
    * shards is elementwise vector addition, so a 100 TB deployment keeps
    * 128 longs per (shard, group) and re-merges only changed shards
    * (q77's rollup pattern); the shuffle carries bin counts, never
    * values.
    *
    * Everything is deterministic cross-engine by construction: bin
    * arithmetic is IEEE double ops in identical order (no rounding
    * needed), quantile thresholds compare in INTEGER arithmetic
    * (`2·cum ≥ tot`, q39's rule), the estimate is the selected bin's
    * upper edge, and the exact side returns actual data values. The
    * estimate always lands in the same bin as the exact value, so
    * `0 ≤ err < bin width` — pinned by `QuantileSketchSpec`. */
  private val QBins = 128

  def q105QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .filter(col("value").isNotNull).select(col("event_type"), col("value"))
    val bounds = e.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .select(col("lo"), ((col("hi") - col("lo")) / QBins).as("w"))
    val binned = e.crossJoin(broadcast(bounds))
      .select(col("event_type"), col("lo"), col("w"),
        least(floor((col("value") - col("lo")) / col("w")).cast("int"), lit(QBins - 1)).as("bin"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = binned.groupBy(col("event_type"), col("bin"))
      .agg(min(col("lo")).as("lo"), min(col("w")).as("w"), count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cnt")).over(byType))
    val edge = col("lo") + (col("bin") + 1).cast("double") * col("w")
    val est = cum.groupBy(col("event_type"))
      .agg(max(col("tot")).as("n"),
        min(when(col("cum") * 2 >= col("tot"), edge)).as("p50_est"),
        min(when(col("cum") * 20 >= col("tot") * 19, edge)).as("p95_est"))
    val cum2 = e.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cnt")).over(byType))
    val exact = cum2.groupBy(col("event_type"))
      .agg(min(when(col("cum") * 2 >= col("tot"), col("value"))).as("p50_exact"),
        min(when(col("cum") * 20 >= col("tot") * 19, col("value"))).as("p95_exact"))
    est.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n"),
        col("p50_est"), col("p50_exact"), (col("p50_est") - col("p50_exact")).as("p50_err"),
        col("p95_est"), col("p95_exact"), (col("p95_est") - col("p95_exact")).as("p95_err"))
      .orderBy(col("event_type"))
  }

  val q105Sql: String =
    s"""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events WHERE value IS NOT NULL),
       |b2 AS (SELECT lo, (hi - lo) / $QBins AS w FROM b),
       |bi AS (SELECT event_type, b2.lo, b2.w,
       |         least(CAST(floor((value - b2.lo) / b2.w) AS INTEGER), ${QBins - 1}) AS bin
       |       FROM events, b2 WHERE value IS NOT NULL),
       |h AS (SELECT event_type, bin, min(lo) AS lo, min(w) AS w, count(*) AS cnt
       |      FROM bi GROUP BY 1, 2),
       |c AS (SELECT *,
       |        sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |        sum(cnt) OVER (PARTITION BY event_type) AS tot FROM h),
       |est AS (SELECT event_type, CAST(max(tot) AS BIGINT) AS n,
       |          min(CASE WHEN cum * 2 >= tot THEN lo + CAST(bin + 1 AS DOUBLE) * w END) AS p50_est,
       |          min(CASE WHEN cum * 20 >= tot * 19 THEN lo + CAST(bin + 1 AS DOUBLE) * w END) AS p95_est
       |        FROM c GROUP BY 1),
       |vc AS (SELECT event_type, value, count(*) AS cnt FROM events
       |       WHERE value IS NOT NULL GROUP BY 1, 2),
       |c2 AS (SELECT *,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY value
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |         sum(cnt) OVER (PARTITION BY event_type) AS tot FROM vc),
       |ex AS (SELECT event_type,
       |         min(CASE WHEN cum * 2 >= tot THEN value END) AS p50_exact,
       |         min(CASE WHEN cum * 20 >= tot * 19 THEN value END) AS p95_exact
       |       FROM c2 GROUP BY 1)
       |SELECT est.event_type, est.n,
       |  p50_est, p50_exact, p50_est - p50_exact AS p50_err,
       |  p95_est, p95_exact, p95_est - p95_exact AS p95_err
       |FROM est JOIN ex USING (event_type) ORDER BY est.event_type""".stripMargin

  // ---------------------------------------------------------------- q144
  /** HyperLogLog distinct estimate per language from FIRST PRINCIPLES —
    * [[HllM]] = 64 registers built as a (lang, bucket) max-aggregate over
    * the corpus hash kernel, beside the exact distinct count and the
    * realized relative error. Where KMV (q57) keeps the k smallest
    * hashes (exact below k, ~1/√k error above), HLL keeps ONE 6-bit rank
    * per register — the memory-optimal distinct sketch (Flajolet et al.,
    * AofA 2007), and the register frame is MERGEABLE by elementwise max
    * (q77's shard-rollup pattern applies verbatim).
    *
    * Register rank uses the trailing-zero variant (Flajolet–Martin
    * style): rho = (#trailing zeros of the 54 post-bucket hash bits) + 1,
    * computed EXACTLY via the two's-complement lowest-set-bit identity
    * `rest & -rest` — a power of two whose log2 both engines recover
    * bit-identically under round() (plain floor(log2(8.0)) is the classic
    * 2.9999… trap). No sampling, no RNG: the same md5-derived hex60 hash
    * kernel every dedup query shares.
    *
    * 100 TB shape: ONE corpus scan → a map-side-combinable
    * (lang, bucket) max — the shuffle carries ≤ langs×64 tiny rows, never
    * values (the exact countDistinct column exists only to GATE the
    * estimator, exactly q95/q105's contract). Parity: each register's
    * 2^-M term is the exact double `1.0 / (1L << M)`, rounded through
    * DECIMAL(38,30) so the 64-term sum is exact decimal addition
    * (order-free); the raw estimate and small-range correction
    * (E ≤ 2.5m ∧ V > 0 → m·ln(m/V)) are fixed-shape double expressions,
    * with the ln branch rounded through DECIMAL(18,6) (q74's rule). */
  private val HllM = 64 // registers (p = 6 bucket bits of the 60-bit hash)

  def q144HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val hashed = Tables(spark, dir).documents
      .select(col("lang"), hex60(normText(col("text"))).as("h"))
    val rest = shiftright(col("h"), 6)
    val rho = when(rest === 0, lit(55))
      .otherwise(round(log2(rest.bitwiseAND(-rest).cast("double"))).cast("int") + 1)
    val regs = hashed
      .select(col("lang"), (col("h") % HllM).as("bucket"), rho.as("rho"))
      .groupBy(col("lang"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllM.toDouble))
    val perLang = regs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_used"),
        sum((lit(1.0) / expr("cast(shiftleft(cast(1 as bigint), m_j) as double)"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 30))).as("den_used"))
      .select(col("lang"), col("n_used"),
        (col("den_used").cast("double") + (lit(HllM) - col("n_used")).cast("double")).as("den"),
        (lit(HllM) - col("n_used")).as("v_empty"))
    val raw = alpha * lit((HllM * HllM).toDouble) / col("den")
    val est = when(raw <= lit(2.5 * HllM) && col("v_empty") > 0,
        lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_empty").cast("double")))
      .otherwise(raw)
      .cast(org.apache.spark.sql.types.DecimalType(18, 6))
    val exact = hashed.groupBy(col("lang"))
      .agg(countDistinct(col("h")).as("exact_distinct"))
    perLang.join(exact, Seq("lang"))
      .select(col("lang"), col("n_used").as("registers_used"), col("v_empty"),
        est.cast("double").as("hll_est"), col("exact_distinct"),
        ((est.cast("double") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")).cast(DecimalType(18, 6)).cast("double")
          .as("rel_err"))
      .orderBy(col("lang"))
  }

  val q144Sql: String =
    s"""WITH hx AS (SELECT lang, $hSql AS h FROM documents),
       |rr AS (SELECT lang, h % $HllM AS bucket,
       |         CASE WHEN (h >> 6) = 0 THEN 55
       |              ELSE CAST(round(log2(CAST(((h >> 6) & -(h >> 6)) AS DOUBLE))) AS INTEGER) + 1
       |         END AS rho
       |       FROM hx),
       |regs AS (SELECT lang, bucket, max(rho) AS m_j FROM rr GROUP BY 1, 2),
       |pl AS (SELECT lang, count(*) AS n_used,
       |         sum(CAST(CAST(1.0 AS DOUBLE) / CAST((1::BIGINT << m_j) AS DOUBLE) AS DECIMAL(38,30))) AS den_used
       |       FROM regs GROUP BY 1),
       |pl2 AS (SELECT lang, n_used,
       |          CAST(den_used AS DOUBLE) + CAST($HllM - n_used AS DOUBLE) AS den,
       |          $HllM - n_used AS v_empty
       |        FROM pl),
       |ex AS (SELECT lang, count(DISTINCT h) AS exact_distinct FROM hx GROUP BY 1),
       |est AS (SELECT lang, n_used, v_empty,
       |          CAST(CASE WHEN (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(${HllM.toDouble} AS DOUBLE))
       |                          * CAST(${(HllM * HllM).toDouble} AS DOUBLE) / den) <= CAST(${2.5 * HllM} AS DOUBLE)
       |                     AND v_empty > 0
       |                    THEN CAST(${HllM.toDouble} AS DOUBLE) * ln(CAST(${HllM.toDouble} AS DOUBLE) / CAST(v_empty AS DOUBLE))
       |                    ELSE CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(${HllM.toDouble} AS DOUBLE))
       |                          * CAST(${(HllM * HllM).toDouble} AS DOUBLE) / den
       |               END AS DECIMAL(18,6)) AS est_dec
       |        FROM pl2)
       |SELECT est.lang, n_used AS registers_used, v_empty,
       |  CAST(est_dec AS DOUBLE) AS hll_est, exact_distinct,
       |  CAST(CAST((CAST(est_dec AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
       |       / CAST(exact_distinct AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS rel_err
       |FROM est JOIN ex ON est.lang = ex.lang ORDER BY est.lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_quantile_sketch" -> (q105QuantileSketch _),
    "q144_hll_distinct" -> (q144HllDistinct _),
    "q57_kmv_distinct" -> (q57KmvDistinct _),
    "q77_sketch_rollup" -> (q77SketchRollup _),
    "q88_rolling_actives" -> (q88RollingActives _),
    "q95_heavy_hitters" -> (q95HeavyHitters _))

  val oracleSql: Map[String, String] = Map(
    "q105_quantile_sketch" -> q105Sql,
    "q144_hll_distinct" -> q144Sql,
    "q57_kmv_distinct" -> q57Sql,
    "q77_sketch_rollup" -> q77Sql,
    "q88_rolling_actives" -> q88Sql,
    "q95_heavy_hitters" -> q95Sql)
}
