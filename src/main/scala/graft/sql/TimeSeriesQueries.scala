package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Time-series smoothing over the event stream — the EWMA companion to
  * q117's sliding z-score: where the z-score weighs every trailing hour
  * equally, the exponentially-weighted moving average discounts history
  * geometrically, the smoother monitoring pipelines actually deploy
  * (Holt's level equation / NIST EWMA control charts).
  */
object TimeSeriesQueries {

  // ---------------------------------------------------------------- q146
  /** Hourly event-rate EWMA (α = 0.25 ⇒ decay 0.75/hour, [[EwmaSpan]]-hour
    * support) per event type, plus a PRIOR-hours-only baseline and a
    * "current rate > [[SpikeFactor]]× baseline" spike flag — the alerting
    * card. The geometric window is BOUNDED (weights below 0.75²⁴ ≈ 1e-3
    * contribute nothing at count scale), which is what makes the
    * recursive textbook form S_t = αc_t + (1−α)S_{t−1} — useless
    * distributed, it chains the whole history — collapse to a fixed
    * [[EwmaSpan]]-term weighted sum.
    *
    * 100 TB shape: ONE corpus-sized aggregate map-side combines to
    * (type, hour) counts; the [[EwmaSpan]]+1-row offset/weight dimension
    * then fans each count out to the target hours it influences
    * (constant fan-out on the already-aggregated frame — the window
    * never sees event rows), and a second map-side-combinable aggregate
    * folds (type, target-hour) back down. Gap hours contribute nothing
    * and the per-target weight sum renormalizes — no spine join (q117's
    * rule).
    *
    * Parity: the weights 0.75^j are materialized as exact DECIMAL(18,9)
    * literals (0.75^j is dyadic, so its 9-dp rounding has no half-way
    * case and is engine-independent; both sides embed the same plain
    * string). Weight·count products and all cross-row sums are then PURE
    * DECIMAL arithmetic — exact, order-free, and immune to the
    * double→decimal shortest-string rounding trap (a double cast rounds
    * the 17-digit repr in the JVM but the exact binary value in DuckDB,
    * which diverges when a structured product sits ~1e-17 from a
    * boundary — measured on this very query at 18,9). Each output is ONE
    * IEEE division of two exact decimals cast to double — bit-identical
    * cross-engine with NO output rounding (q112's rule; rounding the
    * quotient to 6 dp would REINTRODUCE divergence, because ratios of
    * 9-dp decimals routinely terminate exactly on x.xxxxx5 half-way
    * points where the JVM's string-based HALF_UP and DuckDB's
    * binary-value rounding disagree — measured 19/3385 rows). The spike
    * flag compares the same doubles. */
  private val EwmaSpan    = 24  // support of the truncated geometric window
  private val SpikeFactor = 2.0

  /** 0.75^j rounded to 9 dp as a plain decimal string: 3^j/4^j is exact
    * in double (3^j < 2^53, denominator a power of two), its binary
    * expansion can never sit exactly on a 5e-10 half-way point (that
    * would need 5^9 to divide a power of two), so the 9-dp rounding is
    * mode-independent and both engines parse the identical literal. */
  private def w75s(j: Int): String =
    new java.math.BigDecimal(BigInt(3).pow(j).toDouble / BigInt(4).pow(j).toDouble)
      .setScale(9, java.math.RoundingMode.HALF_UP).toPlainString

  /** The shared scored frame: (event_type, h, cnt, ewma, baseline) —
    * q146 formats it, q153 backtests it. */
  private def ewmaFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables(spark, dir).events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("cnt"))
    // offset dimension: j hours ahead, EWMA weight (offsets 0..span−1)
    // and prior-only baseline weight (offsets 1..span, re-anchored at 1)
    val d9 = DecimalType(18, 9)
    val offsets = (0 to EwmaSpan).map { j =>
      (j,
        if (j < EwmaSpan) Some(w75s(j)) else None,
        if (j >= 1) Some(w75s(j - 1)) else None)
    }.toDF("j", "wcs", "wbs")
      .select(col("j"), col("wcs").cast(d9).as("wc"), col("wbs").cast(d9).as("wb"))
    // cnt as DECIMAL(12,0), NOT long: DECIMAL(18,9) × LongType exceeds
    // Spark's 38-digit cap and allowPrecisionLoss silently rounds the
    // product's scale down to 8 dp (measured: every EWMA off at ~1e-9);
    // the narrower operand keeps the multiply exact at scale 9
    val cntDec = col("cnt").cast(DecimalType(12, 0))
    val contrib = hourly.crossJoin(broadcast(offsets))
      .select(col("event_type"), (col("h") + col("j")).as("t"),
        (col("wc") * cntDec).as("num_c"), col("wc").as("den_c"),
        (col("wb") * cntDec).as("num_b"), col("wb").as("den_b"))
      .groupBy(col("event_type"), col("t"))
      .agg(sum(col("num_c")).as("nc"), sum(col("den_c")).as("dc"),
        sum(col("num_b")).as("nb"), sum(col("den_b")).as("db"))
      // renamed key: contrib shares lineage with `hourly`, so the join
      // below would otherwise be a self-join ambiguity on event_type
      .withColumnRenamed("event_type", "et")
    val ewma = col("nc").cast(DoubleType) / col("dc").cast(DoubleType)
    val base = col("nb").cast(DoubleType) / col("db").cast(DoubleType)
    hourly.join(contrib, col("event_type") === col("et") && col("h") === col("t"))
      .select(col("event_type"), col("h"), col("cnt"),
        ewma.as("ewma"), base.as("baseline"))
  }

  def q146EwmaSpikes(spark: SparkSession, dir: String): DataFrame =
    ewmaFrame(spark, dir)
      .select(col("event_type"),
        date_format(timestamp_seconds(col("h") * 3600), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("cnt"), col("ewma"), col("baseline"),
        coalesce(col("cnt").cast(DoubleType) > lit(SpikeFactor) * col("baseline"),
          lit(false)).as("is_spike"))
      .orderBy(col("event_type"), col("hour"))

  /** The scored-frame CTE chain, DuckDB side, ending in
    * `o(event_type, h, cnt, ewma, baseline)` — shared by q146 and q153
    * so the forecast arithmetic can never diverge. */
  private val ewmaCtesSql: String = {
    val rows = (0 to EwmaSpan).map { j =>
      val wc = if (j < EwmaSpan) s"CAST('${w75s(j)}' AS DECIMAL(18,9))" else "CAST(NULL AS DECIMAL(18,9))"
      val wb = if (j >= 1) s"CAST('${w75s(j - 1)}' AS DECIMAL(18,9))" else "CAST(NULL AS DECIMAL(18,9))"
      s"($j, $wc, $wb)"
    }.mkString(",\n|  ")
    s"""hc AS (SELECT event_type,
       |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |off(j, wc, wb) AS (VALUES
       |  $rows),
       |ag AS (SELECT event_type, h + j AS t,
       |    sum(wc * CAST(cnt AS DECIMAL(12,0))) AS nc,
       |    sum(wc) AS dc,
       |    sum(wb * CAST(cnt AS DECIMAL(12,0))) AS nb,
       |    sum(wb) AS db
       |  FROM hc CROSS JOIN off GROUP BY 1, 2),
       |o AS (SELECT hc.event_type, hc.h, hc.cnt,
       |    CAST(nc AS DOUBLE) / CAST(dc AS DOUBLE) AS ewma,
       |    CAST(nb AS DOUBLE) / CAST(db AS DOUBLE) AS baseline
       |  FROM hc JOIN ag ON hc.event_type = ag.event_type AND hc.h = ag.t)""".stripMargin
  }

  val q146Sql: String =
    s"""WITH $ewmaCtesSql
       |SELECT event_type,
       |  strftime(epoch_ms(h * 3600000), '%Y-%m-%d %H:%M:%S') AS hour,
       |  cnt, ewma, baseline,
       |  coalesce(CAST(cnt AS DOUBLE) > $SpikeFactor * baseline, false) AS is_spike
       |FROM o ORDER BY event_type, hour""".stripMargin

  // ---------------------------------------------------------------- q153
  /** Forecast-accuracy backtest of q146's one-step-ahead predictor (the
    * prior-only EWMA baseline IS the forecast for the hour it excludes):
    * per event type, MAE, sMAPE (the scale-free industry default), and
    * signed bias over every hour that has a forecast — the eval card
    * that must accompany any deployed forecaster. Chains with q146
    * exactly like q124 (estimate) pairs with its calibration.
    *
    * 100 TB shape: q146's frame (type×hour-cardinality after the one
    * map-side-combinable corpus aggregate) folds to type-cardinality
    * metric rows — the backtest adds ZERO corpus passes. Parity:
    * per-row error terms round through DECIMAL(18,6) (abs/signed) and
    * DECIMAL(18,9) (the sMAPE ratio) so the sums are exact and
    * order-free; each metric is one IEEE division (q146's rule). */
  def q153ForecastEval(spark: SparkSession, dir: String): DataFrame = {
    val f = ewmaFrame(spark, dir).filter(col("baseline").isNotNull)
    val err = col("cnt").cast(DoubleType) - col("baseline")
    val smapeTerm = (abs(err) * lit(2.0) / (col("cnt").cast(DoubleType) + col("baseline")))
      .cast(DecimalType(18, 9))
    f.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_forecasts"),
        sum(abs(err).cast(DecimalType(18, 6))).as("sae"),
        sum(err.cast(DecimalType(18, 6))).as("se"),
        sum(smapeTerm).as("ss"))
      .select(col("event_type"), col("n_forecasts"),
        (col("sae").cast(DoubleType) / col("n_forecasts").cast(DoubleType)).as("mae"),
        (col("ss").cast(DoubleType) / col("n_forecasts").cast(DoubleType)).as("smape"),
        (col("se").cast(DoubleType) / col("n_forecasts").cast(DoubleType)).as("bias"))
      .orderBy(col("event_type"))
  }

  val q153Sql: String =
    s"""WITH $ewmaCtesSql
       |SELECT event_type, count(*) AS n_forecasts,
       |  CAST(sum(CAST(abs(CAST(cnt AS DOUBLE) - baseline) AS DECIMAL(18,6))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS mae,
       |  CAST(sum(CAST(abs(CAST(cnt AS DOUBLE) - baseline) * 2.0
       |      / (CAST(cnt AS DOUBLE) + baseline) AS DECIMAL(18,9))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS smape,
       |  CAST(sum(CAST(CAST(cnt AS DOUBLE) - baseline AS DECIMAL(18,6))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS bias
       |FROM o WHERE baseline IS NOT NULL
       |GROUP BY 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q158
  /** Autocorrelation function of the zero-filled hourly event-rate series
    * per type, at lags {1, 2, 3, 6, 12, 24} — the seasonality/persistence
    * card (Box–Jenkins model identification): a 24 h spike in the ACF
    * says "daily cycle", fast decay says "short memory", and it is the
    * diagnostic read BEFORE choosing q146's smoothing constant or
    * q117's window width. Gaps are true zeros here (no events = rate 0),
    * so the series is completed over each type's [min, max] hour spine.
    *
    * 100 TB shape: the corpus folds ONCE into the map-side-combinable
    * (type, hour) count; the spine (sequence + explode over per-type
    * extrema) and everything after are hour-cardinality. Lag pairs come
    * from ONE composite-key equi-join of the spine frame against itself
    * shifted by the 6-row broadcast lag dimension — never a window over
    * corpus rows. Output is types × lags.
    *
    * Parity: the estimator is cleared of its rational mean x̄ = S/n by
    * multiplying through — r_L = (n²·P_L − n·S·T_L + k_L·S²) /
    * (n·(n·SS − S²)) with P_L = Σx_t·x_{t+L}, T_L = Σ(x_t+x_{t+L}),
    * SS = Σx², k_L = n−L — so numerator and denominator are EXACT
    * DECIMAL(38,0) integers (fits for n < 10⁶ spine hours and hourly
    * counts < 10⁹ — i.e. up to 10¹⁵ events per type; products stage
    * through bounded casts to respect the 38-digit cap, and a
    * raise_error guard fails LOUDLY past the bounds — matching DuckDB's
    * overflow error instead of non-ANSI Spark's silent NULL) and each ACF
    * value is ONE IEEE division, q156's
    * no-float-anywhere discipline. A constant series (zero variance)
    * yields NULL via nullif on both engines. */
  private val AcfLags = Seq(1, 2, 3, 6, 12, 24)

  def q158Acf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables(spark, dir).events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("cnt"))
    // zero-filled spine over each type's [min, max] hour range —
    // hour-cardinality, read by the stats fold AND both join sides
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("cnt"), lit(0L)).as("x"))
      .localCheckpoint(true)
    val d15 = DecimalType(15, 0)
    // per-type exact stats: n, S = Σx, SS = Σx²
    val stats = spine.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum((col("x").cast(d15) * col("x").cast(d15))).as("ss"),
        max(col("x")).as("xmax"))
    val lags = AcfLags.toDF("lag")
    // lag pairs: one composite-key equi-join of the spine against itself
    val lhs = spine.crossJoin(broadcast(lags))
      .select(col("event_type").as("et"), col("lag"),
        (col("h") + col("lag")).as("h2"), col("x").as("xa"))
    val pairs = lhs.join(spine,
        col("et") === col("event_type") && col("h2") === col("h"))
      .groupBy(col("et"), col("lag"))
      .agg(sum(col("xa").cast(d15) * col("x").cast(d15)).as("p"),
        sum((col("xa") + col("x")).cast(d15)).as("t"),
        count(lit(1)).as("k"))
    // exact integer numerator/denominator, staged within the 38-digit cap.
    // Past the documented staging bounds (n < 10⁶ spine hours, hourly
    // counts < 10⁹) DuckDB raises a cast/overflow error while non-ANSI
    // Spark would silently yield NULL acf — fail loudly and identically
    // instead (ADVICE r9): the guard rides the per-output-row projection
    // (types × lags rows), not the corpus.
    val nGuarded = when(col("n") > lit(999999L) || col("xmax") > lit(999999999L),
      raise_error(concat(
        lit("q158: spine exceeds exact-integer staging bounds (n="),
        col("n").cast("string"), lit(" > 999999 hours or max hourly count="),
        col("xmax").cast("string"), lit(" > 999999999)"))).cast("long"))
      .otherwise(col("n"))
    val n6 = nGuarded.cast(DecimalType(6, 0))
    val num = (n6 * n6 * col("p").cast(DecimalType(25, 0)) -
      n6 * col("s").cast(d15) * col("t").cast(DecimalType(16, 0)) +
      col("k").cast(DecimalType(6, 0)) * col("s").cast(d15) * col("s").cast(d15))
      .cast(DecimalType(38, 0))
    val den = (n6 * (n6 * col("ss").cast(DecimalType(25, 0)) -
      col("s").cast(d15) * col("s").cast(d15)).cast(DecimalType(31, 0)))
      .cast(DecimalType(38, 0))
    pairs.join(broadcast(stats), col("et") === col("event_type"))
      .select(col("et").as("event_type"), col("lag"), col("k").as("n_pairs"),
        (num.cast(DoubleType) / nullif(den, lit(0)).cast(DoubleType)).as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  // MATERIALIZED on `sp` is load-bearing at scale: DuckDB inlines plain
  // CTEs, and `sp` (the gap-filled hourly spine) is referenced three times
  // (st, and both sides of pr's self-join) — the 10× replica sweep hung
  // minutes on the re-expanded spine joins until the hint pinned one
  // evaluation (1.1 s at 10×). Results unchanged (same rule as q156's LPA
  // chain, GraphQueries.lpaCtesSql).
  val q158Sql: String = {
    val lagRows = AcfLags.map(l => s"($l)").mkString(", ")
    s"""WITH hc AS (SELECT event_type,
       |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |ext AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hc GROUP BY 1),
       |spx AS (SELECT ext.event_type, u.h
       |  FROM ext, unnest(generate_series(ext.h0, ext.h1)) AS u(h)),
       |sp AS MATERIALIZED (SELECT spx.event_type, spx.h, coalesce(hc.cnt, 0) AS x
       |  FROM spx LEFT JOIN hc ON hc.event_type = spx.event_type AND hc.h = spx.h),
       |st AS (SELECT event_type, count(*) AS n, sum(x) AS s,
       |    sum(CAST(x AS DECIMAL(15,0)) * CAST(x AS DECIMAL(15,0))) AS ss
       |  FROM sp GROUP BY 1),
       |lg(lag) AS (VALUES $lagRows),
       |pr AS (SELECT a.event_type AS et, lg.lag,
       |    sum(CAST(a.x AS DECIMAL(15,0)) * CAST(b.x AS DECIMAL(15,0))) AS p,
       |    sum(CAST(a.x + b.x AS DECIMAL(16,0))) AS t,
       |    count(*) AS k
       |  FROM sp a CROSS JOIN lg
       |  JOIN sp b ON b.event_type = a.event_type AND b.h = a.h + lg.lag
       |  GROUP BY 1, 2)
       |SELECT pr.et AS event_type, pr.lag, CAST(pr.k AS BIGINT) AS n_pairs,
       |  CAST(CAST(n AS DECIMAL(6,0)) * CAST(n AS DECIMAL(6,0)) * CAST(p AS DECIMAL(25,0))
       |     - CAST(n AS DECIMAL(6,0)) * CAST(s AS DECIMAL(15,0)) * CAST(t AS DECIMAL(16,0))
       |     + CAST(k AS DECIMAL(6,0)) * CAST(s AS DECIMAL(15,0)) * CAST(s AS DECIMAL(15,0))
       |     AS DOUBLE)
       |  / CAST(nullif(CAST(n AS DECIMAL(6,0)) *
       |      CAST(CAST(n AS DECIMAL(6,0)) * CAST(ss AS DECIMAL(25,0))
       |         - CAST(s AS DECIMAL(15,0)) * CAST(s AS DECIMAL(15,0)) AS DECIMAL(31,0)),
       |      0) AS DOUBLE) AS acf
       |FROM pr JOIN st ON st.event_type = pr.et
       |ORDER BY event_type, lag""".stripMargin
  }

  // ---------------------------------------------------------------- q166
  /** Multiplicative monthly seasonal indices of order revenue (the
    * ratio-to-overall decomposition, the first stage of classical
    * X-11-style seasonal adjustment): per calendar month, the revenue
    * across all observed (year, month) cells relative to the overall
    * monthly mean — index > 1 ⇒ seasonally strong month — plus the
    * deseasonalization ledger (n cells, total revenue). The calendar
    * companion to q158's ACF (ACF detects periodicity; the index
    * QUANTIFIES it per phase) and the seasonality input a forecast like
    * q146 would be adjusted by.
    *
    * 100 TB shape: ONE orders scan folds map-side to (year, month)
    * revenue cells — everything after is cell-cardinality (≤ 12·years).
    * Parity: revenue rounds per order through DECIMAL(18,6) (q85's
    * rule) and decimal-sums; per-month mean, the overall mean, and each
    * index are fixed-shape IEEE divisions of exact sums. The index
    * formula avg_month / overall_avg spells as (sm/nm) / (st/nt) —
    * identical text both engines. */
  def q166SeasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val cells = Tables(spark, dir).orders
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice").cast(d6)).as("rev"))
      .localCheckpoint(true) // read twice: per-month fold + grand fold
    val byMonth = cells.groupBy(col("m"))
      .agg(count(lit(1)).as("n_cells"), sum(col("rev")).as("sm"))
    val grand = cells.agg(count(lit(1)).as("nt"), sum(col("rev")).as("st"))
    byMonth.crossJoin(broadcast(grand))
      .select(col("m").as("month"), col("n_cells"),
        col("sm").cast(DoubleType).as("revenue"),
        ((col("sm").cast(DoubleType) / col("n_cells").cast(DoubleType)) /
          (col("st").cast(DoubleType) / col("nt").cast(DoubleType)))
          .as("seasonal_index"))
      .orderBy(col("month"))
  }

  val q166Sql: String =
    """WITH cells AS (SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
      |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      |  FROM orders GROUP BY 1, 2),
      |bm AS (SELECT m, count(*) AS n_cells, sum(rev) AS sm FROM cells GROUP BY 1),
      |g AS (SELECT count(*) AS nt, sum(rev) AS st FROM cells)
      |SELECT m AS month, CAST(n_cells AS BIGINT) AS n_cells,
      |  CAST(sm AS DOUBLE) AS revenue,
      |  (CAST(sm AS DOUBLE) / CAST(n_cells AS DOUBLE))
      |    / (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)) AS seasonal_index
      |FROM bm CROSS JOIN g ORDER BY month""".stripMargin

  // ---------------------------------------------------------------- q209
  /** CUSUM changepoint detection per event type (Page 1954) over the
    * zero-filled hourly rate series — the LEVEL-SHIFT detector the
    * time-series family lacked: q117/q146 flag transient bursts against
    * a trailing window, q158 reads periodicity, q166 quantifies the
    * calendar; q209 answers "WHEN did the rate permanently change", the
    * question behind every deploy/incident postmortem.
    *
    * The textbook statistic S_t = Σ_{i≤t}(x_i − x̄) needs the rational
    * mean; multiplying through by n makes it EXACT INTEGER arithmetic:
    * D_t = n·P_t − t·T (P = prefix sum, T = total) — argmax |D_t| is
    * argmax |S_t| (positive scaling), ties → earliest hour. D_n = 0 by
    * construction, so the argmax never lands on the last hour of a
    * non-constant series (the nullif guards the constant/degenerate
    * case). Per type: hours, events, the changepoint hour, exact-sum
    * means before/after, the shift, and max |S| = |D|/n.
    *
    * 100 TB shape: one map-side-combinable (type, hour) count; the spine,
    * prefix window, and argmax are hour-cardinality and type-partitioned
    * (the hour count is bounded by the TIME RANGE, not the corpus, so
    * |D| ≤ hours·events stays far inside 2⁵³ even at 10¹² events —
    * every decimal→double cast below is exact). Parity: D accumulates as
    * DECIMAL(38,0); means/shift/|S| are fixed-shape IEEE divisions on
    * exact integers. cp_hour formatting: `date_format(timestamp_seconds)`
    * renders in the SESSION time zone while DuckDB's `strftime
    * (to_timestamp)` is UTC-fixed — cross-engine hash parity therefore
    * requires `spark.sql.session.timeZone=UTC`, which [[graft.GraftSession]]
    * pins for every entry point (same contract as q117's hour labels). */
  def q209CusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir).events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"), col("h0"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), (col("h") - col("h0") + 1).as("t"),
        coalesce(col("cnt"), lit(0L)).as("x"))
    val d380 = DecimalType(38, 0)
    val wPre = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val stats = spine.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("tot"))
    val dev = spine
      .withColumn("p", sum(col("x")).over(wPre))
      .join(stats, Seq("event_type"))
      .withColumn("d",
        (col("n").cast(d380) * col("p").cast(d380) -
          col("t").cast(d380) * col("tot").cast(d380)).cast(d380))
    val wArg = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("d")).desc, col("h").asc)
    dev.withColumn("rn", row_number().over(wArg)).filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_hours"), col("tot").as("n_events"),
        date_format(timestamp_seconds(col("h") * 3600), "yyyy-MM-dd HH:mm:ss")
          .as("cp_hour"),
        col("t").as("cp_index"),
        (col("p").cast(DoubleType) / col("t")).as("mean_before"),
        ((col("tot") - col("p")).cast(DoubleType) /
          nullif((col("n") - col("t")), lit(0L))).as("mean_after"),
        (((col("tot") - col("p")).cast(DoubleType) /
          nullif((col("n") - col("t")), lit(0L))) -
          (col("p").cast(DoubleType) / col("t"))).as("shift"),
        (abs(col("d")).cast(DoubleType) / col("n")).as("cusum_max"),
        signum(col("d").cast(DoubleType)).cast(LongType).as("direction"))
      .orderBy(col("event_type"))
  }

  val q209Sql: String =
    s"""WITH hourly AS (SELECT event_type,
       |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |rng AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
       |spx AS (SELECT r.event_type, r.h0, u.h
       |  FROM rng r, unnest(generate_series(r.h0, r.h1)) AS u(h)),
       |spine AS MATERIALIZED (SELECT spx.event_type, spx.h, spx.h - spx.h0 + 1 AS t,
       |    coalesce(cnt, 0) AS x
       |  FROM spx LEFT JOIN hourly ON hourly.event_type = spx.event_type AND hourly.h = spx.h),
       |st AS (SELECT event_type, count(*) AS n, sum(x) AS tot FROM spine GROUP BY 1),
       |dev AS (SELECT spine.event_type, h, t, x,
       |    sum(x) OVER (PARTITION BY spine.event_type ORDER BY h) AS p,
       |    n, tot
       |  FROM spine JOIN st ON spine.event_type = st.event_type),
       |dd AS (SELECT event_type, h, t, p, n, tot,
       |    CAST(CAST(n AS DECIMAL(38,0)) * CAST(p AS DECIMAL(38,0))
       |       - CAST(t AS DECIMAL(38,0)) * CAST(tot AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS d
       |  FROM dev),
       |cp AS (SELECT * FROM (SELECT dd.*,
       |    row_number() OVER (PARTITION BY event_type ORDER BY abs(d) DESC, h ASC) AS rn
       |  FROM dd) WHERE rn = 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n_hours, CAST(tot AS BIGINT) AS n_events,
       |  strftime(to_timestamp(h * 3600), '%Y-%m-%d %H:%M:%S') AS cp_hour,
       |  CAST(t AS BIGINT) AS cp_index,
       |  CAST(p AS DOUBLE) / t AS mean_before,
       |  CAST(tot - p AS DOUBLE) / nullif(n - t, 0) AS mean_after,
       |  CAST(tot - p AS DOUBLE) / nullif(n - t, 0) - CAST(p AS DOUBLE) / t AS shift,
       |  CAST(abs(d) AS DOUBLE) / n AS cusum_max,
       |  CAST(sign(CAST(d AS DOUBLE)) AS BIGINT) AS direction
       |FROM cp ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q214
  /** SEQUENTIAL CUSUM alert ledger — the online half of q209, oracle-
    * gated: where q209 finds the single retrospective argmax changepoint,
    * this card runs the deployed monitor's exact fold
    * ([[graft.streaming.StreamingCusum.batchAlerts]], the SAME shared
    * Page step the `transformWithState` operator executes per batch) over
    * the zero-filled hourly series and emits every threshold crossing
    * with its re-arm semantics. The DuckDB oracle walks the identical
    * recursion as a RECURSIVE CTE stepping one hour per level — depth is
    * bounded by the TIME RANGE, never the corpus — so the streaming
    * operator's per-row semantics (two-sided accumulate, ≥ tie to "up",
    * report-then-reset, n counted from the reset) are pinned CROSS-ENGINE,
    * not merely self-consistent with the batch reference.
    *
    * Rates are STANDARDIZED per type so the monitor's parameters are
    * scalar across heterogeneous-rate keys, the way a fleet monitor
    * deploys: first to per-mille of a first-24-hour baseline mean
    * (`v = (x·1000) div μ₀,t`), then to hundredths of the type's OWN
    * first-day noise scale (`w = ((v − 1000)·100) div sad_t`, where
    * `sad_t` is the mean absolute successive difference over hours
    * 2..24) — slack = [[CusumSlackStd]] is then 0.5 noise units per
    * observation and threshold = [[CusumThresholdStd]] is 5 cumulative
    * units, meaningful at EVERY corpus scale (a fixed per-mille slack
    * either drowns in sf0.01's quantization noise or never fires at
    * sf0.1's tighter relative noise — measured both before this form).
    * Integer division end to end in both engines; state is Long.
    *
    * Scale gates: the workload is HOUR-cardinality (q209's rule — the
    * series length is bounded by the time range, never the corpus), so
    * the honest corpus decade is sf0.01 → sf0.1: the same hours get 10×
    * denser, both oracle-gated (24 and 9 alerts). The standard 10×
    * replica additionally stresses the SERIES-LENGTH axis — its replicas
    * offset timestamps by years, stretching the spine to ~87k hours with
    * long zero-filled gaps — and the fold is hash-exact there too at
    * 239,850 alert rows. The oracle recursion indexes a per-type
    * `list(w ORDER BY t)` instead of re-joining the 87k-row pts frame at
    * every level (round 14: each level's join builds an 8-row hash table
    * instead of a 700k-row one — 3.6× at equal depth, value-identical),
    * so the 10× walk is minutes, not the ~25 min the join form cost. */
  private val CusumSlackStd = 50L
  private val CusumThresholdStd = 500L

  def q214CusumAlerts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables(spark, dir).events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"), col("h0"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), (col("h") - col("h0") + 1).as("t"),
        coalesce(col("cnt"), lit(0L)).as("x"))
    val base = spine.groupBy(col("event_type"))
      .agg(greatest(expr("sum(CASE WHEN t <= 24 THEN x ELSE 0 END) div 24"),
        lit(1L)).as("mu0"))
    val nv = spine.join(base, Seq("event_type"))
      .select(col("event_type"), col("h"), col("t"), expr("(x * 1000) div mu0").as("v"))
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val noise = nv.withColumn("pv", lag(col("v"), 1).over(wLag))
      .filter(col("t").between(2, 24))
      .groupBy(col("event_type"))
      .agg(greatest(expr("sum(abs(v - pv)) div 23"), lit(1L)).as("sad"))
    // sign split before the div: trunc-vs-floor semantics on NEGATIVE
    // integral division are not guaranteed to agree cross-engine, so the
    // division only ever sees a non-negative dividend
    val pts = nv.join(noise, Seq("event_type"))
      .select(col("event_type").as("key"),
        timestamp_seconds(col("h") * 3600).as("ts"),
        expr("CASE WHEN v >= 1000 THEN ((v - 1000) * 100) div sad " +
          "ELSE -(((1000 - v) * 100) div sad) END").as("value"))
      .as[graft.streaming.CusumPoint]
    graft.streaming.StreamingCusum
      .batchAlerts(pts, 0L, CusumSlackStd, CusumThresholdStd)
      .select(col("key").as("event_type"),
        expr("unix_timestamp(ts) div 3600").as("alert_h"),
        col("direction"), col("stat"), col("n_since_reset"))
      .orderBy(col("event_type"), col("alert_h"))
  }

  val q214Sql: String = {
    val sl = CusumSlackStd
    val th = CusumThresholdStd
    s"""WITH RECURSIVE hourly AS (SELECT event_type,
       |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |rng AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
       |spx AS (SELECT r.event_type, r.h0, u.h
       |  FROM rng r, unnest(generate_series(r.h0, r.h1)) AS u(h)),
       |spine AS MATERIALIZED (SELECT spx.event_type, spx.h, spx.h - spx.h0 + 1 AS t,
       |    coalesce(cnt, 0) AS x
       |  FROM spx LEFT JOIN hourly ON hourly.event_type = spx.event_type AND hourly.h = spx.h),
       |base AS (SELECT event_type,
       |    greatest(sum(CASE WHEN t <= 24 THEN x ELSE 0 END) // 24, 1) AS mu0
       |  FROM spine GROUP BY 1),
       |nv AS MATERIALIZED (SELECT s.event_type, s.h, s.t, (s.x * 1000) // b.mu0 AS v
       |  FROM spine s JOIN base b USING (event_type)),
       |noise AS (SELECT a.event_type, greatest(sum(abs(a.v - b.v)) // 23, 1) AS sad
       |  FROM nv a JOIN nv b ON a.event_type = b.event_type AND b.t = a.t - 1
       |  WHERE a.t BETWEEN 2 AND 24 GROUP BY 1),
       |pts AS MATERIALIZED (SELECT n.event_type, n.h, n.t,
       |    CASE WHEN n.v >= 1000 THEN ((n.v - 1000) * 100) // s.sad
       |         ELSE -(((1000 - n.v) * 100) // s.sad) END AS w
       |  FROM nv n JOIN noise s USING (event_type)),
       |series AS MATERIALIZED (SELECT event_type, min(h) AS h0, count(*) AS n,
       |    list(w ORDER BY t) AS ws
       |  FROM pts GROUP BY 1),
       |walk AS (
       |  SELECT event_type, 1 AS t,
       |    greatest(0, ws[1] - $sl) AS spos1,
       |    greatest(0, -ws[1] - $sl) AS sneg1,
       |    1 AS n1,
       |    (greatest(0, ws[1] - $sl) > $th OR greatest(0, -ws[1] - $sl) > $th) AS crossed
       |  FROM series
       |  UNION ALL
       |  SELECT w.event_type, w.t + 1,
       |    greatest(0, (CASE WHEN w.crossed THEN 0 ELSE w.spos1 END) + s.ws[w.t + 1] - $sl),
       |    greatest(0, (CASE WHEN w.crossed THEN 0 ELSE w.sneg1 END) - s.ws[w.t + 1] - $sl),
       |    (CASE WHEN w.crossed THEN 0 ELSE w.n1 END) + 1,
       |    (greatest(0, (CASE WHEN w.crossed THEN 0 ELSE w.spos1 END) + s.ws[w.t + 1] - $sl) > $th OR
       |     greatest(0, (CASE WHEN w.crossed THEN 0 ELSE w.sneg1 END) - s.ws[w.t + 1] - $sl) > $th)
       |  FROM walk w JOIN series s USING (event_type) WHERE w.t < s.n)
       |SELECT w.event_type, CAST(s.h0 + w.t - 1 AS BIGINT) AS alert_h,
       |  CASE WHEN w.spos1 >= w.sneg1 THEN 'up' ELSE 'down' END AS direction,
       |  CAST(greatest(w.spos1, w.sneg1) AS BIGINT) AS stat,
       |  CAST(w.n1 AS BIGINT) AS n_since_reset
       |FROM walk w JOIN series s USING (event_type) WHERE w.crossed
       |ORDER BY event_type, alert_h""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q146_ewma_spikes" -> (q146EwmaSpikes _),
      "q153_forecast_eval" -> (q153ForecastEval _),
      "q158_acf" -> (q158Acf _),
      "q166_seasonal_index" -> (q166SeasonalIndex _),
      "q209_cusum_changepoint" -> (q209CusumChangepoint _),
      "q214_cusum_alerts" -> (q214CusumAlerts _))

  val oracleSql: Map[String, String] =
    Map("q146_ewma_spikes" -> q146Sql,
      "q153_forecast_eval" -> q153Sql,
      "q158_acf" -> q158Sql,
      "q166_seasonal_index" -> q166Sql,
      "q209_cusum_changepoint" -> q209Sql,
      "q214_cusum_alerts" -> q214Sql)
}
