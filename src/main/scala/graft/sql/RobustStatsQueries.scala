package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Robust order-statistic cards — the median/MAD surface that
  * complements the moment-based stats (mean/σ z-scores q117, quartile
  * fences q109, percentile families q39/q105): weighted medians for
  * skewed business aggregates and MAD-based outlier gates that a single
  * corrupted batch can't drag the way it drags a mean.
  *
  * Both cards share one kernel: the LOWER weighted median — the first
  * value v (in value order) whose cumulative weight reaches half the
  * total. Choosing the lower median (an actual data value, never an
  * interpolation) makes the statistic exactly representable in both
  * engines: cumulative weights are exact decimal/long sums and the
  * selection is a pure comparison — no midpoint arithmetic, no
  * interpolation-rule divergence (the q39 integer-threshold argument,
  * extended to weights).
  *
  * Scale shape shared by both: rows first COLLAPSE to (key, value,
  * weight) — map-side combinable, output bounded by value cardinality —
  * then the cumulative window runs per key over the collapsed frame
  * (never a global window). Honesty note: on CONTINUOUS value columns
  * the collapse barely shrinks (distinct values ≈ rows) and the per-key
  * window is then the true cost of an EXACT order statistic — a sort
  * per key. That is the contract of these cards; the approximate path
  * for corpus-scale continuous columns is the mergeable histogram
  * sketch (q105), and for the same reason these cards are excluded from
  * the replica scale measure (replication duplicates values 10×, making
  * the collapse artificially effective in a way organic continuous data
  * never is).
  */
object RobustStatsQueries {

  /** Lower weighted median of `df(key, v, w)` → (key, med). `w` must be
    * an exact type (long / decimal): the running sum and the 2·cum ≥ tot
    * selection are then bit-deterministic under any partitioning. */
  private def lowerWeightedMedian(df: DataFrame, key: String): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col("v"))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(key))
    df.withColumn("cw", sum(col("w")).over(cum))
      .withColumn("tw", sum(col("w")).over(all))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col(key)).agg(min(col("v")).as("med"))
  }

  // ---------------------------------------------------------------- q138
  /** Quantity-weighted median unit price per brand — "the price at which
    * half the VOLUME trades", the robust alternative to the
    * revenue-per-unit mean that a single bulk line can drag. Weights are
    * quantities (exact decimals), values are prices.
    *
    * 100 TB shape: part broadcasts into the lineitem scan; the
    * (brand, price) collapse map-side combines to value cardinality;
    * the cumulative window is per brand over the collapsed frame. */
  def q138WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val d2 = DecimalType(18, 2)
    val pw = t.lineitem
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        col("l_extendedprice").cast(d2).as("v"))
      .agg(sum(col("l_quantity").cast(d2)).as("w"))
    val tot = pw.groupBy(col("brand"))
      .agg(sum(col("w")).as("total_qty"), count(lit(1)).as("n_prices"))
    lowerWeightedMedian(pw, "brand")
      .join(tot, Seq("brand"))
      .select(col("brand"), col("med").cast(DoubleType).as("w_median_price"),
        col("total_qty").cast(DoubleType).as("total_qty"), col("n_prices"))
      .orderBy(col("brand"))
  }

  val q138Sql: String =
    """WITH pw AS (SELECT p_brand AS brand, CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
      |c AS (SELECT brand, v, w,
      |    sum(w) OVER (PARTITION BY brand ORDER BY v
      |                 ROWS UNBOUNDED PRECEDING) AS cw,
      |    sum(w) OVER (PARTITION BY brand) AS tw
      |  FROM pw),
      |m AS (SELECT brand, min(v) AS med FROM c WHERE cw * 2 >= tw GROUP BY 1),
      |t AS (SELECT brand, CAST(sum(w) AS DOUBLE) AS total_qty,
      |        CAST(count(*) AS BIGINT) AS n_prices FROM pw GROUP BY 1)
      |SELECT m.brand AS brand, CAST(med AS DOUBLE) AS w_median_price, total_qty, n_prices
      |FROM m JOIN t ON m.brand = t.brand
      |ORDER BY brand""".stripMargin

  // ---------------------------------------------------------------- q139
  /** Median/MAD robust outlier gate per event type: center = lower
    * median of `value`, scale = lower median of absolute deviations,
    * outliers = |x − med| > 4.4478·MAD (3σ-equivalent under normality,
    * 3 × the 1.4826 consistency constant folded into ONE literal so
    * both engines compute one multiply). The data-quality gate that a
    * corrupted batch can't drag: a mean/σ gate (q117's machinery) moves
    * with the outliers it is supposed to catch; median/MAD has a 50%
    * breakdown point.
    *
    * 100 TB shape: two value-collapse passes (values, then deviations —
    * the second needs the first's medians, broadcast back as a
    * type-keyed frame), each map-side combined to value cardinality
    * before its per-type cumulative window; the outlier count is one
    * conditional aggregate over the same collapsed deviation frame. */
  def q139RobustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val vc = Tables(spark, dir).events
      .groupBy(col("event_type"), col("value").as("v"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(true) // consumed by the median pass AND the deviation build
    val med = lowerWeightedMedian(vc, "event_type")
    val dev = vc.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), col("med"), abs(col("v") - col("med")).as("v"))
      .agg(sum(col("w")).as("w"))
      .localCheckpoint(true) // consumed by the MAD pass AND the outlier count
    val mad = lowerWeightedMedian(dev, "event_type")
      .withColumnRenamed("med", "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(min(col("med")).as("median"), min(col("mad")).as("mad_v"),
        sum(col("w")).as("n"),
        sum(when(col("v") > lit(4.4478) * col("mad"), col("w")).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("median"), col("mad_v").as("mad"), col("n"),
        col("n_outliers"),
        (col("n_outliers").cast(DoubleType) / col("n").cast(DoubleType))
          .as("outlier_frac"))
      .orderBy(col("event_type"))
  }

  val q139Sql: String =
    """WITH vc AS (SELECT event_type, value AS v, CAST(count(*) AS BIGINT) AS w
      |  FROM events GROUP BY 1, 2),
      |c1 AS (SELECT event_type, v, w,
      |    sum(w) OVER (PARTITION BY event_type ORDER BY v
      |                 ROWS UNBOUNDED PRECEDING) AS cw,
      |    sum(w) OVER (PARTITION BY event_type) AS tw
      |  FROM vc),
      |m AS (SELECT event_type, min(v) AS med FROM c1 WHERE cw * 2 >= tw GROUP BY 1),
      |dev AS (SELECT vc.event_type, med, abs(v - med) AS v, CAST(sum(w) AS BIGINT) AS w
      |  FROM vc JOIN m ON vc.event_type = m.event_type GROUP BY 1, 2, 3),
      |c2 AS (SELECT event_type, v, w,
      |    sum(w) OVER (PARTITION BY event_type ORDER BY v
      |                 ROWS UNBOUNDED PRECEDING) AS cw,
      |    sum(w) OVER (PARTITION BY event_type) AS tw
      |  FROM dev),
      |md AS (SELECT event_type, min(v) AS mad FROM c2 WHERE cw * 2 >= tw GROUP BY 1)
      |SELECT dev.event_type AS event_type, min(med) AS median, min(mad) AS mad,
      |  CAST(sum(w) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN v > 4.4478 * mad THEN w ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(sum(CASE WHEN v > 4.4478 * mad THEN w ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(w) AS DOUBLE) AS outlier_frac
      |FROM dev JOIN md ON dev.event_type = md.event_type
      |GROUP BY dev.event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q149
  /** Hash-bootstrap confidence interval for the mean event value per
    * type — the uncertainty-quantification card (Efron's bootstrap,
    * Poissonized for one-pass streams à la Kleiner et al.'s BLB): every
    * row carries, for each of [[BootReps]] resamples, a DETERMINISTIC
    * multiplicity w ~ Binomial(8, 1/8) (mean 1, variance 7/8 ≈ the
    * Poisson(1) resampling weight) read from 8 disjoint 3-bit fields of
    * an AFFINE per-replicate hash (a_b·h₀+c_b mod p over ONE md5 per
    * row — the q21 MinHash-family device; a per-(row, replicate) md5
    * measured 2.4× slower at sf0.1). No RNG state: any engine
    * reproduces the exact same resamples. The CI is the [p05, p95] band
    * of the replicate means via q39's integer-threshold percentile
    * rule.
    *
    * 100 TB shape: ONE corpus scan computes the 32 weights IN-ROW (one
    * md5 + 32 multiply-add-mods, codegen'd) and posexplodes into a
    * map-side-combinable (type, replicate) aggregate — the shuffle
    * carries types × replicates partial rows, never events; the
    * percentile window runs over [[BootReps]]-row frames. This is the
    * standard trade: B× extra scan-stage compute buys error bars with
    * ZERO extra passes.
    *
    * Parity: per-row values round through DECIMAL(18,6) (q85's rule) and
    * w·x products stay decimal-exact, so every replicate sum is exact;
    * each replicate mean is one IEEE division of identical inputs (no
    * output rounding — q146's lesson); the CI bounds are SELECTED
    * replicate means, not interpolations (q39's rule). */
  private val BootReps   = 32
  private val BootFields = 8 // Binomial(8, 1/8) multiplicity per (row, replicate)

  def q149BootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps.{hex32Mod, minhashCoeff, MinHashPrime}
    val d6 = DecimalType(18, 6)
    // r16: spread the single-split gate-scale scan — the 64-column
    // replicate aggregate below fuses one md5 + 32 affine transforms +
    // popcounts PER ROW onto the scan stage, which ran as ONE task
    // (profiled 1.73 s of the query's 2.7 s); Tables.spread is a no-op
    // on a many-split production scan (guide §2.5)
    val x = Tables.spread(Tables(spark, dir).events
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"), col("value")))
      .select(col("event_id"), col("event_type"), col("value").cast(d6).as("x"))
      .withColumn("h0", hex32Mod(concat(lit("bs:"), col("event_id").cast("string"))))
    // 32 in-row multiplicities: affine replicate hash, 8 disjoint 3-bit
    // fields, each contributing P(field = 0) = 1/8. The count of zero
    // fields is a branch-free POPCOUNT trick (t's bit 3f ORs field f's
    // three bits, so ~t masked at bits {0,3,…,21} flags zero fields) —
    // value-identical to the per-field when-chain but 6 ops instead of
    // 24 per replicate; with the chain, the 256 nested whens pushed the
    // generated code past JIT-friendly size (measured: whole query
    // 8.0 s → 1.9 s at sf0.1 together with the explode-free aggregate)
    def wOf(b: Int) = {
      val hb = (col("h0") * lit(minhashCoeff("bsa", b)) + lit(minhashCoeff("bsb", b))) %
        MinHashPrime
      val m = hb.bitwiseAND(lit(0xFFFFFFL))
      val t = m.bitwiseOR(shiftright(m, 1)).bitwiseOR(shiftright(m, 2))
      bit_count(t.bitwiseXOR(lit(0xFFFFFFL)).bitwiseAND(lit(0x249249L))).cast("long")
    }
    // replicate partials as 2·B aggregate COLUMNS over the one scan —
    // no 32× posexplode row blow-up through the aggregate hash map; the
    // (type × B) frame is then unpivoted by stack (rows appear only at
    // type-cardinality)
    val aggs = (0 until BootReps).flatMap { b =>
      val w = wOf(b)
      Seq(sum(w).as(s"nb_$b"),
        sum(w.cast(DecimalType(2, 0)) * col("x")).as(s"sb_$b"))
    }
    val stackExpr = s"stack($BootReps, " +
      (0 until BootReps).map(b => s"$b, nb_$b, sb_$b").mkString(", ") + ") AS (b, nb, sb)"
    val repMeans = x.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"), expr(stackExpr))
      .select(col("event_type"), col("b"),
        (col("sb").cast(DoubleType) / col("nb").cast(DoubleType)).as("mb"))
    val byType = Window.partitionBy(col("event_type"))
    val ci = repMeans
      .withColumn("cw", count(lit(1)).over(byType.orderBy(col("mb"), col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("cw") * 20 >= BootReps, col("mb"))).as("ci_lo"),
        min(when(col("cw") * 20 >= BootReps * 19, col("mb"))).as("ci_hi"))
    val full = x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .select(col("event_type"), col("n"),
        (col("sx").cast(DoubleType) / col("n").cast(DoubleType)).as("mean"))
    full.join(ci, Seq("event_type"))
      .select(col("event_type"), col("n"), col("mean"),
        col("ci_lo"), col("ci_hi"), (col("ci_hi") - col("ci_lo")).as("ci_width"))
      .orderBy(col("event_type"))
  }

  val q149Sql: String = {
    import graft.text.TextOps.{minhashCoeff, MinHashPrime}
    val wSql = (0 until BootFields)
      .map(f => s"(CASE WHEN ((hb >> ${3 * f}) & 7) = 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val coeffRows = (0 until BootReps)
      .map(b => s"($b, ${minhashCoeff("bsa", b)}, ${minhashCoeff("bsb", b)})")
      .mkString(",\n|  ")
    s"""WITH x AS (SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS x,
       |    ('0x' || substr(md5('bs:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % $MinHashPrime AS h0
       |  FROM events WHERE value IS NOT NULL),
       |cf(b, ca, cb) AS (VALUES
       |  $coeffRows),
       |reps AS (SELECT event_type, b, x, (h0 * ca + cb) % $MinHashPrime AS hb
       |  FROM x CROSS JOIN cf),
       |rm AS (SELECT event_type, b,
       |    CAST(sum(w) AS BIGINT) AS nb,
       |    sum(CAST(w AS DECIMAL(2,0)) * x) AS sb
       |  FROM (SELECT event_type, b, x, $wSql AS w FROM reps)
       |  GROUP BY 1, 2),
       |mb AS (SELECT event_type, b, CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb FROM rm),
       |cw AS (SELECT event_type, mb,
       |    count(*) OVER (PARTITION BY event_type ORDER BY mb, b
       |                   ROWS UNBOUNDED PRECEDING) AS cw
       |  FROM mb),
       |ci AS (SELECT event_type,
       |    min(CASE WHEN cw * 20 >= $BootReps THEN mb END) AS ci_lo,
       |    min(CASE WHEN cw * 20 >= ${BootReps * 19} THEN mb END) AS ci_hi
       |  FROM cw GROUP BY 1),
       |f AS (SELECT event_type, count(*) AS n,
       |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
       |  FROM x GROUP BY 1)
       |SELECT f.event_type, n, mean, ci_lo, ci_hi, ci_hi - ci_lo AS ci_width
       |FROM f JOIN ci ON f.event_type = ci.event_type
       |ORDER BY f.event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_weighted_median" -> (q138WeightedMedian _),
    "q139_robust_outliers" -> (q139RobustOutliers _),
    "q149_bootstrap_ci" -> (q149BootstrapCi _))

  val oracleSql: Map[String, String] = Map(
    "q138_weighted_median" -> q138Sql,
    "q139_robust_outliers" -> q139Sql,
    "q149_bootstrap_ci" -> q149Sql)
}
