package graft.sim

import graft.sql.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Spectral analysis over the embedding corpus — the linear-algebra
  * member of the similarity family: Gram-free distributed power
  * iteration for the top principal component. Complements the moment
  * cards (centroids q68, dispersion q83) with the direction the corpus
  * actually varies along — the statistic behind embedding whitening,
  * anisotropy audits ("all my vectors point the same way"), and
  * 1-D spectral ordering.
  */
object SpectralQueries {

  private val FpScale = 1073741824.0 // 2^30, the q68 fixed-point device
  private val Dec38 = DecimalType(38, 0)

  // ---------------------------------------------------------------- q137
  /** Top principal component by [[PcaRounds]] rounds of power iteration
    * on the mean-centered corpus, Gram-free: the d×d covariance matrix
    * is never materialized — each round computes w = Σ_rows (x'·v)·x'
    * directly (Halko et al., SIAM Rev. 2011's randomized-SVD building
    * block, with the deterministic uniform start 1/√d so the oracle can
    * unroll it).
    *
    * 100 TB shape: per round ONE corpus scan and ONE d-key aggregate —
    * no N-sized shuffle anywhere. The per-row projection x'·v folds
    * INSIDE the row (a codegen'd `aggregate(zip_with(...))` over the
    * array — no explode, no per-row shuffle); the contribution terms
    * then posexplode to (dim, term) and map-side combine to d partial
    * rows. Mean and iterate vectors travel as BROADCAST 64-element
    * literals (driver ferries ≤ d doubles per round, the pageRank-`n`
    * bounded-scalar rule — no driver arithmetic).
    *
    * Parity: every sum that crosses rows is EXACT — per-term
    * `floor(x·v·2³⁰)` fixed-point decimals (associative integer
    * addition, partition-invariant: the q68 contract) — and every
    * double op is fixed-shape: centering is one subtraction, the
    * normalizer squares round through DECIMAL(38,6) before the exact
    * sum, components round through DECIMAL(18,9). The oracle unrolls
    * the identical arithmetic in SQL. */
  private val PcaRounds = 2

  private def fp(c: Column): Column = floor(c).cast(Dec38)

  def q137PcaPower(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings.select(col("embedding"))
    // global per-dim mean via the q68 fixed-point centroid
    val means = e.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("d"), fp(col("x").cast(DoubleType) * lit(FpScale)).as("q"))
      .groupBy(col("d")).agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("d"),
        (col("s").cast(DoubleType) / (col("n").cast(DoubleType) * lit(FpScale))).as("m"))
      .orderBy(col("d")).collect().map(_.getDouble(1))
    val dims = means.length
    val mLit = array(means.toIndexedSeq.map(lit): _*)
    val xc = zip_with(col("embedding"), mLit, (x, m) => x.cast(DoubleType) - m)

    // one power-iteration round: (dim, wd) from the centered corpus and v
    def round(v: Array[Double]): DataFrame = {
      val vLit = array(v.toIndexedSeq.map(lit): _*)
      val sf = aggregate(
        zip_with(xc, vLit, (a, b) => floor(a * b * lit(FpScale))),
        lit(0).cast(Dec38), (acc, t) => acc + t.cast(Dec38))
      e.select((sf.cast(DoubleType) / lit(FpScale)).as("sd"), xc.as("xc"))
        .select(col("sd"), posexplode(col("xc")).as(Seq("d", "x")))
        .select(col("d"), fp(col("sd") * col("x") * lit(FpScale)).as("t"))
        .groupBy(col("d")).agg(sum(col("t")).as("w"))
        .select(col("d"), (col("w").cast(DoubleType) / lit(FpScale)).as("wd"))
    }
    // normalize a (d, wd) frame to (d, v DECIMAL(18,9)→double, lambda)
    def normalize(w: DataFrame): DataFrame = {
      val nsq = w.agg(sum((col("wd") * col("wd")).cast(DecimalType(38, 6))).as("nsq"))
      w.crossJoin(broadcast(nsq))
        .select(col("d"),
          (col("wd") / sqrt(col("nsq").cast(DoubleType)))
            .cast(DecimalType(18, 9)).cast(DoubleType).as("v"),
          sqrt(col("nsq").cast(DoubleType)).as("lambda"))
    }
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var out: DataFrame = null
    for (_ <- 1 to PcaRounds) {
      out = normalize(round(v))
      // the driver FERRIES the 64 components (bounded), never computes
      v = out.orderBy(col("d")).collect().map(_.getDouble(1))
    }
    out.select(col("d").as("dim"), col("v").as("loading"),
        col("lambda").as("lambda_est"))
      .orderBy(col("dim"))
  }

  val q137Sql: String = {
    def round(k: Int): String =
      s"""s$k AS (SELECT vec_id,
         |  sum(CAST(floor(xc * CAST(v AS DOUBLE) * 1073741824.0) AS DECIMAL(38,0))) AS sf
         |  FROM exc JOIN v${k - 1} USING (d) GROUP BY vec_id),
         |w$k AS (SELECT d,
         |  sum(CAST(floor(CAST(sf AS DOUBLE) / 1073741824.0 * xc * 1073741824.0)
         |      AS DECIMAL(38,0))) AS w
         |  FROM exc JOIN s$k USING (vec_id) GROUP BY d),
         |wd$k AS (SELECT d, CAST(w AS DOUBLE) / 1073741824.0 AS wd FROM w$k),
         |n$k AS (SELECT sqrt(CAST(sum(CAST(wd * wd AS DECIMAL(38,6))) AS DOUBLE)) AS nrm
         |        FROM wd$k),
         |v$k AS (SELECT d, CAST(wd / nrm AS DECIMAL(18,9)) AS v
         |        FROM wd$k CROSS JOIN n$k)""".stripMargin
    s"""WITH ex AS (
       |  SELECT vec_id,
       |    unnest([{'d': i, 'x': CAST(embedding[i+1] AS DOUBLE)}
       |            for i in range(0, len(embedding))]) AS u
       |  FROM embeddings),
       |exf AS (SELECT vec_id, u.d AS d, u.x AS x FROM ex),
       |m AS (SELECT d,
       |    CAST(sum(CAST(floor(x * 1073741824.0) AS DECIMAL(38,0))) AS DOUBLE)
       |      / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS m
       |  FROM exf GROUP BY d),
       |exc AS (SELECT vec_id, exf.d, x - m AS xc FROM exf JOIN m USING (d)),
       |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM m),
       |v0 AS (SELECT DISTINCT d, CAST(1.0 AS DOUBLE) / sqrt(nd) AS v
       |       FROM exf CROSS JOIN nd),
       |${(1 to PcaRounds).map(round).mkString(",\n")}
       |SELECT v$PcaRounds.d AS dim, CAST(v AS DOUBLE) AS loading,
       |  nrm AS lambda_est
       |FROM v$PcaRounds CROSS JOIN n$PcaRounds
       |ORDER BY dim""".stripMargin
  }

  // ---------------------------------------------------------------- q164
  /** Johnson–Lindenstrauss random projection (64 → [[JlOutDims]] dims,
    * seeded ±1 signs — Achlioptas JCSS'03's database-friendly variant)
    * with a cosine-distortion audit on a deterministic
    * [[JlSample]]-vector sample: per pair, cosine under the full
    * embedding vs the projection, plus the grand mean/max |Δcos| — the
    * go/no-go card for running ANN (q25/q45) on a 4×-cheaper index, the
    * sibling of q150's truncation audit (which cuts dims; JL MIXES
    * them, keeping distortion dimension-uniform). Cosine is
    * scale-invariant, so the usual 1/√k factor is dropped.
    *
    * 100 TB shape: the sign matrix is 64×16 LITERALS baked into the
    * plan at build time (driver computes md5 constants, never data);
    * the projection is a narrow per-row expression a full-corpus
    * materialization would run scan-shaped — here it runs on the
    * 24-row audit sample picked by hash-order TakeOrdered (q24's
    * bounded-queries device; the 276-pair cross join never touches the
    * corpus). Parity: ±1·x terms fold left-to-right in double matching
    * `list_dot_product`'s fold (the q24 contract); cosines round to
    * 4 dp; |Δ| rounds through DECIMAL(18,6) and decimal-sums for the
    * grand mean (one IEEE division); max over identical doubles. */
  private val JlOutDims = 16
  private val JlInDims  = 64
  private val JlSample  = 24

  /** Seeded ±1 entry of the projection matrix — a BUILD-TIME constant
    * (both the plan and the oracle text embed the same literals). */
  private def jlSign(i: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$i:$j".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1.0 else -1.0
  }

  def q164JlProjection(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dot  = (a: Column, b: Column) => graft.expr.VecDot.dot(a, b)
    val e = Tables(spark, dir).embeddings
    val hj = graft.text.TextOps.hex60(concat(lit("jls:"), col("vec_id").cast("string")))
    val sample = e
      .select(col("vec_id"), col("embedding"), hj.as("hj"))
      .orderBy(col("hj"), col("vec_id")).limit(JlSample)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true) // read by both sides of the pair join
    def proj(x: Column, j: Int): Column =
      (0 until JlInDims).map(i =>
        lit(jlSign(i, j)) * element_at(x, i + 1).cast(DoubleType)).reduce(_ + _)
    val projected = sample.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"),
      array((0 until JlOutDims).map(j => proj(col("embedding"), j)): _*).as("pv"))
      .localCheckpoint(true)
    def side(s: String): DataFrame = projected.select(
      col("vec_id").as(s"id_$s"), col("cv").as(s"cv_$s"), col("pv").as(s"pv_$s"))
    def cosine(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    val pairs = side("a").join(side("b"), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("cv_a"), col("cv_b")), 4).as("cos_full"),
        round(cosine(col("pv_a"), col("pv_b")), 4).as("cos_proj"))
      .withColumn("err", abs(col("cos_full") - col("cos_proj")).cast(DecimalType(18, 6)))
      .localCheckpoint(true) // read twice: pair rows + the audit fold
    val grand = pairs.agg(
      (sum(col("err")).cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("mean_abs_err"),
      max(col("err").cast(DoubleType)).as("max_abs_err"))
    pairs
      .select(col("id_a"), col("id_b"), col("cos_full"), col("cos_proj"),
        col("err").cast(DoubleType).as("abs_err"))
      .crossJoin(broadcast(grand))
      .orderBy(col("id_a"), col("id_b"))
  }

  val q164Sql: String = {
    def projSql(v: String, j: Int): String =
      (0 until JlInDims).map { i =>
        val s = if (jlSign(i, j) > 0) "1.0" else "-1.0"
        s"$s * $v[${i + 1}]"
      }.mkString(" + ")
    val pvList = (0 until JlOutDims).map(j => projSql("cv", j)).mkString(",\n|    ")
    s"""WITH h AS (SELECT vec_id, embedding::DOUBLE[] AS cv,
       |    ('0x' || substr(md5('jls:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS hj
       |  FROM embeddings),
       |s AS (SELECT vec_id, cv FROM h ORDER BY hj, vec_id LIMIT $JlSample),
       |p AS (SELECT vec_id, cv, [
       |    $pvList] AS pv FROM s),
       |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(list_dot_product(a.cv, b.cv)
       |      / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv))), 4) AS cos_full,
       |    round(list_dot_product(a.pv, b.pv)
       |      / (sqrt(list_dot_product(a.pv, a.pv)) * sqrt(list_dot_product(b.pv, b.pv))), 4) AS cos_proj
       |  FROM p a JOIN p b ON a.vec_id < b.vec_id),
       |er AS (SELECT *, CAST(abs(cos_full - cos_proj) AS DECIMAL(18,6)) AS err FROM pr),
       |g AS (SELECT CAST(sum(err) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_abs_err,
       |    max(CAST(err AS DOUBLE)) AS max_abs_err FROM er)
       |SELECT id_a, id_b, cos_full, cos_proj, CAST(err AS DOUBLE) AS abs_err,
       |  mean_abs_err, max_abs_err
       |FROM er CROSS JOIN g ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------- q188
  /** Embedding effective rank & isotropy — the whole-spectrum summary
    * q137's single component can't give, WITHOUT an eigendecomposition:
    * participation ratio PR = (tr C)² / tr(C²) (= (Σλ)²/Σλ², the
    * effective number of principal directions — Roy & Vetterli 2007's
    * "effective rank" in its PR form), plus per-dim variance extremes.
    * PR ≈ d means isotropic (all directions used); PR ≈ 1 means the
    * corpus collapsed onto one direction — the anisotropy pathology
    * ("all my vectors point the same way") that breaks cosine retrieval.
    * tr(C²) = ΣᵢⱼCᵢⱼ² needs only the covariance ENTRIES, never its
    * eigenvectors.
    *
    * 100 TB shape: second moments come from one self-join of the
    * fixed-point (vec_id, dim, q) frame on vec_id — the product frame
    * map-side combines onto d(d+1)/2 = 2080 keys before any shuffle, so
    * the exchange is dimension²-bounded no matter the corpus size; every
    * cross-row sum is exact decimal (q68's fixed-point contract at 2¹⁵ —
    * chosen so q·q products stay integer-exact in DECIMAL), making the
    * whole card partition-invariant. Parity: covariance entries quantize
    * to integer 1e-8 units via floor(x·10⁸ + 0.5) on the bit-identical
    * double chain (not a DECIMAL cast — the double→decimal conversion
    * paths split cross-engine at rounding edges; 10⁸ keeps the Frobenius
    * sum's scaled value under 2⁵³ so its int→double conversion is also
    * exact), trace/Frobenius fold as exact integer sums, and the three
    * output ratios are fixed-shape double ops. The card reports the
    * spectrum OF THE 2⁻¹⁵-QUANTIZED corpus — deterministic by
    * construction; quantization perturbs variances by O(2⁻¹⁵) relative,
    * far below decision thresholds. */
  private val Fp15 = 32768.0 // 2^15: q·q stays integer-exact in decimal
  private val Dec18 = DecimalType(18, 0)

  def q188EffectiveRank(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    // referenced three times (pair join both sides + per-dim sums):
    // materialize the 8-byte-quantized frame once.
    // r16: spread the single-split gate-scale scan first — the in-row
    // dim² pair join below otherwise runs on the checkpoint's ONE
    // partition (profiled 1.0 s single-task); no-op on a many-split
    // production scan (guide §2.5)
    val ex = graft.sql.Tables.spread(e.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        floor(col("x").cast(DoubleType) * lit(Fp15)).cast(Dec18).as("q"))
      .localCheckpoint(true)
    val nn = e.agg(count(lit(1)).as("n"))
    val sd = ex.groupBy(col("dim")).agg(sum(col("q")).as("s"))
    val dd = sd.agg((max(col("dim")) + 1).as("d"))
    val pp = ex.as("a")
      .join(ex.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.dim") <= col("b.dim"))
      .groupBy(col("a.dim").as("i"), col("b.dim").as("j"))
      .agg(sum(col("a.q") * col("b.q")).as("spp"))
    // covariance entries quantize to integer 1e-8 units via
    // floor(x·10⁸ + 0.5) on the (bit-identical) double chain — NOT a
    // DECIMAL cast, whose double→decimal paths differ cross-engine at
    // rounding edges; 10⁸ (not 10⁹) keeps Σc² scaled under 2⁵³ so every
    // later int→double conversion is exact. trace²/frob2 is scale-free:
    // (tr8/10⁸)² / (Σc8²/10¹⁶) = tr8²/Σc8².
    val cv = pp
      .join(broadcast(sd.select(col("dim").as("i"), col("s").as("si"))), Seq("i"))
      .join(broadcast(sd.select(col("dim").as("j"), col("s").as("sj"))), Seq("j"))
      .crossJoin(broadcast(nn))
      .select(col("i"), col("j"),
        floor(((col("spp").cast(DoubleType) / col("n") -
          (col("si").cast(DoubleType) / col("n")) *
            (col("sj").cast(DoubleType) / col("n"))) / lit(FpScale))
          * lit(1.0e8) + lit(0.5)).as("c8"))
    val folded = cv.agg(
      sum(when(col("i") === col("j"), col("c8"))).as("tr8"),
      sum(col("c8") * col("c8")).as("f_all8"),
      sum(when(col("i") =!= col("j"), col("c8") * col("c8"))).as("f_off8"),
      max(when(col("i") === col("j"), col("c8"))).as("vmax8"),
      min(when(col("i") === col("j"), col("c8"))).as("vmin8"))
    val t8 = col("tr8").cast(DoubleType)
    folded.crossJoin(broadcast(nn)).crossJoin(broadcast(dd))
      .select(col("n"), col("d"),
        (t8 / lit(1.0e8)).as("total_var"),
        (t8 * t8 / (col("f_all8") + col("f_off8")).cast(DoubleType))
          .as("effective_rank"),
        (col("vmax8").cast(DoubleType) / t8).as("top_var_share"),
        (col("vmax8").cast(DoubleType) /
          nullif(col("vmin8").cast(DoubleType), lit(0.0)))
          .as("anisotropy_ratio")) // NULL for degenerate zero-variance dims
  }

  val q188Sql: String =
    s"""WITH ex AS (
       |  SELECT vec_id,
       |    unnest([{'d': i, 'q': CAST(floor(CAST(embedding[i+1] AS DOUBLE) * $Fp15) AS DECIMAL(18,0))}
       |            for i in range(0, len(embedding))]) AS u
       |  FROM embeddings),
       |e2 AS (SELECT vec_id, u.d AS dim, u.q AS q FROM ex),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |sd AS (SELECT dim, sum(q) AS s FROM e2 GROUP BY 1),
       |dd AS (SELECT max(dim) + 1 AS d FROM sd),
       |pp AS (SELECT a.dim AS i, b.dim AS j, sum(a.q * b.q) AS spp
       |       FROM e2 a JOIN e2 b ON a.vec_id = b.vec_id AND a.dim <= b.dim
       |       GROUP BY 1, 2),
       |cv AS (SELECT i, j,
       |    CAST(floor((CAST(spp AS DOUBLE) / n
       |      - (CAST(sa.s AS DOUBLE) / n) * (CAST(sb.s AS DOUBLE) / n)) / $FpScale
       |      * 100000000.0 + 0.5) AS BIGINT) AS c8
       |  FROM pp JOIN sd sa ON i = sa.dim JOIN sd sb ON j = sb.dim CROSS JOIN nn),
       |fd AS (SELECT
       |    sum(CASE WHEN i = j THEN c8 END) AS tr8,
       |    sum(c8 * c8) AS f_all8,
       |    sum(CASE WHEN i <> j THEN c8 * c8 END) AS f_off8,
       |    max(CASE WHEN i = j THEN c8 END) AS vmax8,
       |    min(CASE WHEN i = j THEN c8 END) AS vmin8
       |  FROM cv)
       |SELECT n, d,
       |  CAST(tr8 AS DOUBLE) / 100000000.0 AS total_var,
       |  CAST(tr8 AS DOUBLE) * CAST(tr8 AS DOUBLE)
       |    / CAST(f_all8 + f_off8 AS DOUBLE) AS effective_rank,
       |  CAST(vmax8 AS DOUBLE) / CAST(tr8 AS DOUBLE) AS top_var_share,
       |  CAST(vmax8 AS DOUBLE) / nullif(CAST(vmin8 AS DOUBLE), 0) AS anisotropy_ratio
       |FROM fd CROSS JOIN nn CROSS JOIN dd""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_pca_power" -> (q137PcaPower _),
    "q164_jl_projection" -> (q164JlProjection _),
    "q188_effective_rank" -> (q188EffectiveRank _))

  val oracleSql: Map[String, String] = Map(
    "q137_pca_power" -> q137Sql,
    "q164_jl_projection" -> q164Sql,
    "q188_effective_rank" -> q188Sql)
}
