package graft.sim

import graft.sql.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Distributed model fitting over the embedding corpus — the supervised
  * companion to [[SpectralQueries]]' unsupervised power iteration: each
  * optimizer step is one full-corpus scan folding to a gradient vector,
  * the map-reduce training loop (Chu et al., NIPS 2006) that every
  * data-parallel trainer is built on — plus the evaluation card (q154)
  * a fitted model must ship with, the way q153 backtests q146's
  * forecaster.
  */
object MlQueries {

  // ---------------------------------------------------------------- q147
  /** Logistic regression by [[GdSteps]] full-batch gradient-descent steps
    * (η = 1, zero init, bias term): features = the first [[NumFeat]]
    * embedding dimensions, target = label < 5. The output row carries the
    * weight vector after EACH step, so the oracle's hash pins the whole
    * optimizer trajectory, not just a final fixed point.
    *
    * 100 TB shape: per step ONE corpus scan folding map-side to a
    * ([[NumFeat]]+1)-term gradient + count — a single 1-row aggregate, no
    * shuffle wider than the partial-aggregate merge, exactly q137's
    * schedule with a d+1-column fold instead of a posexplode. The weight
    * vector travels as broadcast literals (driver ferries ≤ d+1 bounded
    * scalars per step, never computes — the q137/pageRank-`n` rule).
    *
    * Parity: the margin z = Σ wₖxₖ + b is a FIXED-SHAPE left-associated
    * double chain (float features widen exactly); the sigmoid's libm exp
    * rounds through DECIMAL(18,6) per row (q74's ln rule — measured-safe
    * at corpus row counts); per-row gradient terms round through
    * DECIMAL(18,9) so the cross-row sums are exact decimal addition,
    * order- and partition-free; the step update wₖ − gₖ/n is one division
    * + one subtraction on those exact sums, rounded back through
    * DECIMAL(18,9) — so both engines walk bit-identical trajectories. */
  private val NumFeat = 4
  private val GdSteps = 2

  /** The feature frame shared by fit (q147) and eval (q154): x0..x<d-1>
    * double features + y ∈ {0.0, 1.0}. */
  private def featureFrame(spark: SparkSession, dir: String): DataFrame = {
    val feats = (0 until NumFeat).map(i =>
      element_at(col("embedding"), i + 1).cast(DoubleType).as(s"x$i"))
    val y = when(col("label") < 5, lit(1.0)).otherwise(lit(0.0)).as("y")
    Tables(spark, dir).embeddings.select(feats :+ y: _*)
  }

  /** The fixed-shape margin + 6-dp sigmoid for a given weight vector —
    * the ONE scoring expression both the in-step residual and q154's
    * eval reuse, so train- and eval-time scores cannot diverge. */
  private def sigmoid6(w: Array[Double]): Column = {
    val z = (0 until NumFeat).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _) +
      lit(w(NumFeat))
    (lit(1.0) / (lit(1.0) + exp(-z))).cast(DecimalType(18, 6))
  }

  /** Runs the [[GdSteps]]-step fit. Returns the per-step 1-row weight
    * frames (for q147's trajectory output) and the final weights as
    * driver-ferried bounded scalars (for q154's scoring pass). */
  private def fit(spark: SparkSession, dir: String): (Seq[DataFrame], Array[Double]) =
    fitFrame(featureFrame(spark, dir))

  /** The same [[GdSteps]]-step fit over ANY feature frame (x0..x<d-1>, y)
    * — q147/q154 pass the full corpus, q207 passes gated training
    * subsets. */
  private def fitFrame(x: DataFrame): (Seq[DataFrame], Array[Double]) = {
    // one GD step from weight vector w: returns the 1-row frame holding
    // the updated weights as DECIMAL(18,9) (w0..w<NumFeat-1> = features,
    // w<NumFeat> = bias)
    def step(w: Array[Double]): DataFrame = {
      val resid = sigmoid6(w).cast(DoubleType) - col("y")
      val gTerms = (0 until NumFeat).map(i =>
        sum((resid * col(s"x$i")).cast(DecimalType(18, 9))).as(s"g$i")) :+
        sum(resid.cast(DecimalType(18, 9))).as(s"g$NumFeat") :+
        count(lit(1)).as("n")
      x.agg(gTerms.head, gTerms.tail: _*)
        .select((0 to NumFeat).map(k =>
          (lit(w(k)) - col(s"g$k").cast(DoubleType) / col("n").cast(DoubleType))
            .cast(DecimalType(18, 9)).as(s"w$k")): _*)
    }

    var w = Array.fill(NumFeat + 1)(0.0)
    val trajectory = (1 to GdSteps).map { _ =>
      val f = step(w)
      // the driver FERRIES the d+1 weights (bounded), never computes
      w = f.select((0 to NumFeat).map(k => col(s"w$k").cast(DoubleType)): _*)
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
      f
    }
    (trajectory, w)
  }

  def q147LogisticGd(spark: SparkSession, dir: String): DataFrame = {
    val (trajectory, _) = fit(spark, dir)
    def names(s: Int): Seq[String] =
      (0 until NumFeat).map(i => s"w${s}_x$i") :+ s"w${s}_b"
    trajectory.zipWithIndex
      .map { case (f, i) =>
        f.select((0 to NumFeat).map(k =>
          col(s"w$k").cast(DoubleType).as(names(i + 1)(k))): _*)
      }
      .reduce(_ crossJoin _)
  }

  /** The fit CTE chain, DuckDB side (no WITH): x (features+label) and
    * s1/g1/w1 … s<GdSteps>/g<GdSteps>/w<GdSteps> — shared by q147 and
    * q154 so the oracle's trajectory arithmetic cannot diverge between
    * the fit gate and the eval gate. */
  private val mlCtesSql: String = {
    val xCols = (0 until NumFeat)
      .map(i => s"CAST(embedding[${i + 1}] AS DOUBLE) AS x$i").mkString(",\n|  ")
    def zSql(wRef: Int => String): String =
      ((0 until NumFeat).map(i => s"${wRef(i)} * x$i") :+ wRef(NumFeat)).mkString(" + ")
    def stepSql(k: Int, wRef: Int => String, prevJoin: String): String = {
      val gCols = ((0 until NumFeat).map(i =>
        s"sum(CAST((CAST(sg AS DOUBLE) - y) * x$i AS DECIMAL(18,9))) AS g$i") :+
        s"sum(CAST(CAST(sg AS DOUBLE) - y AS DECIMAL(18,9))) AS g$NumFeat").mkString(",\n|    ")
      val wCols = (0 to NumFeat).map(i =>
        s"CAST(${wRef(i)} - CAST(g$i AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(18,9)) AS w$i")
        .mkString(",\n|    ")
      s"""s$k AS (SELECT x.*, CAST(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(${zSql(wRef)}))) AS DECIMAL(18,6)) AS sg
         |  FROM x$prevJoin),
         |g$k AS (SELECT $gCols,
         |    count(*) AS n
         |  FROM s$k),
         |w$k AS (SELECT $wCols
         |  FROM g$k$prevJoin)""".stripMargin
    }
    val zero: Int => String = _ => "CAST(0.0 AS DOUBLE)"
    def fromW(c: Int): Int => String = i => s"CAST(w$c.w$i AS DOUBLE)"
    val steps = (1 to GdSteps).map { k =>
      if (k == 1) stepSql(1, zero, "")
      else stepSql(k, fromW(k - 1), s" CROSS JOIN w${k - 1}")
    }.mkString(",\n")
    s"""x AS (SELECT $xCols,
       |  CASE WHEN label < 5 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM embeddings),
       |$steps""".stripMargin
  }

  val q147Sql: String = {
    val outCols = (1 to GdSteps).flatMap { s =>
      (0 until NumFeat).map(i => s"CAST(w$s.w$i AS DOUBLE) AS w${s}_x$i") :+
        s"CAST(w$s.w$NumFeat AS DOUBLE) AS w${s}_b"
    }.mkString(",\n|  ")
    s"""WITH $mlCtesSql
       |SELECT $outCols
       |FROM ${(1 to GdSteps).map(s => s"w$s").mkString(" CROSS JOIN ")}""".stripMargin
  }

  // ---------------------------------------------------------------- q154
  /** ROC-AUC + Brier score + 10-bin reliability (calibration) table for
    * q147's fitted scores — the eval card a trained classifier must ship
    * with (pairs with q147 exactly the way q153's backtest pairs with
    * q146's forecaster; q124's estimate/calibration split, applied to a
    * model). AUC is the tie-corrected Mann–Whitney form: over the
    * DISTINCT-score collapse, Σ_s [pos(s)·neg_below(s) + pos(s)·neg(s)/2]
    * / (P·N) — computed in the doubled all-integer form
    * num2 = Σ_s [2·pos·neg_below + pos·neg] so every cross-row term is an
    * exact integer and AUC is ONE IEEE division at the end.
    *
    * 100 TB shape: scoring rides ONE corpus scan (the margin + sigmoid
    * are codegen'd scalar expressions); the distinct-score collapse is a
    * map-side-combinable aggregate whose output is bounded by the score
    * DOMAIN — the 6-dp sigmoid rounding admits at most 10⁶+1 distinct
    * values, so the rank sweep window that follows runs on a
    * value-cardinality frame (q131's sweep argument), never on corpus
    * rows. Calibration bins and P/N totals fold from the same collapsed
    * frame; nothing after the scan is corpus-sized.
    *
    * Parity: scores reuse the EXACT fit-time scoring expression (shared
    * [[sigmoid6]] kernel / shared CTE text); num2 sums as DECIMAL(38,0)
    * (P·N overflows a long at corpus scale — q125's rule); Brier terms
    * (s−y)² are PURE decimal products of exact operands — no float ever
    * enters, dodging the double→decimal half-way trap q146 documents
    * (measured here: 2e-12 drift with a pow-then-round formulation);
    * AUC/Brier/mean_score/frac_pos are each
    * one fixed-shape IEEE division of exact sums (q146's no-output-
    * rounding rule). */
  def q154ModelEval(spark: SparkSession, dir: String): DataFrame = {
    val (_, w) = fit(spark, dir)
    val scored = featureFrame(spark, dir)
      .select(sigmoid6(w).as("s"), col("y"))

    // distinct-score collapse: (s, pos, neg) — map-side combinable,
    // bounded by the 6-dp score domain. The Brier term (s−y)² stays in
    // PURE decimal arithmetic (s is 6-dp decimal, y ∈ {0,1} exact): a
    // double-pow-then-round term would hit the double→decimal half-way
    // trap q146 documents (measured here: 2e-12 drift over 500 rows)
    val sdiff = (col("s") - col("y").cast(DecimalType(1, 0))).cast(DecimalType(7, 6))
    val grp = scored.groupBy(col("s"))
      .agg(count(when(col("y") === 1.0, 1)).as("pos"),
        count(when(col("y") === 0.0, 1)).as("neg"),
        sum(sdiff * sdiff).as("sqerr"))

    // rank sweep over the value-cardinality frame (q131's device): negs
    // strictly below each distinct score
    val wBelow = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val swept = grp.withColumn("neg_below", coalesce(sum(col("neg")).over(wBelow), lit(0L)))

    // per-row term in decimal BEFORE the multiply: pos·(2·neg_below+neg)
    // can pass 2^63 at corpus scale (the inner long 2·neg_below+neg ≤ ~2N
    // stays safe); DuckDB's side computes the same exact integer in
    // native 128-bit, so the differing shapes agree bit-for-bit
    val totals = swept.agg(
      sum((col("pos").cast(DecimalType(19, 0)) *
        (lit(2L) * col("neg_below") + col("neg")))
        .cast(DecimalType(38, 0))).as("num2"),
      sum(col("pos")).as("p"),
      sum(col("neg")).as("n"),
      sum(col("sqerr")).as("sq"))
      .select(
        (col("num2").cast(DoubleType) /
          nullif(lit(2.0) * col("p").cast(DoubleType) * col("n").cast(DoubleType),
            lit(0.0))).as("auc"),
        (col("sq").cast(DoubleType) /
          (col("p") + col("n")).cast(DoubleType)).as("brier"))

    // reliability bins from the same collapsed frame: fixed-width deciles
    // of the score, mean score vs realized positive rate per bin
    val bin = least(floor(col("s").cast(DoubleType) * lit(10.0)).cast(IntegerType), lit(9))
    val bins = grp.groupBy(bin.as("bin"))
      .agg(sum(col("pos") + col("neg")).as("n_rows"),
        sum(col("s") * (col("pos") + col("neg")).cast(DecimalType(12, 0))).as("ssum"),
        sum(col("pos")).as("npos"))
      .select(col("bin"), col("n_rows"),
        (col("ssum").cast(DoubleType) / col("n_rows").cast(DoubleType)).as("mean_score"),
        (col("npos").cast(DoubleType) / col("n_rows").cast(DoubleType)).as("frac_pos"))

    bins.crossJoin(broadcast(totals)).orderBy(col("bin"))
  }

  val q154Sql: String =
    s"""WITH $mlCtesSql,
       |scored AS (SELECT
       |    CAST(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(${
      ((0 until NumFeat).map(i => s"CAST(w$GdSteps.w$i AS DOUBLE) * x$i") :+
        s"CAST(w$GdSteps.w$NumFeat AS DOUBLE)").mkString(" + ")
    }))) AS DECIMAL(18,6)) AS s, y
       |  FROM x CROSS JOIN w$GdSteps),
       |grp AS (SELECT s,
       |    count(*) FILTER (WHERE y = 1.0) AS pos,
       |    count(*) FILTER (WHERE y = 0.0) AS neg,
       |    sum(CAST(s - CAST(y AS DECIMAL(1,0)) AS DECIMAL(7,6))
       |      * CAST(s - CAST(y AS DECIMAL(1,0)) AS DECIMAL(7,6))) AS sqerr
       |  FROM scored GROUP BY 1),
       |swept AS (SELECT s, pos, neg, sqerr,
       |    coalesce(sum(neg) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
       |  FROM grp),
       |tot AS (SELECT
       |    CAST(sum(CAST(2 * pos * neg_below + pos * neg AS DECIMAL(38,0))) AS DOUBLE)
       |      / nullif(2.0 * CAST(sum(pos) AS DOUBLE) * CAST(sum(neg) AS DOUBLE), 0.0) AS auc,
       |    CAST(sum(sqerr) AS DOUBLE)
       |      / CAST(sum(pos) + sum(neg) AS DOUBLE) AS brier
       |  FROM swept),
       |bins AS (SELECT
       |    least(CAST(floor(CAST(s AS DOUBLE) * 10.0) AS INT), 9) AS bin,
       |    sum(pos + neg) AS n_rows,
       |    sum(s * CAST(pos + neg AS DECIMAL(12,0))) AS ssum,
       |    sum(pos) AS npos
       |  FROM grp GROUP BY 1)
       |SELECT bin, CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(ssum AS DOUBLE) / CAST(n_rows AS DOUBLE) AS mean_score,
       |  CAST(npos AS DOUBLE) / CAST(n_rows AS DOUBLE) AS frac_pos,
       |  auc, brier
       |FROM bins CROSS JOIN tot ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q159
  /** Weight-of-evidence decile binning + information value of the first
    * embedding feature against the q147 target — the feature-SCREENING
    * card (the credit-scoring WOE/IV standard; Siddiqi 2006): per decile
    * bin, the Laplace-smoothed log-odds lift WOE_b = ln(ps_b/ns_b), and
    * the grand IV = Σ (ps_b − ns_b)·WOE_b that ranks features BEFORE any
    * model is fit (IV < 0.02 ⇒ not predictive; > 0.3 ⇒ strong).
    * Completes the supervised family: q159 screens, q147 fits, q154
    * evaluates.
    *
    * 100 TB shape: ONE corpus scan collapses to the distinct-VALUE count
    * table (map-side combinable, value-cardinality ≤ 2³² float domain);
    * decile thresholds are q39/q122's integer-threshold device folded to
    * ONE broadcast array row; bucket assignment runs on the collapsed
    * frame (cheaper than q122, which assigns per corpus row) and
    * everything after is 10-bin-sized. Smoothing is integer
    * ((pos+1)/(P+10)) so empty-side bins are deterministic, never ±∞.
    *
    * Parity: counts/thresholds exact (float compares are
    * bit-deterministic); each share is one double division; ln rounds
    * through DECIMAL(18,6) (the q66/q74 rule) for WOE, the IV term
    * rounds once as a whole (q122's spelling) and decimal-sums. */
  def q159WoeIv(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).embeddings
      .select(element_at(col("embedding"), 1).as("x"),
        when(col("label") < 5, 1L).otherwise(0L).as("y"))
    val cnt = d.groupBy(col("x"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val cum = cnt
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy()))
    val thresholds = (1 to 9).map(i =>
      min(when(col("cum") * 10 >= col("tot") * i, col("x"))).as(s"t$i"))
    val tarr = cum.agg(thresholds.head, thresholds.tail: _*)
      .select(array((1 to 9).map(i => col(s"t$i")): _*).as("ts"))
    val byBin = cnt.crossJoin(broadcast(tarr))
      .select((size(filter(col("ts"), t => col("x") > t)) + 1).as("bin"),
        col("cnt"), col("pos"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("n"), sum(col("pos")).as("n_pos"))
    val totals = byBin.agg(sum(col("n")).as("nt"), sum(col("n_pos")).as("pt"))
    val ps = (col("n_pos") + 1).cast(DoubleType) / (col("pt") + 10)
    val ns = ((col("n") - col("n_pos")) + 1).cast(DoubleType) /
      ((col("nt") - col("pt")) + 10)
    val scored = byBin.crossJoin(broadcast(totals))
      .select(col("bin"), col("n"), col("n_pos"),
        log(ps / ns).cast(DecimalType(18, 6)).cast(DoubleType).as("woe"),
        ((ps - ns) * log(ps / ns)).cast(DecimalType(18, 6)).as("term"))
      .localCheckpoint(true) // read twice: bin rows + the IV fold
    val iv = scored.agg(
      sum(col("term")).cast(DecimalType(18, 6)).cast(DoubleType).as("iv"))
    scored.drop("term").crossJoin(broadcast(iv)).orderBy(col("bin"))
  }

  val q159Sql: String = {
    val tmins = (1 to 9).map(i =>
      s"min(CASE WHEN cum * 10 >= tot * $i THEN x END)").mkString(",\n|    ")
    s"""WITH d AS (SELECT embedding[1] AS x,
       |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y FROM embeddings),
       |cnt AS (SELECT x, count(*) AS cnt, sum(y) AS pos FROM d GROUP BY 1),
       |cum AS (SELECT x, cnt, pos,
       |    sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER () AS tot FROM cnt),
       |tarr AS (SELECT [
       |    $tmins] AS ts FROM cum),
       |bins AS (SELECT 1 + len(list_filter(ts, t -> x > t)) AS bin,
       |    CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
       |  FROM cnt CROSS JOIN tarr GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(n_pos) AS BIGINT) AS pt
       |  FROM bins),
       |sc AS (SELECT bin, n, n_pos,
       |    CAST(CAST(ln((CAST(n_pos + 1 AS DOUBLE) / (pt + 10))
       |         / (CAST((n - n_pos) + 1 AS DOUBLE) / ((nt - pt) + 10)))
       |      AS DECIMAL(18,6)) AS DOUBLE) AS woe,
       |    CAST((CAST(n_pos + 1 AS DOUBLE) / (pt + 10)
       |          - CAST((n - n_pos) + 1 AS DOUBLE) / ((nt - pt) + 10))
       |      * ln((CAST(n_pos + 1 AS DOUBLE) / (pt + 10))
       |           / (CAST((n - n_pos) + 1 AS DOUBLE) / ((nt - pt) + 10)))
       |      AS DECIMAL(18,6)) AS term
       |  FROM bins CROSS JOIN tot),
       |iv AS (SELECT CAST(CAST(sum(term) AS DECIMAL(18,6)) AS DOUBLE) AS iv FROM sc)
       |SELECT bin, n, n_pos, woe, iv
       |FROM sc CROSS JOIN iv ORDER BY bin""".stripMargin
  }

  // ---------------------------------------------------------------- q207
  /** LEARNING CURVE of q147's classifier: the fit re-runs on nested
    * hash-gated training fractions (25/50/75/100% of the non-held-out
    * corpus) and each fitted model is evaluated by q154's tie-corrected
    * AUC on ONE fixed held-out slice (fold 7 of an 8-fold hash split —
    * never trained on). Per fraction: training rows, eval rows, AUC.
    * This is the "do we need more data?" card every training-data
    * acquisition decision reads — completing the supervised family's
    * lifecycle: q159 screens features, q147 fits, q154 evaluates, q207
    * prices the next data purchase.
    *
    * Subsets NEST (same hash, growing threshold), so the curve isolates
    * data volume — no subset-to-subset sampling noise. Shares
    * [[fitFrame]]/[[sigmoid6]] verbatim with q147/q154 (and the oracle
    * unrolls the identical per-subset trajectory text), so a curve point
    * at 100% is q147's own fit evaluated on the held-out slice.
    *
    * 100 TB shape: 4 fits × [[GdSteps]] corpus scans, each folding
    * map-side to a (d+1)-term gradient (q147's schedule; the gate is a
    * scan-stage hash projection, no membership table); each eval is one
    * scan of the 1/8 slice + the value-cardinality rank sweep (q154's
    * device). Parity: identical decimal trajectory arithmetic; the AUC
    * numerator sums as DECIMAL(38,0). */
  private val LcPcts = Seq(25, 50, 75, 100)

  private def gatedFrame(spark: SparkSession, dir: String): DataFrame = {
    val feats = (0 until NumFeat).map(i =>
      element_at(col("embedding"), i + 1).cast(DoubleType).as(s"x$i"))
    val y = when(col("label") < 5, lit(1.0)).otherwise(lit(0.0)).as("y")
    val fold = (graft.text.TextOps.hex60(
      concat(lit("lc:"), col("vec_id").cast("string"))) % 8).as("fold")
    val u = (graft.text.TextOps.hex60(
      concat(lit("lcp:"), col("vec_id").cast("string"))) % 100).as("u")
    Tables(spark, dir).embeddings.select(feats ++ Seq(y, fold, u): _*)
  }

  def q207LearningCurve(spark: SparkSession, dir: String): DataFrame = {
    val g = gatedFrame(spark, dir).localCheckpoint(true)
    val eval = g.filter(col("fold") === 7)
    val nEval = eval.count()
    val curves = LcPcts.map { p =>
      val train = g.filter(col("fold") =!= 7 && col("u") < p)
      val (_, w) = fitFrame(train)
      val scored = eval.select(sigmoid6(w).as("s"), col("y"))
      val grp = scored.groupBy(col("s"))
        .agg(count(when(col("y") === 1.0, 1)).as("pos"),
          count(when(col("y") === 0.0, 1)).as("neg"))
      val wBelow = Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val swept = grp.withColumn("neg_below",
        coalesce(sum(col("neg")).over(wBelow), lit(0L)))
      val nTrain = train.count()
      swept.agg(
        sum((col("pos").cast(DecimalType(19, 0)) *
          (lit(2L) * col("neg_below") + col("neg")))
          .cast(DecimalType(38, 0))).as("num2"),
        sum(col("pos")).as("p"), sum(col("neg")).as("n"))
        .select(lit(p.toLong).as("pct"), lit(nTrain).as("n_train"),
          lit(nEval).as("n_eval"),
          (col("num2").cast(DoubleType) /
            nullif(lit(2.0) * col("p").cast(DoubleType) * col("n").cast(DoubleType),
              lit(0.0)))
            .as("auc"))
    }
    curves.reduce(_ unionByName _).orderBy(col("pct"))
  }

  // ---- shared oracle-SQL generators for the GD-fit + held-out-AUC arm
  // (q207's spellings, factored for q212 — the ccWalkCtesSql rule: one
  // spelling, never hand-inlined copies) ----
  private val gdXCols = (0 until NumFeat)
    .map(i => s"CAST(embedding[${i + 1}] AS DOUBLE) AS x$i").mkString(", ")
  private def gdZSql(wRef: Int => String): String =
    ((0 until NumFeat).map(i => s"${wRef(i)} * x$i") :+ wRef(NumFeat)).mkString(" + ")
  private def gdStepSql(tag: String, k: Int, wRef: Int => String, prevJoin: String): String = {
    val gCols = ((0 until NumFeat).map(i =>
      s"sum(CAST((CAST(sg AS DOUBLE) - y) * x$i AS DECIMAL(18,9))) AS g$i") :+
      s"sum(CAST(CAST(sg AS DOUBLE) - y AS DECIMAL(18,9))) AS g$NumFeat").mkString(", ")
    val wCols = (0 to NumFeat).map(i =>
      s"CAST(${wRef(i)} - CAST(g$i AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(18,9)) AS w$i")
      .mkString(", ")
    s"""s$tag$k AS (SELECT x$tag.*, CAST(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(${gdZSql(wRef)}))) AS DECIMAL(18,6)) AS sg
       |  FROM x$tag$prevJoin),
       |g$tag$k AS (SELECT $gCols, count(*) AS n FROM s$tag$k),
       |w$tag$k AS (SELECT $wCols FROM g$tag$k$prevJoin)""".stripMargin
  }
  private val gdZero: Int => String = _ => "CAST(0.0 AS DOUBLE)"
  private def gdFromW(tag: String, c: Int): Int => String =
    i => s"CAST(w$tag$c.w$i AS DOUBLE)"

  /** One full arm: train-subset CTE (from `trainSelect`), the unrolled
    * [[GdSteps]] trajectory, scoring over the shared `xe` eval CTE, and
    * the tie-corrected AUC + train count — CTE names all suffixed `tag`. */
  private def gdArmSql(tag: String, trainSelect: String): String = {
    val steps = (1 to GdSteps).map { k =>
      if (k == 1) gdStepSql(tag, 1, gdZero, "")
      else gdStepSql(tag, k, gdFromW(tag, k - 1), s" CROSS JOIN w$tag${k - 1}")
    }.mkString(",\n")
    val finalZ = ((0 until NumFeat).map(i =>
      s"CAST(w$tag$GdSteps.w$i AS DOUBLE) * x$i") :+
      s"CAST(w$tag$GdSteps.w$NumFeat AS DOUBLE)").mkString(" + ")
    s"""x$tag AS MATERIALIZED ($trainSelect),
       |$steps,
       |e$tag AS (SELECT CAST(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-($finalZ))) AS DECIMAL(18,6)) AS s, y
       |  FROM xe CROSS JOIN w$tag$GdSteps),
       |c$tag AS (SELECT s,
       |    count(*) FILTER (WHERE y = 1.0) AS pos,
       |    count(*) FILTER (WHERE y = 0.0) AS neg
       |  FROM e$tag GROUP BY 1),
       |sw$tag AS (SELECT pos, neg,
       |    coalesce(sum(neg) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
       |  FROM c$tag),
       |a$tag AS (SELECT
       |    CAST(sum(CAST(2 * pos * neg_below + pos * neg AS DECIMAL(38,0))) AS DOUBLE)
       |      / nullif(2.0 * CAST(sum(pos) AS DOUBLE) * CAST(sum(neg) AS DOUBLE), 0.0) AS auc
       |  FROM sw$tag),
       |n$tag AS (SELECT count(*) AS n_train FROM x$tag)""".stripMargin
  }

  val q207Sql: String = {
    val xCols = gdXCols
    val perPct = LcPcts.map { p =>
      val tag = s"_$p"
      gdArmSql(tag, s"SELECT * FROM xg WHERE fold != 7 AND u < $p")
    }.mkString(",\n")
    val sel = LcPcts.map { p =>
      val tag = s"_$p"
      s"""SELECT CAST($p AS BIGINT) AS pct, CAST(n_train AS BIGINT) AS n_train,
         |  (SELECT CAST(count(*) AS BIGINT) FROM xe) AS n_eval, auc
         |FROM n$tag, a$tag""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH xg AS MATERIALIZED (SELECT $xCols,
       |  CASE WHEN label < 5 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
       |  ('0x' || substr(md5('lc:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS fold,
       |  ('0x' || substr(md5('lcp:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS u
       |  FROM embeddings),
       |xe AS MATERIALIZED (SELECT * FROM xg WHERE fold = 7),
       |$perPct
       |$sel
       |ORDER BY pct""".stripMargin
  }

  // ---------------------------------------------------------------- q212
  /** SOURCE-GROUP ABLATION — training-data VALUATION, the q169
    * removal-effect pattern applied to the training corpus itself: the
    * 20 sources hash into [[SaGroups]] groups (q201's deterministic
    * md5 device, seed tag `sa:`), q147's classifier re-fits with each
    * group REMOVED from training, and every fit is evaluated by q154's
    * tie-corrected AUC on THE SAME fixed held-out eighth q207 uses
    * (fold 7 of the `lc:` split — never trained on, so ablation deltas
    * and learning-curve points are directly comparable). Per arm:
    * the ablated group, sources/docs removed, training rows, AUC, and
    * `delta_auc` = base − ablated (positive = the group HELPS) — the
    * "which data should we buy more of / drop" card that completes the
    * training-data lifecycle (q207 prices volume, q212 prices
    * composition; DoReMi q180 reweights, this measures removal).
    * Its verdict here is honestly ~0 at every arm — the synthetic
    * features carry no signal (q150's rule, q207's flat curve) — the
    * card is the machinery and its exactness.
    *
    * 100 TB shape: ([[SaGroups]]+1) fits × [[GdSteps]] corpus scans,
    * each folding map-side to a (d+1)-term gradient (q147's schedule);
    * the group gate is a scan-stage hash projection over the one
    * doc-keyed source join (broadcast dimension at any real source
    * cardinality); each eval scans the 1/8 slice + q154's
    * value-cardinality rank sweep. Parity: identical decimal
    * trajectories; `delta_auc` subtracts two identically-computed
    * doubles, so it is bit-stable wherever they are. */
  private val SaGroups = 4

  private def sourcedFrame(spark: SparkSession, dir: String): DataFrame = {
    val feats = (0 until NumFeat).map(i =>
      element_at(col("embedding"), i + 1).cast(DoubleType).as(s"x$i"))
    val y = when(col("label") < 5, lit(1.0)).otherwise(lit(0.0)).as("y")
    val fold = (graft.text.TextOps.hex60(
      concat(lit("lc:"), col("vec_id").cast("string"))) % 8).as("fold")
    val grp = (graft.text.TextOps.hex60(
      concat(lit("sa:"), col("source"))) % SaGroups).as("grp")
    val src = Tables(spark, dir).documents
      .select(col("doc_id").as("vec_id"), col("source"))
    Tables(spark, dir).embeddings
      .join(broadcast(src), Seq("vec_id"))
      .select(feats ++ Seq(y, fold, grp, col("source")): _*)
  }

  def q212SourceAblation(spark: SparkSession, dir: String): DataFrame = {
    val g = sourcedFrame(spark, dir).localCheckpoint(true)
    val eval = g.filter(col("fold") === 7)
    val nEval = eval.count()
    def arm(label: String, train: DataFrame, nSrc: Long, nRemoved: Long): DataFrame = {
      val (_, w) = fitFrame(train)
      val scored = eval.select(sigmoid6(w).as("s"), col("y"))
      val grp2 = scored.groupBy(col("s"))
        .agg(count(when(col("y") === 1.0, 1)).as("pos"),
          count(when(col("y") === 0.0, 1)).as("neg"))
      val wBelow = Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val swept = grp2.withColumn("neg_below",
        coalesce(sum(col("neg")).over(wBelow), lit(0L)))
      val nTrain = train.count()
      swept.agg(
        sum((col("pos").cast(DecimalType(19, 0)) *
          (lit(2L) * col("neg_below") + col("neg")))
          .cast(DecimalType(38, 0))).as("num2"),
        sum(col("pos")).as("p"), sum(col("neg")).as("n"))
        .select(lit(label).as("ablated_group"),
          lit(nSrc).as("n_sources_removed"), lit(nRemoved).as("n_docs_removed"),
          lit(nTrain).as("n_train"), lit(nEval).as("n_eval"),
          (col("num2").cast(DoubleType) /
            nullif(lit(2.0) * col("p").cast(DoubleType) * col("n").cast(DoubleType),
              lit(0.0)))
            .as("auc"))
    }
    val full = g.filter(col("fold") =!= 7)
    // per-group removal ledger (bounded: SaGroups rows, driver-ferried)
    val ledger = full.groupBy(col("grp"))
      .agg(countDistinct(col("source")).as("ns"), count(lit(1)).as("nd"))
      .collect().map(r => r.getAs[Long]("grp") ->
        (r.getAs[Long]("ns"), r.getAs[Long]("nd"))).toMap
    // the five arms are INDEPENDENT fits, but each one is a chain of
    // serial driver-ferried GD steps (one tiny agg+collect job per step)
    // — running them sequentially leaves the cluster idle on every
    // step's tail. Overlap them from a small driver pool (guide §2.6:
    // actions are only sequential because the driver calls them
    // sequentially); each arm's trajectory is deterministic in
    // isolation, and Future.sequence preserves arm order, so the output
    // is bit-identical to the sequential schedule. Measured at sf0.1:
    // 6.9 s → 3.0 s wall on the same capture day (OPTIMIZATION_r16.md).
    val armSpecs: Seq[(String, DataFrame, Long, Long)] =
      ("none", full, 0L, 0L) +:
        (0 until SaGroups).map { k =>
          val (ns, nd) = ledger.getOrElse(k.toLong, (0L, 0L))
          (s"g$k", full.filter(col("grp") =!= k), ns, nd)
        }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(armSpecs.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val arms =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(armSpecs.map { case (l, t, ns, nd) =>
          scala.concurrent.Future(arm(l, t, ns, nd))
        }), scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    val rows = arms.reduce(_ unionByName _).localCheckpoint(true)
    val base = rows.filter(col("ablated_group") === "none")
      .select(col("auc").as("base_auc"))
    rows.crossJoin(broadcast(base))
      .select(col("ablated_group"), col("n_sources_removed"), col("n_docs_removed"),
        col("n_train"), col("n_eval"), col("auc"),
        (col("base_auc") - col("auc")).as("delta_auc"))
      .orderBy(col("ablated_group"))
  }

  val q212Sql: String = {
    val armTags = "none" +: (0 until SaGroups).map(k => s"g$k")
    val perArm = armTags.map { t =>
      val pred = if (t == "none") "" else s" AND grp != ${t.drop(1)}"
      gdArmSql(s"_$t", s"SELECT * FROM xg WHERE fold != 7$pred")
    }.mkString(",\n")
    val led = (0 until SaGroups).map(k =>
      s"""l_g$k AS (SELECT count(DISTINCT source) AS ns, count(*) AS nd
         |  FROM xg WHERE fold != 7 AND grp = $k)""".stripMargin).mkString(",\n")
    val sel = armTags.map { t =>
      val (nsSel, joinL) =
        if (t == "none") ("CAST(0 AS BIGINT) AS n_sources_removed, CAST(0 AS BIGINT) AS n_docs_removed", "")
        else (s"CAST(ns AS BIGINT) AS n_sources_removed, CAST(nd AS BIGINT) AS n_docs_removed", s", l_$t")
      s"""SELECT '$t' AS ablated_group, $nsSel,
         |  CAST(n_train AS BIGINT) AS n_train,
         |  (SELECT CAST(count(*) AS BIGINT) FROM xe) AS n_eval, auc
         |FROM n_$t, a_$t$joinL""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH xg AS MATERIALIZED (SELECT $gdXCols,
       |  CASE WHEN label < 5 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
       |  ('0x' || substr(md5('lc:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS fold,
       |  ('0x' || substr(md5('sa:' || d.source), 1, 15))::BIGINT % $SaGroups AS grp,
       |  d.source AS source
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
       |xe AS MATERIALIZED (SELECT * FROM xg WHERE fold = 7),
       |$perArm,
       |$led,
       |res AS ($sel)
       |SELECT r.ablated_group, r.n_sources_removed, r.n_docs_removed,
       |  r.n_train, r.n_eval, r.auc,
       |  (SELECT auc FROM a_none) - r.auc AS delta_auc
       |FROM res r ORDER BY r.ablated_group""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q147_logistic_gd" -> (q147LogisticGd _),
      "q154_model_eval" -> (q154ModelEval _),
      "q159_woe_iv" -> (q159WoeIv _),
      "q207_learning_curve" -> (q207LearningCurve _),
      "q212_source_ablation" -> (q212SourceAblation _))

  val oracleSql: Map[String, String] =
    Map("q147_logistic_gd" -> q147Sql,
      "q154_model_eval" -> q154Sql,
      "q159_woe_iv" -> q159Sql,
      "q207_learning_curve" -> q207Sql,
      "q212_source_ablation" -> q212Sql)
}
