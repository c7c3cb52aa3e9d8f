package graft.sim

import graft.sql.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Distributed model fitting over the embedding corpus — the supervised
  * companion to [[SpectralQueries]]' unsupervised power iteration: each
  * optimizer step is one full-corpus scan folding to a gradient vector,
  * the map-reduce training loop (Chu et al., NIPS 2006) that every
  * data-parallel trainer is built on.
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

  def q147LogisticGd(spark: SparkSession, dir: String): DataFrame = {
    val feats = (0 until NumFeat).map(i =>
      element_at(col("embedding"), i + 1).cast(DoubleType).as(s"x$i"))
    val y = when(col("label") < 5, lit(1.0)).otherwise(lit(0.0)).as("y")
    val x = Tables(spark, dir).embeddings.select(feats :+ y: _*)

    // one GD step from weight vector w: returns the 1-row frame holding
    // the updated weights as DECIMAL(18,9) (w0..w<NumFeat> = features,
    // w<NumFeat> = bias)
    def step(w: Array[Double]): DataFrame = {
      val z = (0 until NumFeat).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _) +
        lit(w(NumFeat))
      val sg = (lit(1.0) / (lit(1.0) + exp(-z))).cast(DecimalType(18, 6))
      val resid = sg.cast(DoubleType) - col("y")
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
    def names(s: Int): Seq[String] =
      (0 until NumFeat).map(i => s"w${s}_x$i") :+ s"w${s}_b"
    trajectory.zipWithIndex
      .map { case (f, i) =>
        f.select((0 to NumFeat).map(k =>
          col(s"w$k").cast(DoubleType).as(names(i + 1)(k))): _*)
      }
      .reduce(_ crossJoin _)
  }

  val q147Sql: String = {
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
    val outCols = (1 to GdSteps).flatMap { s =>
      (0 until NumFeat).map(i => s"CAST(w$s.w$i AS DOUBLE) AS w${s}_x$i") :+
        s"CAST(w$s.w$NumFeat AS DOUBLE) AS w${s}_b"
    }.mkString(",\n|  ")
    s"""WITH x AS (SELECT $xCols,
       |  CASE WHEN label < 5 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM embeddings),
       |$steps
       |SELECT $outCols
       |FROM ${(1 to GdSteps).map(s => s"w$s").mkString(" CROSS JOIN ")}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q147_logistic_gd" -> (q147LogisticGd _))

  val oracleSql: Map[String, String] =
    Map("q147_logistic_gd" -> q147Sql)
}
