package graft.sim

import graft.SparkSpec

/** q212 driver-replay: the source-group hash gate, each arm's 2-step
  * decimal GD trajectory on the ablated training set, the shared
  * held-out AUC, and the delta against the base arm — all re-derived in
  * plain Scala and matched bit-for-bit. The structural invariants the
  * valuation rests on: arms train on strictly less data than base, no
  * arm ever touches the eval fold, groups partition the sources, and
  * delta_auc('none') is exactly 0. */
class SourceAblationSpec extends SparkSpec {

  private val NumFeat = 4
  private val SaGroups = 4

  private def hex60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def round(x: Double, scale: Int): BigDecimal =
    BigDecimal.decimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)

  /** (vec_id, features, y, source) — embeddings joined to documents. */
  private lazy val vecs: Seq[(Long, Array[Double], Double, String)] = {
    val srcOf = spark.read.parquet(s"$Sf0001/documents.parquet").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("source")))
      .toMap
    spark.read.parquet(s"$Sf0001/embeddings.parquet").collect().flatMap { r =>
      val id = r.getLong(r.fieldIndex("vec_id"))
      srcOf.get(id).map { src =>
        val emb = r.getSeq[Float](r.fieldIndex("embedding"))
        (id, emb.take(NumFeat).map(_.toDouble).toArray,
          if (r.getInt(r.fieldIndex("label")) < 5) 1.0 else 0.0, src)
      }
    }.toSeq
  }

  private def sigmoid6(w: Array[Double], x: Array[Double]): BigDecimal = {
    val z = (0 until NumFeat).map(i => w(i) * x(i)).sum + w(NumFeat)
    round(1.0 / (1.0 + math.exp(-z)), 6)
  }

  private def fit(rows: Seq[(Array[Double], Double)]): Array[Double] = {
    var w = Array.fill(NumFeat + 1)(0.0)
    for (_ <- 1 to 2) {
      val resids = rows.map { case (x, y) => (x, sigmoid6(w, x).toDouble - y) }
      val g = (0 until NumFeat).map(i =>
        resids.map { case (x, r) => round(r * x(i), 9) }.sum) :+
        resids.map { case (_, r) => round(r, 9) }.sum
      w = (0 to NumFeat).map(k =>
        round(w(k) - g(k).toDouble / rows.size, 9).toDouble).toArray
    }
    w
  }

  private def auc(scored: Seq[(BigDecimal, Double)]): Double = {
    val grp = scored.groupBy(_._1).toSeq.sortBy(_._1)
    var negBelow = 0L; var num2 = BigInt(0); var p = 0L; var n = 0L
    grp.foreach { case (_, g) =>
      val pos = g.count(_._2 == 1.0).toLong
      val neg = g.count(_._2 == 0.0).toLong
      num2 += BigInt(pos) * (2 * negBelow + neg)
      p += pos; n += neg; negBelow += neg
    }
    num2.toDouble / (2.0 * p * n)
  }

  test("q212: gates, ablated trajectories, held-out AUCs, and deltas match the replay") {
    val rows = MlQueries.q212SourceAblation(spark, Sf0001).collect()
      .sortBy(_.getAs[String]("ablated_group"))
    assert(rows.map(_.getAs[String]("ablated_group")).toSeq ==
      Seq("g0", "g1", "g2", "g3", "none"))

    def fold(id: Long) = hex60(s"lc:$id") % 8
    def grpOf(src: String) = hex60(s"sa:$src") % SaGroups
    val evalRows = vecs.filter(v => fold(v._1) == 7)
    val full = vecs.filter(v => fold(v._1) != 7)
    assert(rows.forall(_.getAs[Long]("n_eval") == evalRows.size))

    // groups partition the training sources (every source lands somewhere)
    val bySrcGroup = full.groupBy(v => grpOf(v._4))
    assert(bySrcGroup.values.map(_.map(_._4).distinct.size).sum ==
      full.map(_._4).distinct.size)

    val baseW = fit(full.map(v => (v._2, v._3)))
    val baseAuc = auc(evalRows.map(v => (sigmoid6(baseW, v._2), v._3)))

    rows.foreach { r =>
      val label = r.getAs[String]("ablated_group")
      val train =
        if (label == "none") full
        else full.filter(v => grpOf(v._4) != label.drop(1).toLong)
      assert(r.getAs[Long]("n_train") == train.size, s"$label n_train")
      if (label != "none") {
        assert(train.size < full.size, s"$label must actually remove data")
        val removed = full.filter(v => grpOf(v._4) == label.drop(1).toLong)
        assert(r.getAs[Long]("n_docs_removed") == removed.size, s"$label n_docs_removed")
        assert(r.getAs[Long]("n_sources_removed") ==
          removed.map(_._4).distinct.size, s"$label n_sources_removed")
      }
      // no arm ever trains on the eval fold
      assert(train.forall(v => fold(v._1) != 7))
      val w = fit(train.map(v => (v._2, v._3)))
      val expected = auc(evalRows.map(v => (sigmoid6(w, v._2), v._3)))
      assert(math.abs(r.getAs[Double]("auc") - expected) < 1e-12, s"$label auc")
      assert(math.abs(r.getAs[Double]("delta_auc") - (baseAuc - expected)) < 1e-12,
        s"$label delta")
    }
    val none = rows.find(_.getAs[String]("ablated_group") == "none").get
    assert(none.getAs[Double]("delta_auc") == 0.0,
      "the base arm's delta must be exactly zero")
  }
}
