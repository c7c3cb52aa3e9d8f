package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side recomputes for the round-12 curation cards (q200–q203):
  * each card's full pipeline is re-derived in plain Scala over the
  * sf0.001 corpus and compared value-for-value. */
class CurationSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def toks(text: String): Seq[String] =
    text.replaceAll("[ \t\n\r\f\u000B]+", " ").trim.toLowerCase.split(" ").toSeq

  private def hex60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  // ------------------------------------------------------------- q200
  test("q200: spans, longest-span selection, and token-interval union " +
    "match a driver brute force") {
    val k = CurationQueries.SpanK
    val grams: Seq[(Long, Int, String)] = docs.flatMap { case (id, text, _) =>
      val t = toks(text)
      if (t.length < k) Nil
      else (0 to t.length - k).map(i => (id, i + 1, t.slice(i, i + k).mkString(" ")))
    }
    val dirtySet = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val byDoc = grams.filter(g => dirtySet.contains(g._3)).groupBy(_._1)
    val expected = byDoc.map { case (id, g) =>
      val pos = g.map(_._2).sorted
      // gram-space islands
      val spans = pos.foldLeft(List.empty[(Int, Int)]) { case (acc, p) =>
        acc match {
          case (s, e) :: rest if p == e + 1 => (s, p) :: rest
          case _ => (p, p) :: acc
        }
      }.reverse
      val longest = spans.map(s => s._2 - s._1 + 1).max
      val bestStart = spans.filter(s => s._2 - s._1 + 1 == longest).map(_._1).min
      // token-interval union
      val ivs = spans.map { case (s, e) => (s, e + k - 1) }.sortBy(_._1)
      val cov = ivs.foldLeft((0L, 0)) { case ((tot, hi), (s, e)) =>
        if (hi == 0 || s > hi) (tot + (e - s + 1), e)
        else if (e > hi) (tot + (e - hi), e)
        else (tot, hi)
      }._1
      id -> (pos.size.toLong, spans.size.toLong, longest.toLong,
        bestStart.toLong, cov)
    }
    val rows = CurationQueries.q200SubstringSpans(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected.keySet)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nDirty, nSpans, longest, start, cov) = expected(id)
      assert(r.getAs[Long]("n_dirty") == nDirty, s"doc $id n_dirty")
      assert(r.getAs[Long]("n_spans") == nSpans, s"doc $id n_spans")
      assert(r.getAs[Long]("longest_span") == longest, s"doc $id longest")
      assert(r.getAs[Long]("span_start") == start, s"doc $id start")
      assert(r.getAs[Long]("span_end") == start + longest - 1, s"doc $id end")
      assert(r.getAs[Long]("removable_tokens") == cov, s"doc $id removable")
      val nTok = r.getAs[Long]("n_tokens")
      assert(cov <= nTok && r.getAs[Double]("removable_frac") == cov.toDouble / nTok)
    }
  }

  // ------------------------------------------------------------- q201
  test("q201: held-out-split confusion matrices match a driver-side naive-Bayes replay") {
    val b = CurationQueries.NbBuckets
    // the 8-fold hash gate (fold 7 = eval) — replayed, never trusted
    def split(id: Long): String =
      if (hex60(s"nb:$id") % 8 == 7) "eval" else "train"
    val trainDocs = docs.filter(d => split(d._1) == "train")
    assert(trainDocs.size < docs.size, "fixture must actually hold an eval eighth out")
    val bucketed: Seq[(Long, String, Int)] = trainDocs.flatMap { case (id, text, lang) =>
      toks(text).map(w => (id, lang, (hex60(w) % b).toInt))
    }
    val counts = bucketed.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val langs = trainDocs.map(_._3).distinct.sorted
    val totalTok = langs.map(l => l -> (0 until b).map(x => counts.getOrElse((l, x), 0L)).sum).toMap
    val langDocs = trainDocs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    def lnp(l: String, x: Int): BigDecimal =
      BigDecimal(math.log((counts.getOrElse((l, x), 0L) + 1).toDouble /
        (totalTok(l) + b).toDouble)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val priors = langs.map(l => l -> BigDecimal(
      math.log(langDocs(l).toDouble / trainDocs.size.toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
    // the eval eighth is scored too — by the train-only model
    val predicted: Map[Long, String] = docs.flatMap { case (id, text, _) =>
      val t = toks(text)
      if (t.isEmpty) None
      else {
        val byB = t.map(w => (hex60(w) % b).toInt).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val best = langs.map { l =>
          val s = byB.map { case (x, n) => BigDecimal(n) * lnp(l, x) }.sum + priors(l)
          (l, s)
        }.minBy { case (l, s) => (-s, l) }(Ordering.Tuple2(Ordering.BigDecimal, Ordering.String))
        Some(id -> best._1)
      }
    }.toMap
    val expectedConf = docs.filter(d => predicted.contains(d._1))
      .groupBy(d => (split(d._1), d._3, predicted(d._1))).view.mapValues(_.size.toLong).toMap
    val rows = CurationQueries.q201NaiveBayesLang(spark, Sf0001).collect()
    assert(rows.map(r => (r.getAs[String]("split"), r.getAs[String]("lang"),
      r.getAs[String]("pred_lang"))).toSet == expectedConf.keySet)
    assert(rows.exists(_.getAs[String]("split") == "eval"),
      "card must report the held-out confusion")
    val rowTotals = expectedConf.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.values.sum).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("split"), r.getAs[String]("lang"), r.getAs[String]("pred_lang"))
      assert(r.getAs[Long]("n_docs") == expectedConf(key), s"conf $key")
      assert(math.abs(r.getAs[Double]("row_frac") -
        expectedConf(key).toDouble / rowTotals((key._1, key._2))) < 1e-12)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == predicted.size)
  }

  // ------------------------------------------------------------- q202
  test("q202: buckets are powers of two, plan conserves docs/tokens, and " +
    "batch arithmetic is exact") {
    def nTok(text: String): Long =
      "[^ \t\n\r\f\u000B]+".r.findAllIn(text).size.toLong
    val perDoc = docs.map { case (_, text, _) =>
      val n = nTok(text)
      val m = math.max(n, 16L)
      var bl = 16L
      while (bl < m) bl <<= 1
      (n, bl)
    }
    val expected = perDoc.groupBy(_._2).view.mapValues { g =>
      (g.size.toLong, g.map(_._1).sum)
    }.toMap
    val rows = CurationQueries.q202LengthBucketBatching(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("bucket_len")).toSet == expected.keySet)
    rows.foreach { r =>
      val bl = r.getAs[Long]("bucket_len")
      assert((bl & (bl - 1)) == 0 && bl >= 16, s"bucket $bl not a pow2 ≥ 16")
      val (nd, nt) = expected(bl)
      assert(r.getAs[Long]("n_docs") == nd && r.getAs[Long]("n_tokens") == nt)
      val dpb = math.max(CurationQueries.BatchBudget / bl, 1L)
      assert(r.getAs[Long]("docs_per_batch") == dpb)
      val nb = (nd + dpb - 1) / dpb
      assert(r.getAs[Long]("n_batches") == nb)
      assert(r.getAs[Long]("pad_tokens") == nd * bl - nt && nd * bl >= nt)
      assert(r.getAs[Long]("slack_slots") == nb * dpb - nd)
      assert(r.getAs[Long]("slack_slots") < dpb, "slack must fit one batch")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.size)
  }

  // ------------------------------------------------------------- q204
  test("q204: excision ledger matches a driver replay and the audit re-runs " +
    "the detector for real") {
    val k = CurationQueries.SpanK
    val byId = docs.map(d => d._1 -> toks(d._2)).toMap
    val srcOf = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def detect(m: Map[Long, Seq[String]]): Map[Long, Set[Int]] = {
      val grams = m.toSeq.flatMap { case (id, t) =>
        if (t.length < k) Nil
        else (0 to t.length - k).map(i => (id, i + 1, t.slice(i, i + k).mkString(" ")))
      }
      val dirtySet = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      grams.filter(g => dirtySet.contains(g._3))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val d1 = detect(byId)
    val cleaned = byId.map { case (id, t) =>
      val dirtyTok = d1.getOrElse(id, Set.empty)
        .flatMap(p => p until p + k).map(_.toInt)
      id -> t.zipWithIndex.collect { case (w, i) if !dirtyTok(i + 1) => w }
    }
    val residual = detect(cleaned).values.map(_.size.toLong).sum
    val rows = CurationQueries.q204ExciseAudit(spark, Sf0001).collect()
    val bySrc = cleaned.groupBy { case (id, _) => srcOf(id) }
    assert(rows.map(_.getAs[String]("source")).toSet == bySrc.keySet)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val g = bySrc(s)
      // g.keys is a Set — map-then-sum over it would DEDUPLICATE equal sizes
      val before = g.keys.toSeq.map(id => byId(id).size.toLong).sum
      val after = g.values.toSeq.map(_.size.toLong).sum
      assert(r.getAs[Long]("n_docs") == g.size)
      assert(r.getAs[Long]("docs_touched") == g.keys.count(d1.contains))
      assert(r.getAs[Long]("tokens_before") == before)
      assert(r.getAs[Long]("tokens_after") == after)
      assert(r.getAs[Long]("removed_tokens") == before - after)
    }
    assert(rows.map(_.getAs[Long]("residual_dirty_positions")).sum == residual)
    // the treatment converges on this corpus — and q204's removed mass must
    // equal q200's per-doc removable mass (shared detector, shared intervals)
    assert(residual == 0)
    val q200Removable = CurationQueries.q200SubstringSpans(spark, Sf0001)
      .agg(sum(col("removable_tokens"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("removed_tokens")).sum == q200Removable)
  }

  // ------------------------------------------------------------- q205
  test("q205: growth curves and Heaps beta match a driver replay; " +
    "order-1 saturates, order-3 keeps growing") {
    val rows = CurationQueries.q205HeapsGrowth(spark, Sf0001).collect()
    assert(rows.length == 20)
    val ids = docs.map(_._1).sorted
    val dec = ids.zipWithIndex.map { case (id, i) =>
      id -> (i * 10 / ids.size + 1)
    }.toMap // ntile over equal-size 500 → exact tenths
    def curve(order: Int): (Seq[(Long, Long)], Double) = {
      val grams = docs.flatMap { case (id, text, _) =>
        val t = toks(text)
        if (t.length < order) Nil
        else (0 to t.length - order).map(i =>
          (dec(id), t.slice(i, i + order).mkString(" ")))
      }
      val perDecPos = grams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val firstDec = grams.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
      val newV = firstDec.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var (cp, cv) = (0L, 0L)
      val pts = (1 to 10).map { d =>
        cp += perDecPos.getOrElse(d, 0L); cv += newV.getOrElse(d, 0L); (cp, cv)
      }
      val ln = pts.map { case (x, y) =>
        (BigDecimal(math.log(x.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
          BigDecimal(math.log(y.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }
      val n = ln.size
      val sx = ln.map(_._1).sum; val sy = ln.map(_._2).sum
      val sxx = ln.map(p => p._1 * p._1).sum; val sxy = ln.map(p => p._1 * p._2).sum
      val beta = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      (pts, beta)
    }
    for (ord <- Seq(1, 3)) {
      val (pts, beta) = curve(ord)
      val got = rows.filter(_.getAs[Long]("ord") == ord).sortBy(_.getAs[Long]("dec"))
      got.zip(pts).foreach { case (r, (cp, cv)) =>
        assert(r.getAs[Long]("cum_positions") == cp, s"ord $ord pos")
        assert(r.getAs[Long]("cum_vocab") == cv, s"ord $ord vocab")
      }
      // the card rounds β through DECIMAL(18,6) (q119's parity device)
      assert(math.abs(got.head.getAs[Double]("heaps_beta") - beta) < 1e-6)
    }
    // the sizing story: unigram vocab saturates, trigram vocab keeps growing
    val b1 = rows.find(_.getAs[Long]("ord") == 1).get.getAs[Double]("heaps_beta")
    val b3 = rows.find(_.getAs[Long]("ord") == 3).get.getAs[Double]("heaps_beta")
    assert(b1 < 0.05 && b3 > 0.2, s"beta1=$b1 beta3=$b3")
  }

  // ------------------------------------------------------------- q206
  test("q206: cluster gate leaks zero clusters, naive gate leaks some, " +
    "and the ledger conserves the corpus") {
    val labels = graft.dedup.DedupQueries.q65DedupClusters(spark, Sf0001)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cid = docs.map(d => d._1 -> labels.getOrElse(d._1, d._1)).toMap
    def gate(key: String): String = {
      val b = hex60("split:" + key) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val rows = CurationQueries.q206ClusterSplit(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.size)
    val expectedBySplit = docs.groupBy(d => gate(cid(d._1).toString))
    rows.foreach { r =>
      val s = r.getAs[String]("split")
      assert(r.getAs[Long]("n_docs") == expectedBySplit(s).size)
      assert(r.getAs[Long]("n_clusters") ==
        expectedBySplit(s).map(d => cid(d._1)).distinct.size)
      assert(r.getAs[Long]("leaked_clusters") == 0L)
    }
    // every cluster lands whole: all members share the split by construction
    val clusterSplits = docs.groupBy(d => cid(d._1))
      .view.mapValues(_.map(d => gate(cid(d._1).toString)).distinct.size)
    assert(clusterSplits.values.forall(_ == 1))
    // the contrast number: the naive doc_id gate does leak on this corpus
    val naiveLeaked = docs.groupBy(d => cid(d._1))
      .count { case (_, ds) => ds.map(d => gate(d._1.toString)).distinct.size > 1 }
    assert(rows.head.getAs[Long]("naive_leaked_clusters") == naiveLeaked)
    assert(naiveLeaked > 0, "fixture must exercise the failure the card fixes")
  }

  // ------------------------------------------------------------- q203
  test("q203: rho matches a driver-side tie-averaged Spearman and is in [-1, 1]") {
    val qf = TextQueries.q16TextQuality(spark, Sf0001)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nll = TextQueries.q74BigramLm(spark, Sf0001)
      .filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("avg_nll")).collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 1e6 + 0.5).toLong).toMap
    val ids = nll.keySet.toSeq.sorted.filter(qf.contains)
    def avgRanks[T](vs: Seq[T])(implicit o: Ordering[T]): Seq[Double] = {
      val sorted = vs.sorted
      val firstIdx = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => (g.map(_._2).min + 1 + g.map(_._2).max + 1) / 2.0).toMap
      vs.map(firstIdx)
    }
    val xs = avgRanks(ids.map(qf))
    val ys = avgRanks(ids.map(nll))
    val n = ids.size.toDouble
    val mx = xs.sum / n; val my = ys.sum / n
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum) *
      math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
    val expectedRho = num / den
    val row = CurationQueries.q203QualityPplAgreement(spark, Sf0001).collect().head
    assert(row.getAs[Long]("n_docs") == ids.size)
    val rho = row.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
    assert(math.abs(rho - expectedRho) < 1e-9, s"rho $rho vs $expectedRho")
  }
}
