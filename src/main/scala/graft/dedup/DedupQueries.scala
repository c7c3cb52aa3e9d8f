package graft.dedup

import graft.sql.Tables
import graft.text.TextOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Deduplication operators over the `documents` table: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash — the standard toolkit for
  * training-corpus dedup.
  *
  * Scale design (the 100 TB story):
  *   - exact dedup is one hash-partitioned groupBy on a 16-byte key —
  *     shuffle volume is keys, not documents;
  *   - the inverted-index pair generator (q20) caps shingle document
  *     frequency at [[DfCap]]: a shingle shared by d documents otherwise
  *     yields d² candidates, so one boilerplate phrase melts the shuffle
  *     at scale. Capped buckets emit pairs from a collected id array —
  *     bounded fan-out, no exploded self-join;
  *   - MinHash LSH (q21) shuffles O(docs × bands) tiny (band, sig) rows;
  *     its 96-hash signature costs ONE md5 per shingle (affine
  *     Carter–Wegman family, [[graft.text.TextOps.minhashFamily]]), not 96;
  *   - SimHash (q22/q23) reduces every document to one 60-bit word; the
  *     banded self-join finds all pairs within Hamming distance 5 with NO
  *     quadratic pass (pigeonhole over 6 disjoint 10-bit bands).
  *
  * All hashes are md5-derived (see [[graft.text.TextOps.hex60]]) so every
  * stage — including the LSH signatures themselves — is reproducible in the
  * DuckDB oracle.
  */
object DedupQueries {

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), shingles(tokens(normText(col("text")))).as("sh"))
      .filter(size(col("sh")) > 0)

  private val toksSql = s"string_split(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))), ' ')"
  private val shinglesSqlCte =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
       |shs AS (SELECT doc_id,
       |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sh
       |  FROM tk),
       |sh AS (SELECT doc_id, sh FROM shs WHERE len(sh) > 0)""".stripMargin

  /** Hashed shingle sets: one 60-bit hash per shingle. Every downstream
    * shuffle/join/intersect then carries 8-byte longs instead of ~25-byte
    * strings (3× smaller shuffles, primitive compares in the intersect).
    * Within-pair hash collisions would perturb the Jaccard estimate with
    * probability ~ |sh|²/2⁶⁰ per pair — immaterial. */
  /** Materialized (localCheckpoint) because every pair query references it
    * three times — candidate generation plus both verify sides — and Spark
    * has no cross-subplan reuse short of an identical exchange: without
    * this the shingle kernel runs 3× per query (measured ~40% of q20).
    * The checkpoint blocks are freed by the ContextCleaner once the query
    * result is dropped. */
  private[graft] def docShingleHashes(spark: SparkSession, dir: String): DataFrame =
    // r16: spread the (single-row-group, hence single-split) gate-scale
    // scan so the shingle+hash kernel runs on every core — Tables.spread
    // is a no-op on a many-split production scan (guide §2.5)
    Tables.spread(Tables(spark, dir).documents)
      // sorted ONCE per document so every candidate pair's intersection is
      // an allocation-free two-pointer merge (SortedIntersectCount below)
      .select(col("doc_id"), array_sort(shingleHashes(tokens(normText(col("text"))))).as("shh"))
      .filter(size(col("shh")) > 0)
      .localCheckpoint(true)

  /** Exact-verify a (ida, idb) candidate DataFrame against hashed shingle
    * sets (sorted; see [[graft.expr.SortedIntersectCount]] — the
    * `size(array_intersect(...))` spelling allocates a hash set + result
    * array per candidate pair). */
  private def verifyJaccard(cands: DataFrame, shh: DataFrame, threshold: Double): DataFrame = {
    val j = col("common").cast(DoubleType) / (col("na") + col("nb") - col("common"))
    // NOTE: do NOT broadcast-hint these joins — the explicit hint defeats
    // AQE's exchange reuse of the hashed-shingle subplan and re-executes
    // it per join (measured 10× slower); AQE already right-sizes them
    cands
      .join(shh.select(col("doc_id").as("ida"), col("shh").as("sha")), "ida")
      .join(shh.select(col("doc_id").as("idb"), col("shh").as("shb")), "idb")
      .select(col("ida"), col("idb"),
        graft.expr.SortedIntersectCount.of(col("sha"), col("shb")).as("common"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
      .filter(j >= threshold)
      .select(col("ida"), col("idb"), j.as("jaccard"))
      .orderBy(col("ida"), col("idb"))
  }

  // ---------------------------------------------------------------- q19
  /** Exact dedup: md5 of normalized content → representative + group size.
    * One groupBy on the 16-byte digest; at 100 TB the shuffle carries only
    * (hash, doc_id), never the text. */
  def q19DedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), md5(normText(col("text"))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_docs"))
      .orderBy(col("content_hash"))

  val q19Sql: String =
    s"""SELECT md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS content_hash,
       | min(doc_id) AS rep_doc_id, count(*) AS n_docs
       |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  // ---------------------------------------------------------------- q192
  /** Cross-source exact-duplicate FLOW matrix — which sources copy from
    * which: for every unordered source pair, how many q19 content-hash
    * groups span both sources, and the cross-duplicate pair mass
    * Σ_groups (count_a × count_b). The provenance complement to q81's
    * per-source dup RATE and q92's fuzzy n-gram profile overlap: exact
    * content flow, attributed to the source pair, which is what a
    * mirror-detection / license-laundering audit actually reads.
    *
    * 100 TB shape: one digest fold to (content_hash, source, c) — the
    * 16-byte-digest shuffle q19 already pays, text never moves — then
    * the pair join fans out per digest by its SOURCE-count (≤ 5 here,
    * bounded by the source dimension, never by group depth: a 10⁶-doc
    * duplicate group contributes source-pair rows, not doc-pair rows). */
  def q192SourceDupFlow(spark: SparkSession, dir: String): DataFrame = {
    val ds = Tables(spark, dir).documents
      .select(col("source"), md5(normText(col("text"))).as("h"))
      .groupBy(col("h"), col("source")).agg(count(lit(1)).as("c"))
    ds.as("a")
      .join(ds.as("b"), col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared_groups"),
        sum(col("a.c") * col("b.c")).as("n_cross_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q192Sql: String =
    s"""WITH ds AS (
       |  SELECT source, md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS h,
       |    count(*) AS c
       |  FROM documents GROUP BY 1, 2)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  count(*) AS n_shared_groups,
       |  CAST(sum(a.c * b.c) AS BIGINT) AS n_cross_pairs
       |FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Exact n-gram Jaccard near-dup pairs (threshold 0.5) via a
    * df-capped inverted index: shingles shared by more than [[DfCap]]
    * documents are dropped from CANDIDATE GENERATION (they are
    * boilerplate, and each contributes df² pair rows); verification still
    * uses the full shingle sets. One shuffle groups doc ids per shingle;
    * pair fan-out per shingle is then bounded by DfCap²/2. */
  private val DfCap = 32

  /** All ordered pairs from a bucket's (sorted, bounded) `ids` array —
    * shared by the q20 and q72 inverted-index candidate generators. */
  private def bucketPairList: Column = flatten(transform(
    sequence(lit(1), size(col("ids")) - 1),
    i => transform(
      sequence(i + 1, size(col("ids"))),
      j => struct(element_at(col("ids"), i).as("ida"), element_at(col("ids"), j).as("idb")))))

  /** Df-capped inverted-index candidate pairs from hashed shingle sets —
    * the q20 generator, shared with q129's containment verify. */
  private def invertedIndexCands(shh: DataFrame): DataFrame = {
    val ex = shh.select(col("doc_id"), explode(col("shh")).as("h"))
    val buckets = ex.groupBy(col("h"))
      // collect_LIST: a doc contributes each shingle hash at most once
      // (shingle sets are distinct per doc), so the values are already
      // unique — no per-group hash set needed
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, DfCap))
    buckets
      .select(explode(bucketPairList).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb"))
      // positions in the sorted id array guarantee ida <= idb; the strict
      // filter restores the hard ida < idb invariant the oracle's
      // a.doc_id < b.doc_id relies on — a 60-bit hash collision between
      // two distinct shingles WITHIN one doc would otherwise put the same
      // doc_id twice in a bucket and emit a self-pair
      .filter(col("ida") < col("idb"))
      .distinct()
  }

  def q20NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    verifyJaccard(invertedIndexCands(shh), shh, 0.5)
  }

  val q20Sql: String =
    s"""$shinglesSqlCte,
       |cnt AS (SELECT doc_id, len(sh) AS n FROM sh),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |dfok AS (SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND $DfCap),
       |p AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       |      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |      WHERE a.s IN (SELECT s FROM dfok)),
       |v AS (SELECT ida, idb,
       |        len(list_intersect(ca.sh, cb.sh)) AS common, len(ca.sh) AS na, len(cb.sh) AS nb
       |      FROM p JOIN sh ca ON ida = ca.doc_id JOIN sh cb ON idb = cb.doc_id)
       |SELECT ida, idb, CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
       |FROM v WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5
       |ORDER BY ida, idb""".stripMargin

  // ---------------------------------------------------------------- q129
  /** Shingle-set CONTAINMENT pairs (Broder 1997's second resemblance
    * measure): C = |A∩B| / min(|A|,|B|) ≥ [[ContainThreshold]] — the
    * near-SUBSET detector. Jaccard (q20/q21) misses a short document
    * quoted verbatim inside a much longer one (J = |A|/|B| is small
    * exactly when the size ratio is large); containment is what catches
    * boilerplate inclusion, quoted-document trains, and chunk-level
    * copying, and every emitted row carries BOTH measures so the
    * containment-vs-resemblance gap is visible per pair. Direction is
    * explicit: the smaller shingle set (ties → lower doc_id) is the
    * `contained` document.
    *
    * 100 TB shape: candidates ride the SAME df-capped inverted index as
    * q20 (one generator, two verifies — Σdf² fan-out, never N²); the
    * verify joins carry sorted long arrays and count intersections with
    * the allocation-free two-pointer expression. The df-cap recall
    * caveat is q20's, inherited deliberately: a contained doc ALL of
    * whose shingles are boilerplate (df > [[DfCap]]) generates no
    * candidate — and the oracle applies the identical cap, making the
    * cap part of the operator contract (the q108 rule). */
  private val ContainThreshold = 0.8

  def q129Containment(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val c = col("common").cast(DoubleType) / least(col("na"), col("nb"))
    val j = col("common").cast(DoubleType) / (col("na") + col("nb") - col("common"))
    val aSmaller = col("na") < col("nb") ||
      (col("na") === col("nb") && col("ida") < col("idb"))
    invertedIndexCands(shh)
      .join(shh.select(col("doc_id").as("ida"), col("shh").as("sha")), "ida")
      .join(shh.select(col("doc_id").as("idb"), col("shh").as("shb")), "idb")
      .select(col("ida"), col("idb"),
        graft.expr.SortedIntersectCount.of(col("sha"), col("shb")).as("common"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
      .filter(c >= ContainThreshold)
      .select(
        when(aSmaller, col("ida")).otherwise(col("idb")).as("contained"),
        when(aSmaller, col("idb")).otherwise(col("ida")).as("container"),
        when(aSmaller, col("na")).otherwise(col("nb")).as("n_contained"),
        when(aSmaller, col("nb")).otherwise(col("na")).as("n_container"),
        c.as("containment"), j.as("jaccard"))
      .orderBy(col("contained"), col("container"))
  }

  val q129Sql: String =
    s"""$shinglesSqlCte,
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |dfok AS (SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND $DfCap),
       |p AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       |      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |      WHERE a.s IN (SELECT s FROM dfok)),
       |v AS (SELECT ida, idb,
       |        len(list_intersect(ca.sh, cb.sh)) AS common, len(ca.sh) AS na, len(cb.sh) AS nb
       |      FROM p JOIN sh ca ON ida = ca.doc_id JOIN sh cb ON idb = cb.doc_id)
       |SELECT CASE WHEN na < nb OR (na = nb AND ida < idb) THEN ida ELSE idb END AS contained,
       |  CASE WHEN na < nb OR (na = nb AND ida < idb) THEN idb ELSE ida END AS container,
       |  CASE WHEN na < nb OR (na = nb AND ida < idb) THEN na ELSE nb END AS n_contained,
       |  CASE WHEN na < nb OR (na = nb AND ida < idb) THEN nb ELSE na END AS n_container,
       |  CAST(common AS DOUBLE) / least(na, nb) AS containment,
       |  CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
       |FROM v WHERE CAST(common AS DOUBLE) / least(na, nb) >= $ContainThreshold
       |ORDER BY contained, container""".stripMargin

  // ---------------------------------------------------------------- q175
  /** Contamination-SPAN localization — the excision worklist downstream
    * of q60's doc-level flag: for every corpus document sharing at least
    * one trigram shingle with the benchmark set, WHERE the contamination
    * sits — total dirty shingle positions, number of contiguous dirty
    * spans, and the longest span's [start, end] (1-based shingle
    * positions; ties → earliest start). A pipeline that only has q60
    * must DROP a contaminated document; with the span map it can excise
    * the overlapping window and keep the rest (the standard production
    * decontamination treatment).
    *
    * Unlike the distinct-shingle kernel every other dedup query rides,
    * this needs the ORDERED shingle sequence with duplicates — built
    * in-row and positionally exploded. Scale shape: the benchmark
    * trigram dimension is small by construction (eval suites are), so
    * the positional explode is flagged by a BROADCAST semi-join and
    * never shuffles; only the FLAGGED positions (dirty-cardinality, not
    * corpus-cardinality) enter the per-doc gaps-and-islands window and
    * the two span folds. All-integer — no float anywhere. */
  def q175ContaminationSpans(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.text.TextOps.tokens(graft.text.TextOps.normText(col("text")))
    // ordered trigram sequence, duplicates preserved (1-based positions) —
    // r16: the codegen'd [[graft.expr.WordGrams]] kernel (step 1, string
    // mode); the HOF spelling (`transform(sequence…, concat_ws(
    // element_at…))`) was CodegenFallback with three interpreted
    // element_ats per position, and its `when(size ≥ 3)` guard is the
    // kernel's own n < k → empty rule
    val px = Tables(spark, dir).documents
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        posexplode(graft.expr.WordGrams.of(col("t"), 3, 1)).as(Seq("p0", "s")))
      .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("pos"), col("s"))
    val bench = px.filter(col("doc_id") % BenchMod === 0).select(col("s")).distinct()
    val flagged = px.filter(col("doc_id") % BenchMod =!= 0)
      .join(bench, Seq("s"), "left_semi")
    // gaps-and-islands: consecutive dirty positions share (pos − row#)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = flagged
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("span_len"), min(col("pos")).as("span_start"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(sum(col("span_len")).as("n_dirty"), count(lit(1)).as("n_spans"),
        max(col("span_len")).as("longest_span"))
    val best = spans
      .join(perDoc.select(col("doc_id"), col("longest_span")), Seq("doc_id"))
      .filter(col("span_len") === col("longest_span"))
      .groupBy(col("doc_id")).agg(min(col("span_start")).as("span_start"))
    perDoc.join(best, Seq("doc_id"))
      .select(col("doc_id"), col("n_dirty"), col("n_spans"), col("longest_span"),
        col("span_start"), (col("span_start") + col("longest_span") - 1).as("span_end"))
      .orderBy(col("doc_id"))
  }

  val q175Sql: String = {
    val toksSqlLocal =
      s"string_split(lower(trim(regexp_replace(text, '${WsSql}+', ' ', 'g'))), ' ')"
    s"""WITH tk AS (SELECT doc_id, $toksSqlLocal AS t FROM documents),
       |sq AS (SELECT doc_id,
       |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)] AS seq
       |  FROM tk),
       |px AS (SELECT doc_id, unnest(seq) AS s, generate_subscripts(seq, 1) AS pos FROM sq),
       |bench AS (SELECT DISTINCT s FROM px WHERE doc_id % $BenchMod = 0),
       |fl AS (SELECT doc_id, pos FROM px
       |       WHERE doc_id % $BenchMod != 0 AND s IN (SELECT s FROM bench)),
       |runs AS (SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM fl),
       |sp AS (SELECT doc_id, grp, count(*) AS span_len, min(pos) AS span_start
       |       FROM runs GROUP BY 1, 2),
       |pd AS (SELECT doc_id, sum(span_len) AS n_dirty, count(*) AS n_spans,
       |       max(span_len) AS longest_span FROM sp GROUP BY 1),
       |bs AS (SELECT sp.doc_id, min(sp.span_start) AS span_start
       |       FROM sp JOIN pd ON sp.doc_id = pd.doc_id AND sp.span_len = pd.longest_span
       |       GROUP BY 1)
       |SELECT pd.doc_id, CAST(n_dirty AS BIGINT) AS n_dirty,
       |  CAST(n_spans AS BIGINT) AS n_spans,
       |  CAST(longest_span AS BIGINT) AS longest_span,
       |  CAST(bs.span_start AS BIGINT) AS span_start,
       |  CAST(bs.span_start + pd.longest_span - 1 AS BIGINT) AS span_end
       |FROM pd JOIN bs ON pd.doc_id = bs.doc_id ORDER BY pd.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q173
  /** df-cap recall AUDIT card for the inverted-index family: the
    * [[DfCap]] candidate generator's measured recall against an UNCAPPED
    * exact generator, per verified metric (q20's Jaccard ≥ 0.5, q129's
    * containment ≥ [[ContainThreshold]]). The family's "df ≤ 32 may miss
    * a pair whose every shared shingle is boilerplate" caveat was
    * documented but never measured — this card is the measurement
    * (q150's truncation-recall pattern applied to the cap).
    *
    * One verify, two classifications: every co-shingled pair is generated
    * ONCE, annotated with the MINIMUM df over its generating buckets —
    * the pair survives the capped generator iff min_df ≤ [[DfCap]] — so
    * the capped count is a filtered subset of the same verified rows, not
    * a second pipeline (candidate-set equality with
    * [[invertedIndexCands]] holds by construction: that generator keeps a
    * pair iff ANY shared shingle has df ≤ cap).
    *
    * SCALE CONTRACT — this is an audit card, not a production operator:
    * the exact arm's fan-out is Σdf² with df UNBOUNDED (worst case N²).
    * Run it at sample scale (the sf0.01 gate here) to measure the cap's
    * recall for a corpus; the production dedup path stays capped. */
  def q173DfcapRecall(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val ex = shh.select(col("doc_id"), explode(col("shh")).as("h"))
    val pairs = ex.groupBy(col("h"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(size(col("ids")).as("df"), explode(bucketPairList).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb"), col("df"))
      .filter(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb")).agg(min(col("df")).as("min_df"))
    val j = col("common").cast(DoubleType) / (col("na") + col("nb") - col("common"))
    val c = col("common").cast(DoubleType) / least(col("na"), col("nb"))
    val capped = col("min_df") <= DfCap
    val counts = pairs
      .join(shh.select(col("doc_id").as("ida"), col("shh").as("sha")), "ida")
      .join(shh.select(col("doc_id").as("idb"), col("shh").as("shb")), "idb")
      .select(col("min_df"),
        graft.expr.SortedIntersectCount.of(col("sha"), col("shb")).as("common"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
      .agg(
        sum(when(j >= 0.5 && capped, 1L).otherwise(0L)).as("jc"),
        sum(when(j >= 0.5, 1L).otherwise(0L)).as("je"),
        sum(when(c >= ContainThreshold && capped, 1L).otherwise(0L)).as("cc"),
        sum(when(c >= ContainThreshold, 1L).otherwise(0L)).as("ce"))
    counts
      .select(explode(array(
        struct(lit("containment").as("metric"), col("cc").as("pairs_capped"),
          col("ce").as("pairs_exact")),
        struct(lit("jaccard").as("metric"), col("jc").as("pairs_capped"),
          col("je").as("pairs_exact")))).as("r"))
      .select(col("r.metric").as("metric"), col("r.pairs_capped").as("pairs_capped"),
        col("r.pairs_exact").as("pairs_exact"),
        (col("r.pairs_capped").cast(DoubleType) /
          nullif(col("r.pairs_exact"), lit(0L)).cast(DoubleType)).as("recall"))
      .orderBy(col("metric"))
  }

  val q173Sql: String =
    s"""$shinglesSqlCte,
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |dfu AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
       |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, min(df) AS min_df
       |      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |      JOIN dfu ON dfu.s = a.s
       |      GROUP BY 1, 2),
       |v AS (SELECT min_df,
       |        len(list_intersect(ca.sh, cb.sh)) AS common, len(ca.sh) AS na, len(cb.sh) AS nb
       |      FROM p JOIN sh ca ON ida = ca.doc_id JOIN sh cb ON idb = cb.doc_id),
       |m AS (SELECT common, na, nb, min_df,
       |        CAST(common AS DOUBLE) / (na + nb - common) AS j,
       |        CAST(common AS DOUBLE) / least(na, nb) AS c
       |      FROM v),
       |agg AS (SELECT
       |    CAST(count(*) FILTER (j >= 0.5 AND min_df <= $DfCap) AS BIGINT) AS jc,
       |    CAST(count(*) FILTER (j >= 0.5) AS BIGINT) AS je,
       |    CAST(count(*) FILTER (c >= $ContainThreshold AND min_df <= $DfCap) AS BIGINT) AS cc,
       |    CAST(count(*) FILTER (c >= $ContainThreshold) AS BIGINT) AS ce
       |  FROM m)
       |SELECT 'containment' AS metric, cc AS pairs_capped, ce AS pairs_exact,
       |  CAST(cc AS DOUBLE) / CAST(nullif(ce, 0) AS DOUBLE) AS recall FROM agg
       |UNION ALL
       |SELECT 'jaccard' AS metric, jc AS pairs_capped, je AS pairs_exact,
       |  CAST(jc AS DOUBLE) / CAST(nullif(je, 0) AS DOUBLE) AS recall FROM agg
       |ORDER BY metric""".stripMargin

  // ---------------------------------------------------------------- q21
  /** MinHash + LSH near-dup pairs (threshold 0.8). 96 min-hashes per doc
    * from ONE md5 per shingle + the affine Carter–Wegman family, banded
    * 32 × 3: P(candidate | J=0.8) = 1-(1-0.8³)³² ≈ 1-6e-10, so LSH recall
    * is exact for gate purposes (the oracle is the full exact Jaccard);
    * candidates are verified with true Jaccard. The doc→signature pass is
    * one groupBy; the bucket self-join shuffles only (band, sig, doc_id)
    * rows. */
  private val NumHashes = 96
  private val BandRows = 3 // 32 bands × 3 rows

  /** (doc_id, band, sig) LSH bucket rows from hashed shingle sets — the
    * q21 signature pipeline, shared with q76's incremental variant.
    *
    * r16: the signature fold is the codegen'd [[graft.expr.MinHashSigs]]
    * kernel — all 96 minima computed in-row on the shingle array (base
    * hash = top 32 bits of the shared 60-bit md5 hash, zero extra md5
    * work), bit-identical to the former explode + 96-column min
    * aggregate but with NO Generate row blow-up and NO doc-keyed
    * exchange: at 100 TB the old shape shuffled 96 longs per document
    * and multiplied the scan by the average shingle count before the
    * aggregate could fold it back down. */
  private[graft] def lshBuckets(shh: DataFrame): DataFrame = {
    val as = (0 until NumHashes).map(minhashCoeff("a", _))
    val bs = (0 until NumHashes).map(minhashCoeff("b", _))
    val sigs = shh.select(col("doc_id"),
      graft.expr.MinHashSigs.of(col("shh"), as, bs, MinHashPrime).as("mh"))
    val bandCols = (0 until NumHashes / BandRows).map { b =>
      val rows = (0 until BandRows).map(r => element_at(col("mh"), b * BandRows + r + 1))
      struct(lit(b).as("band"), md5(concat_ws(",", rows: _*)).as("sig"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def q21MinHashLsh(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val buckets = lshBuckets(shh)
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    verifyJaccard(cands, shh, 0.8)
  }

  /** Oracle: brute-force pairwise Jaccard at 0.8 (exact; LSH recall at
    * this threshold is 1 − 6e-10 so the hash compare is safe). */
  val q21Sql: String =
    s"""$shinglesSqlCte,
       |cnt AS (SELECT doc_id, len(sh) AS n FROM sh),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
       |      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT ida, idb, CAST(common AS DOUBLE) / (ca.n + cb.n - common) AS jaccard
       |FROM p JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
       |WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.8
       |ORDER BY ida, idb""".stripMargin

  // ---------------------------------------------------------------- q183
  /** LSH S-curve calibration (q173's audit pattern applied to q21's
    * BANDING): per true-Jaccard bin [j/10, (j+1)/10), how many exact
    * shared-shingle pairs exist, how many the 32×3 banding actually
    * catches, and the theoretical catch probability
    * 1 − (1 − m³)³² at the bin midpoint — the measured S-curve the
    * (bands, rows) design decision rests on. q21's "recall ≈ 1 at
    * J ≥ 0.8" claim stops being a formula and becomes a per-bin
    * (n_pairs, n_detected, empirical vs theoretical) table; the sub-
    * threshold bins show the false-candidate mass the verify step pays
    * for.
    *
    * AUDIT-scale contract (q173's): the exact arm joins every shared-
    * shingle pair — Σdf² fan-out, fine at gate/bench SF where shingle
    * df is benign; a 100 TB run computes the curve on a sampled stratum
    * while production dedup stays banded. The LSH arm is q21's own
    * bucket join, verbatim ([[lshBuckets]]), so the card measures the
    * production signature pipeline, not a reimplementation.
    *
    * Parity: Jaccard and rates are int/int IEEE divisions; the
    * theoretical curve is five explicit squarings (no pow — library pow
    * is not correctly rounded everywhere), so both engines run the
    * identical float op sequence; the oracle rebuilds the minhash family
    * from the same plan-time coefficients, embedded as literals. */
  def q183LshScurve(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val cnt = shh.select(col("doc_id"), size(col("shh")).as("n"))
    val ex = shh.select(col("doc_id"), explode(col("shh")).as("s"))
    val pairs = ex.as("a")
      .join(ex.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("common"))
      .join(cnt.toDF("ida", "na"), "ida")
      .join(cnt.toDF("idb", "nb"), "idb")
      .select(col("ida"), col("idb"),
        (col("common").cast(DoubleType) / (col("na") + col("nb") - col("common"))).as("j"))
    val buckets = lshBuckets(shh)
    val det = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()
      .withColumn("hit", lit(1L))
    val binned = pairs.join(det, Seq("ida", "idb"), "left")
      .select(least(floor(col("j") * 10).cast(IntegerType), lit(9)).as("bin"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("hit")).as("n_detected"))
    // full 10-bin spine: the theoretical curve renders everywhere, the
    // empirical columns report 0 pairs where the corpus has none
    spark.range(0, 10).select(col("id").cast(IntegerType).as("bin"))
      .join(binned, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_detected"), lit(0L)).as("n_detected"))
      .withColumn("m", col("bin").cast(DoubleType) / 10.0 + 0.05)
      .withColumn("y", lit(1.0) - col("m") * col("m") * col("m"))
      .withColumn("y2", col("y") * col("y"))
      .withColumn("y4", col("y2") * col("y2"))
      .withColumn("y8", col("y4") * col("y4"))
      .withColumn("y16", col("y8") * col("y8"))
      .select(
        (col("bin").cast(DoubleType) / 10.0).as("j_lo"),
        col("n_pairs"), col("n_detected"),
        when(col("n_pairs") > 0,
          col("n_detected").cast(DoubleType) / col("n_pairs")).as("empirical_rate"),
        (lit(1.0) - col("y16") * col("y16")).as("theoretical_rate"))
      .orderBy(col("j_lo"))
  }

  val q183Sql: String = {
    val coefRows = (0 until NumHashes).map { i =>
      s"($i, ${i / BandRows}, ${minhashCoeff("a", i)}, ${minhashCoeff("b", i)})"
    }.mkString(", ")
    s"""$shinglesSqlCte,
       |cnt AS (SELECT doc_id, len(sh) AS n FROM sh),
       |ex AS (SELECT doc_id,
       |    unnest([('0x' || substr(md5(s), 1, 15))::BIGINT for s in sh]) AS s FROM sh),
       |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
       |      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pj AS (SELECT ida, idb, CAST(common AS DOUBLE) / (ca.n + cb.n - common) AS j
       |       FROM p JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id),
       |bx AS (SELECT doc_id, (s >> 28) % $MinHashPrime AS bh FROM ex),
       |co AS (SELECT * FROM (VALUES $coefRows) AS t(i, band, a, b)),
       |mh AS (SELECT e.doc_id, c.i, c.band, min((e.bh * c.a + c.b) % $MinHashPrime) AS mh
       |       FROM bx e CROSS JOIN co c GROUP BY 1, 2, 3),
       |sg AS (SELECT doc_id, band,
       |       md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS sig
       |       FROM mh GROUP BY 1, 2),
       |det AS (SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
       |        FROM sg x JOIN sg y
       |        ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |bn0 AS (SELECT least(CAST(floor(j * 10) AS INT), 9) AS bin,
       |       count(*) AS n_pairs,
       |       CAST(sum(CASE WHEN det.ida IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_detected
       |       FROM pj LEFT JOIN det ON pj.ida = det.ida AND pj.idb = det.idb GROUP BY 1),
       |bn AS (SELECT CAST(sp.bin AS INT) AS bin,
       |       CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
       |       coalesce(n_detected, 0) AS n_detected
       |       FROM (SELECT unnest(range(0, 10)) AS bin) sp
       |       LEFT JOIN bn0 ON sp.bin = bn0.bin),
       |t1 AS (SELECT *, CAST(bin AS DOUBLE) / 10.0 + 0.05 AS m FROM bn),
       |t2 AS (SELECT *, CAST(1 AS DOUBLE) - m * m * m AS y FROM t1),
       |t3 AS (SELECT *, y * y AS y2 FROM t2),
       |t4 AS (SELECT *, y2 * y2 AS y4 FROM t3),
       |t5 AS (SELECT *, y4 * y4 AS y8 FROM t4),
       |t6 AS (SELECT *, y8 * y8 AS y16 FROM t5)
       |SELECT CAST(bin AS DOUBLE) / 10.0 AS j_lo,
       |  n_pairs, n_detected,
       |  CASE WHEN n_pairs > 0 THEN CAST(n_detected AS DOUBLE) / n_pairs END
       |    AS empirical_rate,
       |  CAST(1 AS DOUBLE) - y16 * y16 AS theoretical_rate
       |FROM t6 ORDER BY j_lo""".stripMargin
  }

  // ---------------------------------------------------------------- q22
  /** SimHash: 60-bit signature = per-bit majority vote over the md5 hashes
    * of the token multiset. One narrow pass + one groupBy per doc. */
  private val Bits = 60

  private def simhashPerDoc(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val tok = d.select(col("doc_id"), explode(tokens(normText(col("text")))).as("tok"))
      .select(col("doc_id"), hex60(col("tok")).as("th"))
    val bitSums = (0 until Bits).map(j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until Bits).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    // q23 self-joins this on both sides — materialize once (see
    // docShingleHashes for the rationale)
    agg.select(col("doc_id"), sim.as("simhash")).localCheckpoint(true)
  }

  private val simhashSqlCte: String = {
    val bitSums = (0 until Bits)
      .map(j => s"sum(CASE WHEN ((th >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(", ")
    val sim = (0 until Bits)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, ('0x' || substr(md5(unnest($toksSql)), 1, 15))::BIGINT AS th
       |  FROM documents),
       |bits AS (SELECT doc_id, $bitSums FROM tok GROUP BY doc_id),
       |simhash AS (SELECT doc_id, $sim AS simhash FROM bits)""".stripMargin
  }

  def q22Simhash(spark: SparkSession, dir: String): DataFrame =
    simhashPerDoc(spark, dir).orderBy(col("doc_id"))

  val q22Sql: String =
    s"""$simhashSqlCte
       |SELECT doc_id, simhash FROM simhash ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** SimHash near-dup pairs within Hamming distance 5, found WITHOUT a
    * quadratic pass: 6 disjoint 10-bit bands — any pair with ≤5 differing
    * bits must agree exactly on ≥1 band (pigeonhole), so a self-join on
    * (band_idx, band_value) finds all of them; bit_count verifies. */
  private val HammingMax = 5
  private val NumBands = 6 // 6 bands × 10 bits = 60; complete for distance ≤ 5

  def q23SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sim = simhashPerDoc(spark, dir)
    val bandW = Bits / NumBands
    val bands = sim.select(col("doc_id"), col("simhash"),
      explode(array((0 until NumBands).map(k =>
        struct(lit(k).as("k"),
          shiftright(col("simhash"), k * bandW).bitwiseAND(lit((1L << bandW) - 1)).as("v"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.k").as("k"), col("b.v").as("v"))
    val hamming = expr("bit_count(sa ^ sb)")
    bands.as("a")
      .join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
      .filter(hamming <= HammingMax)
      .select(col("ida"), col("idb"), hamming.as("hamming"))
      .orderBy(col("ida"), col("idb"))
  }

  val q23Sql: String =
    s"""$simhashSqlCte
       |SELECT a.doc_id AS ida, b.doc_id AS idb,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax
       |ORDER BY ida, idb""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Dedup representative selection — the decision a training-corpus
    * pipeline actually makes: within each exact-duplicate cluster keep
    * the HIGHEST-QUALITY copy (ties → lowest doc_id), emit the keep id,
    * cluster size, and how many rows get dropped. One narrow scoring pass
    * + one window over the 16-byte content hash (same shuffle key as
    * q19 — at scale the two dedup stages share a partitioning). */
  def q44DedupSelect(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
      .select(col("doc_id"),
        md5(normText(col("text"))).as("content_hash"),
        graft.text.TextQueries.qualityScore(col("text")).as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
      .orderBy(col("q").desc, col("doc_id"))
    d.withColumn("rn", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .filter(col("rn") === 1)
      .select(col("content_hash"), col("doc_id").as("keep_doc_id"),
        col("q").as("keep_quality"), col("n_docs"),
        (col("n_docs") - 1).as("n_dropped"))
      .orderBy(col("content_hash"))
  }

  val q44Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS content_hash,
       |    ${graft.text.TextQueries.qualityScoreSql} AS q
       |  FROM documents),
       |r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY content_hash ORDER BY q DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY content_hash) AS n_docs
       |  FROM scored)
       |SELECT content_hash, doc_id AS keep_doc_id, q AS keep_quality, n_docs,
       |  n_docs - 1 AS n_dropped
       |FROM r WHERE rn = 1 ORDER BY content_hash""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Corpus curation — the operators composed the way a training-data
    * pipeline actually runs them: quality-filter (q16's score), exact
    * dedup among the survivors, keep-best representative (q44's rule),
    * reported per language. One scoring scan + ONE window over the
    * content hash (the same shuffle key q19/q44 use) + one per-lang
    * aggregate — no operator-per-pass re-scanning. */
  private val CurationMinQuality = 0.75

  def q52CorpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        md5(normText(col("text"))).as("content_hash"),
        graft.text.TextQueries.qualityScore(col("text")).as("q"))
    val pass = col("q") >= CurationMinQuality
    // rank only the quality-passing docs within their duplicate cluster
    val ranked = scored.withColumn("rn",
      when(pass, row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_hash"), pass).orderBy(col("q").desc, col("doc_id"))))
        .otherwise(lit(null)))
    ranked.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(!pass, 1)).as("n_quality_fail"),
        count(when(pass, 1)).as("n_pass"),
        count(when(col("rn") === 1, 1)).as("n_kept"),
        count(when(pass && col("rn") =!= 1, 1)).as("n_dup_dropped"))
      .orderBy(col("lang"))
  }

  val q52Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS content_hash,
       |    ${graft.text.TextQueries.qualityScoreSql} AS q
       |  FROM documents),
       |r AS (
       |  SELECT *,
       |    CASE WHEN q >= $CurationMinQuality THEN
       |      row_number() OVER (PARTITION BY content_hash, q >= $CurationMinQuality
       |                         ORDER BY q DESC, doc_id)
       |    END AS rn
       |  FROM scored)
       |SELECT lang, count(*) AS n_docs,
       |  count(CASE WHEN q < $CurationMinQuality THEN 1 END) AS n_quality_fail,
       |  count(CASE WHEN q >= $CurationMinQuality THEN 1 END) AS n_pass,
       |  count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
       |  count(CASE WHEN q >= $CurationMinQuality AND rn != 1 THEN 1 END) AS n_dup_dropped
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Decontamination — the eval-set overlap scrub every training corpus
    * runs: flag documents sharing too many shingles with a benchmark set.
    * The benchmark here is the deterministic `doc_id % 97 == 0` slice (a
    * stand-in for the real eval suite — the gate enumerates identical
    * sets in both engines); a corpus doc is contaminated when ≥10% of its
    * trigram shingles appear in the benchmark (integer compare, no float
    * threshold).
    *
    * Scale shape: the benchmark shingle set is small by construction
    * (eval suites are), so the semi-join broadcasts under AQE and the
    * corpus side never shuffles its shingles; the per-doc hit count
    * groups on doc_id — the same key the shingle kernel already carries. */
  // `final` = compile-time constants: q175Sql (declared ABOVE this line)
  // interpolates BenchMod — a plain val would still be 0 (JVM default)
  // during that initializer, silently baking `% 0` into the oracle SQL
  private[graft] final val BenchMod = 97
  private[graft] final val ContamPct = 10 // contaminated when hits * 100 >= pct * shingles

  def q60Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val ex = shh.select(col("doc_id"), explode(col("shh")).as("h"))
    val benchSh = ex.filter(col("doc_id") % BenchMod === 0).select(col("h")).distinct()
    val hits = ex.filter(col("doc_id") % BenchMod =!= 0)
      .join(benchSh, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits")) // shingles are distinct per doc
    // TOTAL over the corpus: every non-bench doc reports, including the
    // shingle-less (< 3 tokens) ones the kernel drops — they emit
    // n_shingles=0, contaminated=false (n_hits>0 is required) rather than
    // silently vanishing from the report
    Tables(spark, dir).documents
      .filter(col("doc_id") % BenchMod =!= 0)
      .select(col("doc_id"))
      .join(shh.select(col("doc_id"), size(col("shh")).cast(LongType).as("n_shingles")),
        Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        (coalesce(col("n_hits"), lit(0L)) > 0 &&
          coalesce(col("n_hits"), lit(0L)) * 100 >=
            coalesce(col("n_shingles"), lit(0L)) * ContamPct).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  val q60Sql: String =
    s"""$shinglesSqlCte,
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % $BenchMod = 0),
       |hits AS (
       |  SELECT doc_id, count(*) AS n_hits
       |  FROM ex WHERE doc_id % $BenchMod != 0 AND s IN (SELECT s FROM bench)
       |  GROUP BY doc_id),
       |sizes AS (SELECT doc_id, len(sh) AS n_shingles FROM sh)
       |SELECT d.doc_id,
       |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(z.n_shingles, 0) AS BIGINT) AS n_shingles,
       |  coalesce(h.n_hits, 0) > 0 AND
       |    coalesce(h.n_hits, 0) * 100 >= coalesce(z.n_shingles, 0) * $ContamPct
       |    AS contaminated
       |FROM documents d
       |LEFT JOIN sizes z ON d.doc_id = z.doc_id
       |LEFT JOIN hits h ON d.doc_id = h.doc_id
       |WHERE d.doc_id % $BenchMod != 0 ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q186
  /** NEAR-dup eval-set decontamination: training docs whose shingle-set
    * Jaccard against ANY eval doc (q60's `doc_id % 97 = 0` convention)
    * reaches 0.8 — the contamination q60's exact-overlap test undercounts
    * when an eval item was lightly edited before leaking into the crawl.
    * Completes the decontamination family: q60 exact semi-join, q94 Bloom
    * prefilter, q175 span localization, q186 near-dup.
    *
    * 100 TB shape: candidate generation is q21's BANDED bucket join
    * restricted train×eval — a training doc is only ever paired with eval
    * docs sharing a (band, sig) bucket, so the fan-out is band-bucket
    * bounded, never |train|×|eval|; the eval side of the bucket frame is
    * corpus-fraction-of-1/97 sized (in production: broadcast-scale). The
    * verify step is the shared [[verifyJaccard]] two-pointer intersect.
    * Oracle: brute-force train×eval Jaccard (exact; banding recall at
    * J ≥ 0.8 is 1 − 6e-10 — q183 MEASURES that claim per decile). */
  def q186NearDupDecontam(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val buckets = lshBuckets(shh)
    val cands = buckets.filter(col("doc_id") % BenchMod =!= 0).as("a")
      .join(buckets.filter(col("doc_id") % BenchMod === 0).as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    verifyJaccard(cands, shh, 0.8)
      .select(col("ida").as("train_id"), col("idb").as("eval_id"), col("jaccard"))
      .orderBy(col("train_id"), col("eval_id"))
  }

  val q186Sql: String =
    s"""$shinglesSqlCte,
       |cnt AS (SELECT doc_id, len(sh) AS n FROM sh),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |p AS (SELECT a.doc_id AS train_id, b.doc_id AS eval_id, count(*) AS common
       |      FROM ex a JOIN ex b ON a.s = b.s
       |      WHERE a.doc_id % $BenchMod != 0 AND b.doc_id % $BenchMod = 0
       |      GROUP BY 1, 2)
       |SELECT train_id, eval_id,
       |  CAST(common AS DOUBLE) / (ca.n + cb.n - common) AS jaccard
       |FROM p JOIN cnt ca ON train_id = ca.doc_id JOIN cnt cb ON eval_id = cb.doc_id
       |WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.8
       |ORDER BY train_id, eval_id""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Within-document repetition ratio — the boilerplate/templating signal
    * corpus-quality rules gate on (alongside q16's score): the fraction
    * of trigram POSITIONS whose shingle already occurred in the document,
    * `1 − distinct_shingles / total_positions`. Pure narrow pass: the
    * shingle kernel runs in the scan stage, nothing shuffles but the
    * presentation sort. */
  def q61Repetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(normText(col("text")))
    val positions = greatest(size(toks) - 2, lit(0)).cast(LongType) // k=3 shingle starts
    val distinctSh = size(shingleHashes(toks)).cast(LongType)
    Tables(spark, dir).documents
      .select(col("doc_id"), positions.as("n_positions"), distinctSh.as("n_distinct"))
      .withColumn("repetition_ratio",
        lit(1.0) - col("n_distinct").cast(DoubleType) / nullif(col("n_positions"), lit(0)))
      .orderBy(col("doc_id"))
  }

  val q61Sql: String =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    greatest(len(t) - 2, 0) AS n_positions,
       |    len(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |                       for i in range(1, len(t)-1)])) AS n_distinct
       |  FROM tk)
       |SELECT doc_id, CAST(n_positions AS BIGINT) AS n_positions,
       |  CAST(n_distinct AS BIGINT) AS n_distinct,
       |  1.0 - CAST(n_distinct AS DOUBLE) / nullif(n_positions, 0) AS repetition_ratio
       |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Connected components over an undirected edge list by min-label
    * propagation with pointer jumping (path halving). Each iteration:
    * label(v) ← min(label(v), min over neighbours' labels), then one
    * pointer-jump label(v) ← label(label(v)) — the jump collapses label
    * chains so convergence is O(log n) rounds on chains and stars, not
    * O(diameter). Every round is two hash-partitioned equi-joins + one
    * aggregate on the edge key; nothing is ever collected to the driver
    * and the per-round `localCheckpoint` cuts lineage so round k's plan
    * does not replay rounds 1..k-1 (the standard large-graph CC shape —
    * near-dup graphs are shallow, so rounds stay in low single digits). */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges
      .select(col("ida").as("src"), col("idb").as("dst"))
      .unionByName(edges.select(col("idb").as("src"), col("ida").as("dst")))
      .localCheckpoint(true)
    // parallelism proportional to the EDGE list, not the corpus: the pair
    // graph is orders of magnitude smaller than the documents that
    // produced it, and an iterative loop pays per-round scheduling for
    // every shuffle partition — ~1M edges per partition keeps a
    // billion-edge graph at production width while a gate-scale graph
    // runs single-partition rounds
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1L, math.min(prevParts.toLong, sym.count() / 1000000L))
    // labels only ever DECREASE, so Σlabel strictly decreases while any
    // node changes — an O(1)-row aggregate per round replaces a
    // join-and-count convergence check (one fewer shuffle per round).
    // Summed as DECIMAL(38,0): node ids may be 60-bit hashes (q132's
    // hex60 names), where a long Σ overflows past ~8 nodes under ANSI
    def labelSum(df: DataFrame): BigDecimal =
      Option(df.agg(sum(col("label").cast(DecimalType(38, 0)))).first().get(0))
        .fold(BigDecimal(0))(v => BigDecimal(v.asInstanceOf[java.math.BigDecimal]))
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      var labels = sym.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
        .localCheckpoint(true)
      var prevSum = labelSum(labels)
      var done = false
      while (!done) {
        // message round: each node offers its label to every neighbour and
        // keeps its own (the union), takes the min — ONE join + one agg
        val msgs = sym
          .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
          .select(col("src").as("node"), col("label"))
        val prop = msgs.unionByName(labels)
          .groupBy(col("node")).agg(min(col("label")).as("label"))
        // pointer jump (path halving): label ← label(label) collapses
        // label chains so convergence is O(log n) rounds, not O(diameter)
        val jumped = prop
          .join(prop.select(col("node").as("label"), col("label").as("ll")), Seq("label"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
          .localCheckpoint(true)
        labels = jumped
        val s = labelSum(labels)
        done = s == prevSum
        prevSum = s
      }
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Near-dup CLUSTERS — the step after pair generation that a dedup
    * pipeline actually needs (q21 emits pairs; keeping one doc per
    * connected component is what shrinks the corpus): connected components
    * over the MinHash-LSH pair graph, labels = min doc_id reachable.
    * The pair set is materialized once ([[connectedComponents]] iterates
    * over it; without the checkpoint every CC round would re-run the whole
    * LSH cascade). Oracle: recursive-CTE reachability over the exact
    * Jaccard pair graph. */
  def q65DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = q21MinHashLsh(spark, dir)
      .select(col("ida"), col("idb"))
      .localCheckpoint(true)
    connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .orderBy(col("doc_id"))
  }

  private val shinglesSqlCteBody = shinglesSqlCte.stripPrefix("WITH ")

  /** The ONE oracle spelling of the near-dup CC walk (shingle sets →
    * Jaccard ≥ 0.8 pairs → recursive min-label walk → `lab(doc_id,
    * cluster_id)`), shared by q65Sql, q208Sql, and q206Sql (review
    * caught three diverging hand-inlined copies). Callers prepend
    * `WITH RECURSIVE ` themselves. Multi-referenced CTEs MATERIALIZED
    * per the 10x inliner rule. */
  private[graft] val ccWalkCtesSql: String =
    s"""$shinglesSqlCteBody,
       |cnt AS (SELECT doc_id, len(sh) AS n FROM sh),
       |ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
       |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
       |      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |pr AS (SELECT ida, idb
       |       FROM p JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
       |       WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.8),
       |sym AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pr
       |        UNION ALL SELECT idb, ida FROM pr),
       |walk AS (SELECT src, dst FROM sym
       |         UNION
       |         SELECT w.src, s.dst FROM walk w JOIN sym s ON w.dst = s.src),
       |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |        FROM walk GROUP BY src)""".stripMargin

  val q65Sql: String =
    s"""WITH RECURSIVE $ccWalkCtesSql
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM lab ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Substring-level dedup (Lee et al. style, token-window granularity):
    * hash every non-overlapping [[ChunkW]]-token window, count how many of
    * a document's windows also occur in ANOTHER document, report the
    * duplicated-window fraction. This is the signal paragraph/boilerplate
    * scrubbing gates on where q19 (whole-doc) and q20/q21 (whole-doc
    * near-dup) are too coarse.
    *
    * Scale shape: the chunk kernel is narrow (one pass, windows hashed to
    * 16-byte digests); the only shuffles carry (digest, doc_id) pairs —
    * never text — for the document-frequency groupBy and the count join
    * back, both on the same digest key. */
  private val ChunkW = 10

  def q69SubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    // r16: Tables.spread tried and reverted (0.49 → 0.94 s): the chunk
    // kernel is sub-half-second of CPU at gate scale — the q178 verdict
    val d = Tables(spark, dir).documents
    val toks = tokens(normText(col("text")))
    // one codegen'd kernel pass (see [[graft.expr.WordGrams]] — the HOF
    // spelling re-evaluates the token split per window); hashed mode means
    // every downstream shuffle carries 8-byte longs, never window text
    val segs = graft.expr.WordGrams.hashedOf(toks, ChunkW, ChunkW)
    // referenced twice (df count + join back) — materialize the digests,
    // not the text, so the token kernel runs once
    val ch = d.select(col("doc_id"), segs.as("hs")).localCheckpoint(true)
    val ex = ch.select(col("doc_id"), explode(col("hs")).as("h"))
    val dc = ex.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
    val per = ex.join(dc, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("nd") >= 2, 1)).as("n_dup_chunks"))
    ch.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        (coalesce(col("n_dup_chunks"), lit(0L)).cast(DoubleType) /
          nullif(coalesce(col("n_chunks"), lit(0L)), lit(0L))).as("dup_fraction"))
      .orderBy(col("doc_id"))
  }

  val q69Sql: String =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
       |ch AS (SELECT doc_id,
       |  CASE WHEN len(t) // $ChunkW > 0 THEN
       |    [('0x' || substr(md5(array_to_string(t[(i*$ChunkW+1):(i*$ChunkW+$ChunkW)], ' ')), 1, 15))::BIGINT
       |     for i in range(0, len(t) // $ChunkW)]
       |  ELSE []::BIGINT[] END AS hs FROM tk),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM ch),
       |dc AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ex GROUP BY h),
       |per AS (SELECT e.doc_id, count(*) AS n_chunks,
       |          count(CASE WHEN dc.nd >= 2 THEN 1 END) AS n_dup_chunks
       |        FROM ex e JOIN dc USING (h) GROUP BY e.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(per.n_chunks, 0) AS BIGINT) AS n_chunks,
       |  CAST(coalesce(per.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       |  CAST(coalesce(per.n_dup_chunks, 0) AS DOUBLE)
       |    / nullif(coalesce(per.n_chunks, 0), 0) AS dup_fraction
       |FROM ch d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q187
  /** Content-defined chunking dedup (the FastCDC/LBFS family, token
    * granularity): a chunk boundary falls AFTER token i whenever that
    * token's hash ≡ 0 (mod [[CdcMod]]), so boundaries are a function of
    * CONTENT, not position — after an insertion the chunk grid
    * resynchronizes at the next boundary, where q69's fixed grid shifts
    * every downstream chunk and loses the entire match
    * (`CdcResyncSpec` demonstrates exactly that, q69-vs-q187, on a
    * one-token prefix insertion). Expected chunk length = [[CdcMod]]
    * tokens. Per doc: chunk count, chunks appearing in ≥ 2 distinct docs
    * (q69's rule), and both the chunk-count and token-mass duplicate
    * fractions (CDC chunks are variable-length, so the mass fraction is
    * the honest one).
    *
    * 100 TB shape: chunking runs entirely IN-ROW on the token-hash
    * array (one WordGrams kernel pass, boundary scan + per-chunk md5 as
    * HOFs in the scan stage) — the only thing that ever shuffles is
    * (16-char chunk digest, doc_id, len); the df fold and join-back are
    * q69's digest-keyed schedule on the checkpointed chunk frame. */
  private val CdcMod = 8

  /** The CDC chunk frame (doc_id, chunk digest, token length) shared by
    * q187 and q210 — the token kernel runs once per call. */
  private def cdcChunkEx(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    // r16: Tables.spread tried and reverted (q187 0.74 → 1.06 s): the
    // in-row chunk pipeline is cheap at gate scale — the q178 verdict
    cdcChunkExOf(Tables(spark, dir).documents
      .select(col("doc_id"), tokens(normText(col("text"))).as("t")))

  /** As [[cdcChunkEx]] but over an existing (doc_id, t) token frame —
    * q210 feeds its shared tokenized base in so the treatment matrix
    * pays ONE corpus tokenization for all four treatments (r16). */
  private def cdcChunkExOf(tok: DataFrame): (DataFrame, DataFrame) = {
    val uh = graft.expr.WordGrams.hashedOf(col("t"), 1, 1)
    val n = size(col("uh"))
    val bpos = filter(sequence(lit(1), n), i => element_at(col("uh"), i) % CdcMod === 0)
    val starts = concat(array(lit(0)), col("bpos"))
    val ends = concat(col("bpos"), array(n))
    val chunks = filter(
      zip_with(starts, ends, (a, b) => struct(
        substring(md5(array_join(
          transform(slice(col("uh"), a + 1, b - a), h => h.cast("string")), ",")), 1, 16)
          .as("h"),
        (b - a).cast(LongType).as("len"))),
      c => c.getField("len") > 0)
    // digests only — the token kernel runs once (q69's rationale)
    val ch = tok
      .select(col("doc_id"), uh.as("uh"))
      .filter(size(col("uh")) > 0)
      .withColumn("bpos", bpos)
      .select(col("doc_id"), chunks.as("cs"))
      .localCheckpoint(true)
    (ch, ch.select(col("doc_id"), explode(col("cs")).as("c"))
      .select(col("doc_id"), col("c.h").as("h"), col("c.len").as("len")))
  }

  def q187CdcDedup(spark: SparkSession, dir: String): DataFrame = {
    val (ch, ex) = cdcChunkEx(spark, dir)
    val dc = ex.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
    val per = ex.join(dc, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("nd") >= 2, 1)).as("n_dup_chunks"),
        sum(col("len")).as("tok_total"),
        sum(when(col("nd") >= 2, col("len")).otherwise(0L)).as("tok_dup"))
    ch.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        (coalesce(col("n_dup_chunks"), lit(0L)).cast(DoubleType) /
          nullif(coalesce(col("n_chunks"), lit(0L)), lit(0L))).as("dup_fraction"),
        (coalesce(col("tok_dup"), lit(0L)).cast(DoubleType) /
          nullif(coalesce(col("tok_total"), lit(0L)), lit(0L))).as("dup_token_frac"))
      .orderBy(col("doc_id"))
  }

  val q187Sql: String =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
       |uhx AS (SELECT doc_id,
       |  [('0x' || substr(md5(t[i]), 1, 15))::BIGINT for i in range(1, len(t)+1)] AS uh
       |  FROM tk WHERE len(t) > 0),
       |bp AS (SELECT doc_id, uh,
       |  [i for i in range(1, len(uh)+1) if uh[i] % $CdcMod = 0] AS bpos
       |  FROM uhx),
       |sg AS (SELECT doc_id, uh,
       |  list_prepend(0, bpos) AS starts, list_append(bpos, len(uh)) AS ends
       |  FROM bp),
       |ch AS (SELECT doc_id,
       |  [struct_pack(h := substr(md5(array_to_string(
       |       list_transform(uh[starts[k]+1:ends[k]], x -> CAST(x AS VARCHAR)), ',')), 1, 16),
       |     l := CAST(ends[k] - starts[k] AS BIGINT))
       |   for k in range(1, len(starts)+1) if ends[k] > starts[k]] AS cs
       |  FROM sg),
       |ex0 AS (SELECT doc_id, unnest(cs) AS c FROM ch),
       |ex AS (SELECT doc_id, c.h AS h, c.l AS len FROM ex0),
       |dc AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ex GROUP BY h),
       |per AS (SELECT e.doc_id, count(*) AS n_chunks,
       |          count(CASE WHEN dc.nd >= 2 THEN 1 END) AS n_dup_chunks,
       |          CAST(sum(e.len) AS BIGINT) AS tok_total,
       |          CAST(sum(CASE WHEN dc.nd >= 2 THEN e.len ELSE 0 END) AS BIGINT) AS tok_dup
       |        FROM ex e JOIN dc USING (h) GROUP BY e.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(per.n_chunks, 0) AS BIGINT) AS n_chunks,
       |  CAST(coalesce(per.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       |  CAST(coalesce(per.n_dup_chunks, 0) AS DOUBLE)
       |    / nullif(coalesce(per.n_chunks, 0), 0) AS dup_fraction,
       |  CAST(coalesce(per.tok_dup, 0) AS DOUBLE)
       |    / nullif(coalesce(per.tok_total, 0), 0) AS dup_token_frac
       |FROM ch d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q72
  /** Winnow-fingerprint overlap pairs — MOSS-style containment detection
    * (Schleimer et al., SIGMOD'03): document pairs sharing at least
    * [[WinnowMinOverlap]] winnowing fingerprints (q50's kernel), scored by
    * containment = shared / min(|a|, |b|). Winnowing guarantees any
    * shared token run of ≥ window+gram−1 tokens contributes a common
    * fingerprint, so this finds PARTIAL overlap (one doc embedded in
    * another) that whole-document Jaccard (q20/q21) dilutes away.
    *
    * Scale shape: same df-capped inverted index as q20 — fingerprints
    * shared by more than [[DfCap]] docs are boilerplate and skipped for
    * candidate generation (each would fan out df² pairs); verification
    * still intersects the FULL fingerprint sets (sorted-merge, no
    * allocation). Shuffles carry (fingerprint, doc_id) longs only. */
  private val WinnowMinOverlap = 8

  def q72WinnowPairs(spark: SparkSession, dir: String): DataFrame = {
    val fps = graft.text.TextQueries
      .winnowFingerprintSets(Tables(spark, dir).documents)
      .filter(size(col("fp")) > 0)
      .select(col("doc_id"), col("fp"))
      .localCheckpoint(true)
    val ex = fps.select(col("doc_id"), explode(col("fp")).as("h"))
    val buckets = ex.groupBy(col("h"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, DfCap))
    val cands = buckets
      .select(explode(bucketPairList).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb"))
      .filter(col("ida") < col("idb"))
      .distinct()
    cands
      .join(fps.select(col("doc_id").as("ida"), col("fp").as("fa")), "ida")
      .join(fps.select(col("doc_id").as("idb"), col("fp").as("fb")), "idb")
      .select(col("ida"), col("idb"),
        graft.expr.SortedIntersectCount.of(col("fa"), col("fb")).as("n_shared"),
        size(col("fa")).as("na"), size(col("fb")).as("nb"))
      .filter(col("n_shared") >= WinnowMinOverlap)
      .select(col("ida"), col("idb"), col("n_shared").cast(LongType).as("n_shared"),
        (col("n_shared").cast(DoubleType) / least(col("na"), col("nb"))).as("containment"))
      .orderBy(col("ida"), col("idb"))
  }

  val q72Sql: String =
    s"""${graft.text.TextQueries.winnowSqlCte},
       |fs AS (SELECT doc_id, fp FROM f WHERE len(fp) > 0),
       |exw AS (SELECT doc_id, unnest(fp) AS h FROM fs),
       |dfok AS (SELECT h FROM exw GROUP BY h HAVING count(*) BETWEEN 2 AND $DfCap),
       |p AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       |      FROM exw a JOIN exw b ON a.h = b.h AND a.doc_id < b.doc_id
       |      WHERE a.h IN (SELECT h FROM dfok)),
       |v AS (SELECT ida, idb,
       |        len(list_intersect(fa.fp, fb.fp)) AS n_shared,
       |        len(fa.fp) AS na, len(fb.fp) AS nb
       |      FROM p JOIN fs fa ON ida = fa.doc_id JOIN fs fb ON idb = fb.doc_id)
       |SELECT ida, idb, CAST(n_shared AS BIGINT) AS n_shared,
       |  CAST(n_shared AS DOUBLE) / least(na, nb) AS containment
       |FROM v WHERE n_shared >= $WinnowMinOverlap
       |ORDER BY ida, idb""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Incremental (cross-corpus) near-dedup: treat one doc in five
    * (`doc_id % 5 = 0`) as the NEW crawl delta and the rest as the
    * EXISTING corpus, and report, for every new doc that near-duplicates
    * (Jaccard ≥ 0.8) something already in the corpus, its best existing
    * match — the steady-state form of corpus dedup, where each new crawl
    * is deduped against everything ingested before it, not all-pairs
    * against itself.
    *
    * Reuses the q21 signature pipeline ([[lshBuckets]]): candidates come
    * from a (band, sig) equi-join of the delta's bucket rows against the
    * corpus's (no self-join), then exact-verify + a per-new-doc top-1
    * window. 100 TB shape: the join shuffles bucket rows (longs + md5
    * strings), never text; the corpus side's signatures are
    * delta-independent, so a production deployment persists them once and
    * each nightly crawl only computes delta signatures — the plan here IS
    * that plan with the persist elided. Banding recall at J=0.8 is
    * 1 − 6e-10 (q21), so the brute-force oracle compare is safe.
    */
  def q76IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val buckets = lshBuckets(shh)
    val cands = buckets.filter(col("doc_id") % 5 === 0).as("a")
      .join(buckets.filter(col("doc_id") % 5 =!= 0).as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    val best = Window.partitionBy(col("ida")).orderBy(col("jaccard").desc, col("idb"))
    verifyJaccard(cands, shh, 0.8)
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("ida").as("new_doc_id"), col("idb").as("dup_of"), col("jaccard"))
      .orderBy(col("new_doc_id"))
  }

  /** Oracle: brute-force new×old Jaccard at 0.8, top-1 per new doc. */
  val q76Sql: String =
    s"""$shinglesSqlCte,
       |cnt AS (SELECT doc_id, len(sh) AS n FROM sh),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
       |      FROM ex a JOIN ex b ON a.s = b.s
       |      WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
       |      GROUP BY 1, 2),
       |v AS (SELECT ida, idb, CAST(common AS DOUBLE) / (ca.n + cb.n - common) AS jaccard
       |      FROM p JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
       |      WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.8),
       |r AS (SELECT ida, idb, jaccard,
       |        row_number() OVER (PARTITION BY ida ORDER BY jaccard DESC, idb) AS rk
       |      FROM v)
       |SELECT ida AS new_doc_id, idb AS dup_of, jaccard
       |FROM r WHERE rk = 1 ORDER BY new_doc_id""".stripMargin

  // ---------------------------------------------------------------- q81
  /** Per-source duplicate-rate rollup — the data-card statistic that says
    * which ingest sources are redundant (a crawl with dup_rate 0.4 gets
    * deduped or down-weighted before training). Same content key as q19
    * (md5 of normalized text): the shuffle carries (source, digest), the
    * per-source distinct count partial-aggregates map-side, and the two
    * final double ops (one division, one subtraction) are bit-stable
    * cross-engine. */
  def q81DupStats(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents
      .select(col("source"), md5(normText(col("text"))).as("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"),
        (lit(1.0) - countDistinct(col("h")).cast(DoubleType) / count(lit(1)))
          .as("dup_rate"))
      .orderBy(col("source"))
  }

  val q81Sql: String =
    s"""SELECT source, count(*) AS n_docs,
       |  count(DISTINCT md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))))) AS n_distinct,
       |  1.0 - CAST(count(DISTINCT md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g'))))) AS DOUBLE)
       |    / count(*) AS dup_rate
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q141
  /** Duplicate-aware training weights, MATERIALIZED per document — the
    * artifact a trainer actually consumes (where q19 reports clusters
    * and q81 reports rates): every doc gets weight 1/|its exact-dup
    * cluster| (Lee et al. 2022's count-deduplication alternative to
    * dropping — total corpus influence per distinct content is exactly
    * 1, so boilerplate repeated 10 000× stops dominating the loss while
    * rare phrasing keeps full weight). Swapping q65's near-dup CC
    * labels for the digest gives the near-dup-aware variant with the
    * SAME join-back shape.
    *
    * 100 TB shape: digest-keyed count + join-back co-partitioned on the
    * 16-byte digest (one shuffle pair, AQE-reused subplan; the text
    * never shuffles — only (digest, doc_id) pairs); the weight is one
    * bit-stable double division. Invariant (spec-pinned): Σ weight =
    * #distinct contents, because each cluster contributes n · (1/n) —
    * up to one float ulp per cluster (1/3 summed thrice is not
    * bit-exactly 1). */
  def q141DupWeights(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), md5(normText(col("text"))).as("content_hash"))
    val sizes = h.groupBy(col("content_hash")).agg(count(lit(1)).as("cluster_n"))
    h.join(sizes, Seq("content_hash"))
      .select(col("doc_id"), col("source"), col("content_hash"), col("cluster_n"),
        (lit(1.0) / col("cluster_n").cast(DoubleType)).as("weight"))
      .orderBy(col("doc_id"))
  }

  val q141Sql: String =
    s"""WITH h AS (SELECT doc_id, source,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS content_hash
       |  FROM documents),
       |s AS (SELECT content_hash, CAST(count(*) AS BIGINT) AS cluster_n
       |      FROM h GROUP BY 1)
       |SELECT doc_id, source, content_hash, cluster_n,
       |  CAST(1.0 AS DOUBLE) / CAST(cluster_n AS DOUBLE) AS weight
       |FROM h JOIN s USING (content_hash)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q208
  /** NEAR-dup-aware training weights — q141's count-deduplication with
    * q65's connected-component labels swapped in for the exact content
    * hash (the swap q141's scaladoc promises; this card makes it a gated
    * artifact): weight = 1/|near-dup cluster|, singletons are their own
    * cluster (left-join coalesce, q132's device), so lightly-edited
    * copies that q141's exact hash treats as distinct content share one
    * unit of influence. Σweight = #clusters is spec-pinned.
    *
    * 100 TB shape: q65's CC engine (edge-proportional shuffles,
    * per-round checkpoint) + ONE label-keyed count + the doc-keyed join
    * back — the exact q141 join-back shape on the CC label instead of
    * the digest. One bit-stable division per row. */
  def q208NearDupWeights(spark: SparkSession, dir: String): DataFrame = {
    val labels = q65DedupClusters(spark, dir).select(col("doc_id"), col("cluster_id"))
    val base = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = base.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_n"))
    base.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("source"), col("cluster_id"), col("cluster_n"),
        (lit(1.0) / col("cluster_n").cast(DoubleType)).as("weight"))
      .orderBy(col("doc_id"))
  }

  val q208Sql: String =
    s"""WITH RECURSIVE $ccWalkCtesSql,
       |base AS MATERIALIZED (SELECT d.doc_id, d.source,
       |    coalesce(lab.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_n
       |       FROM base GROUP BY 1)
       |SELECT doc_id, source, cluster_id, cluster_n,
       |  CAST(1.0 AS DOUBLE) / CAST(cluster_n AS DOUBLE) AS weight
       |FROM base JOIN sz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q210
  /** Dedup-treatment COMPARISON matrix — the decision table for choosing
    * an excision granularity, composing the exact kernels of the four
    * treatments the family ships (q194's summary-≡-detail pattern):
    *
    *   - `exact_doc` (q19's rule): non-keeper copies (min-doc_id keeper
    *     per content hash) removed WHOLE;
    *   - `chunk_fixed` (q69): duplicated non-overlapping 10-token
    *     windows (mass = dup windows × 10; all occurrences counted);
    *   - `chunk_cdc` (q187): duplicated content-defined chunks (variable
    *     length — the mass is the chunks' own token lengths);
    *   - `span_exact` (q200): the exact token-interval union of
    *     cross-document repeated 8-gram spans.
    *
    * Per treatment: docs affected, tokens removed (each treatment's OWN
    * accounting, all in the same whitespace-token units), the shared
    * corpus token mass, and the removed fraction. exact_doc keeps one
    * canonical copy; the sub-document treatments flag every occurrence
    * (the Lee et al. ExactSubstr convention q204 executes) — the
    * asymmetry is the point of the table: it is what choosing a
    * granularity trades.
    *
    * 100 TB shape: four aggregation-shaped passes that all exist
    * elsewhere (16-byte digest fold; two chunk-digest folds; the span
    * detector's dup-mass semi-join), each folding to ONE row map-side —
    * no new shuffle shapes, output is 4 rows. */
  def q210TreatmentMatrix(spark: SparkSession, dir: String): DataFrame = {
    val k = graft.text.CurationQueries.SpanK
    val (base, flagged) = graft.text.CurationQueries.spanDirty(spark, dir)
    val corpus = base.agg(sum(size(col("t")).cast(LongType)).as("corpus_tokens"))

    // exact_doc: q19's keeper rule over the content hash; digests
    // materialized — referenced by the keeper fold AND the join back
    // (q69's device; review caught the double kernel run).
    // r16: the digest derives from the ALREADY-TOKENIZED base frame —
    // normText emits single-space-joined trimmed tokens, so
    // concat_ws(" ", t) reproduces the normalized string byte-for-byte
    // and md5 of it equals md5(normText(text)). That turns a fourth
    // corpus text scan + regex-normalization pass + doc-keyed join into
    // one projection over the checkpointed token frame.
    val h = base
      .select(col("doc_id"), md5(concat_ws(" ", col("t"))).as("ch"),
        size(col("t")).cast(LongType).as("n"))
      .localCheckpoint(true)
    val keeper = h.groupBy(col("ch")).agg(min(col("doc_id")).as("kid"))
    val exactRow = h.join(keeper, Seq("ch")).filter(col("doc_id") =!= col("kid"))
      .agg(count(lit(1)).as("docs_affected"), sum(col("n")).as("tokens_removed"))
      .select(lit("exact_doc").as("treatment"),
        coalesce(col("docs_affected"), lit(0L)).as("docs_affected"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"))

    // chunk_fixed: q69's duplicated 10-token windows, all occurrences —
    // the window hashes run over base's token arrays (r16: no third
    // corpus tokenization pass; identical input array, identical grams)
    val cex = base
      .select(col("doc_id"),
        explode(graft.expr.WordGrams.hashedOf(col("t"), ChunkW, ChunkW)).as("h"))
      .localCheckpoint(true)
    val cdc69 = cex.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
    val chunkRow = cex.join(cdc69, Seq("h")).filter(col("nd") >= 2)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("ndup"))
      .agg(count(lit(1)).as("docs_affected"),
        sum(col("ndup") * ChunkW).as("tokens_removed"))
      .select(lit("chunk_fixed").as("treatment"),
        coalesce(col("docs_affected"), lit(0L)).as("docs_affected"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"))

    // chunk_cdc: q187's duplicated content-defined chunks, fed from the
    // shared token frame (r16: one corpus tokenization for the matrix)
    val (_, cdcEx) = cdcChunkExOf(base.select(col("doc_id"), col("t")))
    val cdcDf = cdcEx.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
    val cdcRow = cdcEx.join(cdcDf, Seq("h")).filter(col("nd") >= 2)
      .groupBy(col("doc_id")).agg(sum(col("len")).as("tokdup"))
      .agg(count(lit(1)).as("docs_affected"), sum(col("tokdup")).as("tokens_removed"))
      .select(lit("chunk_cdc").as("treatment"),
        coalesce(col("docs_affected"), lit(0L)).as("docs_affected"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"))

    // span_exact: q200's dirty token set (≡ the interval union, pinned
    // equal by CurationSpec's q204 cross-check)
    val spanRow = flagged
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("j"))
      .distinct()
      .agg(countDistinct(col("doc_id")).as("docs_affected"),
        count(lit(1)).as("tokens_removed"))
      .select(lit("span_exact").as("treatment"),
        col("docs_affected"), col("tokens_removed"))

    exactRow.unionByName(chunkRow).unionByName(cdcRow).unionByName(spanRow)
      .crossJoin(broadcast(corpus))
      .select(col("treatment"), col("docs_affected"), col("tokens_removed"),
        col("corpus_tokens"),
        (col("tokens_removed").cast(DoubleType) / col("corpus_tokens"))
          .as("removed_frac"))
      .orderBy(col("treatment"))
  }

  val q210Sql: String = {
    val k = graft.text.CurationQueries.SpanK
    s"""WITH tk AS MATERIALIZED (SELECT doc_id, $toksSql AS t FROM documents),
       |tokn AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM tk),
       |ct AS (SELECT sum(n) AS corpus_tokens FROM tokn),
       |eh AS (SELECT doc_id,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS ch
       |  FROM documents),
       |ek AS (SELECT ch, min(doc_id) AS kid FROM eh GROUP BY 1),
       |erow AS (SELECT 'exact_doc' AS treatment,
       |    CAST(count(*) AS BIGINT) AS docs_affected,
       |    CAST(coalesce(sum(n), 0) AS BIGINT) AS tokens_removed
       |  FROM eh JOIN ek USING (ch) JOIN tokn USING (doc_id)
       |  WHERE doc_id != kid),
       |cq AS (SELECT doc_id, unnest(CASE WHEN len(t) // $ChunkW > 0 THEN
       |    [('0x' || substr(md5(array_to_string(t[(i*$ChunkW+1):(i*$ChunkW+$ChunkW)], ' ')), 1, 15))::BIGINT
       |     for i in range(0, len(t) // $ChunkW)]
       |  ELSE []::BIGINT[] END) AS h FROM tk),
       |cqd AS (SELECT h FROM cq GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |cqp AS (SELECT doc_id, count(*) AS ndup FROM cq
       |        WHERE h IN (SELECT h FROM cqd) GROUP BY 1),
       |crow AS (SELECT 'chunk_fixed' AS treatment,
       |    CAST(count(*) AS BIGINT) AS docs_affected,
       |    CAST(coalesce(sum(ndup * $ChunkW), 0) AS BIGINT) AS tokens_removed
       |  FROM cqp),
       |duh AS (SELECT doc_id,
       |  [('0x' || substr(md5(t[i]), 1, 15))::BIGINT for i in range(1, len(t)+1)] AS uh
       |  FROM tk WHERE len(t) > 0),
       |dbp AS (SELECT doc_id, uh,
       |  [i for i in range(1, len(uh)+1) if uh[i] % $CdcMod = 0] AS bpos
       |  FROM duh),
       |dsg AS (SELECT doc_id, uh,
       |  list_prepend(0, bpos) AS starts, list_append(bpos, len(uh)) AS ends
       |  FROM dbp),
       |dch AS (SELECT doc_id,
       |  [struct_pack(h := substr(md5(array_to_string(
       |       list_transform(uh[starts[x]+1:ends[x]], v -> CAST(v AS VARCHAR)), ',')), 1, 16),
       |     l := CAST(ends[x] - starts[x] AS BIGINT))
       |   for x in range(1, len(starts)+1) if ends[x] > starts[x]] AS cs
       |  FROM dsg),
       |dex0 AS (SELECT doc_id, unnest(cs) AS c FROM dch),
       |dex AS MATERIALIZED (SELECT doc_id, c.h AS h, c.l AS len FROM dex0),
       |dd AS (SELECT h FROM dex GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |dp AS (SELECT doc_id, sum(len) AS tokdup FROM dex
       |       WHERE h IN (SELECT h FROM dd) GROUP BY 1),
       |drow AS (SELECT 'chunk_cdc' AS treatment,
       |    CAST(count(*) AS BIGINT) AS docs_affected,
       |    CAST(coalesce(sum(tokdup), 0) AS BIGINT) AS tokens_removed
       |  FROM dp),
       |ssq AS (SELECT doc_id,
       |    CASE WHEN len(t) >= $k
       |      THEN [('0x' || substr(md5(array_to_string(t[i:i+${k - 1}], ' ')), 1, 15))::BIGINT
       |            for i in range(1, len(t) - ${k - 2})]
       |      ELSE []::BIGINT[] END AS seq
       |  FROM tk),
       |spx AS MATERIALIZED (SELECT doc_id, unnest(seq) AS h,
       |    generate_subscripts(seq, 1) AS pos FROM ssq),
       |sdirty AS (SELECT h FROM spx GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |sfl AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM spx
       |        WHERE h IN (SELECT h FROM sdirty)),
       |stf AS (SELECT DISTINCT doc_id, pos + r.o AS j FROM sfl, range(0, $k) r(o)),
       |srow AS (SELECT 'span_exact' AS treatment,
       |    CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_affected,
       |    CAST(count(*) AS BIGINT) AS tokens_removed
       |  FROM stf),
       |allrows AS (SELECT * FROM erow UNION ALL SELECT * FROM crow
       |            UNION ALL SELECT * FROM drow UNION ALL SELECT * FROM srow)
       |SELECT treatment, docs_affected, tokens_removed,
       |  CAST(corpus_tokens AS BIGINT) AS corpus_tokens,
       |  CAST(tokens_removed AS DOUBLE) / corpus_tokens AS removed_frac
       |FROM allrows, ct ORDER BY treatment""".stripMargin
  }

  // ---------------------------------------------------------------- q87
  /** Duplicate-cluster size distribution — how redundancy is SHAPED: many
    * 2-dup clusters (benign boilerplate) vs a few huge ones (a mirror or
    * crawler loop; at 100 TB the giant cluster is also the groupBy skew
    * key the q84 card would flag). Two cascaded digest-keyed
    * aggregations, both map-side combinable; output is bounded by the
    * largest cluster size. */
  def q87DupSizeHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents
      .select(md5(normText(col("text"))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  val q87Sql: String =
    s"""WITH g AS (SELECT md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS h,
       |  count(*) AS cluster_size FROM documents GROUP BY 1)
       |SELECT cluster_size, count(*) AS n_clusters,
       |  CAST(sum(cluster_size) AS BIGINT) AS n_docs
       |FROM g GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Cross-source n-gram profile overlap — the source-level contamination
    * matrix a corpus-mixing decision reads: for every source pair, the
    * Jaccard similarity of their distinct 3-gram shingle sets. High
    * overlap between two "independent" sources means one mirrors the
    * other (dedup them jointly, or drop one from the mixture); near-zero
    * overlap justifies sampling them as independent strata. Doc-level
    * exact overlap (q19's key) is the wrong granularity for this — mirrors
    * re-wrap text so whole-doc hashes diverge while the n-gram profile
    * stays ~identical.
    *
    * Scale shape: the shuffle carries distinct (shingle-hex60, source)
    * longs, never text; per-shingle fan-out is a `collect_set` bounded by
    * the SOURCE cardinality (a mixture has tens..thousands of sources, not
    * billions), and the ordered-pair expansion happens inside that bounded
    * array — no shingle self-join, no d² explosion. Per-source set sizes
    * are a tiny aggregate broadcast back onto the ≤|sources|² pair rows. */
  def q92SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    // referenced three times (pair side + both per-source count joins) —
    // materialize so the shingle kernel and the distinct run ONCE (the
    // docShingleHashes pattern; without this the plan scans documents 3×)
    val ss = Tables(spark, dir).documents
      .select(col("source"), explode(shingleHashes(tokens(normText(col("text"))))).as("h"))
      .distinct()
      .localCheckpoint(true)
    val ns = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    ss.groupBy(col("h"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(explode(expr(
        "flatten(transform(srcs, (x, i) -> " +
          "transform(slice(srcs, i + 2, size(srcs)), y -> struct(x AS a, y AS b))))")).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(ns.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(ns.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"), col("n_b"),
        (col("n_shared").cast(DoubleType) / (col("n_a") + col("n_b") - col("n_shared")))
          .as("profile_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q92Sql: String =
    s"""WITH tk AS (SELECT source, $toksSql AS t FROM documents),
       |shs AS (SELECT source,
       |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sh
       |  FROM tk),
       |ss AS (SELECT DISTINCT source, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
       |       FROM (SELECT source, unnest(sh) AS s FROM shs)),
       |ns AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
       |c AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
       |      FROM ss a JOIN ss b ON a.h = b.h AND a.source < b.source
       |      GROUP BY 1, 2)
       |SELECT src_a, src_b, n_shared, na.n AS n_a, nb.n AS n_b,
       |  CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared) AS profile_jaccard
       |FROM c JOIN ns na ON c.src_a = na.source JOIN ns nb ON c.src_b = nb.source
       |ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- q213
  /** KMV-sketch pairwise source overlap — q92 restated in the shape that
    * ships at 100 TB (the q60→q94 move, applied to the overlap matrix).
    * q92 materializes the cross-source shared-shingle set, so its cost is
    * the full distinct-shingle profile of every source PLUS a pair
    * explosion on the shared hashes; this card touches the raw rows ONCE:
    * per source, a [[graft.sketch.KmvSketch]] state of the shingle hashes
    * ([[OverlapK]] minimum values — the shuffle carries ≤ k longs per
    * source, never the profile), then every pair statistic is arithmetic
    * on the source-cardinality sketch frame: the merged pair sketch is the
    * k smallest of the two min-sets' union (KMV merge = capped sorted-set
    * union), ρ = |merged ∩ A ∩ B| / |merged| estimates Jaccard (Beyer et
    * al., SIGMOD'07), the union size comes from the merged kth minimum
    * (Bar-Yossef et al.), and intersection = ρ · union. S² pairs of
    * k-arrays is driver-trivial for any bounded source count, and the
    * sketches persist/re-merge incrementally like q77's rollup — the
    * update path q92 fundamentally lacks.
    *
    * Parity: the estimator is DETERMINISTIC given the hash set, so the
    * oracle mirrors it — per-source k-minimum rows via one ranked window,
    * pair unions ranked the same way, and the exact-below-k vs
    * kth-minimum branches spelled with the SAME division order as
    * [[graft.sketch.KmvSketch.KmvAggregator.finish]]; jaccard and the
    * product est columns are single fixed-shape IEEE ops on those exact
    * inputs. A source whose every doc is shorter than the shingle width
    * has no profile and drops from the matrix in both engines (explode/
    * unnest of an empty list). `KmvOverlapSpec` pins the estimates
    * against q92's exact profile Jaccard at gate scale. */
  private val OverlapK = 1024

  def q213KmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val hs = (1L << 60).toDouble
    // one corpus pass → one ≤k-long sketch per source (tiny; materialized
    // so the self-join's two sides don't re-run the shingle kernel)
    val sk = Tables(spark, dir).documents
      .select(col("source"), explode(shingleHashes(tokens(normText(col("text"))))).as("h"))
      .groupBy(col("source"))
      .agg(graft.sketch.KmvSketch.sketchState(col("h"), OverlapK).getField("mins").as("mins"))
      .localCheckpoint(true)
    def est(mins: Column, kth: Column): Column =
      when(size(mins) < OverlapK, size(mins).cast(DoubleType))
        .otherwise(lit((OverlapK - 1).toDouble) / (kth.cast(DoubleType) / lit(hs)))
    val a = sk.select(col("source").as("src_a"), col("mins").as("ma"))
    val b = sk.select(col("source").as("src_b"), col("mins").as("mb"))
    // source-cardinality pair frame: S(S−1)/2 rows of two k-arrays each
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("u", array_sort(array_union(col("ma"), col("mb"))))
      .withColumn("merged", slice(col("u"), 1, OverlapK))
      .withColumn("n_merged", size(col("merged")))
      // hash-set intersections (array_intersect), never a per-element
      // array_contains scan: O(k) per pair instead of O(k²)
      .withColumn("n_shared",
        size(array_intersect(array_intersect(col("merged"), col("ma")), col("mb"))))
      .withColumn("est_a", est(col("ma"), element_at(col("ma"), OverlapK)))
      .withColumn("est_b", est(col("mb"), element_at(col("mb"), OverlapK)))
      .withColumn("union_est",
        when(size(col("u")) < OverlapK, size(col("u")).cast(DoubleType))
          .otherwise(lit((OverlapK - 1).toDouble) /
            (element_at(col("u"), OverlapK).cast(DoubleType) / lit(hs))))
      .withColumn("jaccard_est",
        col("n_shared").cast(DoubleType) / nullif(col("n_merged"), lit(0)).cast(DoubleType))
      .withColumn("intersect_est", col("jaccard_est") * col("union_est"))
      .select(col("src_a"), col("src_b"),
        size(col("ma")).as("sk_a"), size(col("mb")).as("sk_b"),
        col("n_merged"), col("n_shared"), col("est_a"), col("est_b"),
        col("union_est"), col("jaccard_est"), col("intersect_est"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q213Sql: String = {
    val k = OverlapK
    // exact-below-k vs kth-minimum branch, spelled with KmvAggregator.
    // finish's division order so the doubles are bit-identical
    def estSql(n: String, kth: String): String =
      s"CASE WHEN $n < $k THEN CAST($n AS DOUBLE) ELSE ${(k - 1).toDouble} / (CAST($kth AS DOUBLE) / 1152921504606846976.0) END"
    s"""WITH tk AS (SELECT source, $toksSql AS t FROM documents),
       |shs AS (SELECT source,
       |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sh
       |  FROM tk),
       |ss AS (SELECT DISTINCT source, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
       |       FROM (SELECT source, unnest(sh) AS s FROM shs)),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |      FROM ss),
       |sk AS MATERIALIZED (SELECT source, h, rn FROM r WHERE rn <= $k),
       |ksz AS (SELECT source, count(*) AS n_sk,
       |               max(CASE WHEN rn = $k THEN h END) AS kth
       |        FROM sk GROUP BY 1),
       |p AS (SELECT a.source AS src_a, a.n_sk AS sk_a, a.kth AS kth_a,
       |             b.source AS src_b, b.n_sk AS sk_b, b.kth AS kth_b
       |      FROM ksz a JOIN ksz b ON a.source < b.source),
       |uh AS (SELECT p.src_a, p.src_b, sk.h,
       |         bool_or(sk.source = p.src_a) AS in_a,
       |         bool_or(sk.source = p.src_b) AS in_b
       |       FROM p JOIN sk ON sk.source IN (p.src_a, p.src_b)
       |       GROUP BY 1, 2, 3),
       |ur AS (SELECT src_a, src_b, h, in_a, in_b,
       |         row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn,
       |         count(*) OVER (PARTITION BY src_a, src_b) AS nu
       |       FROM uh),
       |pu AS (SELECT src_a, src_b, max(nu) AS nu,
       |         count(*) FILTER (WHERE rn <= $k) AS n_merged,
       |         count(*) FILTER (WHERE rn <= $k AND in_a AND in_b) AS n_shared,
       |         max(CASE WHEN rn = $k THEN h END) AS kth_u
       |       FROM ur GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b,
       |  CAST(p.sk_a AS INT) AS sk_a, CAST(p.sk_b AS INT) AS sk_b,
       |  CAST(pu.n_merged AS INT) AS n_merged, CAST(pu.n_shared AS INT) AS n_shared,
       |  ${estSql("p.sk_a", "p.kth_a")} AS est_a,
       |  ${estSql("p.sk_b", "p.kth_b")} AS est_b,
       |  ${estSql("pu.nu", "pu.kth_u")} AS union_est,
       |  CAST(pu.n_shared AS DOUBLE) / CAST(nullif(pu.n_merged, 0) AS DOUBLE) AS jaccard_est,
       |  (CAST(pu.n_shared AS DOUBLE) / CAST(nullif(pu.n_merged, 0) AS DOUBLE))
       |    * (${estSql("pu.nu", "pu.kth_u")}) AS intersect_est
       |FROM p JOIN pu USING (src_a, src_b)
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ---------------------------------------------------------------- q94
  /** Bloom-prefiltered decontamination — q60's scrub restated in the shape
    * that actually ships at 100 TB. q60 semi-joins every corpus shingle
    * against the benchmark set; fine when the set broadcasts, but the join
    * still evaluates per shingle. Here the benchmark set is compiled into
    * a FIXED-SIZE Bloom bitmap ([[BloomBits]] bits = 64 longs, built with
    * `bit_or` partial aggregation), broadcast as ONE row, and probed with
    * pure integer ops (shift/mask on the shingle's existing hex60 hash —
    * zero extra hashing); only the shingles that pass all [[BloomShifts]]
    * probes reach the exact verify join, whose input shrinks by the FP
    * rate (~0.6% at gate scale). No false negatives by construction, so
    * `n_hits` and the contamination verdict match q60 exactly; the card
    * also reports `n_bloom_pass`/`n_false_pos` so the prefilter's
    * selectivity is itself gated.
    *
    * Scale shape: the bitmap is O(m) bytes regardless of corpus size and
    * reaches executors as a 1-row broadcast nested-loop join (single-row
    * side — NOT a cartesian risk); the corpus side stays narrow through
    * probe + filter; the only shuffle is the per-doc count on `doc_id`,
    * the key the shingle kernel already carries. At a real eval-suite size
    * m scales as ~1.44·j·n/ln 2 bits and stays executor-memory-trivial. */
  private val BloomBits = 4096 // 2^12 bits = 64 longs; ~0.6% FP at 270 keys
  private val BloomShifts = Seq(0, 15, 30) // j=3 probes from disjoint hex60 bit ranges

  /** Bloom membership probe for shift `s`, evaluated against the 1-row
    * broadcast bitmap column `bm: map<int,bigint>` (absent word = 0). */
  private def bloomProbeSql(s: Int): String = {
    val p = s"(shiftright(h, $s) % $BloomBits)"
    s"((shiftright(coalesce(element_at(bm, CAST(shiftright($p, 6) AS INT)), " +
      s"CAST(0 AS BIGINT)), CAST($p % 64 AS INT)) & 1) = 1)"
  }

  def q94BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val shh = docShingleHashes(spark, dir)
    val ex = shh.select(col("doc_id"), explode(col("shh")).as("h"))
    // referenced twice (bitmap build + exact verify) off the checkpointed base
    val bench = ex.filter(col("doc_id") % BenchMod === 0).select(col("h")).distinct()
    val bitmap = BloomShifts
      .map(s => bench.select((shiftright(col("h"), s) % BloomBits).as("pos")))
      .reduce(_ union _)
      .groupBy(shiftright(col("pos"), 6).cast(IntegerType).as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").as("bits"))
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("bits"))).as("bm"))
    val cand = ex.filter(col("doc_id") % BenchMod =!= 0)
      .crossJoin(broadcast(bitmap)) // single-row side: the compiled filter
      .filter(BloomShifts.map(s => expr(bloomProbeSql(s))).reduce(_ && _))
      .select(col("doc_id"), col("h"))
    // ONE aggregation computes both counts: exact-verify via broadcast
    // left join against the (tiny) true benchmark set
    val agg = cand
      .join(broadcast(bench.withColumn("is_hit", lit(true))), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bloom_pass"),
        sum(when(col("is_hit"), 1L).otherwise(0L)).as("n_hits"))
    Tables(spark, dir).documents
      .filter(col("doc_id") % BenchMod =!= 0)
      .select(col("doc_id"))
      .join(shh.select(col("doc_id"), size(col("shh")).cast(LongType).as("n_shingles")),
        Seq("doc_id"), "left")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_bloom_pass"), lit(0L)).as("n_bloom_pass"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_bloom_pass"), lit(0L)) - coalesce(col("n_hits"), lit(0L)))
          .as("n_false_pos"),
        (coalesce(col("n_hits"), lit(0L)) > 0 &&
          coalesce(col("n_hits"), lit(0L)) * 100 >=
            coalesce(col("n_shingles"), lit(0L)) * ContamPct).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: same Bloom SEMANTICS (position-set membership ≡ bitmap-bit
    * membership, exactly) via IN-subqueries on the distinct position set —
    * DuckDB needs no bitmap to agree bit-for-bit on which shingles pass. */
  val q94Sql: String =
    s"""$shinglesSqlCte,
       |ex AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
       |       FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
       |bench AS (SELECT DISTINCT h FROM ex WHERE doc_id % $BenchMod = 0),
       |bloom AS (SELECT DISTINCT pos FROM (
       |  ${BloomShifts.map(s => s"SELECT (h >> $s) % $BloomBits AS pos FROM bench")
            .mkString("\n  UNION ALL ")})),
       |cand AS (SELECT doc_id, h FROM ex WHERE doc_id % $BenchMod != 0
       |  ${BloomShifts.map(s => s"AND (h >> $s) % $BloomBits IN (SELECT pos FROM bloom)")
            .mkString("\n  ")}),
       |agg AS (SELECT c.doc_id, count(*) AS n_bloom_pass, count(b.h) AS n_hits
       |        FROM cand c LEFT JOIN bench b ON c.h = b.h GROUP BY 1),
       |sizes AS (SELECT doc_id, len(sh) AS n_shingles FROM sh)
       |SELECT d.doc_id,
       |  CAST(coalesce(z.n_shingles, 0) AS BIGINT) AS n_shingles,
       |  CAST(coalesce(a.n_bloom_pass, 0) AS BIGINT) AS n_bloom_pass,
       |  CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(a.n_bloom_pass, 0) - coalesce(a.n_hits, 0) AS BIGINT) AS n_false_pos,
       |  coalesce(a.n_hits, 0) > 0 AND
       |    coalesce(a.n_hits, 0) * 100 >= coalesce(z.n_shingles, 0) * $ContamPct
       |    AS contaminated
       |FROM documents d
       |LEFT JOIN sizes z ON d.doc_id = z.doc_id
       |LEFT JOIN agg a ON d.doc_id = a.doc_id
       |WHERE d.doc_id % $BenchMod != 0 ORDER BY d.doc_id""".stripMargin

  // ----------------------------------------------------------------

  // ---------------------------------------------------------------- q100
  /** Snapshot diff — the corpus-versioning audit between two crawl
    * snapshots: every doc_id is classified added / removed / changed /
    * unchanged by a FULL OUTER join on the id with a content-digest
    * compare, rolled up per (source, status) with a doc_id-sum checksum
    * that pins cell MEMBERSHIP, not just size. The two snapshots are
    * derived deterministically from the one gate table (q76's `doc_id %
    * k` device): OLD omits `doc_id % 7 = 0` (those are "added" later),
    * NEW omits `doc_id % 11 = 0` ("removed") and edits the text of
    * `doc_id % 5 = 0` ("changed"); in production the two sides are real
    * snapshot paths and everything from the join on is identical.
    *
    * Scale shape: each side is one narrow scan computing (id, source,
    * digest) — the shuffle carries 16-byte digests, never text; the full
    * outer join is a co-partitioned hash join on the id key; the report
    * is a (source × status)-cardinality map-side-combinable agg. This is
    * the engine's only FULL OUTER join surface, exercised where the
    * shape genuinely needs one (presence on either side is the
    * signal). */
  def q100SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    def digested = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("text"))
    val old = digested.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("old_id"), col("source").as("old_src"),
        md5(normText(col("text"))).as("old_h"))
    val neu = digested.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .select(col("doc_id").as("new_id"), col("source").as("new_src"),
        md5(normText(col("text"))).as("new_h"))
    old.join(neu, col("old_id") === col("new_id"), "full_outer")
      .select(
        coalesce(col("new_src"), col("old_src")).as("source"),
        when(col("old_id").isNull, "added")
          .when(col("new_id").isNull, "removed")
          .when(col("old_h") =!= col("new_h"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("new_id"), col("old_id")).as("id"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("id")).as("id_sum"))
      .orderBy(col("source"), col("status"))
  }

  val q100Sql: String =
    s"""WITH o AS (SELECT doc_id AS old_id, source AS old_src,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS old_h
       |  FROM documents WHERE doc_id % 7 <> 0),
       |n AS (SELECT doc_id AS new_id, source AS new_src,
       |    md5(lower(trim(regexp_replace(
       |      CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END,
       |      '$WsSql+', ' ', 'g')))) AS new_h
       |  FROM documents WHERE doc_id % 11 <> 0),
       |j AS (SELECT coalesce(new_src, old_src) AS source,
       |        CASE WHEN old_id IS NULL THEN 'added'
       |             WHEN new_id IS NULL THEN 'removed'
       |             WHEN old_h <> new_h THEN 'changed'
       |             ELSE 'unchanged' END AS status,
       |        coalesce(new_id, old_id) AS id
       |      FROM o FULL OUTER JOIN n ON old_id = new_id)
       |SELECT source, status, count(*) AS n_docs, CAST(sum(id) AS BIGINT) AS id_sum
       |FROM j GROUP BY 1, 2 ORDER BY source, status""".stripMargin

  // ---------------------------------------------------------------- q114
  /** SCD2 historization — the warehouse pattern that turns q100's
    * snapshot pair into a versioned dimension: unchanged docs keep one
    * open version, changed docs CLOSE v1 at the new snapshot time and
    * open v2, removed docs close without a successor (tombstone), added
    * docs open at T1. One full outer join on the id (q100's plan — the
    * shuffle carries digests), then each row EXPLODES into its 1-or-2
    * version records from a case-built struct array — no second pass,
    * no window. Validity bounds are literal snapshot timestamps, so
    * every column is exact. */
  private val ScdT0 = "2026-01-01 00:00:00"
  private val ScdT1 = "2026-02-01 00:00:00"

  def q114Scd2(spark: SparkSession, dir: String): DataFrame = {
    def digested = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("text"))
    val old = digested.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("old_id"), col("source").as("old_src"),
        md5(normText(col("text"))).as("old_h"))
    val neu = digested.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .select(col("doc_id").as("new_id"), col("source").as("new_src"),
        md5(normText(col("text"))).as("new_h"))
    def ver(v: Int, h: Column, from: String, to: Option[String]): Column =
      struct(lit(v).as("version"), h.as("content_hash"),
        lit(from).as("valid_from"),
        to.map(lit(_)).getOrElse(lit(null).cast("string")).as("valid_to"),
        lit(to.isEmpty).as("is_current"))
    val versions =
      when(col("old_id").isNull, // added at T1
        array(ver(1, col("new_h"), ScdT1, None)))
      .when(col("new_id").isNull, // removed: tombstoned v1
        array(ver(1, col("old_h"), ScdT0, Some(ScdT1))))
      .when(col("old_h") =!= col("new_h"), // changed: close v1, open v2
        array(ver(1, col("old_h"), ScdT0, Some(ScdT1)),
          ver(2, col("new_h"), ScdT1, None)))
      .otherwise( // unchanged: one open version
        array(ver(1, col("old_h"), ScdT0, None)))
    old.join(neu, col("old_id") === col("new_id"), "full_outer")
      .select(coalesce(col("new_id"), col("old_id")).as("doc_id"),
        coalesce(col("new_src"), col("old_src")).as("source"),
        explode(versions).as("v"))
      .select(col("doc_id"), col("source"),
        col("v.version").as("version"), col("v.content_hash").as("content_hash"),
        col("v.valid_from").as("valid_from"), col("v.valid_to").as("valid_to"),
        col("v.is_current").as("is_current"))
      .orderBy(col("doc_id"), col("version"))
  }

  val q114Sql: String =
    s"""WITH o AS (SELECT doc_id AS old_id, source AS old_src,
       |    md5(lower(trim(regexp_replace(text, '$WsSql+', ' ', 'g')))) AS old_h
       |  FROM documents WHERE doc_id % 7 <> 0),
       |n AS (SELECT doc_id AS new_id, source AS new_src,
       |    md5(lower(trim(regexp_replace(
       |      CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END,
       |      '$WsSql+', ' ', 'g')))) AS new_h
       |  FROM documents WHERE doc_id % 11 <> 0),
       |j AS (SELECT coalesce(new_id, old_id) AS doc_id,
       |        coalesce(new_src, old_src) AS source, old_id, new_id, old_h, new_h
       |      FROM o FULL OUTER JOIN n ON old_id = new_id)
       |SELECT doc_id, source, 1 AS version, new_h AS content_hash,
       |  '$ScdT1' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, true AS is_current
       |FROM j WHERE old_id IS NULL
       |UNION ALL
       |SELECT doc_id, source, 1, old_h, '$ScdT0', '$ScdT1', false
       |FROM j WHERE new_id IS NULL
       |UNION ALL
       |SELECT doc_id, source, 1, old_h, '$ScdT0', '$ScdT1', false
       |FROM j WHERE old_id IS NOT NULL AND new_id IS NOT NULL AND old_h <> new_h
       |UNION ALL
       |SELECT doc_id, source, 2, new_h, '$ScdT1', NULL, true
       |FROM j WHERE old_id IS NOT NULL AND new_id IS NOT NULL AND old_h <> new_h
       |UNION ALL
       |SELECT doc_id, source, 1, old_h, '$ScdT0', NULL, true
       |FROM j WHERE old_id IS NOT NULL AND new_id IS NOT NULL AND old_h = new_h
       |ORDER BY doc_id, version""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_scd2"               -> (q114Scd2 _),
    "q100_snapshot_diff"      -> (q100SnapshotDiff _),
    "q87_dup_size_histogram"  -> (q87DupSizeHistogram _),
    "q81_dup_stats"           -> (q81DupStats _),
    "q141_dup_weights"        -> (q141DupWeights _),
    "q208_near_dup_weights"   -> (q208NearDupWeights _),
    "q210_treatment_matrix"   -> (q210TreatmentMatrix _),
    "q76_incremental_dedup"   -> (q76IncrementalDedup _),
    "q60_decontaminate"       -> (q60Decontaminate _),
    "q61_repetition"          -> (q61Repetition _),
    "q52_corpus_curation"     -> (q52CorpusCuration _),
    "q44_dedup_select"        -> (q44DedupSelect _),
    "q19_dedup_exact"         -> (q19DedupExact _),
    "q20_dedup_ngram_jaccard" -> (q20NgramJaccard _),
    "q129_containment"        -> (q129Containment _),
    "q173_dfcap_recall"       -> (q173DfcapRecall _),
    "q183_lsh_scurve"         -> (q183LshScurve _),
    "q186_neardup_decontam"   -> (q186NearDupDecontam _),
    "q187_cdc_dedup"          -> (q187CdcDedup _),
    "q192_source_dup_flow"    -> (q192SourceDupFlow _),
    "q175_contamination_spans" -> (q175ContaminationSpans _),
    "q21_dedup_minhash_lsh"   -> (q21MinHashLsh _),
    "q22_dedup_simhash"       -> (q22Simhash _),
    "q23_dedup_simhash_pairs" -> (q23SimhashPairs _),
    "q65_dedup_clusters"      -> (q65DedupClusters _),
    "q69_substring_dedup"     -> (q69SubstringDedup _),
    "q72_winnow_pairs"        -> (q72WinnowPairs _),
    "q92_source_overlap"      -> (q92SourceOverlap _),
    "q213_kmv_overlap"        -> (q213KmvOverlap _),
    "q94_bloom_decontaminate" -> (q94BloomDecontaminate _))

  val oracleSql: Map[String, String] = Map(
    "q114_scd2"               -> q114Sql,
    "q100_snapshot_diff"      -> q100Sql,
    "q87_dup_size_histogram"  -> q87Sql,
    "q81_dup_stats"           -> q81Sql,
    "q141_dup_weights"        -> q141Sql,
    "q208_near_dup_weights"   -> q208Sql,
    "q210_treatment_matrix"   -> q210Sql,
    "q76_incremental_dedup"   -> q76Sql,
    "q60_decontaminate"       -> q60Sql,
    "q61_repetition"          -> q61Sql,
    "q52_corpus_curation"     -> q52Sql,
    "q44_dedup_select"        -> q44Sql,
    "q19_dedup_exact"         -> q19Sql,
    "q20_dedup_ngram_jaccard" -> q20Sql,
    "q129_containment"        -> q129Sql,
    "q173_dfcap_recall"       -> q173Sql,
    "q183_lsh_scurve"         -> q183Sql,
    "q186_neardup_decontam"   -> q186Sql,
    "q187_cdc_dedup"          -> q187Sql,
    "q192_source_dup_flow"    -> q192Sql,
    "q175_contamination_spans" -> q175Sql,
    "q21_dedup_minhash_lsh"   -> q21Sql,
    "q22_dedup_simhash"       -> q22Sql,
    "q23_dedup_simhash_pairs" -> q23Sql,
    "q65_dedup_clusters"      -> q65Sql,
    "q69_substring_dedup"     -> q69Sql,
    "q72_winnow_pairs"        -> q72Sql,
    "q92_source_overlap"      -> q92Sql,
    "q213_kmv_overlap"        -> q213Sql,
    "q94_bloom_decontaminate" -> q94Sql)
}
