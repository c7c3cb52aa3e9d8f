package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Pattern-mining and data-profiling cards — the corpus-curation questions
  * that sit between the relational core ([[RelationalQueries]]) and the
  * dedup family ([[graft.dedup.DedupQueries]]): frequent-itemset rules over
  * baskets, single-scan column profiling (the Deequ-style constraint
  * suite), and blocked fuzzy matching (the entity-resolution candidate
  * generator).
  *
  * Oracle-parity rules follow the house conventions (RelationalQueries
  * scaladoc): exact integer/decimal aggregation everywhere, one
  * fixed-shape double op per emitted ratio, rounded through
  * DECIMAL(18,6) at the boundary, total-order sorts.
  */
object MiningQueries {

  // ---------------------------------------------------------------- q126
  /** Association rules (support / confidence / lift) over order baskets
    * of part brands — the A-Priori first-and-second pass, the classic
    * "customers who bought X also bought Y" card a curation pipeline
    * uses for co-occurrence structure (the basket analogue of q116's
    * event PMI, which is unordered event pairs; here baskets are sets
    * and rules are DIRECTED, scored by confidence and lift).
    *
    * Min support is the A-Priori pruning step and is applied with exact
    * integer math (`pc * 100 >= n_baskets`, i.e. support ≥ 1%) so the
    * gate is bit-identical cross-engine.
    *
    * 100 TB shape: the part dim BROADCASTS into the lineitem scan; the
    * basket frame (distinct (order, brand)) pays the one orderkey
    * shuffle and is `localCheckpoint`ed because BOTH passes read it
    * (item counts and pair counts — one materialization, two cheap
    * aggregates, zero fact re-scans). Pair generation is the q108
    * sorted-array explode: per-basket distinct items are collected and
    * pairs exploded locally, so the pair shuffle carries (a, b) count
    * partials only — map-side combined, at most item² rows per
    * partition (brands = 25, so 300 pairs; with an open item domain
    * you'd df-cap baskets exactly like q108's [[CoCap]]). The basket
    * count is one bounded driver scalar (the pageRank `n` pattern).
    * Metrics are one double division / one fixed-shape double formula
    * over exact longs (pc·nb overflows a long at corpus scale, so the
    * lift products are computed in double), rounded through
    * DECIMAL(18,6). */
  def q126BasketRules(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val baskets = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("oid"), col("p_brand").as("item"))
      .distinct()
      .localCheckpoint(true)
    val nBaskets = baskets.select(col("oid")).distinct().count()
    val itemCnt = baskets.groupBy(col("item")).agg(count(lit(1)).as("ic"))
    val pairExpr = flatten(transform(
      sequence(lit(1), size(col("items")) - 1),
      i => transform(
        sequence(i + 1, size(col("items"))),
        j => struct(element_at(col("items"), i).as("a"),
          element_at(col("items"), j).as("b")))))
    val pairCnt = baskets.groupBy(col("oid"))
      .agg(array_sort(collect_list(col("item"))).as("items"))
      .filter(size(col("items")) >= 2)
      .select(explode(pairExpr).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("pc"))
      .filter(col("pc") * 100 >= nBaskets)
    val directed = pairCnt
      .unionByName(pairCnt.select(col("b").as("a"), col("a").as("b"), col("pc")))
    val d6 = DecimalType(18, 6)
    directed
      .join(broadcast(itemCnt).select(col("item").as("a"), col("ic").as("ica")), Seq("a"))
      .join(broadcast(itemCnt).select(col("item").as("b"), col("ic").as("icb")), Seq("b"))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("pc").as("support_n"),
        (col("pc").cast(DoubleType) / lit(nBaskets.toDouble))
          .cast(d6).cast(DoubleType).as("support"),
        (col("pc").cast(DoubleType) / col("ica").cast(DoubleType))
          .cast(d6).cast(DoubleType).as("confidence"),
        ((col("pc").cast(DoubleType) * lit(nBaskets.toDouble)) /
          (col("ica").cast(DoubleType) * col("icb").cast(DoubleType)))
          .cast(d6).cast(DoubleType).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
  }

  val q126Sql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS oid, p_brand AS item
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT count(DISTINCT oid) AS nb FROM b),
      |ic AS (SELECT item, count(*) AS ic FROM b GROUP BY 1),
      |pc AS (SELECT x.item AS a, y.item AS b, count(*) AS pc
      |       FROM b x JOIN b y ON x.oid = y.oid AND x.item < y.item
      |       GROUP BY 1, 2),
      |f AS (SELECT a, b, pc FROM pc, n WHERE pc * 100 >= nb),
      |d AS (SELECT a, b, pc FROM f UNION ALL SELECT b, a, pc FROM f)
      |SELECT d.a AS antecedent, d.b AS consequent, d.pc AS support_n,
      |  CAST(CAST(CAST(d.pc AS DOUBLE) / CAST(n.nb AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS support,
      |  CAST(CAST(CAST(d.pc AS DOUBLE) / CAST(ia.ic AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS confidence,
      |  CAST(CAST((CAST(d.pc AS DOUBLE) * CAST(n.nb AS DOUBLE))
      |       / (CAST(ia.ic AS DOUBLE) * CAST(ib.ic AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) AS lift
      |FROM d JOIN ic ia ON d.a = ia.item JOIN ic ib ON d.b = ib.item CROSS JOIN n
      |ORDER BY lift DESC, antecedent, consequent""".stripMargin

  // ---------------------------------------------------------------- q127
  /** Single-scan column profile + constraint suite over `orders` — the
    * Deequ-style data-quality card (Schelter et al., VLDB'18 shape) a
    * pipeline runs before admitting a new data drop: per-column
    * completeness, exact distinct counts, numeric min/max/mean, date
    * bounds, key uniqueness, and domain/range/format violation counts,
    * emitted as (col_name, metric, value) rows.
    *
    * 100 TB shape: ONE pass over the fact table. The non-distinct
    * metrics are plain map-side-combinable aggregates; the six exact
    * COUNT(DISTINCT)s plan as Catalyst's Expand — the scan is read once
    * and re-emitted ×6, which is the honest cost of EXACT profiling and
    * is the documented trade against the KMV sketch card (q57): a wide
    * production profile swaps each exact distinct for a mergeable
    * sketch and the Expand disappears. Everything folds to ONE row
    * before the O(#metrics) unpivot; violations are conditional counts
    * (codegen'd, no second scan); mean is the exact decimal sum over
    * the count (one double division, the house rule). */
  def q127DataProfile(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    def ratio(n: Column, d: Column): Column =
      (n.cast(DoubleType) / d.cast(DoubleType)).cast(d6).cast(DoubleType)
    val s = Tables(spark, dir).orders.agg(
      count(lit(1)).as("n"),
      count(col("o_orderkey")).as("c_ok"), countDistinct(col("o_orderkey")).as("d_ok"),
      count(col("o_custkey")).as("c_ck"), countDistinct(col("o_custkey")).as("d_ck"),
      count(col("o_orderstatus")).as("c_st"), countDistinct(col("o_orderstatus")).as("d_st"),
      count(col("o_orderpriority")).as("c_pr"), countDistinct(col("o_orderpriority")).as("d_pr"),
      count(col("o_totalprice")).as("c_tp"), countDistinct(col("o_totalprice")).as("d_tp"),
      count(col("o_orderdate")).as("c_od"), countDistinct(col("o_orderdate")).as("d_od"),
      min(col("o_totalprice")).as("min_tp"), max(col("o_totalprice")).as("max_tp"),
      sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sum_tp"),
      min(datediff(col("o_orderdate"), lit("1970-01-01"))).as("min_od"),
      max(datediff(col("o_orderdate"), lit("1970-01-01"))).as("max_od"),
      count(when(!col("o_totalprice").between(1, 600000), 1)).as("v_tp"),
      count(when(!col("o_orderstatus").isin("O", "F", "P"), 1)).as("v_st"),
      count(when(!col("o_orderpriority").rlike("^[1-5]-"), 1)).as("v_pr"))
    val rows: Seq[(String, String, Column)] = Seq(
      ("o_orderkey", "completeness", ratio(col("c_ok"), col("n"))),
      ("o_orderkey", "distinct", col("d_ok").cast(DoubleType)),
      ("o_orderkey", "uniqueness", ratio(col("d_ok"), col("c_ok"))),
      ("o_custkey", "completeness", ratio(col("c_ck"), col("n"))),
      ("o_custkey", "distinct", col("d_ck").cast(DoubleType)),
      ("o_orderstatus", "completeness", ratio(col("c_st"), col("n"))),
      ("o_orderstatus", "distinct", col("d_st").cast(DoubleType)),
      ("o_orderstatus", "domain_violations", col("v_st").cast(DoubleType)),
      ("o_orderpriority", "completeness", ratio(col("c_pr"), col("n"))),
      ("o_orderpriority", "distinct", col("d_pr").cast(DoubleType)),
      ("o_orderpriority", "format_violations", col("v_pr").cast(DoubleType)),
      ("o_totalprice", "completeness", ratio(col("c_tp"), col("n"))),
      ("o_totalprice", "distinct", col("d_tp").cast(DoubleType)),
      ("o_totalprice", "min", col("min_tp").cast(d6).cast(DoubleType)),
      ("o_totalprice", "max", col("max_tp").cast(d6).cast(DoubleType)),
      ("o_totalprice", "mean", ratio(col("sum_tp"), col("c_tp"))),
      ("o_totalprice", "range_violations", col("v_tp").cast(DoubleType)),
      ("o_orderdate", "completeness", ratio(col("c_od"), col("n"))),
      ("o_orderdate", "distinct", col("d_od").cast(DoubleType)),
      ("o_orderdate", "min_epoch_day", col("min_od").cast(DoubleType)),
      ("o_orderdate", "max_epoch_day", col("max_od").cast(DoubleType)))
    s.select(inline(array(rows.map { case (c, m, v) =>
        struct(lit(c).as("col_name"), lit(m).as("metric"), v.as("value"))
      }: _*)))
      .orderBy(col("col_name"), col("metric"))
  }

  val q127Sql: String = {
    def r(n: String, d: String): String =
      s"CAST(CAST(CAST($n AS DOUBLE) / CAST($d AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)"
    val rows = Seq(
      ("o_orderkey", "completeness", r("c_ok", "n")),
      ("o_orderkey", "distinct", "CAST(d_ok AS DOUBLE)"),
      ("o_orderkey", "uniqueness", r("d_ok", "c_ok")),
      ("o_custkey", "completeness", r("c_ck", "n")),
      ("o_custkey", "distinct", "CAST(d_ck AS DOUBLE)"),
      ("o_orderstatus", "completeness", r("c_st", "n")),
      ("o_orderstatus", "distinct", "CAST(d_st AS DOUBLE)"),
      ("o_orderstatus", "domain_violations", "CAST(v_st AS DOUBLE)"),
      ("o_orderpriority", "completeness", r("c_pr", "n")),
      ("o_orderpriority", "distinct", "CAST(d_pr AS DOUBLE)"),
      ("o_orderpriority", "format_violations", "CAST(v_pr AS DOUBLE)"),
      ("o_totalprice", "completeness", r("c_tp", "n")),
      ("o_totalprice", "distinct", "CAST(d_tp AS DOUBLE)"),
      ("o_totalprice", "min", "CAST(CAST(min_tp AS DECIMAL(18,6)) AS DOUBLE)"),
      ("o_totalprice", "max", "CAST(CAST(max_tp AS DECIMAL(18,6)) AS DOUBLE)"),
      ("o_totalprice", "mean", r("sum_tp", "c_tp")),
      ("o_totalprice", "range_violations", "CAST(v_tp AS DOUBLE)"),
      ("o_orderdate", "completeness", r("c_od", "n")),
      ("o_orderdate", "distinct", "CAST(d_od AS DOUBLE)"),
      ("o_orderdate", "min_epoch_day", "CAST(min_od AS DOUBLE)"),
      ("o_orderdate", "max_epoch_day", "CAST(max_od AS DOUBLE)"))
      .map { case (c, m, v) => s"SELECT '$c' AS col_name, '$m' AS metric, $v AS value FROM s" }
      .mkString("\nUNION ALL\n")
    s"""WITH s AS (SELECT count(*) AS n,
       |  count(o_orderkey) AS c_ok, count(DISTINCT o_orderkey) AS d_ok,
       |  count(o_custkey) AS c_ck, count(DISTINCT o_custkey) AS d_ck,
       |  count(o_orderstatus) AS c_st, count(DISTINCT o_orderstatus) AS d_st,
       |  count(o_orderpriority) AS c_pr, count(DISTINCT o_orderpriority) AS d_pr,
       |  count(o_totalprice) AS c_tp, count(DISTINCT o_totalprice) AS d_tp,
       |  count(o_orderdate) AS c_od, count(DISTINCT o_orderdate) AS d_od,
       |  min(o_totalprice) AS min_tp, max(o_totalprice) AS max_tp,
       |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_tp,
       |  min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS min_od,
       |  max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS max_od,
       |  count(CASE WHEN o_totalprice NOT BETWEEN 1 AND 600000 THEN 1 END) AS v_tp,
       |  count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END) AS v_st,
       |  count(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 END) AS v_pr
       |  FROM orders)
       |$rows
       |ORDER BY col_name, metric""".stripMargin
  }

  // ---------------------------------------------------------------- q128
  /** Blocked fuzzy matching over part names — the entity-resolution
    * candidate generator (Fellegi–Sunter blocking, the step every
    * record-linkage pipeline runs before pairwise scoring): names are
    * first collapsed to distinct values with occurrence counts, paired
    * ONLY within a blocking key (the name's trailing token — the
    * "canopy"), and surviving candidates are verified with exact
    * Levenshtein distance ≤ [[FuzzyMaxDist]].
    *
    * 100 TB shape: the quadratic step is confined to blocks — candidate
    * volume is Σ|block|² instead of N² (the q20/q108 df-cap argument;
    * an open name domain would cap block width the same way). The
    * distinct-name collapse happens FIRST, so the pair join runs on
    * name cardinality, not row cardinality, and occurrence counts ride
    * along to weight downstream merge decisions. Levenshtein runs only
    * on post-block candidates (codegen'd built-in, never a UDF); the
    * block equi-join shuffles by block key — no broadcast assumption,
    * though Catalyst will broadcast when the name frame is small. */
  private val FuzzyMaxDist = 2

  /** The blocking key: a name's trailing token. NULL-safe via `get`
    * (0-based, out-of-bounds → null → ''): a single-token name must
    * land in the '' block, matching DuckDB's `split_part` semantics —
    * `element_at` would raise under ANSI mode instead. */
  private def blockKey(name: Column): Column =
    coalesce(get(split(name, " "), lit(1)), lit(""))

  def q128FuzzyBlocking(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables(spark, dir).part
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("block", blockKey(col("p_name")))
    val a = names.select(col("block"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("block"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= FuzzyMaxDist)
      .select(col("block"), col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy(col("block"), col("name_a"), col("name_b"))
  }

  val q128Sql: String =
    s"""WITH names AS (SELECT p_name, count(*) AS n_parts,
       |                 split_part(p_name, ' ', 2) AS block
       |               FROM part GROUP BY 1),
       |cand AS (SELECT a.block, a.p_name AS name_a, b.p_name AS name_b,
       |           levenshtein(a.p_name, b.p_name) AS dist,
       |           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
       |         FROM names a JOIN names b
       |           ON a.block = b.block AND a.p_name < b.p_name)
       |SELECT block, name_a, name_b, dist, n_parts_a, n_parts_b
       |FROM cand WHERE dist <= $FuzzyMaxDist
       |ORDER BY block, name_a, name_b""".stripMargin

  // ---------------------------------------------------------------- q131
  /** 2-D skyline (Pareto frontier) of parts under (price ↓, size ↓) —
    * the preference-query operator (Börzsönyi et al., ICDE'01): a part
    * is on the skyline iff no other part is at most as expensive AND at
    * most as large with at least one strict improvement. The card the
    * "best trade-off" question compiles to when no scalar utility
    * exists.
    *
    * 100 TB shape: the classic sort-based 2-D sweep, distributed: (1)
    * collapse to distinct (price, size) points with multiplicities —
    * map-side-combinable, output bounded by value-pair cardinality, not
    * rows; (2) keep min(size) per price — again combinable, ≤ \|distinct
    * price\| rows; (3) ONE global running-min window over the price
    * order emits points strictly below every cheaper point's size. The
    * single-partition window runs over the price-cardinality frame the
    * aggregates already shrank (the q119 bounded-heads argument — NOT
    * the raw fact table; a first-pass per-partition local skyline would
    * bound it further on adversarial value distributions). The oracle
    * states the DEFINITION (NOT EXISTS a dominating point) — hash
    * equality proves the sweep implements it. */
  def q131Skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).part
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("psize"))
      .agg(count(lit(1)).as("n_parts"))
    val minPerPrice = d.groupBy(col("price")).agg(min(col("psize")).as("psize"))
    val sweep = Window.orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    minPerPrice
      .withColumn("prev_min", min(col("psize")).over(sweep))
      .filter(col("prev_min").isNull || col("psize") < col("prev_min"))
      .drop("prev_min")
      .join(d, Seq("price", "psize"))
      .select(col("price"), col("psize"), col("n_parts"))
      .orderBy(col("price"))
  }

  val q131Sql: String =
    """WITH d AS (SELECT p_retailprice AS price, p_size AS psize, count(*) AS n_parts
      |           FROM part GROUP BY 1, 2)
      |SELECT price, psize, n_parts FROM d r
      |WHERE NOT EXISTS (SELECT 1 FROM d p
      |  WHERE p.price <= r.price AND p.psize <= r.psize
      |    AND (p.price < r.price OR p.psize < r.psize))
      |ORDER BY price""".stripMargin

  // ---------------------------------------------------------------- q132
  /** End-to-end entity resolution: q128's blocked fuzzy candidates
    * become similarity EDGES, connected components
    * ([[graft.dedup.DedupQueries.connectedComponents]] — the same
    * min-label + pointer-jump engine q65 runs) merges them
    * transitively, and every part inherits a canonical entity (the
    * lexicographic-min name of its cluster). This is the full
    * Fellegi–Sunter pipeline — block → score → transitively merge →
    * canonicalize — where q128 alone stops at candidate pairs.
    *
    * 100 TB shape: edges live at NAME cardinality (the distinct
    * collapse happens before pairing, q128's argument); CC pays
    * edge-proportional shuffles per round with per-round
    * `localCheckpoint` (q65's analysis); singleton names skip CC
    * entirely via the left join + coalesce fallback. Node ids are the
    * engine-standard 60-bit md5 longs ([[graft.text.TextOps.hex60]]),
    * so the ORACLE rebuilds the identical graph and walks it with a
    * recursive CTE (the q65 device). */
  def q132EntityResolution(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables(spark, dir).part
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("block", blockKey(col("p_name")))
      .withColumn("nid", graft.text.TextOps.hex60(col("p_name")))
      .localCheckpoint(true) // consumed by the edge build AND the join-back
    val a = names.select(col("block"), col("p_name").as("na"), col("nid").as("ida"))
    val b = names.select(col("block"), col("p_name").as("nb"), col("nid").as("idb"))
    val edges = a.join(b, Seq("block"))
      .filter(col("na") < col("nb") &&
        levenshtein(col("na"), col("nb")) <= FuzzyMaxDist)
      .select(col("ida"), col("idb"))
    val labels = graft.dedup.DedupQueries.connectedComponents(edges)
    names
      .join(labels.withColumnRenamed("node", "nid"), Seq("nid"), "left")
      .withColumn("cluster", coalesce(col("label"), col("nid")))
      .groupBy(col("cluster"))
      .agg(min(col("p_name")).as("entity"), count(lit(1)).as("n_names"),
        sum(col("n_parts")).as("n_parts"))
      .select(col("entity"), col("n_names"), col("n_parts"))
      .orderBy(col("entity"))
  }

  val q132Sql: String =
    s"""WITH RECURSIVE names AS (
       |  SELECT p_name, count(*) AS n_parts, split_part(p_name, ' ', 2) AS block,
       |    ('0x' || substr(md5(p_name), 1, 15))::BIGINT AS nid
       |  FROM part GROUP BY 1),
       |e AS (SELECT a.nid AS ida, b.nid AS idb
       |      FROM names a JOIN names b
       |        ON a.block = b.block AND a.p_name < b.p_name
       |      WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist),
       |sym AS (SELECT ida AS src, idb AS dst FROM e
       |        UNION ALL SELECT idb, ida FROM e),
       |walk AS (SELECT src, dst FROM sym
       |         UNION
       |         SELECT w.src, s.dst FROM walk w JOIN sym s ON w.dst = s.src),
       |lab AS (SELECT src AS nid, least(src, min(dst)) AS cluster
       |        FROM walk GROUP BY src),
       |wc AS (SELECT n.p_name, n.n_parts, coalesce(l.cluster, n.nid) AS cluster
       |       FROM names n LEFT JOIN lab l ON n.nid = l.nid)
       |SELECT min(p_name) AS entity, CAST(count(*) AS BIGINT) AS n_names,
       |  CAST(sum(n_parts) AS BIGINT) AS n_parts
       |FROM wc GROUP BY cluster ORDER BY entity""".stripMargin

  // ---------------------------------------------------------------- q133
  /** Sequential pattern mining, order 3: every CONSECUTIVE event-type
    * trigram inside a session (q121's 30-minute sessionization and
    * (us, event_id) total order), counted by occurrence and by session
    * support — the GSP/PrefixSpan first harvest, one order deeper than
    * q121's Markov pairs (which a 2nd-order journey model needs; a
    * transition matrix can't distinguish a→b→a loops from a→b→c
    * flows).
    *
    * Support is reported against ELIGIBLE sessions (those with ≥ 3
    * events — exactly the sessions that could contain a trigram), which
    * keeps the denominator derivable from the trigram frame itself.
    *
    * 100 TB shape: ONE user-keyed shuffle carries sessionization and
    * BOTH lags (all windows share the partition key, the q121
    * subset-satisfaction argument), paid once inside the eager
    * checkpoint of the narrow trigram frame — which BOTH aggregates
    * (per-trigram counts, eligible-session total) then read; an
    * all-sessions denominator would instead force a second corpus
    * pass. Occurrence counts map-side combine to ≤ type³ rows; session
    * support is an exact distinct over (trigram, session) — the one
    * Expand in the plan, bounded by sessions × per-session trigram
    * variety, not raw events. The support ratio is a single bit-stable
    * division (q121's parity rule — no rounding needed). */
  def q133SeqPatterns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = Sessionize.withSid(Tables(spark, dir).events)
    val bySession = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"))
    // the checkpoint sits AFTER the lag windows, on the narrow 4-string
    // frame: the one user shuffle (sessionization + both lags, one
    // exchange by subset satisfaction) runs exactly once in the eager
    // build, and both aggregates below read the materialization
    val tri = sess
      .withColumn("t1", lag(col("event_type"), 2).over(bySession))
      .withColumn("t2", lag(col("event_type"), 1).over(bySession))
      .filter(col("t1").isNotNull)
      .select(col("t1"), col("t2"), col("event_type").as("t3"),
        concat_ws(":", col("user_id"), col("sid")).as("sk"))
      .localCheckpoint(true)
    val counts = tri.groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"), countDistinct(col("sk")).as("n_sessions"))
    val totSessions = tri.agg(countDistinct(col("sk")).as("tot"))
    counts.crossJoin(broadcast(totSessions))
      .select(col("t1"), col("t2"), col("t3"), col("n"), col("n_sessions"),
        (col("n_sessions").cast(DoubleType) / col("tot").cast(DoubleType))
          .as("support"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
  }

  val q133Sql: String =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |l AS (SELECT *, lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      |      FROM e),
      |f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS ns
      |      FROM l),
      |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
      |t AS (SELECT
      |        lag(event_type, 2) OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS t1,
      |        lag(event_type, 1) OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS t2,
      |        event_type AS t3,
      |        user_id || ':' || sid AS sk
      |      FROM s),
      |c AS (SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n,
      |        CAST(count(DISTINCT sk) AS BIGINT) AS n_sessions
      |      FROM t WHERE t1 IS NOT NULL GROUP BY 1, 2, 3),
      |tot AS (SELECT CAST(count(DISTINCT sk) AS BIGINT) AS tot
      |        FROM t WHERE t1 IS NOT NULL)
      |SELECT t1, t2, t3, n, n_sessions,
      |  CAST(n_sessions AS DOUBLE) / CAST(tot AS DOUBLE) AS support
      |FROM c CROSS JOIN tot
      |ORDER BY n DESC, t1, t2, t3""".stripMargin

  // ---------------------------------------------------------------- q134
  /** χ² test of independence on the nation × brand contingency table
    * (does WHERE a customer is predict WHAT their orders contain?) —
    * the categorical-association card behind segmentation and
    * feature-selection decisions, the hypothesis-test companion to
    * q116's PMI (association strength per pair) and q122's PSI (drift
    * of one margin over time). Emits every cell with its observed
    * count, independence-expected count, and χ² contribution, plus the
    * grand statistic replicated per row for one-shot consumption.
    *
    * 100 TB shape: the fact join (lineitem ⋈ orders on orderkey) is
    * the one big shuffle; customer/nation/part ride broadcasts (AQE
    * right-sizes customer, which stops being broadcastable at corpus
    * scale and falls back to a co-partitioned join). Everything after
    * folds to the cell frame (nations × brands), where margins are two
    * cheap aggregates broadcast back. Parity: counts are exact longs;
    * expected = (row·col)/N and contribution = (O−E)²/E are fixed-shape
    * double formulas rounded through DECIMAL(18,6) (the q125 rule —
    * margin products overflow a long at corpus scale). */
  /** The contingency-cell build, pre-checkpoint — factored so the plan
    * audit can assert the dim broadcasts and the single fact shuffle
    * (the checkpoint in [[q134ChiSquare]] hides them from the final
    * plan). */
  private[sql] def q134Cells(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("n_name").as("nation"), col("p_brand").as("brand"))
      .agg(count(lit(1)).as("o"))
  }

  def q134ChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val cells = q134Cells(spark, dir)
      .localCheckpoint(true) // margins + cells both read it; the fact join runs once
    val rowTot = cells.groupBy(col("nation")).agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy(col("brand")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("nn"))
    val d6 = DecimalType(18, 6)
    val e = (col("rt").cast(DoubleType) * col("ct").cast(DoubleType)) /
      col("nn").cast(DoubleType)
    val o = coalesce(col("o"), lit(0L))
    val contrib = ((o.cast(DoubleType) - e) * (o.cast(DoubleType) - e)) / e
    // the DENSE margin grid, not just observed cells: an empty cell still
    // contributes (0−E)²/E = E to the statistic, and the margin identity
    // Σ expected = Σ observed only closes on the full grid
    val perCell = rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("nation", "brand"), "left")
      .crossJoin(broadcast(n))
      .select(col("nation"), col("brand"), o.as("o"),
        e.cast(d6).cast(DoubleType).as("expected"),
        contrib.cast(d6).cast(DoubleType).as("chi2_contrib"))
    val total = perCell.agg(
      sum(col("chi2_contrib").cast(d6)).cast(d6).cast(DoubleType).as("chi2"))
    perCell.crossJoin(broadcast(total))
      .select(col("nation"), col("brand"), col("o"), col("expected"),
        col("chi2_contrib"), col("chi2"))
      .orderBy(col("nation"), col("brand"))
  }

  val q134Sql: String =
    """WITH cells AS (SELECT n_name AS nation, p_brand AS brand, count(*) AS o
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |rt AS (SELECT nation, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT brand, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |nn AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
      |grid AS (SELECT nation, rt, brand, ct FROM rt CROSS JOIN ct),
      |pc AS (SELECT g.nation, g.brand, CAST(coalesce(c.o, 0) AS BIGINT) AS o,
      |    CAST(CAST(CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE) / CAST(nn AS DOUBLE)
      |      AS DECIMAL(18,6)) AS DOUBLE) AS expected,
      |    CAST(CAST(
      |      (CAST(coalesce(c.o, 0) AS DOUBLE) - CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * (CAST(coalesce(c.o, 0) AS DOUBLE) - CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE) / CAST(nn AS DOUBLE))
      |      / (CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE) / CAST(nn AS DOUBLE))
      |      AS DECIMAL(18,6)) AS DOUBLE) AS chi2_contrib
      |  FROM grid g LEFT JOIN cells c ON g.nation = c.nation AND g.brand = c.brand
      |  CROSS JOIN nn),
      |tc AS (SELECT CAST(CAST(sum(CAST(chi2_contrib AS DECIMAL(18,6))) AS DECIMAL(18,6))
      |         AS DOUBLE) AS chi2 FROM pc)
      |SELECT nation, brand, o, expected, chi2_contrib, chi2
      |FROM pc CROSS JOIN tc
      |ORDER BY nation, brand""".stripMargin

  // ---------------------------------------------------------------- q135
  /** Complex-event-processing pattern match: each session's ordered
    * event-type sequence is folded into a `>`-joined string and matched
    * against a fixed library of journey regexes (browse→buy, error
    * recovery, rage errors, single-view bounce) — the MATCH_RECOGNIZE
    * workload expressed with the engine's string kernel, one level of
    * expressiveness past q75's fixed-stage funnel (regex alternation
    * and Kleene stars over the WHOLE session, not three ordered
    * stages).
    *
    * 100 TB shape: the one user-keyed shuffle does sessionization AND
    * the per-session fold (the groupBy(user, sid) is subset-satisfied);
    * session strings are bounded by session length, never corpus-sized;
    * all four patterns match in ONE conditional-aggregation pass
    * (codegen'd regex on the session frame), folding to a single row
    * before the O(#patterns) unpivot. Shares are one division each
    * (q121's parity rule). */
  private val CepPatterns: Seq[(String, String)] = Seq(
    // only views/clicks between the view and the purchase
    ("browse_then_buy", "view(>view|>click)*>purchase"),
    // an error eventually recovered into a purchase
    ("error_recovery", "error(>[a-z]+)*>purchase"),
    // two consecutive errors
    ("rage_errors", "error>error"),
    // the whole session is one view
    ("bounce", "^view$"))

  def q135CepPatterns(spark: SparkSession, dir: String): DataFrame = {
    val sess = Sessionize.withSid(Tables(spark, dir).events)
    val seqs = sess.groupBy(col("user_id"), col("sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type")))),
        x => x.getField("event_type")), ">").as("seq"))
    val aggs = count(lit(1)).as("tot") +:
      CepPatterns.map { case (name, pat) =>
        count(when(col("seq").rlike(pat), 1)).as(s"n_$name")
      }
    val row = seqs.agg(aggs.head, aggs.tail: _*)
    row.select(inline(array(CepPatterns.map { case (name, _) =>
        struct(lit(name).as("pattern"), col(s"n_$name").as("n_sessions"),
          (col(s"n_$name").cast(DoubleType) / col("tot").cast(DoubleType))
            .as("share"))
      }: _*)))
      .orderBy(col("pattern"))
  }

  val q135Sql: String = {
    val conds = CepPatterns.map { case (name, pat) =>
      s"count(CASE WHEN regexp_matches(seq, '$pat') THEN 1 END) AS n_$name"
    }.mkString(", ")
    val rows = CepPatterns.map { case (name, _) =>
      s"""SELECT '$name' AS pattern, n_$name AS n_sessions,
         |  CAST(n_$name AS DOUBLE) / CAST(tot AS DOUBLE) AS share FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
       |l AS (SELECT *, lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
       |      FROM e),
       |f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS ns
       |      FROM l),
       |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
       |q AS (SELECT user_id, sid,
       |        string_agg(event_type, '>' ORDER BY us, event_id) AS seq
       |      FROM s GROUP BY 1, 2),
       |a AS (SELECT count(*) AS tot, $conds FROM q)
       |$rows
       |ORDER BY pattern""".stripMargin
  }

  // ---------------------------------------------------------------- q136
  /** k-anonymity audit with a generalization ladder — the
    * data-governance card (Sweeney 2002) a corpus publisher runs before
    * releasing quasi-identifier columns: customers are grouped by the
    * QI tuple (nation, market segment, account-balance bucket) at three
    * bucket widths, and each rung reports how many equivalence classes
    * fall below k = [[KAnonK]], how many customers they expose, and the
    * suppression fraction a release at that rung would pay. Walking the
    * ladder IS the generalization-lattice decision: widen buckets until
    * the risky fraction is acceptable.
    *
    * 100 TB shape: ONE customer scan projects all three bucketings into
    * a narrow checkpointed base; each rung is then a map-side-combinable
    * (QI → count) aggregate folded to class-size statistics — work per
    * rung is QI-cardinality-bounded, and rungs never re-read the fact
    * table. The risky fraction is one double division through
    * DECIMAL(18,6). */
  private val KAnonK = 10
  private val KAnonWidths = Seq(100, 1000, 10000)

  def q136KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val baseCols = Seq(col("c_nationkey"), col("c_mktsegment")) ++
      KAnonWidths.map(w => floor(col("c_acctbal") / w).as(s"b$w"))
    val base = Tables(spark, dir).customer
      .select(baseCols: _*)
      .localCheckpoint(true) // one scan; every ladder rung reads this
    KAnonWidths.map { w =>
      base.groupBy(col("c_nationkey"), col("c_mktsegment"), col(s"b$w"))
        .agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("k")).as("n_rows"),
          min(col("k")).as("min_k"),
          count(when(col("k") < KAnonK, 1)).as("n_risky_classes"),
          sum(when(col("k") < KAnonK, col("k")).otherwise(0L)).as("n_risky_rows"))
        .select(lit(w).as("bucket_width"), col("n_classes"), col("min_k"),
          col("n_risky_classes"), col("n_risky_rows"),
          (col("n_risky_rows").cast(DoubleType) / col("n_rows").cast(DoubleType))
            .cast(d6).cast(DoubleType).as("risky_frac"))
    }.reduce(_ unionByName _)
      .orderBy(col("bucket_width"))
  }

  val q136Sql: String = {
    val rungs = KAnonWidths.map { w =>
      s"""SELECT $w AS bucket_width, CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(min(k) AS BIGINT) AS min_k,
         |  CAST(count(CASE WHEN k < $KAnonK THEN 1 END) AS BIGINT) AS n_risky_classes,
         |  CAST(sum(CASE WHEN k < $KAnonK THEN k ELSE 0 END) AS BIGINT) AS n_risky_rows,
         |  CAST(CAST(CAST(sum(CASE WHEN k < $KAnonK THEN k ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(k) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS risky_frac
         |FROM (SELECT c_nationkey, c_mktsegment, floor(c_acctbal / $w) AS b,
         |        CAST(count(*) AS BIGINT) AS k
         |      FROM customer GROUP BY 1, 2, 3)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$rungs\nORDER BY bucket_width"
  }

  // ---------------------------------------------------------------- q155
  /** Item-item collaborative filtering over order baskets at the OPEN
    * part-key domain: cosine similarity on co-purchase counts
    * (sim(a,b) = c_ab / √(c_a·c_b), Sarwar et al., WWW'01), materialized
    * as each item's top-[[CfTopK]] neighbor list — the "customers who
    * bought X also bought" artifact a recommender serves. Distinct from
    * q126's 25-brand rule table: here the item domain is unbounded
    * (thousands of part keys, the real recommender regime), the score is
    * the symmetric normalized cosine rather than directed
    * confidence/lift, and the deliverable is a per-item RANKED shortlist
    * — cut by the row_number()≤k idiom so q140's injected
    * `TopKWindowRewrite` plans it as the custom bounded-heap
    * `TopKPerKey` operator (item-cardinality keys ≫ the window sort).
    *
    * 100 TB shape: the distinct (order, item) basket frame pays the one
    * orderkey shuffle and is `localCheckpoint`ed (read by item counts
    * AND pair generation — zero fact re-scans, q126's device). Pairs
    * explode locally from per-basket sorted arrays, capped at
    * [[CfBasketCap]] items per basket (the fan-out guard — q108's CoCap
    * device; oversized baskets are promiscuous noise in CF anyway, and
    * the cap is mirrored in the oracle). The pair shuffle carries
    * map-side-combined (a,b) partials; the two item-count joins are
    * long-key equi-joins AQE broadcasts below threshold (item counts ≪
    * corpus). Nothing after the basket frame is corpus-sized.
    *
    * Parity: √ is IEEE-correctly-rounded in both engines and its
    * operands are exact integer counts widened to double, so
    * sim = c_ab / √(c_a·c_b) is a fixed-shape chain of three exactly
    * reproducible IEEE ops — no decimal rounding needed anywhere. The
    * top-k cut orders by (sim DESC, neighbor) — a total order, so the
    * row_number cut is deterministic and oracle-identical. Item counts
    * deliberately count ALL baskets (cap trims pair GENERATION only):
    * the denominator stays the item's true reach, making capped-basket
    * similarities conservative rather than inflated. */
  private val CfTopK = 3
  private val CfBasketCap = 64

  def q155ItemCf(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables(spark, dir).lineitem
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct()
      .localCheckpoint(true)
    val itemCnt = baskets.groupBy(col("item")).agg(count(lit(1)).as("ic"))
    val pairExpr = flatten(transform(
      sequence(lit(1), size(col("items")) - 1),
      i => transform(
        sequence(i + 1, size(col("items"))),
        j => struct(element_at(col("items"), i).as("a"),
          element_at(col("items"), j).as("b")))))
    val pairCnt = baskets.groupBy(col("oid"))
      .agg(array_sort(collect_list(col("item"))).as("items"))
      .filter(size(col("items")).between(2, CfBasketCap))
      .select(explode(pairExpr).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cooc"))
    val directed = pairCnt
      .unionByName(pairCnt.select(col("b").as("a"), col("a").as("b"), col("cooc")))
    val sims = directed
      .join(itemCnt.select(col("item").as("a"), col("ic").as("ica")), Seq("a"))
      .join(itemCnt.select(col("item").as("b"), col("ic").as("icb")), Seq("b"))
      .select(col("a").as("item"), col("b").as("neighbor"), col("cooc"),
        (col("cooc").cast(DoubleType) /
          sqrt(col("ica").cast(DoubleType) * col("icb").cast(DoubleType))).as("sim"))
    // the row_number()≤k idiom — TopKWindowRewrite plans this as the
    // bounded-heap TopKPerKey operator (item-cardinality partitions)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item")).orderBy(col("sim").desc, col("neighbor"))
    sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CfTopK)
      .select(col("item"), col("neighbor"), col("cooc"), col("sim"))
      .orderBy(col("item"), col("sim").desc, col("neighbor"))
  }

  val q155Sql: String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem),
       |ic AS (SELECT item, count(*) AS ic FROM b GROUP BY 1),
       |ok AS (SELECT oid FROM b GROUP BY oid
       |       HAVING count(*) BETWEEN 2 AND $CfBasketCap),
       |pc AS (SELECT x.item AS a, y.item AS b, count(*) AS cooc
       |       FROM b x JOIN b y ON x.oid = y.oid AND x.item < y.item
       |       JOIN ok ON x.oid = ok.oid
       |       GROUP BY 1, 2),
       |d AS (SELECT a, b, cooc FROM pc UNION ALL SELECT b, a, cooc FROM pc),
       |s AS (SELECT d.a AS item, d.b AS neighbor, CAST(d.cooc AS BIGINT) AS cooc,
       |        CAST(d.cooc AS DOUBLE)
       |          / sqrt(CAST(ia.ic AS DOUBLE) * CAST(ib.ic AS DOUBLE)) AS sim
       |      FROM d JOIN ic ia ON d.a = ia.item JOIN ic ib ON d.b = ib.item)
       |SELECT item, neighbor, cooc, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY item
       |    ORDER BY sim DESC, neighbor) AS rk FROM s)
       |WHERE rk <= $CfTopK
       |ORDER BY item, sim DESC, neighbor""".stripMargin

  // ---------------------------------------------------------------- q160
  /** ε-differentially-private release of the customers-per-nation
    * histogram (Laplace mechanism, ε = 1, Dwork et al. TCC'06) plus the
    * private-side utility audit — the OTHER privacy lever next to q136's
    * k-anonymity ladder: q136 measures re-identification risk of a raw
    * release, q160 produces the noised release a DP pipeline actually
    * publishes, with the realized per-cell error and mean |noise| that
    * only the data owner can see. Noise is SEEDED: u derives from the
    * shared md5/hex60 kernel on the cell key (the q63/q91/q98 device),
    * so the release is reproducible run-to-run and the ORACLE draws the
    * identical noise — hash equality gates the whole mechanism. BECAUSE
    * the seed derivation is public (md5 of the cell name), any consumer
    * can recompute and subtract the noise: the ε here is NOMINAL — the
    * column is named `epsilon_nominal` and the guarantee holds only if
    * the seed string is kept secret (a production release swaps in a
    * secret per-epoch seed; the mechanism and ε-accounting are
    * unchanged).
    *
    * 100 TB shape: one broadcast-dim fact aggregate (map-side
    * combinable) folds to cell-cardinality rows; the noise draw, clip,
    * and audit all run on that 25-row frame. Parity: u sits on the
    * integer 10⁶ grid ((m+0.5)/10⁶, endpoints unreachable so ln never
    * sees 0); the Laplace inverse-CDF ln rounds through DECIMAL(18,6)
    * (q74's rule) and the integerized noise is a half-away-from-zero
    * decimal round — identical in both engines; clipping at 0 is
    * post-processing (ε unchanged). */
  private val DpGrid = 1000000L

  def q160DpHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.customer
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("true_count"))
    val m = graft.text.TextOps.hex60(concat(lit("dp:"), col("nation"))) % DpGrid
    val u = (m.cast(DoubleType) + lit(0.5)) / lit(DpGrid.toDouble)
    // Laplace inverse CDF at b = 1/ε = 1: sign(u−½)·(−ln(1−2|u−½|))
    val lap = when(u >= 0.5, -log(lit(1.0) - lit(2.0) * (u - lit(0.5))))
      .otherwise(log(lit(1.0) - lit(2.0) * (lit(0.5) - u)))
    val noised = counts
      .select(col("nation"), col("true_count"),
        round(lap.cast(DecimalType(18, 6))).cast(LongType).as("noise"))
      .withColumn("noisy_count",
        greatest(lit(0L), col("true_count") + col("noise")))
      .localCheckpoint(true) // read twice: rows + the audit fold
    val audit = noised.agg(
      (sum(abs(col("noise"))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("mean_abs_noise"))
    noised.crossJoin(broadcast(audit))
      .select(col("nation"), col("true_count"), col("noise"),
        col("noisy_count"), col("mean_abs_noise"), lit(1.0).as("epsilon_nominal"))
      .orderBy(col("nation"))
  }

  val q160Sql: String =
    s"""WITH c AS (SELECT n_name AS nation, count(*) AS true_count
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1),
       |nz AS (SELECT nation, CAST(true_count AS BIGINT) AS true_count,
       |    CAST(round(CAST(
       |      CASE WHEN u >= 0.5 THEN -ln(1.0 - 2.0 * (u - 0.5))
       |           ELSE ln(1.0 - 2.0 * (0.5 - u)) END
       |      AS DECIMAL(18,6))) AS BIGINT) AS noise
       |  FROM (SELECT nation, true_count,
       |      (CAST(('0x' || substr(md5('dp:' || nation), 1, 15))::BIGINT % $DpGrid AS DOUBLE)
       |        + 0.5) / ${DpGrid.toDouble} AS u
       |    FROM c)),
       |aud AS (SELECT CAST(sum(abs(noise)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS mean_abs_noise FROM nz)
       |SELECT nation, true_count, noise,
       |  greatest(CAST(0 AS BIGINT), true_count + noise) AS noisy_count,
       |  mean_abs_noise, CAST(1.0 AS DOUBLE) AS epsilon_nominal
       |FROM nz CROSS JOIN aud ORDER BY nation""".stripMargin

  // ---------------------------------------------------------------- q161
  /** A/B experiment readout: users deterministically hash-assigned to two
    * arms (the q98 split device — exactly how a real experimentation
    * platform buckets), metric = per-user total event value, decision =
    * Welch-style two-sample z on the arm means — the experimentation
    * card every growth pipeline ends in, and the inferential sibling of
    * q134's chi-square (contingency independence) and q149's bootstrap
    * (resampling CI): same family, the two-ARM comparison member. Output
    * is one row per arm (n, mean, variance) with the shared t statistic
    * and the |t| > 1.96 large-sample verdict.
    *
    * 100 TB shape: ONE corpus scan folds per-event values to per-user
    * totals (the one user-keyed shuffle; arm assignment is a scan-stage
    * hash projection, no membership table); arm stats are a
    * 2-row map-side-combinable aggregate; the test is driver-free
    * arithmetic on that 2-row frame. Parity: per-event values round
    * through DECIMAL(18,6) (q85's rule) so user totals and the arm-level
    * Σ and Σ² are exact decimals (squares at (37,12) stay under the cap
    * for user totals < 10¹²); Σ and Σ² then quantize to whole units
    * (decimal→DECIMAL(_,0), same half-away rule both engines) before the
    * double conversion — the raw Σ² scales past 2⁵³, where Spark's
    * conversion rounds once and DuckDB's twice — and mean/variance/t are
    * fixed-shape IEEE chains over those exactly-converted integers (sqrt
    * correctly rounded, q146's no-output-rounding rule). Arms with < 2
    * users yield NULL via the n−1 guard on both engines. */
  def q161AbTest(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val perUser = Tables(spark, dir).events
      .select(col("user_id"), col("value").cast(d6).as("v"))
      .groupBy(col("user_id")).agg(sum(col("v")).as("tv"))
      .select(
        (graft.text.TextOps.hex60(concat(lit("ab:"), col("user_id").cast("string")))
          % 2).cast("int").as("arm"),
        col("tv").cast(DecimalType(18, 6)).as("tv"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("tv")).as("s"),
        sum(col("tv") * col("tv")).as("ss"))
      .localCheckpoint(true) // read twice: arm rows + the 1-row test fold
    def d(c: Column): Column = c.cast(DoubleType)
    val mean = d(col("s")) / d(col("n_users"))
    // Σ and Σ² enter the variance chain as WHOLE-UNIT integers: ss is
    // DECIMAL(38,12) whose scaled value exceeds 2⁵³, where decimal→double
    // converts correctly-rounded-once in Spark but in two roundings
    // (int128→double, ÷10¹²) in DuckDB — a 1-ulp split. Quantized to
    // whole units (Spark decimal cast = HALF_UP; the oracle spells
    // round(x, 0) explicitly because DuckDB's decimal→decimal cast
    // TRUNCATES) the values are ≪ 2⁵³, the conversions exact, and the
    // IEEE chain bit-identical.
    val sInt = d(col("s").cast(DecimalType(19, 0)))
    val ssInt = d(col("ss").cast(DecimalType(28, 0)))
    val varr = (d(col("n_users")) * ssInt - sInt * sInt) /
      (d(col("n_users")) * d(when(col("n_users") > 1, col("n_users") - 1)))
    val withStats = arms.select(col("arm"), col("n_users"),
      mean.as("mean_value"), varr.as("var_value"))
    val test = withStats.agg(
      max(when(col("arm") === 0, col("mean_value"))).as("ma"),
      max(when(col("arm") === 1, col("mean_value"))).as("mb"),
      max(when(col("arm") === 0, col("var_value"))).as("va"),
      max(when(col("arm") === 1, col("var_value"))).as("vb"),
      max(when(col("arm") === 0, col("n_users"))).as("na"),
      max(when(col("arm") === 1, col("n_users"))).as("nb"))
      .select(((col("ma") - col("mb")) /
        sqrt(col("va") / d(col("na")) + col("vb") / d(col("nb")))).as("t_stat"))
      .select(col("t_stat"), (abs(col("t_stat")) > 1.96).as("significant"))
    withStats.crossJoin(broadcast(test)).orderBy(col("arm"))
  }

  val q161Sql: String =
    """WITH pu AS (SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS tv
      |  FROM events GROUP BY 1),
      |au AS (SELECT CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS INT) AS arm,
      |    CAST(tv AS DECIMAL(18,6)) AS tv
      |  FROM pu),
      |ar AS (SELECT arm, count(*) AS n_users, sum(tv) AS s,
      |    sum(CAST(tv AS DECIMAL(19,6)) * CAST(tv AS DECIMAL(19,6))) AS ss
      |  FROM au GROUP BY 1),
      |st AS (SELECT arm, CAST(n_users AS BIGINT) AS n_users,
      |    CAST(s AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_value,
      |    (CAST(n_users AS DOUBLE) * CAST(CAST(round(ss, 0) AS DECIMAL(28,0)) AS DOUBLE)
      |       - CAST(CAST(round(s, 0) AS DECIMAL(19,0)) AS DOUBLE) * CAST(CAST(round(s, 0) AS DECIMAL(19,0)) AS DOUBLE))
      |      / (CAST(n_users AS DOUBLE) * CAST(CASE WHEN n_users > 1 THEN n_users - 1 END AS DOUBLE)) AS var_value
      |  FROM ar),
      |ts AS (SELECT (max(CASE WHEN arm = 0 THEN mean_value END)
      |             - max(CASE WHEN arm = 1 THEN mean_value END))
      |    / sqrt(max(CASE WHEN arm = 0 THEN var_value END) / max(CASE WHEN arm = 0 THEN CAST(n_users AS DOUBLE) END)
      |         + max(CASE WHEN arm = 1 THEN var_value END) / max(CASE WHEN arm = 1 THEN CAST(n_users AS DOUBLE) END))
      |    AS t_stat FROM st)
      |SELECT arm, n_users, mean_value, var_value, t_stat,
      |  abs(t_stat) > 1.96 AS significant
      |FROM st CROSS JOIN ts ORDER BY arm""".stripMargin

  // ---------------------------------------------------------------- q163
  /** RFM customer segmentation (recency / frequency / monetary quintile
    * codes, Hughes 1994 — the classic lifecycle-marketing operator): per
    * customer, days since last order (vs the corpus max date), order
    * count, and total spend, each scored 1–5 by q39's integer-threshold
    * quintiles (5 = best: most recent / most frequent / highest spend),
    * folded to the ≤125-segment distribution with per-segment averages
    * and share — the segment table a CRM campaign is keyed on.
    *
    * 100 TB shape: ONE orders scan folds to the customer-cardinality
    * (r, f, m) frame (map-side combinable; the corpus max date is a
    * 1-row broadcast, never a driver scalar), `localCheckpoint`ed
    * because THREE value-collapsed threshold folds and the binning pass
    * all read it; each quintile array folds to one broadcast row
    * (q122's device) so scoring is a projection; everything after is
    * segment-cardinality. Parity: days/counts are exact integers, spend
    * rounds per order through DECIMAL(18,6) (q85's rule) and
    * decimal-sums; threshold compares are exact; each per-segment
    * average/share is one IEEE division of exact sums. */
  def q163RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val o = Tables(spark, dir).orders
    val maxd = o.agg(max(col("o_orderdate")).as("maxd"))
    val cust = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("f"),
        sum(col("o_totalprice").cast(d6)).as("m"))
      .crossJoin(broadcast(maxd))
      .select(col("o_custkey"),
        datediff(col("maxd"), col("last_order")).as("r"), col("f"), col("m"))
      .localCheckpoint(true)
    // quintile cut points t1..t4 per dimension: q39's integer-threshold
    // device over the value collapse, folded to one broadcast array row
    def cuts(c: String): DataFrame = {
      val cnt = cust.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val cum = cnt
        .withColumn("cum", sum(col("cnt")).over(
          Window.orderBy(col(c))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum(col("cnt")).over(Window.partitionBy()))
      val ts = (1 to 4).map(i =>
        min(when(col("cum") * 5 >= col("tot") * i, col(c))).as(s"t$i"))
      cum.agg(ts.head, ts.tail: _*)
        .select(array((1 to 4).map(i => col(s"t$i")): _*).as(s"ts_$c"))
    }
    def binOf(c: String): Column =
      size(filter(col(s"ts_$c"), t => col(c) > t)) + 1
    val scored = cust
      .crossJoin(broadcast(cuts("r")))
      .crossJoin(broadcast(cuts("f")))
      .crossJoin(broadcast(cuts("m")))
      .select(col("r"), col("f"), col("m"),
        (lit(6) - binOf("r")).as("r_score"), // recent = low days = best
        binOf("f").as("f_score"), binOf("m").as("m_score"))
    val segs = scored
      .groupBy(concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("r")).as("sr"), sum(col("f")).as("sf"), sum(col("m")).as("sm"))
      .localCheckpoint(true) // read twice: rows + the share denominator
    val tot = segs.agg(sum(col("n_customers")).as("nt"))
    def dv(c: Column): Column = c.cast(DoubleType)
    segs.crossJoin(broadcast(tot))
      .select(col("segment"), col("n_customers"),
        (dv(col("sr")) / dv(col("n_customers"))).as("avg_recency_days"),
        (dv(col("sf")) / dv(col("n_customers"))).as("avg_orders"),
        (dv(col("sm")) / dv(col("n_customers"))).as("avg_spend"),
        (dv(col("n_customers")) / dv(col("nt"))).as("share"))
      .orderBy(col("segment"))
  }

  val q163Sql: String = {
    def cutsSql(c: String): String = {
      val ts = (1 to 4).map(i =>
        s"min(CASE WHEN cum * 5 >= tot * $i THEN v END)").mkString(", ")
      s"""cut_$c AS (SELECT [$ts] AS ts_$c FROM (
         |  SELECT v, sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         sum(cnt) OVER () AS tot
         |  FROM (SELECT $c AS v, count(*) AS cnt FROM cust GROUP BY 1)))""".stripMargin
    }
    s"""WITH maxd AS (SELECT max(o_orderdate) AS maxd FROM orders),
       |cust AS (SELECT o_custkey,
       |    date_diff('day', CAST(max(o_orderdate) AS DATE),
       |              CAST((SELECT maxd FROM maxd) AS DATE)) AS r,
       |    count(*) AS f,
       |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS m
       |  FROM orders GROUP BY 1),
       |${cutsSql("r")},
       |${cutsSql("f")},
       |${cutsSql("m")},
       |sc AS (SELECT r, f, m,
       |    6 - (1 + len(list_filter(ts_r, t -> r > t))) AS r_score,
       |    1 + len(list_filter(ts_f, t -> f > t)) AS f_score,
       |    1 + len(list_filter(ts_m, t -> m > t)) AS m_score
       |  FROM cust CROSS JOIN cut_r CROSS JOIN cut_f CROSS JOIN cut_m),
       |sg AS (SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
       |         || CAST(m_score AS VARCHAR) AS segment,
       |    count(*) AS n_customers, sum(r) AS sr, sum(f) AS sf, sum(m) AS sm
       |  FROM sc GROUP BY 1),
       |tt AS (SELECT sum(n_customers) AS nt FROM sg)
       |SELECT segment, CAST(n_customers AS BIGINT) AS n_customers,
       |  CAST(sr AS DOUBLE) / CAST(n_customers AS DOUBLE) AS avg_recency_days,
       |  CAST(sf AS DOUBLE) / CAST(n_customers AS DOUBLE) AS avg_orders,
       |  CAST(sm AS DOUBLE) / CAST(n_customers AS DOUBLE) AS avg_spend,
       |  CAST(n_customers AS DOUBLE) / CAST(nt AS DOUBLE) AS share
       |FROM sg CROSS JOIN tt ORDER BY segment""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_cep_patterns" -> (q135CepPatterns _),
    "q136_k_anonymity" -> (q136KAnonymity _),
    "q155_item_cf" -> (q155ItemCf _),
    "q160_dp_histogram" -> (q160DpHistogram _),
    "q161_ab_test" -> (q161AbTest _),
    "q163_rfm_segments" -> (q163RfmSegments _),
    "q126_basket_rules" -> (q126BasketRules _),
    "q127_data_profile" -> (q127DataProfile _),
    "q128_fuzzy_blocking" -> (q128FuzzyBlocking _),
    "q131_skyline" -> (q131Skyline _),
    "q132_entity_resolution" -> (q132EntityResolution _),
    "q133_seq_patterns" -> (q133SeqPatterns _),
    "q134_chi_square" -> (q134ChiSquare _))

  val oracleSql: Map[String, String] = Map(
    "q135_cep_patterns" -> q135Sql,
    "q136_k_anonymity" -> q136Sql,
    "q155_item_cf" -> q155Sql,
    "q160_dp_histogram" -> q160Sql,
    "q161_ab_test" -> q161Sql,
    "q163_rfm_segments" -> q163Sql,
    "q126_basket_rules" -> q126Sql,
    "q127_data_profile" -> q127Sql,
    "q128_fuzzy_blocking" -> q128Sql,
    "q131_skyline" -> q131Sql,
    "q132_entity_resolution" -> q132Sql,
    "q133_seq_patterns" -> q133Sql,
    "q134_chi_square" -> q134Sql)
}
