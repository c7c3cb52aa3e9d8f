package graft.graph

import graft.sql.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Iterative graph analytics over join-derived entity graphs — the
  * "Pregel as joins" family. Connected components lives with the dedup
  * pipeline ([[graft.dedup.DedupQueries.connectedComponents]]); this
  * module holds value-propagation iterations (PageRank-style random-walk
  * scores), which a corpus/graph pipeline uses for entity importance,
  * seed weighting, and crawl prioritization.
  */
object GraphQueries {

  private val Damping  = 0.85
  private val PrRounds = 3

  /** PageRank (damping 0.85, [[PrRounds]] fixed iterations) over the
    * undirected customer–supplier transaction graph (an edge per distinct
    * (customer, supplier) trade pair from orders ⨝ lineitem). The classic
    * importance score for entity graphs; fixed rounds keep the oracle
    * expressible as an unrolled recursive-free SQL chain.
    *
    * 100 TB shape: node ids are LONGS (customer 2k, supplier 2k+1 — the
    * shuffle carries 8-byte keys, never formatted strings; presentation
    * formatting happens once on the final node-cardinality result). The
    * edge list is materialized ONCE with out-degree attached; each round
    * is then exactly one equi-join (rank by src) + one map-side-combinable
    * aggregate (contributions by dst) — the standard distributed PageRank
    * schedule. Production-depth iteration counts would `localCheckpoint`
    * per round to cut lineage like `connectedComponents` does; at 3
    * rounds the lineage is shallow enough to leave Catalyst the whole
    * plan. Parity: per-edge contributions round through DECIMAL(18,6) and
    * are summed as decimals — exact and summation-order-free in both
    * engines (the q66/q78/q79 rule).
    */
  /** PageRank core over a DIRECTED distinct (src, dst) long edge list,
    * symmetrized here (every node then has out-degree ≥ 1 — no dangling
    * mass to redistribute). Returns (node, pr: DECIMAL(18,6)).
    *
    * The symmetrized edge list is materialized once (ONE scan of the
    * upstream join); degrees and the initial uniform rank derive from
    * that checkpoint, and the degree-annotated edge frame is materialized
    * too, so every round's executed plan is exactly one equi-join (rank
    * by src) + one map-side-combinable aggregate (contributions by dst)
    * over in-memory blocks — zero file re-scans across rounds. */
  def pageRank(e0: DataFrame, rounds: Int = PrRounds): DataFrame = {
    val e = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, Seq("src")).localCheckpoint(true)
    // node count: an O(#nodes) aggregate collapsed to one driver long
    // (bounded like connectedComponents' labelSum convergence probe)
    val n = deg.count()
    var pr = deg.select(col("src").as("node"),
      lit(1.0 / n).cast(DecimalType(18, 6)).as("pr"))
    // 0.15 as a LITERAL, not 1.0 - Damping: the JVM double of (1.0 - 0.85)
    // is 0.15000000000000002 while the oracle's 0.15 literal is one ulp
    // below — the decimal rounding would then diverge in the 6th place
    val base = lit(0.15 / n).cast(DecimalType(18, 6))
    for (_ <- 1 to rounds) {
      pr = ed
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          (lit(Damping) * col("pr").cast(DoubleType) / col("deg"))
            .cast(DecimalType(18, 6)).as("c"))
        .groupBy(col("node"))
        .agg((base + sum(col("c"))).cast(DecimalType(18, 6)).as("pr"))
    }
    pr
  }

  def q93PageRank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e0 = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pageRank(e0)
      .select(
        when(col("node") % 2 === 0, concat(lit("c:"), (col("node") / 2).cast("long")))
          .otherwise(concat(lit("s:"), ((col("node") - 1) / 2).cast("long"))).as("node"),
        col("pr").cast(DoubleType).as("pagerank"))
      .orderBy(col("node"))
  }

  val q93Sql: String = {
    def round(k: Int): String =
      s"""p$k AS (SELECT ed.dst AS node,
         |  CAST(b.base + sum(CAST(CAST(0.85 AS DOUBLE) * CAST(p.pr AS DOUBLE) / ed.deg AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS pr
         |  FROM ed JOIN p${k - 1} p ON ed.src = p.node CROSS JOIN b
         |  GROUP BY ed.dst, b.base)""".stripMargin
    s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)),
       |nn AS (SELECT count(*) AS n FROM deg),
       |b AS (SELECT CAST(CAST(0.15 AS DOUBLE) / n AS DECIMAL(18,6)) AS base FROM nn),
       |p0 AS (SELECT src AS node, CAST(CAST(1.0 AS DOUBLE) / n AS DECIMAL(18,6)) AS pr
       |       FROM deg CROSS JOIN nn),
       |${(1 to PrRounds).map(round).mkString(",\n")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'c:' || CAST(node // 2 AS BIGINT)
       |            ELSE 's:' || CAST((node - 1) // 2 AS BIGINT) END AS node,
       |  CAST(pr AS DOUBLE) AS pagerank
       |FROM p$PrRounds ORDER BY node""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_pagerank" -> (q93PageRank _))

  val oracleSql: Map[String, String] = Map(
    "q93_pagerank" -> q93Sql)
}
