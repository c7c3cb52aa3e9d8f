package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._

/** The whole-inventory join-shape net: every declared query's OPTIMIZED
  * plan is swept for nested-loop-shaped joins (no equi-key ⇒ Spark plans
  * BroadcastNestedLoopJoin / CartesianProduct) whose sides are BOTH
  * unbounded — the one join shape that cannot survive 100 TB, because its
  * cost is |stream| × |broadcast| row comparisons and its broadcast side
  * is corpus-shaped. Per-query audits (`PlanAuditSpec`, `TopKRewriteSpec`,
  * the graph specs) pin the plans that matter hardest; this sweep is the
  * regression net that catches the NEXT accidental non-equi `join` on any
  * of the 213 cards, the day it lands.
  *
  * A nested loop over a PROVABLY bounded side is the engine's own idiom —
  * the scalar-aggregate crossJoin ferry (q108's census frame, every
  * grand-total normalization), literal parameter grids — and stays legal:
  * [[boundOf]] proves a side's row bound from the optimized plan
  * (grouping-free aggregates emit exactly 1 row, literal relations their
  * size, joins/unions compose), and any non-equi join with a side bounded
  * by [[BoundedSide]] rows broadcasts O(1) data at any corpus size.
  * What the proof can't see (group-by over a BOUNDED-DOMAIN column —
  * source has single digits of values at any scale) is whitelisted BY
  * NAME with the reason, so every exception stays documented. */
class InventoryPlanAuditSpec extends SparkSpec {

  /** Row bound a broadcast side may have and still count as "parameter
    * shaped": far above any scalar ferry / grid in the inventory, far
    * below anything corpus-proportional. */
  private val BoundedSide = 100000L

  /** name -> (expected count of statically unprovable non-equi joins, why
    * each is still bounded or intended). Every entry was hand-verified
    * against the plan: the broadcast side is a domain-bounded group-by, a
    * filter-derived sample, or a parameter grid the [[boundOf]] prover
    * can't see through (Generate of a literal array, modulo sampling).
    * Whitelisted queries are NOT skipped — the sweep still runs and pins
    * the offending join count to the documented one, so a card that later
    * gains a SECOND, genuinely unbounded non-equi join trips the net. */
  private val BoundedByDomain: Map[String, (Int, String)] = Map(
    "q213_kmv_overlap" -> (1,
      "source-pair sketch matrix: group-by source is bounded by the source DOMAIN, not the corpus"),
    "q134_chi_square" -> (2,
      "contingency margins: nation x brand domain cross (~25 x ~25 cells at any corpus size); both the margin cross and the expected-counts cross are domain-sided"),
    "q143_rrf_fusion" -> (1,
      "query-vector frame: the bounded retrieval query set crossed into per-doc scoring"),
    "q150_truncation_recall" -> (2,
      "modulo-sampled query set broadcast against the corpus (bounded by the sampling rate)"),
    "q170_bpe_compression" -> (1,
      "per-lang baseline frame: group-by lang is bounded by the language DOMAIN"),
    "q171_shapley_attribution" -> (2,
      "event-type state grid crossed into the transition ledger (bounded state domain)"),
    "q185_ivf_recall_curve" -> (3,
      "query sample + literal nprobe grid (Generate of a literal array defeats the prover)"),
    "q193_packing_curve" -> (1,
      "literal context-budget grid crossed into per-doc offsets"),
    "q195_centroid_distances" -> (1,
      "centroid pair matrix: k x k with k a query constant"),
    "q197_filter_funnel" -> (1,
      "literal gate-threshold grid crossed into per-doc quality facts"),
    "q212_source_ablation" -> (1,
      "source-arm grid: group-by source is bounded by the source DOMAIN"),
    "q24_sim_cosine_topk" -> (1,
      "modulo-sampled query embeddings broadcast against the corpus (bounded by the sampling rate)"),
    "q26_sim_embedding_neardup" -> (1,
      "INTENDED quadratic brute-force baseline; the scale path is q25's LSH / q96's semdedup"))

  /** Conservative static row bound of an optimized logical plan: None =
    * can't prove. Only shapes that cannot scale with the corpus return
    * Some — a grouping-free Aggregate is exactly 1 row, literal/range
    * relations know their size, and bounded inputs stay bounded through
    * 1:1/reducing operators, joins (≤ product), unions (≤ sum), limits. */
  private def boundOf(p: LogicalPlan): Option[Long] = p match {
    case a: Aggregate => if (a.groupingExpressions.isEmpty) Some(1L) else None
    case l: LocalRelation => Some(l.data.length.toLong)
    case r: Range => Some(r.numElements.toLong)
    case j: Join =>
      for { l <- boundOf(j.left); r <- boundOf(j.right) } yield (l + 1L) * (r + 1L)
    case u: Union => u.children.foldLeft(Option(0L)) { (acc, c) =>
      for { a <- acc; b <- boundOf(c) } yield a + b }
    case g: GlobalLimit => g.maxRows.orElse(boundOf(g.child))
    case l: LocalLimit => l.maxRows.orElse(boundOf(l.child))
    case _: Project | _: Filter | _: Sort | _: Window | _: SubqueryAlias |
         _: RepartitionOperation | _: Distinct | _: Deduplicate =>
      boundOf(p.children.head)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Mirrors ExtractEquiJoinKeys' core question: is there at least one
    * equality conjunct with one side's references entirely from the left
    * output and the other's from the right? With one, Spark plans a hash
    * or sort-merge join — never a nested loop. */
  private def hasEquiKey(j: Join): Boolean = {
    def split(l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
        (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet))
    j.condition.exists(conjuncts(_).exists {
      case EqualTo(l, r) => split(l, r)
      case EqualNullSafe(l, r) => split(l, r)
      case _ => false
    })
  }

  test("every non-equi join in the inventory has a provably bounded side") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val lp = fn(spark, Sf0001).queryExecution.optimizedPlan
          val bad = lp.collect {
            case j: Join if !hasEquiKey(j) &&
                !Seq(j.left, j.right).flatMap(boundOf).exists(_ <= BoundedSide) => j
          }
          BoundedByDomain.get(name) match {
            case Some((expected, reason)) =>
              // whitelisted: the documented joins are legal, but the COUNT is
              // pinned — a new unproven non-equi join on this card still trips
              if (bad.length == expected) None
              else Some(s"$name: whitelisted for $expected unproven non-equi join(s) " +
                s"($reason) but the plan now has ${bad.length}" +
                (if (bad.nonEmpty) s", e.g.\n${bad.head.simpleString(3)}" else ""))
            case None =>
              if (bad.nonEmpty)
                Some(s"$name: ${bad.length} unbounded nested-loop join(s), e.g.\n${bad.head.simpleString(3)}")
              else None
          }
        } catch { case e: Throwable => Some(s"$name: BUILD FAILED: $e") }
    }
    assert(offenders.isEmpty,
      s"nested-loop joins with no provably bounded side:\n${offenders.mkString("\n")}")
  }
}
