package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CurrentRow, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrites the ubiquitous window top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *      .filter($"rn" <= k).drop("rn") }}}
  *
  * into the [[TopKPerKey]] whole-operator plan (bounded per-key heaps,
  * partial/final, no partition sort) — so users writing the standard
  * window formulation get the custom operator without knowing it
  * exists. This is the `injectOptimizerRule` integration point
  * (SURVEY.md §7.4), completing the extension ladder: expression →
  * planner strategy → optimizer rewrite.
  *
  * The rewrite fires ONLY when it is semantics-preserving:
  *   - the window computes exactly ONE expression and it is
  *     `row_number()` with the standard running row frame — `rank()` /
  *     `dense_rank()` can emit more than k rows on ties and are NEVER
  *     rewritten;
  *   - the filter is `rn <= k` / `rn < k+1` / `rn = 1` against an
  *     integer literal;
  *   - a Project ABOVE the filter drops the rank column (if the rank is
  *     kept, the operator cannot produce it — the window stays);
  *   - the partition spec is non-empty (a global top-k plans better
  *     through TakeOrderedAndProject) and k ≤ [[TopKWindowRewrite.MaxK]]
  *     (the operator's documented small-k regime; see the crossover
  *     numbers on [[TopKPerKey]]);
  *   - no EVIDENCE of a high-cardinality key space: when column-level
  *     statistics exist on the partition keys (ANALYZE … FOR COLUMNS +
  *     CBO stats propagation), and the product of the known distinct
  *     counts — a LOWER bound on the combined key cardinality — exceeds
  *     `spark.graft.topkRewrite.maxKeyCardinality` (default = the
  *     operator's partial-side key cap, where [[TopKPerKey]]'s own
  *     measurements show the heap degrading to 0.9× of the native
  *     window sort), the window formulation is kept. Absent statistics
  *     the rewrite still fires: the partial key cap bounds the downside
  *     to that measured constant factor, while vetoing on a mere
  *     rowCount proxy would forfeit the 1.8× win in the common
  *     dashboard regime (few keys, many rows).
  *
  * Tie semantics are unchanged: with a non-total ORDER BY, which tied
  * boundary rows survive is arbitrary under BOTH formulations
  * (row_number assigns tied rows arbitrarily); with a total order both
  * are deterministic and identical.
  *
  * If Spark's own `InferWindowGroupLimit` already planted a
  * [[WindowGroupLimit]] under the window, the rewrite strips it — the
  * heap operator subsumes the group-limit's pre-filtering.
  *
  * Disable with `spark.graft.topkRewrite.enabled=false`. */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  val MaxK = 10000

  /** Veto bound on the partition keys' estimated distinct-count product.
    * Default = [[TopKPerKey.DefaultMaxPartialKeys]]: past it the partial
    * pass degrades to passthrough and the measured crossover flips. */
  val MaxKeysConfKey = "spark.graft.topkRewrite.maxKeyCardinality"

  /** True ⇢ statistics PROVE the key space is too wide for the heap
    * operator. Uses only positive evidence: the product of the distinct
    * counts that are known is a lower bound on the combined cardinality
    * (unknown columns can only raise it), so exceeding the bound is a
    * sound veto; with no column stats at all this returns false and the
    * rewrite proceeds (cap-bounded downside, see class doc). */
  private def keyCardinalityVeto(part: Seq[Expression], child: LogicalPlan): Boolean = {
    val bound = BigInt(conf.getConfString(MaxKeysConfKey,
      TopKPerKey.DefaultMaxPartialKeys.toString))
    val known = part.flatMap {
      case a: Attribute => child.stats.attributeStats.get(a).flatMap(_.distinctCount)
      case _ => None
    }
    known.nonEmpty && known.product > bound
  }

  private def extractK(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.topkRewrite.enabled", "true") != "true") return plan
    plan.transformUp {
      case Project(projList, Filter(cond, Window(
            Seq(al @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(part, order,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            _, _, wchild, _)))
          if part.nonEmpty && order.nonEmpty &&
            extractK(cond, al.toAttribute).exists(k => k >= 1 && k <= MaxK) &&
            projList.forall(ne => !ne.exists(_.semanticEquals(al.toAttribute))) &&
            !keyCardinalityVeto(part, wchild) =>
        val k = extractK(cond, al.toAttribute).get
        val child = wchild match {
          // the group-limit pre-filter is subsumed by the heap operator
          case wgl: WindowGroupLimit => wgl.child
          case other => other
        }
        Project(projList, TopKPerKey(part, order, k, child))
    }
  }
}
