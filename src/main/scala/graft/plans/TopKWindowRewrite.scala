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
  *     window sort), the window formulation is kept. The same bound also
  *     consults RUNTIME evidence ([[TopKRuntimeFeedback]]): a prior
  *     execution of the same canonical query records its partial pass's
  *     observed key population, so an un-ANALYZEd 1M-key table keeps
  *     the native window from the second planning on. Absent BOTH kinds
  *     of evidence the rewrite still fires: the partial key cap bounds
  *     the downside to that measured constant factor, while vetoing on
  *     a mere rowCount proxy would forfeit the 1.8× win in the common
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
    * operator. Uses only positive evidence, from either rung of the
    * statistics ladder:
    *
    *   - CATALOG: the product of the known column distinct counts
    *     (ANALYZE … FOR COLUMNS + CBO) is a lower bound on the combined
    *     cardinality (unknown columns can only raise it), so exceeding
    *     the bound is a sound veto;
    *   - OBSERVED ([[TopKRuntimeFeedback]]): a prior EXECUTION of this
    *     same canonical query recorded its partial pass's actual key
    *     population — the un-ANALYZEd 1M-key regime self-corrects after
    *     one run, keeping the native window from the second planning on.
    *
    * With neither, the rewrite proceeds: the partial key cap bounds the
    * downside to the measured 0.9× constant (see class doc). */
  private def keyCardinalityVeto(part: Seq[Expression], child: LogicalPlan,
      fp: Long): Boolean = {
    val bound = BigInt(conf.getConfString(MaxKeysConfKey,
      TopKPerKey.DefaultMaxPartialKeys.toString))
    // observed evidence persists across sessions: load the warehouse
    // ledger (once per JVM) before consulting it, unless disabled
    if (conf.getConfString(TopKRuntimeFeedback.LedgerEnabledKey, "true").toBoolean)
      try {
        val maxAgeMs = 3600000L * conf.getConfString(
          TopKRuntimeFeedback.LedgerMaxAgeHoursKey,
          TopKRuntimeFeedback.DefaultLedgerMaxAgeHours.toString).toLong
        val hc = org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sessionState.newHadoopConf())
          .getOrElse(new org.apache.hadoop.conf.Configuration())
        TopKRuntimeFeedback.ensureLoaded(conf.warehousePath, hc, maxAgeMs)
      } catch { case scala.util.control.NonFatal(_) => }
    val known = part.flatMap {
      case a: Attribute => child.stats.attributeStats.get(a).flatMap(_.distinctCount)
      case _ => None
    }
    (known.nonEmpty && known.product > bound) ||
      TopKRuntimeFeedback.observedKeys(fp).exists(BigInt(_) > bound)
  }

  /** Canonical identity of a top-k site — the [[TopKRuntimeFeedback]]
    * key: the canonicalized partition keys plus the canonicalized LEAF
    * relations under the window. Deliberately NOT the whole child plan:
    * the same query optimizes to slightly different child trees inside a
    * bare read vs a write command (projection/ordering wrappers), and a
    * whole-tree hash would never match across them. Keys + sources is
    * what the cardinality evidence is ABOUT; coarser matching means a
    * re-filtered variant of a vetoed query inherits the veto — the
    * conservative direction (it keeps the native window, the
    * bounded-downside formulation). */
  private def fingerprintOf(part: Seq[Expression], child: LogicalPlan): Long = {
    // attributes key by NAME: expression ids are per-construction and an
    // isolated canonicalization keeps them, so they can never match
    // across two builds of the same query. Name collisions (self-joins)
    // only make the key coarser — the conservative direction.
    val partH = 41L * part.map {
      case a: Attribute => a.name
      case e => e.sql
    }.hashCode()
    child.collectLeaves().foldLeft(partH)((acc, l) => acc * 31L + leafId(l))
  }

  /** Structural identity of a leaf relation. A plain canonicalized hash
    * is NOT stable across separate reads of the same source — a file
    * relation's hash includes its file-index instance (identity hash) —
    * so file scans key on (root paths, schema) and DSv2 tables on
    * (table name, schema); anything else falls back to the canonical
    * hash (LocalRelation data is content-hashed there). */
  private def leafId(l: LogicalPlan): Long = l match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          (fs.location.rootPaths.map(_.toString), fs.dataSchema.catalogString).hashCode().toLong
        case other => (other.getClass.getName, other.schema.catalogString).hashCode().toLong
      }
    case dsv2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      (dsv2.table.name(), dsv2.schema.catalogString).hashCode().toLong
    case other => other.canonicalized.semanticHash().toLong
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
            !keyCardinalityVeto(part, wchild, fingerprintOf(part, wchild)) =>
        val k = extractK(cond, al.toAttribute).get
        val child = wchild match {
          // the group-limit pre-filter is subsumed by the heap operator
          case wgl: WindowGroupLimit => wgl.child
          case other => other
        }
        Project(projList, TopKPerKey(part, order, k, child,
          fingerprint = Some(fingerprintOf(part, wchild))))
    }
  }
}
