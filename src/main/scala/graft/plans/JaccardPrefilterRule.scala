package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.WordShinglesExpr

/** Optimizer rule: guard Jaccard threshold predicates with a cheap
  * size-ratio prefilter.
  *
  * `size(array_intersect(a,b)) / size(array_union(a,b)) >= t` costs a
  * full intersect + union per pair, but the SET Jaccard it computes is
  * bounded by the ratio of distinct cardinalities:
  * J(A,B) ≤ min(|A'|,|B'|) / max(|A'|,|B'|) where X' = distinct(X). The
  * rule rewrites the predicate to
  *
  *   size(a) >= t·size(b) AND size(b) >= t·size(a) AND <original>
  *
  * so the O(1) length check short-circuits the O(|A|+|B|) set work for
  * every pair whose sizes already rule it out — on a near-dup candidate
  * join that is most pairs.
  *
  * The raw-length guard is only valid when |X| = |X'|, i.e. the arrays
  * carry no duplicates (array_intersect/array_union both dedupe, so for
  * a=[1], b=[1,1,1], t=0.5 the Jaccard is 1.0 while the raw guard
  * 1 ≥ 0.5·3 would wrongly drop the pair). The rule therefore rewrites
  * ONLY when both array inputs are provably duplicate-free: produced by
  * `array_distinct` or by graft's [[WordShinglesExpr]] (which emits a
  * LinkedHashSet of shingles), traced through Project aliases in the
  * child plan. Anything else is left untouched — a session-wide
  * optimizer rule must never change user-query results.
  *
  * The rule is registered through `spark.experimental.extraOptimizations`
  * or [[graft.expressions.GraftExtensions]]'s injectOptimizerRule path;
  * idempotence is structural — a predicate already carrying its guard
  * (canonicalized comparison) is left untouched, so the fixpoint batch
  * can re-run the rule freely.
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] {

  /** size(x) possibly under the implicit cast to double. */
  private object SizeOf {
    def unapply(e: Expression): Option[(Expression, Boolean)] = e match {
      case Size(c, l) => Some((c, l))
      case Cast(Size(c, l), DoubleType, _, _) => Some((c, l))
      case _ => None
    }
  }

  /** Producing expression per attribute, harvested from every Project
    * alias below the rewritten node (exprIds are plan-unique, so one
    * flat map covers both join sides). Union outputs are EXCLUDED:
    * `Union.output` reuses the FIRST child's exprIds, so following an
    * alias through a union would attribute the first child's
    * (possibly duplicate-free) producer to rows that also flow from
    * the other children un-deduped — the exact unsoundness this rule
    * exists to avoid. */
  private def producers(plan: LogicalPlan): Map[ExprId, Expression] = {
    val unionOutputs = plan.collect {
      case u: Union => u.output.map(_.exprId)
    }.flatten.toSet
    plan.collect { case p: Project =>
      p.projectList.collect {
        case a: Alias if !unionOutputs.contains(a.exprId) =>
          a.exprId -> a.child
      }
    }.flatten.toMap
  }

  /** Conservatively: is `e` an array provably free of duplicate
    * elements? True only for array_distinct and word_shingles (whose
    * eval dedupes via LinkedHashSet), followed through aliases and
    * attribute lineage. Depth-bounded so pathological alias chains
    * cannot stack-overflow the optimizer. */
  private def duplicateFree(e: Expression, prod: Map[ExprId, Expression],
                            depth: Int = 0): Boolean =
    depth < 16 && (e match {
      case _: ArrayDistinct => true
      case _: WordShinglesExpr => true
      case Alias(c, _) => duplicateFree(c, prod, depth + 1)
      case a: AttributeReference =>
        prod.get(a.exprId).exists(duplicateFree(_, prod, depth + 1))
      case _ => false
    })

  private def guard(t: Double, x: Expression, y: Expression,
                    legacy: Boolean): Expression =
    GreaterThanOrEqual(
      Cast(Size(x, legacy), DoubleType),
      Multiply(Literal(t, DoubleType), Cast(Size(y, legacy), DoubleType)))

  private def rewrite(cond: Expression,
                      prod: Map[ExprId, Expression]): Expression = {
    // canonical forms of guards already present — the idempotence set
    val present = cond.collect {
      case g @ GreaterThanOrEqual(Cast(Size(_, _), DoubleType, _, _),
          Multiply(Literal(_, DoubleType),
            Cast(Size(_, _), DoubleType, _, _), _)) => g.canonicalized
    }.toSet
    cond.transformUp {
      // legacySizeOfNull makes size(NULL) = -1, under which the
      // original predicate can PASS a NULL pair ((-1)/(-1) = 1) while
      // the guard would drop it — only rewrite in non-legacy mode,
      // where both sides agree on NULL propagation
      case geq @ GreaterThanOrEqual(
          Divide(SizeOf(ArrayIntersect(a, b), legacy),
            SizeOf(ArrayUnion(a2, b2), _), _),
          Literal(t: Double, DoubleType))
          if !legacy && t > 0.0 &&
            a.semanticEquals(a2) && b.semanticEquals(b2) &&
            duplicateFree(a, prod) && duplicateFree(b, prod) &&
            !present.contains(guard(t, a, b, legacy).canonicalized) =>
        And(And(guard(t, a, b, legacy), guard(t, b, a, legacy)), geq)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the predicate lives in a Filter before pushdown and inside the
    // Join condition after it — cover both homes
    case f @ Filter(cond, child) =>
      val rewritten = rewrite(cond, producers(child))
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = rewrite(cond, producers(j))
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }
}
