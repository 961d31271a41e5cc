package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: guard Jaccard threshold predicates with a cheap
  * size-ratio prefilter.
  *
  * `size(array_intersect(a,b)) / size(array_union(a,b)) >= t` costs a
  * full intersect + union per pair, but Jaccard is bounded by the size
  * ratio: J(A,B) ≤ min(|A|,|B|) / max(|A|,|B|). The rule rewrites the
  * predicate to
  *
  *   size(a) >= t·size(b) AND size(b) >= t·size(a) AND <original>
  *
  * so the O(1) length check short-circuits the O(|A|+|B|) set work for
  * every pair whose sizes already rule it out — on a near-dup candidate
  * join that is most pairs. Semantics are unchanged (the guard is
  * implied by the predicate; NULL arrays yield NULL on both sides).
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

  private def guard(t: Double, x: Expression, y: Expression,
                    legacy: Boolean): Expression =
    GreaterThanOrEqual(
      Cast(Size(x, legacy), DoubleType),
      Multiply(Literal(t, DoubleType), Cast(Size(y, legacy), DoubleType)))

  private def rewrite(cond: Expression): Expression = {
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
            !present.contains(guard(t, a, b, legacy).canonicalized) =>
        And(And(guard(t, a, b, legacy), guard(t, b, a, legacy)), geq)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the predicate lives in a Filter before pushdown and inside the
    // Join condition after it — cover both homes
    case f @ Filter(cond, child) =>
      val rewritten = rewrite(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = rewrite(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }
}
