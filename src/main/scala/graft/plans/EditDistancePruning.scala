package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: bound-prune edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` costs O(|a|·|b|) per row; its cheapest lower
  * bound — `abs(length(a) - length(b))` — costs O(1). Since
  * `lev(a, b) >= abs(len(a) - len(b))` always holds, prepending the
  * length guard as a conjunct is semantics-preserving, and because
  * `AND` short-circuits in generated code, rows that fail the length
  * check never run the dynamic program. On a blocked fuzzy join the
  * guard prunes most candidate pairs before the expensive comparison —
  * at 100 TB this is the difference between "DP on every candidate"
  * and "DP on length-plausible candidates".
  *
  * Registered two ways: `GraftExtensions` injects it at session build
  * (`spark.sql.extensions`), and a live session can opt in via
  * `spark.experimental.extraOptimizations`. The rewrite is idempotent —
  * a guard that is already present (semantically) is not added again —
  * so it is safe under fixed-point rule batches.
  */
object EditDistancePruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap(guardFor)
        .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter((guards ++ conjuncts).reduceLeft(And), child)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  /** Length-difference lower-bound guard for a distance predicate, if
    * `e` is one. Mirrored literal-first forms included; the guard keeps
    * the original comparison's strictness. */
  private def guardFor(e: Expression): Option[Expression] = e match {
    case LessThanOrEqual(lev: Levenshtein, k @ Literal(_, _)) =>
      Some(LessThanOrEqual(lengthGap(lev), k))
    case LessThan(lev: Levenshtein, k @ Literal(_, _)) =>
      Some(LessThan(lengthGap(lev), k))
    case GreaterThanOrEqual(k @ Literal(_, _), lev: Levenshtein) =>
      Some(LessThanOrEqual(lengthGap(lev), k))
    case GreaterThan(k @ Literal(_, _), lev: Levenshtein) =>
      Some(LessThan(lengthGap(lev), k))
    case _ => None
  }

  private def lengthGap(lev: Levenshtein): Expression =
    Abs(Subtract(Length(lev.left), Length(lev.right)))
}
