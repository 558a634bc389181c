package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: evaluate cheap join-condition conjuncts first.
  *
  * Motivated by a measured misplan (q60): Catalyst merges a pushed
  * filter into a nested-loop join condition AHEAD of the cheap key
  * comparison, so `round(graft_dot(va, vb), 4) >= 0.4 AND vec_a < vec_b`
  * evaluated the 64-element dot product for every ORDERED pair — 2× the
  * necessary work, since the `<` test eliminates half the pairs for
  * free. AND is commutative in SQL's three-valued logic and Spark
  * evaluates conjuncts left-to-right, so ordering by expression size
  * (a byte-free proxy for evaluation cost) is semantics-preserving and
  * strictly reduces work whenever selectivity is roughly comparable.
  *
  * Only deterministic conditions are reordered — moving a
  * non-deterministic conjunct would change which rows it observes.
  * The sort is stable, so equal-cost conjuncts keep their user order.
  *
  * Registered via [[graft.GraftExtensions]]; the harness queries do not
  * depend on it (q60 orders its condition manually), it demonstrates
  * the `SparkSessionExtensions` optimizer-injection path with a rule
  * that addresses a real, observed plan defect.
  */
object ReorderJoinPredicates extends Rule[LogicalPlan] with PredicateHelper {

  private def cost(e: Expression): Int = {
    var n = 0
    e.foreach(_ => n += 1)
    n
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, _, Some(cond), _) if cond.deterministic =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.length < 2) j
      else {
        val sorted = conjuncts.sortBy(cost) // stable
        if (sorted == conjuncts) j
        else j.copy(condition = Some(sorted.reduceLeft(And)))
      }
  }
}
