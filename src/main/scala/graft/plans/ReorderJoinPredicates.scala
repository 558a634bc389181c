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
  * ANSI-mode caveat: under `spark.sql.ansi.enabled` (the Spark 4
  * default) AND is commutative only over RESULTS, not ERRORS — a cheap
  * throwing conjunct (division, strict cast, element_at) hoisted ahead
  * of a larger guarding conjunct (`y IN (1,2) AND 100/y > 10`) would
  * turn a succeeding query into a runtime error. `deterministic` does
  * not exclude throwing expressions, so the rule simply does not fire
  * when ANSI mode is on — conjunct reordering there would need a
  * can-this-throw analysis over every expression kind, and the harness
  * sessions run ANSI-off where the rewrite is unconditionally safe.
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

  override def apply(plan: LogicalPlan): LogicalPlan = if (conf.ansiEnabled) plan else plan.transform {
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
