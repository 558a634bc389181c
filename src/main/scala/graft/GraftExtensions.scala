package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, NfcNormalize, TopKLongPairs, TopKSummedLongPairs}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use, so `spark.sql("SELECT graft_dot(a, b) ...")`
  * works in any session built with `.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions` — the standard
  * library-integration path for a cluster deployment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
    // Unicode canonical normalization for encoding-robust dedup keys:
    // `SELECT graft_nfc(text) ...`
    e.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children(0))))
    // k-bounded-heap top-k-per-group aggregate:
    // `SELECT key, graft_topk_pairs(ord, v, 10) ... GROUP BY key`
    e.injectFunction((
      new FunctionIdentifier("graft_topk_pairs"),
      new ExpressionInfo(classOf[TopKLongPairs].getName, "graft_topk_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKLongPairs(children(0), children(1),
          TopKLongPairs.literalK(children(2)))))
    // fused sum-then-top-k-per-group aggregate (positive totals only —
    // the tombstone-exclusion hook, see the class scaladoc):
    // `SELECT key, graft_topk_sum(v, n, 5) ... GROUP BY key`
    e.injectFunction((
      new FunctionIdentifier("graft_topk_sum"),
      new ExpressionInfo(classOf[TopKSummedLongPairs].getName, "graft_topk_sum"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKSummedLongPairs(children(0), children(1),
          TopKLongPairs.literalK(children(2)))))
    // keyless range joins (point-in-interval / band / interval-overlap
    // predicates) become banded equi-joins instead of nested-loop
    // joins — q223's manual rewrite, applied automatically to naive
    // join conditions. Injected BEFORE ReorderJoinPredicates: bound
    // extraction prefers the user's conjunct order, which the
    // cost-reorder below would otherwise scramble within the same
    // fixed-point batch.
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // cheap-conjuncts-first join conditions (see the rule's scaladoc for
    // the measured misplan motivating it)
    e.injectOptimizerRule(_ => graft.plans.ReorderJoinPredicates)
    // native as-of join (whole-operator ladder: AsOfJoinPlan ->
    // AsOfJoinStrategy -> AsOfJoinExec); running sessions can also get
    // it via AsOfJoin.ensureOn (experimental.extraStrategies)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL surface for the native as-of join:
    // SELECT * FROM graft_asof(backward, lview, rview,
    //   lk, rk, lt, rt, tie[, tolerance])   -- or string literals
    e.injectTableFunction((
      new FunctionIdentifier("graft_asof"),
      new ExpressionInfo(graft.plans.AsOfJoin.getClass.getName, "graft_asof"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.plans.AsOfJoin.sqlBuilder(children)))
    // identifier-style graft_asof arguments: the analyzer resolves a
    // TVF only once every argument expression is resolved, and a bare
    // identifier parses as an UnresolvedAttribute that nothing can
    // resolve (there is no input row). Rewrite such args to string
    // literals first (same fixed-point batch), so users can write
    // table/column references the way every other TVF takes them.
    e.injectResolutionRule(_ => GraftExtensions.AsOfTvfIdentifierArgs)
  }
}

object GraftExtensions {

  /** Turns bare-identifier graft_asof arguments into string literals
    * before the built-in TVF resolution runs (it requires resolved
    * args). Dotted identifiers keep their parts quoted so multipart
    * references round-trip. Only active in sessions built WITH
    * GraftExtensions — the runtime [[register]] path cannot inject
    * analyzer rules, so there graft_asof takes string literals only. */
  object AsOfTvfIdentifierArgs
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
      UnresolvedTableValuedFunction}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp {
        case u: UnresolvedTableValuedFunction
            if u.name.map(_.toLowerCase(java.util.Locale.ROOT))
              .lastOption.contains("graft_asof") =>
          u.copy(functionArgs = u.functionArgs.map {
            case ua: UnresolvedAttribute =>
              Literal(graft.plans.AsOfJoin.quoteNameParts(ua.nameParts))
            case other => other
          })
      }
  }

  /** Register the same functions on an already-running session (the
    * extensions path only applies at session build time; graft_asof
    * then accepts string-literal arguments only — identifier-style
    * args need the analyzer rule GraftExtensions injects at build). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk_pairs",
      exprs => TopKLongPairs(exprs(0), exprs(1),
        TopKLongPairs.literalK(exprs(2))),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk_sum",
      exprs => TopKSummedLongPairs(exprs(0), exprs(1),
        TopKLongPairs.literalK(exprs(2))),
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_asof", exprs => graft.plans.AsOfJoin.sqlBuilder(exprs),
      "scala_udf")
  }
}
