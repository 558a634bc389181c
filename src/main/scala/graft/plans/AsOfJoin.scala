package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DataFrame-level API over the native [[AsOfJoinPlan]] operator.
  *
  * Callers name the key/time/tie columns on each side; both inputs must
  * carry DISJOINT column names (alias before calling — the operator
  * concatenates the schemas like a join, and disjoint names also
  * guarantee disjoint attribute ids, sidestepping the self-join
  * ambiguity the analyzer would otherwise have to dedup).
  */
object AsOfJoin {

  /** Make the strategy available on this session whatever way it was
    * built: `injectPlannerStrategy` only helps sessions constructed
    * with GraftExtensions, so also self-register through
    * `experimental.extraStrategies` (idempotent). */
  def ensureOn(spark: SparkSession): Unit =
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)

  /** Backward as-of: latest `right` row with rightTime <= leftTime per
    * key; ties toward the largest rightTie. Left outer. `tolerance`
    * (time-column units; integral time columns only) additionally
    * requires rightTime >= leftTime - tolerance. */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTime: String, rightTime: String,
      rightTie: String, tolerance: Option[Long] = None): DataFrame =
    build(left, right, leftKey, rightKey, leftTime, rightTime, rightTie,
      forward = false, tolerance)

  /** Forward as-of: earliest `right` row with rightTime > leftTime per
    * key; ties toward the smallest rightTie. Left outer. `tolerance`
    * (time-column units; integral time columns only) additionally
    * requires rightTime <= leftTime + tolerance. */
  def forward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTime: String, rightTime: String,
      rightTie: String, tolerance: Option[Long] = None): DataFrame =
    build(left, right, leftKey, rightKey, leftTime, rightTime, rightTie,
      forward = true, tolerance)

  private def build(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTime: String, rightTime: String,
      rightTie: String, forward: Boolean,
      tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    ensureOn(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val dup = lp.output.map(_.name).toSet intersect rp.output.map(_.name).toSet
    require(dup.isEmpty, s"as-of inputs must have disjoint column names; " +
      s"shared: ${dup.mkString(", ")} — alias one side")
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$n' (has: ${p.output.map(_.name).mkString(", ")})"))
    val lt = attr(lp, leftTime, "left")
    val rt = attr(rp, rightTime, "right")
    if (tolerance.isDefined) {
      import org.apache.spark.sql.types._
      require(tolerance.get >= 0, "as-of tolerance must be >= 0")
      val ok = Set[Any](LongType, IntegerType, ShortType, ByteType,
        TimestampType, TimestampNTZType, DateType)
      require(ok(lt.dataType) && ok(rt.dataType),
        s"as-of tolerance needs integral-backed time columns, got " +
        s"${lt.dataType}/${rt.dataType}")
    }
    GraftBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKey, "left"), attr(rp, rightKey, "right"),
      lt, rt, attr(rp, rightTie, "right"), forward, tolerance))
  }
}
