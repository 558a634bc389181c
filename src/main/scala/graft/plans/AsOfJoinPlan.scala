package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan,
  Statistics}
import org.apache.spark.sql.catalyst.plans.logical.statsEstimation.EstimationUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension ladder (SURVEY §2.10 tier (c)): a
  * NATIVE distributed as-of join — logical node, planner strategy and
  * physical sort-merge operator — replacing the equi-join + rank-1
  * window composition q10/q69 shipped through round 9.
  *
  * Why a custom operator instead of the composition: the window form
  * materializes EVERY (left, right-candidate) pair before the rank-1
  * filter — per-key fan-out that is quadratic in events-per-user — and
  * then pays a second full sort for the window. This operator is the
  * plan a native engine would pick: co-partition both sides on the key
  * (the same exchange a shuffle join needs), sort each side once within
  * partitions ((key, time) left; (key, time, tie) right), and emit each
  * left row's match in ONE forward merge pass — O(n log n) in the sort,
  * O(n) in the scan, zero pair fan-out, no second window sort. At 100 TB
  * the composition's intermediate pair set is the difference between a
  * job that finishes and one that doesn't.
  *
  * Semantics (both directions LEFT OUTER, null-extended on no match):
  *  - backward: latest right row with rTime <= lTime; ties on rTime
  *    broken toward the LARGEST rightTie (matches `ORDER BY t DESC,
  *    tie DESC ... rn = 1`).
  *  - forward: earliest right row with rTime > lTime; ties broken toward
  *    the SMALLEST rightTie (matches `ORDER BY t ASC, tie ASC ... rn=1`).
  * Equi-key NULL semantics match a plain join: a NULL key or NULL left
  * time never matches; right rows with NULL key or time are skipped.
  *
  * `tolerance` (the bound every mature as-of implementation exposes —
  * pandas merge_asof, kdb wj, QuestDB ASOF ... TOLERANCE) caps the
  * match distance IN THE TIME COLUMN'S PHYSICAL UNITS (µs for
  * timestamps): backward additionally requires rTime >= lTime - tol,
  * forward rTime <= lTime + tol. Emit-time check only — a candidate
  * that falls out of tolerance for one left row can never re-enter for
  * a later (larger-time) row in backward mode, so the merge pass and
  * its O(1) memory are unchanged. Integral time columns only.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, forward: Boolean,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Honest cardinality: a LEFT OUTER as-of emits EXACTLY one row per
  // left row. BinaryNode's default size visitor multiplies the
  // children's sizes (the safe guess for an unconstrained join), which
  // at scale poisons every broadcast/AQE decision DOWNSTREAM of an
  // as-of output — a few-MB result estimated at |left|×|right| bytes
  // is never broadcast and always sort-merge-joined. Estimate instead
  // as left rows × combined row width (rowCount-based when the left
  // carries one, else scaling the left's byte size by the width ratio).
  override def maxRows: Option[Long] = left.maxRows
  override def maxRowsPerPartition: Option[Long] = left.maxRowsPerPartition
  override def stats: Statistics = {
    val ls = left.stats
    val leftW = EstimationUtils.getSizePerRow(left.output).max(1)
    val outW = EstimationUtils.getSizePerRow(output).max(1)
    val size = ls.rowCount match {
      case Some(rc) => EstimationUtils.getOutputSize(output, rc)
      case None => (ls.sizeInBytes * outW / leftW).max(1)
    }
    Statistics(sizeInBytes = size, rowCount = ls.rowCount)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. Registered per-session via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or at
  * runtime through `experimental.extraStrategies` (AsOfJoin.ensureOn). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, fwd,
        tol) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join.
  *
  * Distribution/ordering contract: both children clustered on their key
  * (EnsureRequirements co-partitions them exactly as it would a
  * sort-merge join — one hash exchange per side, reused if the input is
  * already partitioned that way) and sorted within partitions; the merge
  * is then a single forward pass per partition with ONE buffered
  * lookahead row — no per-key buffering, so memory is O(1) per task
  * regardless of key skew (a hot key costs time, never heap).
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, forward: Boolean,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // standard operator citizenship: per-node SQL metrics (UI / explain
  // with statistics); matched vs output tells the null-extension rate
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // key-clustered, (key, time)-sorted output: downstream equi-key ops
  // reuse the exchange; a final global orderBy still sorts (as it must)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val fwd = forward
    val tol = tolerance
    // tolerance bounds need time ARITHMETIC, not just ordering — the
    // API restricts it to integral-backed time columns (long/int
    // physical values; TimestampType evals to epoch-µs longs)
    def timeLong(v: Any): Long = v match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case s: java.lang.Short => s.longValue
      case b: java.lang.Byte => b.longValue
      case other => throw new IllegalStateException(
        s"as-of tolerance requires an integral time column, got $other")
    }
    val attrs = output
    val nRight = right.output.size
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    // zipPartitions is safe here: EnsureRequirements satisfied both
    // ClusteredDistributions with compatible same-count partitionings,
    // and under AQE both child exchanges sit in one coalesce group
    // (binary nodes don't split groups — only Union does), so
    // CoalesceShufflePartitions assigns them the same coalesced spec.
    // Guard it anyway with an actionable message: a silent misjoin is
    // impossible (zip would throw), but zip's own error names neither
    // the operator nor the likely cause.
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children diverged to ${lRdd.getNumPartitions}/" +
      s"${rRdd.getNumPartitions} partitions — co-partitioning violated " +
      "(AQE coalescing divergence?); rerun with " +
      "spark.sql.adaptive.coalescePartitions.enabled=false to confirm")
    lRdd.zipPartitions(rRdd, preservesPartitioning = true) {
      (lIter, rIter) =>
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(nRight)
        val proj = UnsafeProjection.create(attrs, attrs)
        val rBuf = rIter.buffered
        new Iterator[InternalRow] {
          // the one remembered candidate (backward direction), valid for
          // curKey only; rows from the buffered iterator are reused
          // mutable buffers, so retaining one requires copy()
          private var curKey: Any = null
          private var haveKey = false
          private var lastMatch: InternalRow = null
          private var lastMatchTime: Any = null
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val k = lKeyB.eval(l)
            val t = lTimeB.eval(l)
            var m: InternalRow = null
            if (k != null && t != null) {
              if (!haveKey || keyOrd.compare(k, curKey) != 0) {
                // new left key: drop the old candidate, advance the right
                // side past smaller (or NULL — they sort first) keys
                curKey = k; haveKey = true; lastMatch = null
                lastMatchTime = null
                var adv = true
                while (adv && rBuf.hasNext) {
                  val rk = rKeyB.eval(rBuf.head)
                  if (rk == null || keyOrd.compare(rk, k) < 0) rBuf.next()
                  else adv = false
                }
              }
              // consume same-key rows with time <= left time (NULL right
              // times sort first and never match in either direction)
              var adv = true
              while (adv && rBuf.hasNext) {
                val h = rBuf.head
                val rk = rKeyB.eval(h)
                if (rk != null && keyOrd.compare(rk, k) == 0) {
                  val rt = rTimeB.eval(h)
                  if (rt == null) rBuf.next()
                  else if (timeOrd.compare(rt, t) <= 0) {
                    if (!fwd) { lastMatch = h.copy(); lastMatchTime = rt }
                    rBuf.next()
                  } else adv = false
                } else adv = false
              }
              if (fwd) {
                // first same-key row strictly after t, if any — within
                // t + tol when a tolerance bounds the look-ahead.
                // Overflow-safe form: the candidate satisfies rt > t, so
                // the true distance rt - t is positive; if the Long
                // subtraction wraps (distance > Long.MaxValue, e.g. a
                // MaxValue sentinel vs a negative epoch) it wraps
                // NEGATIVE, and `0 <= diff <= d` correctly rejects it —
                // unlike `rt <= t + d`, where t + d itself can overflow
                // and silently flip the comparison.
                if (rBuf.hasNext) {
                  val h = rBuf.head
                  val rk = rKeyB.eval(h)
                  if (rk != null && keyOrd.compare(rk, k) == 0 &&
                      tol.forall { d =>
                        val diff = timeLong(rTimeB.eval(h)) - timeLong(t)
                        diff >= 0 && diff <= d
                      })
                    m = h
                }
              } else if (lastMatch != null &&
                  tol.forall { d =>
                    // same overflow-safe form: lastMatchTime <= t, so the
                    // true distance t - lastMatchTime is >= 0 and a
                    // wrapped subtraction is always negative
                    val diff = timeLong(t) - timeLong(lastMatchTime)
                    diff >= 0 && diff <= d
                  })
                m = lastMatch
            }
            outRows += 1
            if (m != null) matched += 1
            proj(joined(l, if (m == null) nullRight else m))
          }
        }
    }
  }
}
