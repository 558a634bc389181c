package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences,
  Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
  Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Broadcast variant of the native as-of join (round-11 verdict item 2).
  *
  * The sort-merge [[AsOfJoinExec]] demands `ClusteredDistribution` on
  * BOTH children — the right plan for fact-to-fact as-of, but a 100 TB
  * fact as-of-joining a dimension-sized right side would pay a full
  * fact shuffle + sort that a broadcast hash join in the same position
  * would not. This operator is the broadcast-hash-join analogue: the
  * small right side broadcasts once (`IdentityBroadcastMode`, like
  * BroadcastNestedLoopJoinExec), each executor builds ONE per-key index
  * of time-sorted candidate arrays, and every left row resolves its
  * match with a binary search — **no left exchange, no left sort, left
  * ordering and partitioning pass straight through**. AQE inserts the
  * usual `BroadcastQueryStageExec`; the left side stays wherever its
  * scan put it.
  *
  * Selection is stats-based in [[AsOfJoinStrategy]] (the honest
  * left-rows × width statistics make the right side's estimate
  * trustworthy): right side under `spark.sql.autoBroadcastJoinThreshold`
  * AND all five key/time/tie columns long-backed → broadcast; otherwise
  * the co-partitioned merge. `spark.graft.asof.broadcast` = never|force
  * overrides for tests and for operators who know better. The same
  * query can therefore plan broadcast at one scale and shuffle at
  * 100×, exactly like Spark's own join selection — AsOfJoinSpec
  * differential-tests the two operators on identical inputs.
  *
  * Match semantics are identical to [[AsOfJoinExec]] (backward /
  * forward / nearest, tolerance, plain-join NULL rules, ties by the
  * sort on (time, tie)): per key the candidates sort by (time asc, tie
  * asc), so "last index with time <= t" IS the backward match (largest
  * tie among equal times) and "first index with time > t" IS the
  * forward match (smallest tie) — the merge loop's tie rules fall out
  * of the same order the merge sorts by.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, dir: AsOfDirection,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the whole point: the left side is untouched — partitioning AND
  // ordering pass through, so a downstream op that liked the scan's
  // layout still likes it
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // strategy guarantees long-backed shapes (it falls back to the
    // merge exec otherwise), so all five binds succeed
    def at(e: Expression, out: Seq[Attribute]): AsOfJoinExec.LongAt =
      AsOfJoinExec.longAt(BindReferences.bindReference(e, out)).getOrElse(
        throw new IllegalStateException(
          s"broadcast as-of planned over a non-long-backed column: $e"))
    val lk = at(leftKey, left.output)
    val lt = at(leftTime, left.output)
    val rk = at(rightKey, right.output)
    val rt = at(rightTime, right.output)
    val tie = at(rightTie, right.output)
    val d = dir
    val tol = tolerance
    val attrs = output
    val nRight = right.output.size
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val rel = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIter =>
      val index = BroadcastAsOfJoinExec.indexFor(rel.value, rk, rt, tie)
      val emit = new AsOfJoinExec.Emit(new JoinedRow,
        new GenericInternalRow(nRight), UnsafeProjection.create(attrs, attrs),
        outRows, matched)
      val fwd = d == AsOfDirection.Forward
      val nearest = d == AsOfDirection.Nearest
      val hasTol = tol.isDefined
      val tolD = tol.getOrElse(0L)
      lIter.map { l =>
        var m: InternalRow = null
        if (!lk.isNull(l) && !lt.isNull(l)) {
          val g = index.get(lk.get(l))
          if (g != null) {
            val t = lt.get(l)
            // first index with time > t: forward candidate; the slot
            // before it is the backward candidate (see class doc for
            // why this encodes both tie rules)
            val fi = g.upperBound(t)
            val bi = fi - 1
            def inTol(diff: Long): Boolean =
              !hasTol || (diff >= 0 && diff <= tolD)
            if (fwd) {
              if (fi < g.times.length && inTol(g.times(fi) - t))
                m = g.rows(fi)
            } else if (nearest) {
              // distances compare UNSIGNED, ties toward backward —
              // same rule as both merge loops
              val bwOk = bi >= 0 && inTol(t - g.times(bi))
              val fwOk = fi < g.times.length && inTol(g.times(fi) - t)
              if (bwOk && (!fwOk || java.lang.Long.compareUnsigned(
                  t - g.times(bi), g.times(fi) - t) <= 0)) m = g.rows(bi)
              else if (fwOk) m = g.rows(fi)
            } else if (bi >= 0 && inTol(t - g.times(bi)))
              m = g.rows(bi)
          }
        }
        emit(l, m)
      }
    }, preservesPartitioning = true)
  }
}

object BroadcastAsOfJoinExec {

  /** One key's candidates: parallel arrays sorted by (time, tie). The
    * times array is scanned by binary search; rows are the full right
    * rows (broadcast copies — safe to hand out, never mutated). */
  final class Group(val times: Array[Long], val rows: Array[InternalRow]) {
    /** First index with times(i) > t (all-<= → length). Duplicates safe:
      * returns the index AFTER the last t-valued slot. */
    def upperBound(t: Long): Int = {
      var lo = 0
      var hi = times.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (times(mid) <= t) lo = mid + 1 else hi = mid
      }
      lo
    }
  }

  /** Index build is O(n log n) in the BROADCAST side only — dimension
    * work, never fact work. Built once per executor per broadcast: the
    * cache is keyed weakly on the broadcast value array itself, so
    * repeated partitions (32 tasks on one executor, or a reused
    * broadcast across stages) share one build and the index dies with
    * the broadcast. */
  private val cache =
    new java.util.WeakHashMap[AnyRef, java.util.HashMap[Long, Group]]

  def indexFor(rows: Array[InternalRow], rk: AsOfJoinExec.LongAt,
      rt: AsOfJoinExec.LongAt,
      tie: AsOfJoinExec.LongAt): java.util.HashMap[Long, Group] =
    cache.synchronized {
      val hit = cache.get(rows)
      if (hit != null) hit
      else {
        val built = build(rows, rk, rt, tie)
        cache.put(rows, built)
        built
      }
    }

  private def build(rows: Array[InternalRow], rk: AsOfJoinExec.LongAt,
      rt: AsOfJoinExec.LongAt,
      tie: AsOfJoinExec.LongAt): java.util.HashMap[Long, Group] = {
    // NULL key or NULL time rows are never candidates (same rule the
    // merge applies while advancing); NULL tie sorts first like the
    // merge's ascending NULLS FIRST sort would place it
    val valid = rows.filter(r => !rk.isNull(r) && !rt.isNull(r))
    java.util.Arrays.sort(valid, new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        val c1 = java.lang.Long.compare(rk.get(a), rk.get(b))
        if (c1 != 0) return c1
        val c2 = java.lang.Long.compare(rt.get(a), rt.get(b))
        if (c2 != 0) return c2
        val an = tie.isNull(a); val bn = tie.isNull(b)
        if (an && bn) 0
        else if (an) -1
        else if (bn) 1
        else java.lang.Long.compare(tie.get(a), tie.get(b))
      }
    })
    val out = new java.util.HashMap[Long, Group]
    var i = 0
    val n = valid.length
    while (i < n) {
      val k = rk.get(valid(i))
      var j = i + 1
      while (j < n && rk.get(valid(j)) == k) j += 1
      val times = new Array[Long](j - i)
      val grp = new Array[InternalRow](j - i)
      var p = i
      while (p < j) { times(p - i) = rt.get(valid(p)); grp(p - i) = valid(p); p += 1 }
      out.put(k, new Group(times, grp))
      i = j
    }
    out
  }
}
