package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: band a keyless range join into an equi-join.
  *
  * An inner join whose only cross-side predicates are interval bounds —
  * `lo <= t AND t <= hi` with `t` from one side and `lo`/`hi` from the
  * other — has no equi-key, so Spark plans a nested-loop join:
  * quadratic in the corpus, the classic 100 TB scale-killer. The
  * published fix (banding; DuckDB's IEJoin ICDE'15 solves the same
  * problem engine-side) is mechanical: pick a bin width W, give the
  * point side `bin(t) = floor(t/W)` and explode the interval side to
  * `bin(lo)..bin(hi)`, then EQUI-join on the bin and re-check the
  * original predicates. Every qualifying pair meets exactly once —
  * `bin(t)` is single-valued and the interval's bin list is distinct —
  * so no dedup pass is needed, and the rewrite never loses rows because
  * floor is monotone (`lo <= t <= hi` implies
  * `bin(lo) <= bin(t) <= bin(hi)`). q223 applies this rewrite by hand;
  * this rule applies it to any naive `df.join(other, rangeCond)` the
  * user writes, the way Catalyst is meant to be extended
  * (`SparkSessionExtensions.injectOptimizerRule` via
  * [[graft.GraftExtensions]]).
  *
  * Two shapes are recognized, tried in order:
  *  - POINT-IN-INTERVAL: `lo <= t <= hi`, `t` from one side, both
  *    bounds from the other. Point side gets one bin, interval side
  *    explodes; exactly-once because the point's bin is single-valued.
  *  - INTERVAL OVERLAP: `loL <= hiR AND loR <= hiL` (each side bounds
  *    the other). BOTH sides explode their normalized bin ranges and
  *    the dedup conjunct keeps only the first shared bin
  *    (`max(startL, startR)`), so each qualifying pair survives
  *    exactly once.
  *
  * Bin width selection, in order:
  *  1. Static inference: when both bounds are offsets of one shared
  *     base expression (`t BETWEEN base - w1 AND base + w2` — the as-of
  *     / burst-window shape), the interval length `w1 + w2` is known at
  *     plan time and is the provably safe width: every interval spans
  *     at most two bins. (Overlap: both sides must infer; the smaller
  *     length wins.)
  *  2. `spark.graft.rangeJoin.binSize` (positive long, in the column's
  *     own units) for genuinely variable-length intervals, where no
  *     static width exists. The user owns the width/explosion trade:
  *     an interval spans `len/W + 1` bins. The graft harness sessions
  *     default this to 1 h in µs — the engine's event-time unit — so
  *     variable-interval joins over `ts_us` columns band out of the
  *     box; workloads in other units override per session.
  * No width -> no rewrite (the join is left exactly as written).
  *
  * Safety envelope (everything outside it is left untouched):
  *  - Inner/Cross joins only. Semi/anti/outer multiplicity depends on
  *    which side explodes; not worth the asymmetry in v1.
  *  - All three expressions deterministic and integral-typed
  *    (byte/short/int/long — epoch-µs columns are the target; Date and
  *    Timestamp carry unit semantics that a width in "column units"
  *    would silently mis-scale, the round-13 sameShape lesson).
  *  - No existing cross-side equi-conjunct: if one exists Spark already
  *    hash-partitions on it, and the guard doubles as the idempotence
  *    proof — the rewritten join carries a bin equi-conjunct, so the
  *    rule cannot fire twice.
  *  - The whole join condition must be deterministic (same contract as
  *    [[ReorderJoinPredicates]]): the rewrite changes which candidate
  *    pairs a retained conjunct observes.
  *
  * The original condition is retained verbatim under the new bin
  * equality, so bound classification can only ever cost performance,
  * never correctness. NULL bounds fall out for free: a null `t` yields
  * a null bin (joins nothing), a null/inverted interval yields an empty
  * bin array (generates nothing) — exactly the rows the original
  * predicate would have dropped.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledConf = "spark.graft.rangeJoin.enabled"
  private val BinSizeConf = "spark.graft.rangeJoin.binSize"

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(t / w) for literal w >= 1, exact on the full long domain:
    * truncating `div` plus a -1 adjustment on inexact negative
    * quotients. (The `x - pmod(x, w)` form q223 uses inline would
    * underflow near Long.MinValue; the adjustment form cannot —
    * |q| <= |t| and the -1 only applies when q > Long.MinValue.) */
  private def floorDiv(t: Expression, w: Long): Expression = {
    val tt = asLong(t)
    val q  = new IntegralDivide(tt, Literal(w))
    val adjust = If(
      And(LessThan(tt, Literal(0L)),
        Not(EqualTo(new Remainder(tt, Literal(w)), Literal(0L)))),
      Literal(1L), Literal(0L))
    new Subtract(q, adjust)
  }

  /** Decompose `base + literal` / `base - literal` / `base` so the
    * static interval length of a shared-base bound pair is visible. */
  private def baseOffset(e: Expression): (Expression, Option[Long]) = {
    def lit(l: Literal): Option[Long] = l match {
      case Literal(v: Byte, _)  => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Long, _)  => Some(v)
      case _                    => None
    }
    e match {
      case Add(b, l: Literal, _)      => (b, lit(l))
      case Add(l: Literal, b, _)      => (b, lit(l))
      case Subtract(b, l: Literal, _) => (b, lit(l).map(v => -v))
      case _                          => (e, Some(0L))
    }
  }

  /** Interval length when both bounds are literal offsets of one
    * canonicalized base; the provably-safe bin width. */
  private def staticWidth(lo: Expression, hi: Expression): Option[Long] = {
    val (bLo, oLo) = baseOffset(lo)
    val (bHi, oHi) = baseOffset(hi)
    for {
      l <- oLo; h <- oHi
      if bLo.semanticEquals(bHi) && h - l >= 1L
    } yield h - l
  }

  private def confWidth: Option[Long] =
    scala.util.Try(conf.getConfString(BinSizeConf, "0").toLong)
      .toOption.filter(_ >= 1L)

  /** One cross-side bound pair: `lower <= point <= upper` (modulo
    * strictness — the retained original condition enforces it). */
  private case class RangeBounds(
      point: Expression, lower: Expression, upper: Expression,
      pointOnLeft: Boolean)

  /** Interval-overlap bounds: `loL <= hiR AND loR <= hiL` — each side
    * bounds the OTHER side, the classic `[loL,hiL] ∩ [loR,hiR] != ∅`
    * join. Pairing is chosen in condition order (first valid pair of
    * conjuncts); a mis-pairing with an unrelated inequality conjunct
    * stays CORRECT (the retained condition filters, and the two
    * conjuncts alone imply the normalized "intervals" overlap, so no
    * qualifying pair can be lost) but can cost bins — write the
    * interval bounds first. */
  private case class OverlapBounds(
      loL: Expression, hiL: Expression, loR: Expression, hiR: Expression)

  private def extractBounds(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[RangeBounds] = {
    // Normalize every comparison conjunct to (small, large): small <= large.
    val comps: Seq[(Expression, Expression)] = conjuncts.collect {
      case LessThan(a, b)           => (a, b)
      case LessThanOrEqual(a, b)    => (a, b)
      case GreaterThan(a, b)        => (b, a)
      case GreaterThanOrEqual(a, b) => (b, a)
    }
    def usable(e: Expression): Boolean =
      e.deterministic && isIntegral(e.dataType) && e.references.nonEmpty
    val candidates = for {
      (lo, t1) <- comps
      (t2, hi) <- comps
      if t1.semanticEquals(t2)
      if usable(t1) && usable(lo) && usable(hi)
      pointOnLeft <- Some(canEvaluate(t1, left)).collect {
        case true                           => true
        case _ if canEvaluate(t1, right)    => false
      }
      (iv, intervalPlan) = if (pointOnLeft) (right, right) else (left, left)
      if canEvaluate(lo, intervalPlan) && canEvaluate(hi, intervalPlan)
    } yield RangeBounds(t1, lo, hi, pointOnLeft)
    candidates.headOption
  }

  private def hasCrossSideEqui(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(a, right) && canEvaluate(b, left))
      case EqualNullSafe(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(a, right) && canEvaluate(b, left))
      case _ => false
    }

  /** bin(lo)..bin(hi) as an array expression; inverted or null
    * intervals yield an empty/null array (generate nothing — exactly
    * the rows the original predicate would drop).
    *
    * Sequence is TimeZoneAwareExpression: its `resolved` demands a
    * timezone id, normally filled by the analyzer's ResolveTimeZone —
    * which already ran, so supply it here or the plan validator
    * rejects the rewrite as newly-unresolved. (Pure-long sequences
    * never consult it.) */
  private def binRange(lo: Expression, hi: Expression, w: Long): Expression = {
    val binLo = floorDiv(lo, w)
    val binHi = floorDiv(hi, w)
    If(LessThanOrEqual(binLo, binHi),
      Sequence(binLo, binHi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
  }

  private def explodeBins(bins: Expression, name: String,
      child: LogicalPlan): (AttributeReference, Generate) = {
    val genOut = AttributeReference(name, LongType, nullable = false)()
    (genOut, Generate(Explode(bins), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(genOut),
      child = child))
  }

  /** Point-in-interval rewrite: single bin on the point side, exploded
    * bin range on the interval side; exactly-once because the point's
    * bin is single-valued. */
  private def buildPoint(j: Join, rb: RangeBounds, w: Long): LogicalPlan = {
    val (pointPlan, intervalPlan) =
      if (rb.pointOnLeft) (j.left, j.right) else (j.right, j.left)
    val binAlias = Alias(floorDiv(rb.point, w), "__graft_range_bin")()
    val newPoint = Project(pointPlan.output :+ binAlias, pointPlan)
    val (genOut, newInterval) = explodeBins(
      binRange(rb.lower, rb.upper, w), "__graft_range_bin_gen", intervalPlan)
    val newCond = And(EqualTo(binAlias.toAttribute, genOut), j.condition.get)
    val newJoin =
      if (rb.pointOnLeft) Join(newPoint, newInterval, j.joinType, Some(newCond), j.hint)
      else Join(newInterval, newPoint, j.joinType, Some(newCond), j.hint)
    Project(j.left.output ++ j.right.output, newJoin)
  }

  /** Interval-overlap rewrite: BOTH sides explode their (normalized)
    * bin ranges and pair at every shared bin, so the dedup conjunct
    * keeps only the FIRST shared bin — `max` of the two start bins;
    * shared bins of two overlapping ranges are contiguous from there,
    * so every qualifying pair survives exactly once. Endpoints are
    * normalized with least/greatest because the two overlap conjuncts
    * do not imply lo <= hi per side — an inverted interval still
    * satisfies them, and its normalized span provably covers the
    * match (min(lo,hi) <= lo and hi <= max(lo,hi) on both sides). */
  private def buildOverlap(j: Join, ob: OverlapBounds, w: Long): LogicalPlan = {
    val (nLoL, nHiL) = (Least(Seq(asLong(ob.loL), asLong(ob.hiL))),
      Greatest(Seq(asLong(ob.loL), asLong(ob.hiL))))
    val (nLoR, nHiR) = (Least(Seq(asLong(ob.loR), asLong(ob.hiR))),
      Greatest(Seq(asLong(ob.loR), asLong(ob.hiR))))
    val (genL, leftG) = explodeBins(binRange(nLoL, nHiL, w),
      "__graft_range_bin_genl", j.left)
    val (genR, rightG) = explodeBins(binRange(nLoR, nHiR, w),
      "__graft_range_bin_genr", j.right)
    val firstShared = Greatest(Seq(floorDiv(nLoL, w), floorDiv(nLoR, w)))
    val newCond = And(And(EqualTo(genL, genR), EqualTo(genL, firstShared)),
      j.condition.get)
    Project(j.left.output ++ j.right.output,
      Join(leftG, rightG, j.joinType, Some(newCond), j.hint))
  }

  private def extractOverlap(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[OverlapBounds] = {
    val comps: Seq[(Expression, Expression)] = conjuncts.collect {
      case LessThan(a, b)           => (a, b)
      case LessThanOrEqual(a, b)    => (a, b)
      case GreaterThan(a, b)        => (b, a)
      case GreaterThanOrEqual(a, b) => (b, a)
    }
    def usable(e: Expression): Boolean =
      e.deterministic && isIntegral(e.dataType) && e.references.nonEmpty
    (for {
      (s1, l1) <- comps // loL <= hiR
      (s2, l2) <- comps // loR <= hiL
      if (s1, l1) != (s2, l2)
      if Seq(s1, l1, s2, l2).forall(usable)
      if canEvaluate(s1, left) && canEvaluate(l1, right) &&
        canEvaluate(s2, right) && canEvaluate(l2, left)
    } yield OverlapBounds(loL = s1, hiL = l2, loR = s2, hiR = l1)).headOption
  }

  /** Overlap bin width: static only when BOTH sides' interval lengths
    * are statically known (take the smaller); otherwise the conf. */
  private def overlapWidth(ob: OverlapBounds): Option[Long] =
    (for {
      lL <- staticWidth(ob.loL, ob.hiL)
      lR <- staticWidth(ob.loR, ob.hiR)
    } yield math.min(lL, lR)).orElse(confWidth)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(EnabledConf, "true") != "true") plan
    else plan.transform {
      case j @ Join(left, right, Inner | Cross, Some(cond), _)
          if cond.deterministic && j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasCrossSideEqui(conjuncts, left, right)) j
        else {
          val point = for {
            rb <- extractBounds(conjuncts, left, right)
            w  <- staticWidth(rb.lower, rb.upper).orElse(confWidth)
          } yield buildPoint(j, rb, w)
          lazy val overlap = for {
            ob <- extractOverlap(conjuncts, left, right)
            w  <- overlapWidth(ob)
          } yield buildOverlap(j, ob, w)
          point.orElse(overlap).getOrElse(j)
        }
    }
}
