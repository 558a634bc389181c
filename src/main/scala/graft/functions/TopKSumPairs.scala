package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sum-then-top-k as ONE aggregate: within each group, sum `n` per
  * distinct `v`, then emit the k (sum, v) pairs with the largest
  * POSITIVE sum (ties broken by smallest v), best-first as
  * `array<struct<ord,v>>` — the same emission shape as
  * [[TopKLongPairs]], so consumers explode identically.
  *
  * The composed alternative it replaces is a three-operator chain over
  * the pre-aggregation rows: `GROUP BY key, v -> SUM(n)` (one hash
  * aggregate building a |key x v| table), an exclusion anti-join, and
  * the per-key top-k heap aggregate — in q206's scoring pipeline that
  * chain walked the 5M-row candidate set three times (48 + 45
  * cumulative task-seconds of aggregation in the round-13 StageMetrics
  * profile) to keep 5 rows per user. This aggregate walks it once: the
  * buffer is an open-addressing long->long map (v -> running sum), so
  * update is a single map upsert, and the top-k heap runs at EVAL time
  * over the ~|candidates-per-key| final entries only.
  *
  * Entries whose total sum is NOT strictly positive are dropped before
  * the top-k cut. That rule is the fusion hook for exclusion-list
  * semantics: a caller unions "tombstone" rows carrying a large
  * negative n (more negative than any real total can reach) for every
  * (key, v) it wants excluded, and the summed entry sinks below zero —
  * exactly a NOT EXISTS against the tombstone set, evaluated inside
  * the aggregation instead of as a separate anti-join pass. With only
  * positive inputs the rule is vacuous and the result equals
  * sum-then-top-k verbatim.
  *
  * State is O(distinct v per key) per group — bounded by the candidate
  * fan-out the caller constructs (q206: <= 10 x train-parts-per-user),
  * never by the corpus. Rows where either child is NULL are skipped,
  * mirroring how GROUP BY v drops no rows but SUM(NULL) contributes
  * nothing and a NULL v never ranks in a k << n cut.
  */
case class TopKSummedLongPairs(
    valChild: Expression,
    numChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]]
  with ImplicitCastInputTypes {

  require(k > 0, "topk_sum requires k > 0")

  override def children: Seq[Expression] = Seq(valChild, numChild)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  // Same fractional-input guard as TopKLongPairs: an implicit
  // double->long cast would silently truncate the summed weights.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.expressions.{BRound, Cast, Round}
    def isFractional(dt: DataType): Boolean = dt == DoubleType ||
      dt == FloatType || dt.isInstanceOf[DecimalType]
    val fractional = children.collectFirst {
      case c: Cast if isFractional(c.child.dataType) &&
          !(c.child.isInstanceOf[Round] || c.child.isInstanceOf[BRound]) =>
        c.child.dataType
    }
    fractional match {
      case Some(dt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk_sum requires integral v/n columns; a " +
          s"${dt.catalogString} input would silently truncate — state " +
          "the rounding first (e.g. CAST(round(x * 1000) AS BIGINT))")
      case None => super.checkInputDataTypes()
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  // Primitive fast path (round-17, guide §1.2 "per-task work"): after
  // binding, plain column children are BoundReferences, and the generic
  // Expression.eval boxes a java.lang.Long per child PER ROW — q206's
  // scoring pass feeds ~5.9M rows through this update at sf0.1, where
  // the fused aggregate IS the stage. Read the long directly off the
  // UnsafeRow when both children are long-typed bound refs; any other
  // shape (cast, expression) keeps the generic path. Semantics are
  // identical — null checks mirror eval's null contract.
  @transient private lazy val fastOrdinals: (Int, Int) = (valChild, numChild) match {
    case (a: org.apache.spark.sql.catalyst.expressions.BoundReference,
          b: org.apache.spark.sql.catalyst.expressions.BoundReference)
        if a.dataType == LongType && b.dataType == LongType =>
      (a.ordinal, b.ordinal)
    case _ => (-1, -1)
  }

  override def update(buf: scala.collection.mutable.LongMap[Long],
      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val (vi, ni) = fastOrdinals
    if (vi >= 0) {
      if (!input.isNullAt(vi) && !input.isNullAt(ni)) {
        val key = input.getLong(vi)
        buf(key) = TopKSummedLongPairs.addSat(
          buf.getOrElse(key, 0L), input.getLong(ni))
      }
    } else {
      val v = valChild.eval(input)
      val n = numChild.eval(input)
      if (v != null && n != null) {
        val key = v.asInstanceOf[Long]
        buf(key) = TopKSummedLongPairs.addSat(
          buf.getOrElse(key, 0L), n.asInstanceOf[Long])
      }
    }
    buf
  }

  override def merge(a: scala.collection.mutable.LongMap[Long],
      b: scala.collection.mutable.LongMap[Long]): scala.collection.mutable.LongMap[Long] = {
    b.foreachEntry((v, n) => a(v) = TopKSummedLongPairs.addSat(a.getOrElse(v, 0L), n))
    a
  }

  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    // k-bounded heap over the final per-v sums; positive totals only.
    val heap = scala.collection.mutable.PriorityQueue
      .empty[(Long, Long)](TopKLongPairs.worstFirst)
    buf.foreachEntry { (v, s) =>
      if (s > 0L) {
        val e = (s, v)
        if (heap.size < k) heap.enqueue(e)
        else if (TopKLongPairs.worstFirst.compare(e, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(e)
        }
      }
    }
    val arr = heap.toArray.sorted(TopKLongPairs.worstFirst)
    new GenericArrayData(arr.map(t => InternalRow(t._1, t._2): Any))
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (v, n) => bb.putLong(v); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKSummedLongPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSummedLongPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSummedLongPairs =
    copy(valChild = newChildren(0), numChild = newChildren(1))
  override def prettyName: String = "graft_topk_sum"
}

object TopKSummedLongPairs {

  /** A tombstone weight no real total can cross back above zero: any
    * true summed weight is bounded far below |Long.MinValue / 4|, so
    * a tombstone row per (key, v) forces that entry's total negative
    * and the positive-total eval filter drops it. Because the running
    * sum is SATURATING (see [[addSat]]), duplicated tombstones for the
    * same (key, v) clamp at Long.MinValue instead of wrapping to a
    * large positive total — callers need not deduplicate the exclusion
    * set (round-13 ADVICE: the public graft_topk_sum surface must be
    * misuse-safe, not just safe for q206's one-tombstone wiring). */
  val Tombstone: Long = Long.MinValue / 4

  /** Saturating long addition: overflow clamps to Long.MaxValue /
    * Long.MinValue rather than wrapping. Real q206-scale totals sit far
    * from the clamp, so saturation only ever engages on stacked
    * tombstones — where clamping preserves exactly the "stays negative"
    * contract the exclusion rule needs. */
  def addSat(a: Long, b: Long): Long = {
    val s = a + b
    // overflow iff operands share a sign and the sum flipped it
    if (((a ^ s) & (b ^ s)) < 0L) { if (a >= 0L) Long.MaxValue else Long.MinValue }
    else s
  }

  /** Aggregate Column: per distinct v, sum n; emit top-k positive
    * (sum, v) pairs by (sum desc, v asc) as array<struct<ord,v>>. */
  def topkSum(v: Column, n: Column, k: Int): Column =
    GraftBridge.column(
      TopKSummedLongPairs(GraftBridge.expression(v), GraftBridge.expression(n), k)
        .toAggregateExpression())
}
