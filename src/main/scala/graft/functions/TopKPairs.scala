package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group as ONE aggregate: keep the k (ord, v) pairs
  * with the largest `ord` (ties broken by smallest `v`), emitted
  * best-first as `array<struct<ord,v>>`.
  *
  * The composed alternative — `row_number() OVER (PARTITION BY key
  * ORDER BY ord DESC, v) <= k` — is what it replaces in hot paths.
  * Spark's WindowGroupLimit already trims each map partition to k rows
  * per key before the exchange, so the SHUFFLE volume is comparable;
  * what the window still pays and this aggregate does not is the
  * per-partition SORT on both sides of the exchange (O(n log n) over
  * every candidate row, twice) plus the WindowExec pass itself. The
  * aggregate's buffer is a k-bounded binary heap: O(n log k) updates,
  * O(k) state per group at any scale, and it rides the ordinary
  * partial/final ObjectHashAggregate shape — one hash aggregate where
  * the window form needs sort + shuffle + sort + window.
  *
  * Duplicate (ord, v) pairs are preserved (heap, not set), so the
  * result is row-equivalent to the rank filter even on degenerate
  * inputs; rows where either child is NULL are skipped, mirroring how a
  * DESC sort pushes NULL ord to the bottom of a rank window at k ≪ n.
  */
case class TopKLongPairs(
    ordChild: Expression,
    valChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Long, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, "topk_pairs requires k > 0")

  import TopKLongPairs.worstFirst

  override def children: Seq[Expression] = Seq(ordChild, valChild)
  // SQL-registered (graft_topk_pairs), so arbitrary column types reach
  // analysis: declare LongType inputs so narrower integrals (the INT a
  // `VALUES (1, 2)` literal produces) widen via an implicit cast and
  // anything non-castable fails ANALYSIS, not update() at execution.
  // (narrowed to Seq[DataType]: AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  // ImplicitCastInputTypes would also let FRACTIONAL columns
  // (double/float/decimal) cast to long — silently truncating the
  // ordering values instead of failing. Coercion rewrites such a child
  // to Cast(fractional, LongType), so reject that shape at analysis —
  // UNLESS the fractional value is itself an explicit round()/bround()
  // (integer-valued by construction, so the cast is exact within long
  // range and the caller has STATED the rounding; floor/ceil already
  // return BIGINT and never hit this check).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.expressions.{BRound, Cast, Round}
    def isFractional(dt: DataType): Boolean = dt == DoubleType ||
      dt == FloatType || dt.isInstanceOf[DecimalType]
    def statedRounding(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e match {
        case _: Round | _: BRound => true
        case _ => false
      }
    val fractional = children.collectFirst {
      case c: Cast if isFractional(c.child.dataType) &&
          !statedRounding(c.child) => c.child.dataType
    }
    fractional match {
      case Some(dt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk_pairs requires integral ord/id columns; a " +
          s"${dt.catalogString} input would silently truncate — state " +
          "the rounding first (e.g. CAST(round(x * 1000) AS BIGINT), " +
          "or floor()/ceil() which are already BIGINT)")
      case None => super.checkInputDataTypes()
    }
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Long, Long)](worstFirst)

  private def offer(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
      e: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { // strictly better than the kept worst
      buf.dequeue(); buf.enqueue(e)
    }
  }

  // Primitive fast path for bound long columns (round-17 — see
  // TopKSummedLongPairs.fastOrdinals for the rationale; this aggregate
  // sits in q206's co-matrix truncation and q201's neighbor cut).
  @transient private lazy val fastOrdinals: (Int, Int) = (ordChild, valChild) match {
    case (a: org.apache.spark.sql.catalyst.expressions.BoundReference,
          b: org.apache.spark.sql.catalyst.expressions.BoundReference)
        if a.dataType == LongType && b.dataType == LongType =>
      (a.ordinal, b.ordinal)
    case _ => (-1, -1)
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val (oi, vi) = fastOrdinals
    if (oi >= 0) {
      if (!input.isNullAt(oi) && !input.isNullAt(vi))
        offer(buf, (input.getLong(oi), input.getLong(vi)))
    } else {
      val o = ordChild.eval(input)
      val v = valChild.eval(input)
      if (o != null && v != null)
        offer(buf, (o.asInstanceOf[Long], v.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(a: scala.collection.mutable.PriorityQueue[(Long, Long)],
      b: scala.collection.mutable.PriorityQueue[(Long, Long)]): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Any = {
    // ascending under worstFirst = best pairs first (they compare smallest)
    val arr = buf.toArray.sorted(worstFirst)
    new GenericArrayData(arr.map(t => InternalRow(t._1, t._2): Any))
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val arr = buf.toArray
    val bb = ByteBuffer.allocate(4 + 16 * arr.length)
    bb.putInt(arr.length)
    arr.foreach { case (o, v) => bb.putLong(o); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKLongPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKLongPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongPairs =
    copy(ordChild = newChildren(0), valChild = newChildren(1))
  override def prettyName: String = "graft_topk_pairs"
}

object TopKLongPairs {

  /** Heap ordering: the element to EVICT first (the worst kept pair) is
    * the maximum — smallest ord, ties to largest v. Its reverse is the
    * emission order (ord desc, v asc), exactly the rank-window sort. */
  val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Aggregate Column: top-k (ord, v) pairs by (ord desc, v asc) as
    * array<struct<ord,v>> in emission order. Both columns must be
    * LongType. */
  def topkPairs(ord: Column, v: Column, k: Int): Column =
    GraftBridge.column(
      TopKLongPairs(GraftBridge.expression(ord), GraftBridge.expression(v), k)
        .toAggregateExpression())

  /** SQL-registration helper: the third argument must be an integer
    * literal (the aggregate's buffer bound is fixed at plan time). */
  def literalK(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"graft_topk_pairs k must be an integer literal, got $other")
  }
}
