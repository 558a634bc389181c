package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash signature as a typed imperative aggregate: per group, sum a
  * ±weight contribution per bit of the token hash, then emit the sign
  * bit-vector. Replaces 60 generated `sum(case when ...)` aggregate
  * expressions (same JIT-bomb rationale as [[MinHashSketch]]); the
  * arithmetic is identical — `bits` bit-sums of ±weight, sign threshold
  * > 0 — so results match the DuckDB oracle bit-for-bit.
  */
case class SimHashSketch(
    hashChild: Expression,
    weightChild: Expression,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hashChild, weightChild)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashChild.eval(input)
    val w = weightChild.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      var k = 0
      while (k < bits) {
        buf(k) += (if (((hv >> k) & 1L) == 1L) wv else -wv)
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < bits) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var k = 0
    while (k < bits) { if (buf(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSketch =
    copy(hashChild = newChildren(0), weightChild = newChildren(1))
  override def prettyName: String = "graft_simhash"
}

object SimHashSketch {
  /** Aggregate Column: simhash signature (long) from a token-hash column
    * and a weight (term-frequency) column. */
  def simhash(hashCol: Column, weightCol: Column, bits: Int): Column =
    GraftBridge.column(
      SimHashSketch(GraftBridge.expression(hashCol),
        GraftBridge.expression(weightCol), bits).toAggregateExpression())
}
