package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature sketch as a typed imperative aggregate.
  *
  * The composed alternative (128 separate `min(pmod(a_i*h+b_i, p))`
  * aggregate expressions) is semantically identical but generates a
  * ~100KB codegen unit whose first-run JIT compile costs ~15-20s — fatal
  * for a run-once benchmark and wasteful on a cluster rolling fresh
  * executors. This aggregate keeps one mutable Array[Long](k) buffer per
  * group, updates all k permutations in a tight JVM loop, and merges
  * buffers element-wise-min — the same partial/final shape as any Spark
  * aggregate, with O(k) state per doc at any scale.
  *
  * Permutations are seed-fixed (Random(42)) affine maps modulo the
  * Mersenne prime 2^31-1, matching Spark's pmod semantics exactly, so
  * results are identical to the composed form it replaced.
  */
case class MinHashSketch(
    child: Expression,
    numPerms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = MinHashSketch.P
  @transient private lazy val perms = MinHashSketch.perms(numPerms)

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = child.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val v = java.lang.Math.floorMod(perms(i)._1 * hv + perms(i)._2, P)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_minhash"
}

object MinHashSketch {
  val P = 2147483647L // 2^31 - 1, prime

  /** Seed-fixed affine permutation coefficients; |a|,|b| < 2^31 so
    * a*h+b never overflows a long for 32-bit-range hashes. */
  def perms(n: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(n)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Aggregate Column: minhash signature (array<long> of length k) of a
    * long hash column. */
  def minhash(hashCol: Column, k: Int): Column =
    GraftBridge.column(
      MinHashSketch(GraftBridge.expression(hashCol), k).toAggregateExpression())
}
