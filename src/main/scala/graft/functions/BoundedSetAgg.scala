package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bounded_collect_set(id, cap)` — collect_set over LongType with a HARD
  * per-group state bound: the moment a group's distinct count exceeds `cap`
  * the buffer drops its contents and saturates to O(1) state, and the
  * aggregate evaluates to NULL for that group.
  *
  * Why this exists: the LSH bucket kernel (Dedup.bucketCandidatePairs) caps
  * mega-buckets — but a plain `collect_set … having size ≤ cap` only filters
  * AFTER the full id list materialized in one aggregation buffer, so a
  * degenerate bucket (boilerplate docs sharing one band hash) could still
  * accumulate unbounded executor state before being thrown away. With this
  * aggregate no executor ever holds more than cap+1 ids per group, in the
  * partial aggregate, the shuffle, and the final merge alike — the 100 TB
  * skew-safety property the cap was for.
  */
case class BoundedSetAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedLongSet] {

  require(cap > 0, "bounded_collect_set: cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BoundedLongSet = new BoundedLongSet(cap)

  override def update(buf: BoundedLongSet, input: InternalRow): BoundedLongSet = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedLongSet, b: BoundedLongSet): BoundedLongSet = {
    a.mergeFrom(b); a
  }

  override def eval(buf: BoundedLongSet): Any =
    if (buf.saturated) null
    else new GenericArrayData(buf.sorted)

  override def serialize(buf: BoundedLongSet): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BoundedLongSet =
    BoundedLongSet.fromBytes(cap, bytes)

  override def withNewMutableAggBufferOffset(n: Int): BoundedSetAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedSetAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "bounded_collect_set"
}

/** Distinct-long buffer with a hard cap: crossing the cap clears storage and
  * pins a saturation flag (absorbing for merge). */
final class BoundedLongSet(val cap: Int) {
  private var set = new java.util.HashSet[java.lang.Long](math.min(cap, 64))
  private var sat = false

  def saturated: Boolean = sat

  def add(v: Long): Unit = if (!sat) {
    set.add(v)
    if (set.size > cap) { set.clear(); sat = true }
  }

  def mergeFrom(other: BoundedLongSet): Unit = {
    if (other.sat) { set.clear(); sat = true }
    else if (!sat) {
      val it = other.set.iterator()
      while (it.hasNext && !sat) add(it.next())
    }
  }

  /** Deterministic (ascending) contents — eval order must not depend on
    * hash iteration. */
  def sorted: Array[Long] = {
    val a = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { a(i) = it.next(); i += 1 }
    java.util.Arrays.sort(a)
    a
  }

  def toBytes: Array[Byte] = {
    val n = if (sat) 0 else set.size
    val bb = ByteBuffer.allocate(1 + 4 + n * 8)
    bb.put(if (sat) 1.toByte else 0.toByte)
    bb.putInt(n)
    if (!sat) {
      val it = set.iterator()
      while (it.hasNext) bb.putLong(it.next())
    }
    bb.array()
  }
}

object BoundedLongSet {
  def fromBytes(cap: Int, bytes: Array[Byte]): BoundedLongSet = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BoundedLongSet(cap)
    val sat = bb.get() == 1.toByte
    val n = bb.getInt
    if (sat) buf.sat = true
    else {
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
    }
    buf
  }

  /** Column builder: `bounded_collect_set(id, cap)` as an aggregate Column. */
  def bounded_collect_set(id: Column, cap: Int): Column =
    GraftBridge.column(
      BoundedSetAgg(GraftBridge.expression(id), cap).toAggregateExpression())
}
