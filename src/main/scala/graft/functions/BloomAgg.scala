package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Distributed bloom-filter build: `bloom_agg(gram, numBits)` folds 64-bit
  * gram hashes into a fixed-size bitset (k=2 double-hashed probes,
  * [[Ops.bloomSet]]) and returns it as `array<bigint>` words.
  *
  * Why an aggregate: OR is commutative/associative, so the build runs as a
  * hash aggregate with MAP-SIDE partial bitsets — each mapper folds its
  * grams locally and the shuffle carries one `numBits/8`-byte buffer per
  * partition instead of the gram set. That is what makes the filter
  * buildable from a gram relation too large to collect: 10⁹ distinct grams
  * summarize into the same 128 KiB (2²⁰ bits) the driver then ships to the
  * probe side ([[Exprs.BloomAnyExpr]]).
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    "bloom_agg: numBits must be a positive multiple of 64")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val g = child.eval(input)
    if (g != null) Ops.bloomSet(buf, g.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  /** Column builder: `bloom_agg(gram, numBits)` as an aggregate Column. */
  def bloom_agg(gram: Column, numBits: Int): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(gram), numBits).toAggregateExpression())
}
