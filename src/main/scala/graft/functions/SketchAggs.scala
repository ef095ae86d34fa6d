package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Element-wise sum of `array<bigint>` columns: `vec_sum(qv)` folds n vectors
  * into ONE d-long vector per group.
  *
  * Why a typed aggregate instead of posexplode+groupBy(pos): the explode path
  * shuffles n·d rows to rebuild a d-element array; this buffer shuffles one
  * d-long partial per map partition (map-side combine is automatic for
  * TypedImperativeAggregate), which is what a centroid-update step must look
  * like at 100 TB — the shuffle volume is #partitions·d, independent of n.
  * Used by [[graft.ops.Clustering.kmeansAssign]] for the Lloyd update.
  *
  * Rows with NULL or with a length that differs from the first-seen length
  * raise: a centroid sum over ragged vectors is a data bug, not a mergeable
  * state.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Empty array = "no input seen yet"; real vectors are non-empty.
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    val acc = if (buf.length == 0) new Array[Long](d) else buf
    require(acc.length == d, s"vec_sum: ragged input (${acc.length} vs $d)")
    var i = 0
    while (i < d) { acc(i) += arr.getLong(i); i += 1 }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    require(a.length == b.length, s"vec_sum: ragged merge (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(n: Int): VecSumAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecSumAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "vec_sum"
}

object VecSumAgg {
  /** `vec_sum(arr)` — element-wise sum of `array<bigint>` as an aggregate. */
  def vec_sum(arr: Column): Column =
    GraftBridge.column(VecSumAgg(GraftBridge.expression(arr)).toAggregateExpression())
}

/** HyperLogLog register build: `hll_registers(key, p)` folds an int64 key
  * stream into the m = 2^p max-rho registers (Flajolet et al. '07), returned
  * as `array<int>`.
  *
  * Why: COUNT(DISTINCT) holds the distinct set — unbounded state on a 100 TB
  * stream of ids. The register vector is m bytes regardless of cardinality
  * and merges by element-wise max (map-side partials, order- and
  * duplication-insensitive), so per-group distinct estimates cost one small
  * buffer per partition on the shuffle.
  *
  * Determinism (the property that lets a SQL oracle refold the registers
  * exactly, x96's discipline): the key runs through [[Ops.splitmix64]] —
  * NOT FNV-1a, whose high bits barely avalanche on short keys (measured on
  * this corpus's ids: 150 sequential ids land in 3 of 16 top-4-bit buckets;
  * SplitMix spreads them 5–16 per bucket) — then bucket = top p hash bits,
  * rho = trailing-zero count of the remaining 64-p bits, plus one ("the
  * sub-stream whose hash suffix is ...10^t" — the PCSA/Flajolet-Martin
  * observable, geometric with the same law as the leading-zeros variant,
  * but computable with pure integer ops on BOTH engines:
  * `bit_count((x & -x) - 1) + 1` needs no log2; the oracle re-spells the
  * mixer's mod-2⁶⁴ multiplies with a 32-bit-split mulmod to stay inside
  * signed HUGEINT). An empty sub-stream leaves rho = 0; a key whose suffix
  * is all zeros gets the (64-p)+1 ceiling. String keys: pre-hash to int64
  * (e.g. xxhash64/fnv) before the aggregate.
  */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 2 && p <= 16, "hll_registers: p must be in [2, 16]")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val t = child.eval(input)
    if (t != null) {
      val h = Ops.splitmix64(t.asInstanceOf[Long])
      val bucket = (h >>> (64 - p)).toInt
      val rem = h & ((1L << (64 - p)) - 1L)
      val rho =
        if (rem == 0L) 64 - p + 1
        else java.lang.Long.numberOfTrailingZeros(rem) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "hll_registers"
}

object HllAgg {
  /** `hll_registers(key, p)` — HLL register vector as an aggregate Column. */
  def hll_registers(key: Column, p: Int): Column =
    GraftBridge.column(HllAgg(GraftBridge.expression(key), p).toAggregateExpression())
}
