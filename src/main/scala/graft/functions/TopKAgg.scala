package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory per-key top-k aggregate.
  *
  * `top_k(ord, id, k)` keeps the k largest `(ord DESC, id ASC)` pairs per
  * group in a fixed-size heap and returns them as a sorted
  * `array<struct<ord double, id bigint>>`.
  *
  * Why this exists: the standard per-key top-k spelling —
  * `row_number() OVER (PARTITION BY key ORDER BY ord DESC) <= k` — SORTS
  * every partition in full (O(n log n) per key, full spill surface). As a
  * TypedImperativeAggregate this instead runs as a hash aggregate with
  * map-side partial merge: O(n log k) time, O(k) state per key, and the
  * shuffle carries at most k rows per key per mapper instead of the whole
  * table. At 100 TB that is the difference between a sort of the fact table
  * and a bounded sketch-style combine. (Correctness is pinned against the
  * window spelling by the x19 DuckDB oracle.)
  */
case class TopKAgg(
    ordExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "top_k: k must be positive")

  override def children: Seq[Expression] = Seq(ordExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null) {
      buf.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeFrom(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDescending
    new GenericArrayData(sorted.map { case (o, i) =>
      InternalRow(o, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(ordExpr = c(0), idExpr = c(1))
  override def prettyName: String = "top_k"
}

/** Fixed-capacity min-heap over (ord, id) with total order
  * ord DESC, id ASC — the heap root is the WORST kept element. */
final class TopKBuffer(val k: Int) {
  // parallel arrays as a binary heap; size ≤ k
  private val ords = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** true if (o1,i1) ranks WORSE than (o2,i2) under ord DESC, id ASC.
    * Total order via Double.compare — NaN sorts greatest, matching Spark's
    * sort semantics (primitive < would make a NaN at the heap root
    * unevictable). */
  private def worse(o1: Double, i1: Long, o2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c < 0 || (c == 0 && i1 > i2)
  }

  def insert(o: Double, id: Long): Unit = {
    if (n < k) {
      ords(n) = o; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(ords(0), ids(0), o, id)) {
      ords(0) = o; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(ords(i), ids(i), ords(p), ids(p))) {
        swap(i, p); i = p
      } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < n && worse(ords(l), ids(l), ords(m), ids(m))) m = l
      if (r < n && worse(ords(r), ids(r), ords(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val to = ords(a); ords(a) = ords(b); ords(b) = to
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ords(i), other.ids(i)); i += 1 }
  }

  def sortedDescending: Seq[(Double, Long)] =
    (0 until n).map(i => (ords(i), ids(i)))
      .sortWith { case ((o1, i1), (o2, i2)) =>
        val c = java.lang.Double.compare(o1, o2)
        c > 0 || (c == 0 && i1 < i2)
      }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(ords(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  /** Column builder: `top_k(ord, id, k)` as an aggregate Column. */
  def top_k(ord: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(ord), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
