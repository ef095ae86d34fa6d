package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch build: `count_min(token, rows, width)` folds a token
  * stream into a fixed `rows`×`width` counter matrix (Cormode &
  * Muthukrishnan '05; double-hashed rows from two FNV-1a variants,
  * [[Ops.cmsAdd]]), returned flat as `array<bigint>`.
  *
  * Why: exact per-token counting holds state proportional to the VOCABULARY
  * — unbounded on a 100 TB crawl. The sketch holds rows·width longs
  * regardless of vocabulary, merges by elementwise addition (map-side
  * partials, one small buffer per partition on the shuffle), and answers
  * point queries within εN over-estimate, never under. Point lookups via
  * [[Exprs.cms_lookup]].
  *
  * Determinism: buckets derive from FNV-1a alone — no JVM hashCode, no
  * randomness — so the same data yields the same matrix on any engine that
  * can fold FNV, which is what lets a SQL oracle replicate the estimates
  * exactly (x96).
  */
case class CountMinAgg(
    child: Expression,
    rows: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(rows > 0 && width > 0, "count_min: rows and width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](rows * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = child.eval(input)
    if (t != null) Ops.cmsAdd(buf, t.asInstanceOf[UTF8String], rows, width)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
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

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "count_min"
}

object CountMinAgg {
  /** Column builder: `count_min(token, rows, width)` as an aggregate Column. */
  def count_min(token: Column, rows: Int, width: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(token), rows, width).toAggregateExpression())
}
