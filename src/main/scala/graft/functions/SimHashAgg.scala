package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass SimHash aggregate: folds a group of 60-bit hashes into a
  * 60-bit SimHash fingerprint (bit b set iff more than half the
  * hashes have bit b set — identical to the textbook sum(+-1) > 0).
  *
  * Why a TypedImperativeAggregate: the expression-only formulation
  * needs 60 separate `sum(CASE ...)` aggregates (60 aggregation
  * buffers, 60 codegen'd update chains); this buffer is one long
  * array updated in a tight loop, with map-side partial aggregation
  * and an O(bits) merge — the standard shape for sketch-like
  * aggregates (HLL, CPC, ...).
  *
  * Buffer layout: counts(0..bits-1) = per-bit set counts,
  * counts(bits) = total rows.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) { buf(b) += (h >>> b) & 1L; b += 1 }
      buf(bits) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (2L * buf(b) > buf(bits)) fp |= 1L << b
      b += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column API: 60-bit SimHash of a BIGINT hash column. */
  def simhash60(hashes: Column): Column =
    Bridge.column(SimHashAgg(Bridge.eagerExpression(hashes)).toAggregateExpression())
}
