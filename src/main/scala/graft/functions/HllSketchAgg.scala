package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Mergeable HyperLogLog approximate-distinct-count aggregate — the
  * 100 TB workhorse for per-key cardinality, where exact
  * `count(distinct)` forces a full shuffle-dedup of every value.
  *
  * Standard 64-bit HLL (Flajolet et al. 2007, with the linear-counting
  * small-range correction): m = 2^p byte registers; an incoming 64-bit
  * hash is split into a p-bit register index (top bits) and the rank
  * of the first set bit of the remainder. The aggregation buffer is
  * the register array itself, so partial aggregation runs map-side and
  * `merge` is an elementwise max — associative and commutative, which
  * makes the estimate independent of partitioning (spec-asserted).
  *
  * p = 12 -> 4096 one-byte registers (4 KB per group), standard error
  * 1.04/sqrt(m) ~ 1.6%.
  *
  * The input must already be a 64-bit hash (use `xxhash64(col)`;
  * the [[HllSketchAgg.approxDistinct]] Column API applies it).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"HLL precision p must be in [4,16], got $p")

  private val m: Int = 1 << p

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> (64 - p)).toInt
      // rank of the first set bit in the remaining 64-p bits (1-based;
      // all-zero remainder -> 64-p+1)
      val w = h << p
      val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.scalb(1.0, -buf(i)) // 2^-register
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / sum
    // small-range: linear counting while empty registers remain
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
    math.round(corrected)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

object HllSketchAgg {
  /** Column API: HLL approximate distinct count of any column (hashed
    * with xxhash64 internally). NULLs are excluded before hashing —
    * xxhash64 maps a null input to its seed rather than null, which
    * would otherwise count the null group as one distinct value.
    */
  def approxDistinct(c: Column): Column = {
    import org.apache.spark.sql.functions.{when, xxhash64}
    Bridge.column(HllSketchAgg(
      Bridge.eagerExpression(when(c.isNotNull, xxhash64(c))))
      .toAggregateExpression())
  }
}
