package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable relative-error quantile sketch (the DDSketch family:
  * Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees", VLDB 2019).
  *
  * Exact per-group percentiles (`q_percentiles`, Stats.scala) need a
  * per-group sort — one full shuffle of every row at 100 TB. This
  * sketch instead maps each positive value to a logarithmic bucket
  * index `ceil(log_gamma(x))` with `gamma = (1+alpha)/(1-alpha)`, and
  * the aggregation state is just the bucket->count map. That gives:
  *
  *  - **relative-error guarantee**: the value returned for any
  *    quantile is within `alpha` (default 1%) of the true order
  *    statistic, regardless of the data distribution;
  *  - **full mergeability**: merge = bucket-wise count sum, which is
  *    associative and commutative, so partial aggregation runs
  *    map-side and the exchange carries one small sketch per group
  *    per map partition — the same scale posture as
  *    [[HllSketchAgg]];
  *  - **determinism**: unlike sampling sketches (KLL/t-digest) there
  *    are no coin flips and no merge-order dependence — the sketch is
  *    a pure function of the multiset of inputs, so results are
  *    bit-stable across partitionings (spec-asserted).
  *
  * State is a dense count array over a fixed index window [minIdx,
  * maxIdx] (buckets outside are clamped to the boundary buckets, the
  * standard collapse strategy): with alpha=0.01, gamma~1.0202,
  * log_gamma spans ~[-690, 1380] for doubles in [1e-6, 1e12] — we keep
  * [-800, 1500] = 2301 long counters per sign ~ 36 KB per group.
  * Negative values get the standard MIRRORED bucket store (the sketch
  * of -x, estimates negated), exact zeros a dedicated bucket, so the
  * relative-error guarantee holds over the full real line; NaNs are
  * skipped like NULLs (they have no order statistics to estimate).
  *
  * Reference for the operator surface this backs: the AggregationJob
  * metrics family (/root/reference/jobs/flink-job/src/main/kotlin/com/
  * example/flink/AggregationJob.kt:109-206) emits per-window count
  * aggregates; a production metrics pipeline extends those to latency
  * quantiles, which at scale are exactly this sketch.
  */
case class DdSketchAgg(
    child: Expression,
    quantiles: Seq[Double],
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
    s"quantiles must be in [0,1], got $quantiles")

  import DdSketchAgg.{MinIdx, MaxIdx}

  private val gamma: Double = (1 + alpha) / (1 - alpha)
  private val logGamma: Double = math.log(gamma)
  // state layout: [zeroCount,
  //   posCount(MinIdx..MaxIdx),   -- offset 1
  //   negCount(MinIdx..MaxIdx)]   -- offset 1 + nBuckets, sketch of -x
  private val nBuckets: Int = MaxIdx - MinIdx + 1
  private val stateLen: Int = 1 + 2 * nBuckets

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_ddsketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](stateLen)

  private def bucketOf(x: Double): Int = {
    val idx = math.ceil(math.log(x) / logGamma).toInt
    if (idx < MinIdx) MinIdx else if (idx > MaxIdx) MaxIdx else idx
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x.isNaN) () // no order statistic to estimate; skip like NULL
      else if (x > 0) buf(bucketOf(x) - MinIdx + 1) += 1
      else if (x < 0) buf(bucketOf(-x) - MinIdx + 1 + nBuckets) += 1
      else buf(0) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < stateLen) {
      b1(i) += b2(i)
      i += 1
    }
    b1
  }

  /** Emits one estimated value per requested quantile: walk the
    * cumulative counts in value order — negatives from most negative
    * (highest mirrored bucket) down, then zeros, then positives — to
    * the ceil(q * n)-th element's bucket and return the bucket's
    * midpoint `±2*gamma^i/(gamma+1)`, which is within alpha of every
    * value the bucket can hold.
    */
  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < stateLen) { n += buf(i); i += 1 }
    val out = new Array[Any](quantiles.length)
    var qi = 0
    while (qi < quantiles.length) {
      out(qi) = if (n == 0) Double.NaN else estimate(buf, n, quantiles(qi))
      qi += 1
    }
    new GenericArrayData(out)
  }

  private def midpoint(idx: Int): Double = 2.0 * math.pow(gamma, idx) / (gamma + 1)

  private def estimate(buf: Array[Long], n: Long, q: Double): Double = {
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    // negatives: most negative first = mirrored bucket index descending
    var i = nBuckets - 1
    while (i >= 0) {
      cum += buf(1 + nBuckets + i)
      if (rank <= cum) return -midpoint(MinIdx + i)
      i -= 1
    }
    cum += buf(0)
    if (rank <= cum) return 0.0
    var j = 0
    while (j < nBuckets) {
      cum += buf(1 + j)
      if (rank <= cum) return midpoint(MinIdx + j)
      j += 1
    }
    Double.NaN // unreachable: rank <= n = total count
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(stateLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](stateLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DdSketchAgg =
    copy(child = newChildren.head)
}

object DdSketchAgg {
  /** Fixed index window (see class doc): covers doubles in roughly
    * [gamma^-800, gamma^1500] ~ [1e-7, 1e13] at alpha=0.01 before
    * boundary clamping kicks in.
    */
  val MinIdx: Int = -800
  val MaxIdx: Int = 1500

  /** Column API: approximate quantiles of a numeric column with
    * relative error `alpha`; returns ARRAY<DOUBLE>, one element per
    * requested quantile.
    */
  def approxQuantiles(c: Column, qs: Seq[Double], alpha: Double = 0.01): Column = {
    import org.apache.spark.sql.functions.when
    val d = c.cast("double")
    Bridge.column(DdSketchAgg(
      Bridge.eagerExpression(when(d.isNotNull, d)), qs, alpha)
      .toAggregateExpression())
  }
}
