package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives with TRAINED codebooks shipped as
  * codegen reference objects — never as plan literals.
  *
  * Why this exists: `ann_ivf_pq`'s encode/decode steps formerly inlined
  * the trained codebooks as `typedlit` arrays, which (a) made the
  * registry's largest plan (127 KB of double constants) and (b) glued
  * the query to a non-reproducible MLlib fit. Unlike
  * [[Hyperplanes]] (seed-derived, so executors can REGENERATE the
  * matrix locally), codebooks are DATA-DEPENDENT — they cannot be
  * rebuilt from a formula — so the shipping mechanism is
  * `ctx.addReferenceObj`: the arrays ride the serialized plan binary
  * exactly once (a few KB of longs), the generated row loop indexes a
  * plain field, and the plan TEXT stays KB-sized because an Array
  * field prints as a JVM reference, not its contents.
  *
  * Everything is exact integer arithmetic on the 1e-6 quantization
  * grid (the repo-wide convention), so argmin/encode decisions are
  * bit-identical between a 32-partition Spark run and the sequential
  * DuckDB oracle. Ties break to the LOWEST codeword index — mirrored
  * in the oracle as `ORDER BY dist, cw`.
  */
object Pq {

  // Content-hash cache for the Array-typed constructor fields of the
  // expressions below, keyed by ARRAY IDENTITY (arrays hash/equal by
  // reference, so a WeakHashMap keys by instance and lets a dropped
  // codebook be GC'd). Why JVM-wide and not per-instance: every
  // Catalyst transform rule copies an expression via
  // withNewChildInternal, and a per-instance lazy val re-walks the
  // full codebook (k·Dim elements — 4.2M longs at the flat guard
  // bound) on each copy's first hashCode/equals. Copies share the
  // SAME array reference, so an identity-keyed cache computes the
  // deep hash once per distinct array instance per JVM; every copy
  // thereafter pays one O(1) lookup.
  private val contentHashCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, Integer])

  // The deep hash itself runs OUTSIDE the map's mutex (advisor r11):
  // computeIfAbsent would hold the global lock for the full
  // O(k·Dim) walk (tens of ms at the flat guard bound), serializing
  // every other expression's hashCode/equals lookup behind it. A
  // racing first touch of the same array computes twice — harmless,
  // the hash is deterministic — and putIfAbsent (atomic under the
  // SynchronizedMap mutex) keeps one canonical entry.
  private[functions] def cachedContentHash(key: AnyRef)(
      compute: AnyRef => Int): Int = {
    val cached = contentHashCache.get(key)
    if (cached != null) cached.intValue
    else {
      val h = Integer.valueOf(compute(key))
      contentHashCache.putIfAbsent(key, h)
      h.intValue
    }
  }

  private[functions] def cachedDeepHash(books: Array[Array[Array[Long]]]): Int =
    cachedContentHash(books)(b =>
      java.util.Arrays.deepHashCode(b.asInstanceOf[Array[AnyRef]]))

  /** Total input width a codebook family expects: M subspaces times
    * the (uniform) codeword width.
    */
  def expectedLen(books: Array[Array[Array[Long]]]): Int =
    books.length * books(0)(0).length

  /** Nearest codeword per subspace (squared-L2 argmin, tie -> lowest
    * index). For a single-subspace codebook this is plain
    * nearest-centroid assignment (the coarse IVF quantizer).
    */
  def encode(x: ArrayData, books: Array[Array[Array[Long]]]): ArrayData =
    encode(x, books, 1)

  /** Top-`p` nearest codewords per subspace, best first (order:
    * (distance, index) ascending) — m-major layout, so entry
    * `m*p + r` is subspace m's rank-r codeword. p = 1 is [[encode]];
    * p > 1 is the IVF MULTI-PROBE assignment (a vector participates
    * in candidate generation in its p nearest cells, its PRIMARY
    * cell stays entry m*p).
    */
  def encode(x: ArrayData, books: Array[Array[Array[Long]]], p: Int): ArrayData = {
    val m = books.length
    val sub = books(0)(0).length
    val out = new Array[Int](m * p)
    val bd = new Array[Long](p)
    val bi = new Array[Int](p)
    var mi = 0
    while (mi < m) {
      val book = books(mi)
      val base = mi * sub
      var r = 0
      while (r < p) { bd(r) = Long.MaxValue; bi(r) = 0; r += 1 }
      var k = 0
      while (k < book.length) {
        val cw = book(k)
        var dsum = 0L
        var i = 0
        while (i < sub) {
          val diff = x.getLong(base + i) - cw(i)
          dsum += diff * diff
          i += 1
        }
        // insertion into the top-p by (dist, index); scanning k
        // ascending makes strict < the (dist, index) tie rule
        var slot = p
        while (slot > 0 && dsum < bd(slot - 1)) slot -= 1
        if (slot < p) {
          var s = p - 1
          while (s > slot) { bd(s) = bd(s - 1); bi(s) = bi(s - 1); s -= 1 }
          bd(slot) = dsum
          bi(slot) = k
        }
        k += 1
      }
      r = 0
      while (r < p) { out(mi * p + r) = bi(r); r += 1 }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** x minus the concatenated selected codewords: out[m*sub + i] =
    * x[m*sub + i] - books(m)(codes(m))(i) — the residual step of
    * IVF-PQ (for the coarse single-subspace case: vector minus its
    * assigned centroid).
    */
  def subtract(x: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Long]]]): ArrayData = {
    val m = books.length
    val sub = books(0)(0).length
    val out = new Array[Long](m * sub)
    var mi = 0
    while (mi < m) {
      val cw = books(mi)(codes.getInt(mi))
      val base = mi * sub
      var i = 0
      while (i < sub) {
        out(base + i) = x.getLong(base + i) - cw(i)
        i += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Dense index -> id mapping for [[IndexLookup]]: out(i) =
    * ids(codes(i)). Returns null (the expression's NULL) on a NULL or
    * out-of-range entry rather than throwing — malformed input data
    * must not kill a 1000-executor job.
    */
  def lookup(codes: ArrayData, ids: Array[Long]): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= ids.length) return null
      out(i) = ids(c)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** True when `codes` cannot index `books` (wrong arity or an
    * out-of-range / NULL entry) — shared null guard for
    * [[SubCodewords]].
    */
  def badCodes(codes: ArrayData, books: Array[Array[Array[Long]]]): Boolean = {
    if (codes.numElements() != books.length) return true
    var m = 0
    while (m < books.length) {
      if (codes.isNullAt(m)) return true
      val c = codes.getInt(m)
      if (c < 0 || c >= books(m).length) return true
      m += 1
    }
    false
  }
}

/** `graft_pq_codes(x)` — per-subspace nearest-codeword indices of a
  * BIGINT vector against a trained codebook family (reference object,
  * see [[Pq]]). Output: ARRAY<INT> of length M (dense indices into
  * the SURVIVING, cw-sorted codewords — the oracle's sparse cw ids
  * map to the same choice because both sides sort by codeword id).
  *
  * NULL (not a wrong code) for a vector of unexpected width or with a
  * NULL component — the [[HyperplaneBandVals]] discipline.
  */
case class NearestCodes(child: Expression, books: Array[Array[Array[Long]]],
    topP: Int = 1)
    extends UnaryExpression with ExpectsInputTypes {

  require(topP >= 1 && topP <= books.map(_.length).min,
    s"topP $topP out of range for the codebook family")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"
  override def nullable: Boolean = true

  private val expected = Pq.expectedLen(books)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != expected || Hyperplanes.hasNullElement(x)) null
    else Pq.encode(x, books, topP)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() != $expected ||
         |    graft.functions.Hyperplanes.hasNullElement($a)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Pq.encode($a, $b, $topP);
         |}
       """.stripMargin
    })
  }

  // Array-typed constructor fields fall back to reference identity in
  // the synthesized case-class equals/hashCode, which silently defeats
  // Catalyst canonicalization / common-subexpression elimination when
  // two structurally identical expressions are built from distinct
  // array instances — so compare the codebooks by CONTENT. The deep
  // hash comes from [[Pq.cachedContentHash]]: computed once per
  // distinct array INSTANCE per JVM, shared across every Catalyst
  // copy of this node (copies keep the same array reference); equals
  // short-circuits on hash and instance identity before ever walking
  // the arrays.
  @transient private lazy val booksHash = Pq.cachedDeepHash(books)
  override def equals(o: Any): Boolean = o match {
    case that: NearestCodes =>
      child == that.child && topP == that.topP &&
        booksHash == that.booksHash &&
        ((books eq that.books) || java.util.Arrays.deepEquals(
          books.asInstanceOf[Array[AnyRef]], that.books.asInstanceOf[Array[AnyRef]]))
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child, Integer.valueOf(topP),
      Integer.valueOf(booksHash))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_idx_lookup(codes)` — maps an ARRAY<INT> of dense indices
  * (e.g. [[NearestCodes]] output) to the ids they select from a
  * reference-object `long[]` table: out(i) = ids(codes(i)).
  *
  * Why this exists: the blocked embedding-dedup path and the IVF-PQ
  * index both need "dense Lloyd-centroid index -> original cell id".
  * Inlining the id table as a `typedlit` literal puts a k-long
  * constant in the plan TEXT — k scales with corpus size (k =
  * ceil(n/cap)), which is exactly the plan-bloat failure mode the
  * codebook reference objects eliminated. Like the codebooks, the id
  * table is data-dependent (cannot be regenerated executor-side from
  * a seed), so it rides the serialized plan binary once via
  * `ctx.addReferenceObj` and the plan text stays O(1).
  *
  * NULL on a NULL or out-of-range index (never throws — the
  * [[HyperplaneBandVals]] malformed-input discipline).
  */
case class IndexLookup(child: Expression, ids: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_idx_lookup"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Pq.lookup(a.asInstanceOf[ArrayData], ids)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("idxIds", ids, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.Pq.lookup($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  // content equality for the Array field — see [[NearestCodes]]
  @transient private lazy val idsHash = Pq.cachedContentHash(ids)(
    i => java.util.Arrays.hashCode(i.asInstanceOf[Array[Long]]))
  override def equals(o: Any): Boolean = o match {
    case that: IndexLookup =>
      child == that.child && idsHash == that.idsHash &&
        ((ids eq that.ids) || java.util.Arrays.equals(ids, that.ids))
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child, Integer.valueOf(idsHash))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_pq_sub(x, codes)` — x minus the concatenation of the
  * codewords `codes` select from the reference-object codebook family:
  * the residual step of IVF-PQ (see [[Pq.subtract]]). NULL on a
  * malformed vector or codes that cannot index the books.
  */
case class SubCodewords(left: Expression, right: Expression,
    books: Array[Array[Array[Long]]])
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_sub"
  override def nullable: Boolean = true

  private val expected = Pq.expectedLen(books)

  override def nullSafeEval(a: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    if (x.numElements() != expected || Hyperplanes.hasNullElement(x) ||
      Pq.badCodes(codes, books)) null
    else Pq.subtract(x, codes, books)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, (a, c) => {
      s"""
         |if ($a.numElements() != $expected ||
         |    graft.functions.Hyperplanes.hasNullElement($a) ||
         |    graft.functions.Pq.badCodes($c, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Pq.subtract($a, $c, $b);
         |}
       """.stripMargin
    })
  }

  // content equality for the Array field — see [[NearestCodes]]
  @transient private lazy val booksHash = Pq.cachedDeepHash(books)
  override def equals(o: Any): Boolean = o match {
    case that: SubCodewords =>
      left == that.left && right == that.right &&
        booksHash == that.booksHash &&
        ((books eq that.books) || java.util.Arrays.deepEquals(
          books.asInstanceOf[Array[AnyRef]], that.books.asInstanceOf[Array[AnyRef]]))
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(left, right, Integer.valueOf(booksHash))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
