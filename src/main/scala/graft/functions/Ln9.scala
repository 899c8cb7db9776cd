package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** The deterministic integer-ln tables, held OUTSIDE the expression
  * tree (the [[Hyperplanes]] pattern, applied to the ln family).
  *
  * Why this object exists: the original formulations inline a
  * floor(ln·1e9) lookup table into the plan as a `typedlit` at EVERY
  * call site — 4096 longs for the unbounded `ln9big` (Select.scala),
  * 1025 for text_entropy, 4097 for text_lm_score. Queries that call
  * ln9big several times (classify_nb, sample_dsir, mix_kl,
  * text_lm3_heldout) carried 270-530 KB plans, and round 7 MEASURED
  * the identical disease costing wall-clock on the embedding family
  * (dedup_embedding_hi 5.41 → 0.90 s once its plane literals moved to
  * a JVM-static cache). Here each table is computed once per JVM and
  * cached by size; the Catalyst nodes ([[Ln9Big]], [[Ln9Sat]],
  * [[Ln9Bounded]]) carry at most one int, so plans stay KB-sized and
  * executors regenerate the table locally instead of receiving it
  * through task serialization.
  *
  * Bit-compatibility contract: for every n >= 0, `Ln9Big` equals the
  * former column chain
  * `element_at(typedlit(L), (shiftright(n, s) + 1)) + s * Ln2_9` with
  * `s = max(bitlen(n) - 12, 0)` — same table, same shift, same floor —
  * so swapping changes NO query result (Ln9Spec asserts equality
  * against the literal formulation over the full boundary lattice).
  * The DuckDB oracles keep deriving the identical tables from their
  * `lnt` CTEs; no oracle text changes.
  */
object Ln9 {

  /** floor(ln 2 · 1e9) — the per-octave shift step of the mantissa
    * decomposition ln9big(n) = L[n >> s] + s·Ln2_9.
    */
  val Ln2_9: Long = math.floor(math.log(2.0) * 1e9).toLong

  /** ln9big's 12-bit mantissa table spans [0, 4095]. */
  val BigMaxC = 4095

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  /** L[i] = floor(ln i · 1e9) for i in [0, maxC] (L[0] = 0, unused by
    * construction), cached per JVM by table size.
    */
  def table(maxC: Int): Array[Long] =
    cache.computeIfAbsent(maxC, _ => Array.tabulate(maxC + 1)(i =>
      if (i < 1) 0L else math.floor(math.log(i.toDouble) * 1e9).toLong))

  // ln9big's table resolved once: the hot path must not pay a boxed
  // ConcurrentHashMap get per row (4095 is outside the Integer cache).
  private val bigTable: Array[Long] = table(BigMaxC)

  /** Unbounded floor-scaled ln: L[m] + s·Ln2_9 with m = n >> s,
    * s = max(bitlen(n) - 12, 0). Exact for n < 4096; truncation error
    * < ln(1 + 1/2048) ≈ 4.9e-4 nats above. Called from interpreted
    * eval and generated code. Negative input raises — the former
    * literal chain's behavior there was an undefined array index, and
    * every registered consumer feeds counts.
    */
  def ln9big(n: Long): Long = {
    if (n < 0) throw new IllegalArgumentException(
      s"graft_ln9: negative input $n")
    // n | 1 keeps bitlen(0) = 1, matching length(bin(0)) = 1
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(n | 1L)
    val shift = if (bitlen > 12) bitlen - 12 else 0
    bigTable((n >> shift).toInt) + shift.toLong * Ln2_9
  }

  /** Saturating table ln: L[min(c, maxC)]. Negative input raises
    * (the former `element_at(lt, least(c, cap) + 1)` raised on the
    * zero index).
    */
  def ln9sat(c: Long, maxC: Int): Long =
    ln9sat(c, maxC, table(maxC))

  /** Table-passing overload for generated code: the caller hoists the
    * array (a codegen reference object) so the per-row cost is a plain
    * array index, not a boxed cache get.
    */
  def ln9sat(c: Long, maxC: Int, t: Array[Long]): Long = {
    if (c < 0) throw new IllegalArgumentException(
      s"graft_ln9_sat: negative input $c")
    t(math.min(c, maxC.toLong).toInt)
  }

  /** Column API: unbounded ln9big of an integral column. */
  def big(n: Column): Column =
    Bridge.column(Ln9Big(Bridge.expression(n.cast(LongType))))

  /** Column API: saturating ln at `maxC` (text_lm_score's cap). */
  def sat(c: Column, maxC: Int): Column =
    Bridge.column(Ln9Sat(Bridge.expression(c.cast(LongType)), maxC))

  /** Column API: NULL-beyond-bound ln (text_entropy's guard). */
  def bounded(c: Column, maxC: Int): Column =
    Bridge.column(Ln9Bounded(Bridge.expression(c.cast(LongType)), maxC))
}

/** `graft_ln9(n)` — floor(ln n · 1e9) at any magnitude via the 12-bit
  * mantissa decomposition. The table lives in [[Ln9]]'s JVM-static
  * cache; this node serializes as the child alone.
  */
case class Ln9Big(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ln9"

  override def nullSafeEval(a: Any): Any = Ln9.ln9big(a.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Ln9.ln9big($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_ln9_sat(c, maxC)` — L[min(c, maxC)]: the saturating-table ln
  * of text_lm_score (ln flattens for ultra-frequent tokens; a
  * documented property of that score).
  */
case class Ln9Sat(child: Expression, maxC: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(maxC >= 1, s"invalid ln table bound: $maxC")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ln9_sat"

  @transient private lazy val tbl: Array[Long] = Ln9.table(maxC)

  override def nullSafeEval(a: Any): Any =
    Ln9.ln9sat(a.asInstanceOf[Long], maxC, tbl)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Mutable state initialized in the generated class's init — the
    // table is rebuilt EXECUTOR-LOCALLY from the JVM cache (nothing
    // ships with the plan), and the row loop sees a long[] field, not
    // a boxed cache get.
    val t = ctx.addMutableState("long[]", "ln9SatTable",
      v => s"$v = graft.functions.Ln9.table($maxC);")
    defineCodeGen(ctx, ev, c => s"graft.functions.Ln9.ln9sat($c, $maxC, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_ln9_bounded(c, maxC)` — L[c] for c in [0, maxC], NULL
  * outside: the guard-not-clamp ln of text_entropy (a doc beyond the
  * table bound yields NULL rather than a silently-wrong saturation).
  */
case class Ln9Bounded(child: Expression, maxC: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(maxC >= 1, s"invalid ln table bound: $maxC")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ln9_bounded"
  override def nullable: Boolean = true

  @transient private lazy val tbl: Array[Long] = Ln9.table(maxC)

  override def nullSafeEval(a: Any): Any = {
    val c = a.asInstanceOf[Long]
    if (c < 0 || c > maxC) null else tbl(c.toInt)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addMutableState("long[]", "ln9BoundedTable",
      v => s"$v = graft.functions.Ln9.table($maxC);")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c < 0L || $c > ${maxC}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $t[(int) $c];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
