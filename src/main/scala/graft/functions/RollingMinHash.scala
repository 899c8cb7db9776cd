package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Rabin-Karp rolling-hash document fingerprint: the MINIMUM of the
  * polynomial hash over every `window`-byte window of the UTF-8 text,
  * computed in one O(n) pass (each step adds one byte and removes one
  * via the precomputed top-power — no per-window rehash).
  *
  * Hash: h = sum b_i * B^(w-1-i) mod P with B=131, P=2^31-1. All
  * arithmetic stays in [0, P) so products fit a long. Texts shorter
  * than the window hash as one short window. Deterministic, so two
  * documents sharing any `window`-byte run are likely to collide on
  * the min — the winnowing-style near-dup fingerprint.
  */
case class RollingMinHash(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_min_hash"

  private val P = 2147483647L // 2^31 - 1
  private val B = 131L

  override def nullSafeEval(t: Any, w: Any): Any = {
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val window = w.asInstanceOf[Int]
    RollingMinHash.minHash(bytes, window, B, P)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) => {
      val cls = RollingMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.minHash($t.getBytes(), $w, ${B}L, ${P}L);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RollingMinHash {
  /** Shared by the interpreted and codegen paths. */
  def minHash(bytes: Array[Byte], window: Int, b: Long, p: Long): Long = {
    val n = bytes.length
    val w = math.max(1, math.min(window, math.max(n, 1)))
    if (n == 0) return 0L
    // top = B^(w-1) mod P, for removing the outgoing byte
    var top = 1L
    var i = 0
    while (i < w - 1) { top = top * b % p; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * b + (bytes(i) & 0xff)) % p; i += 1 }
    var min = h
    while (i < n) {
      val out = (bytes(i - w) & 0xff) * top % p
      h = ((h - out + p) % p * b + (bytes(i) & 0xff)) % p
      if (h < min) min = h
      i += 1
    }
    min
  }

  def rollingMinHash(text: Column, window: Int): Column =
    Bridge.column(RollingMinHash(Bridge.eagerExpression(text),
      Bridge.eagerExpression(org.apache.spark.sql.functions.lit(window))))
}
