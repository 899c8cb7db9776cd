package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** One engine operator exposed through the driver contract: a Spark
  * query plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * `supersededBy`: MACHINE-READABLE scale steering — when set, this
  * query is a correct, registered baseline whose cost law is known to
  * break down at corpus scale (measured in SCALE_r06/SCALE100_r07),
  * and the named registry key is the linear(ish) replacement to use
  * there. Prose steering lived in SURVEY §2 and Scaladocs since r7;
  * this field makes it programmatic, so a registry consumer picking
  * operators cannot miss it (OperatorSpec cross-checks the field
  * against §2's SUPERSEDED markers in both directions).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    supersededBy: Option[String] = None)

/** Cross-engine determinism helpers.
  *
  * Double sums are order-dependent, so a Spark 32-partition sum and a
  * DuckDB sequential sum can differ in the last ulps and break the
  * driver's hash compare. Rule used by every money/measure aggregate:
  * compute the per-row expression in DOUBLE (bit-identical in both
  * engines), cast to DECIMAL(38,6) (deterministic rounding), SUM
  * exactly in decimal, then cast the final result back to DOUBLE.
  * The DuckDB oracle mirrors the same cast chain.
  *
  * Cast SUMMANDS ONLY — never decimal-cast a lone value. A single
  * double is already bit-deterministic (there is no order to fix),
  * and the cast itself is the rule's one soft spot: when a value's
  * exact rational form lies ON a 6th-decimal half boundary (ratios
  * with 2^a·5^b denominators make that structural — e.g. a quality
  * score of exactly 0.5784375), the nearest double falls a hair to
  * one side and the engines round it differently (Spark: HALF_UP on
  * the shortest decimal repr, so 0.57843749999999993… rounds DOWN;
  * DuckDB 1.0: rounds the same double UP) — found by the sf0.001
  * probe in knn_score_diffusion and fixed by dropping the lone cast.
  * Inside sums the hazard needs BOTH (a) an exact rational value on
  * the boundary and (b) a computed double that has drifted a full
  * ulp off nearest-to-exact (multi-op chains like the quality score's
  * three-term blend). The registered summands avoid it three ways:
  * exact ≤6-decimal money values and their products (lossless cast —
  * and the regression's squared terms can't tie: x² ≡ 5000 mod 10⁴
  * has no solution since 8 is a non-residue mod 16); irrational
  * measures (cosines), where a tie has measure zero; and
  * q_time_decay's value·2⁻ᵏ, which DOES tie exactly (odd cents, k =
  * v₂(cents)+5 ⇒ e.g. 655/3200 = 0.2046875) but stays safe because
  * multiplying by a power of two is exact — the double remains
  * nearest-to-exact, its shortest repr is the tie itself, and both
  * engines round it up together.
  */
object Det {
  val Dec: DecimalType = DecimalType(38, 6)

  /** Timestamp-literal convention for date-filter queries (the pinned
    * UTC session timezone makes the NTZ-vs-TZ coercion deterministic)
    * — one definition; Analytics/Tpch delegate here.
    */
  def tsLit(s: String): Column = lit(s).cast("timestamp")

  def dec(c: Column): Column = c.cast(Dec)
  /** Exact decimal sum surfaced as a bit-deterministic double. */
  def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Deterministic average: exact decimal sum / count in double. */
  def avgd(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))
  def longCol(c: Column): Column = c.cast(LongType)
  /** DuckDB-side spelling of [[sumd]]. */
  def dsum(expr: String): String = s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"
  def davg(expr: String): String = s"(CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))"
}
