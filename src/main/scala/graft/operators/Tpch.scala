package graft.operators

import graft.{QueryDef, Tables}
import graft.Det._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The remaining TPC-H-shaped queries, completing the numbered suite
  * begun in [[Analytics]] (q1/3/5/6/7/14/19/21/22 there; q8 is
  * `q_market_share`, q13 is `q_count_distribution`, and the q17
  * decorrelation family is `q_avg_qty_filter`).
  *
  * The synthetic testdata has no `partsupp` table, so q2/q9/q11/q16/
  * q20 — whose semantics are *about* the part-supplier relation — are
  * out of scope rather than faked. Two columns are also absent and
  * substituted faithfully where noted: `l_commitdate`/`l_receiptdate`
  * (q4/q12 lateness becomes shipdate-vs-orderdate lag) and
  * `l_shipmode` (q12 groups by `l_linestatus` instead).
  *
  * Scale notes (100 TB intent): every query is a declarative
  * fact-scan + broadcast-dimension join + map-side-combinable
  * aggregate; the only fact-fact self-references (q4's EXISTS, q18's
  * HAVING probe) are equi-joins on the order key — shuffle-hash on
  * one key, never correlated re-execution. Money aggregates follow
  * the [[graft.Det]] decimal-sum rule so the DuckDB oracle
  * hash-matches bit-exactly.
  */
object Tpch {

  private def ts(s: String) = graft.Det.tsLit(s)

  /** TPC-H Q4 (order priority checking): orders of one quarter with at
    * least one late line, counted per priority. Lateness here is
    * "shipped more than 60 days after the order was placed" (the
    * testdata carries no commit/receipt dates). The EXISTS
    * decorrelates to a left-semi join on the order key; the date lag
    * is a residual join condition, evaluated inside the hash join.
    */
  val q4 = QueryDef(
    "q4_order_priority",
    (s, d) => {
      val late = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1997-07-01") && col("o_orderdate") < ts("1997-10-01"))
        .join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q10 (returned item reporting): the 20 customers who lost
    * the most revenue to returns in one quarter. One shuffle on the
    * group key; customer and nation broadcast into the fact scan;
    * top-20 executes as TakeOrdered (per-partition heaps), with
    * c_custkey breaking revenue ties deterministically.
    */
  val q10 = QueryDef(
    "q10_returned_items",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name")
        .agg(sumd(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, c_acctbal, c_mktsegment, n_name,
      ${dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** TPC-H Q12 (shipping priority vs line status): among lines shipped
    * more than 90 days after their order date, count critical-priority
    * vs other orders per line status (`l_linestatus` stands in for the
    * absent `l_shipmode`; the lag substitutes for commit/receipt dates
    * as in [[q4]]). The CASE pair is one conditional-aggregation pass
    * — both counts come out of a single fact scan and one 2-row
    * shuffle.
    */
  val q12 = QueryDef(
    "q12_priority_shipping",
    (s, d) => {
      val critical = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
    },
    Some("""SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** TPC-H Q15 (top supplier): the supplier(s) whose one-quarter
    * revenue equals the maximum. The scalar subquery becomes a
    * broadcast of the one-row max into the per-supplier aggregate —
    * the aggregate is computed ONCE and reused for both sides (same
    * exchange feeds the max and the equality probe). Revenue equality
    * is exact because both sides stay in DECIMAL until the final
    * output cast.
    */
  val q15 = QueryDef(
    "q15_top_supplier",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("total_rev"))
      val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_revenue"))
    },
    Some("""WITH rev AS (
      SELECT l_suppkey,
        SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM rev, supplier
    WHERE l_suppkey = s_suppkey AND total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey"""))

  /** TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    * lost if small orders of one brand's parts were not taken. The
    * correlated per-part average decorrelates to a join against the
    * per-part aggregate — computed over ONLY the brand's parts (the
    * broadcast part filter lands below both aggregates, so the fact
    * scan prunes first; contrast `q_avg_qty_filter`, the unfiltered
    * family). Final ratio is 6-dp floor-quantized per the
    * [[graft.Det]] ratio rule.
    */
  val q17 = QueryDef(
    "q17_small_qty_revenue",
    (s, d) => {
      val brandLines = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#23").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
      val perPart = brandLines
        .groupBy(col("p_partkey").as("pk"))
        .agg(avgd(col("l_quantity")).as("avg_qty"))
      brandLines
        .join(perPart, col("p_partkey") === col("pk"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg(sum(dec(col("l_extendedprice"))).as("s"))
        .select((floor(col("s").cast(DoubleType) / 7.0 * 1e6) / 1e6).as("avg_yearly"))
    },
    Some("""WITH brand_lines AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND p_brand = 'Brand#23'),
    per_part AS (
      SELECT l_partkey AS pk,
        (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) AS avg_qty
      FROM brand_lines GROUP BY 1)
    SELECT floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
      / 7.0 * 1e6) / 1e6 AS avg_yearly
    FROM brand_lines, per_part
    WHERE l_partkey = pk AND l_quantity < avg_qty * 0.2"""))

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds 250, with their customer. The HAVING probe is a
    * self-aggregate of the fact joined back on the order key — at
    * scale the aggregate output (one row per qualifying order, rare
    * by construction) broadcasts into the orders scan. Top-100 by
    * price via TakeOrdered with full deterministic tie-break.
    */
  val q18 = QueryDef(
    "q18_large_orders",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("big_okey"))
        .agg(sum(dec(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("big_okey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("total_qty").cast(DoubleType).as("total_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      CAST(total_qty AS DOUBLE) AS total_qty
    FROM orders, customer,
      (SELECT l_orderkey AS big_okey,
              SUM(CAST(l_quantity AS DECIMAL(38,6))) AS total_qty
       FROM lineitem GROUP BY 1
       HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250) big
    WHERE o_orderkey = big_okey AND o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100"""))

  val defs: Seq[QueryDef] = Seq(q4, q10, q12, q15, q17, q18)
}
