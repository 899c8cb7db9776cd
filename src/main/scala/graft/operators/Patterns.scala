package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Event-sequence pattern operators — the batch re-expression of the
  * CEP (complex-event-processing) surface a Flink-family engine offers
  * (reference context: flink-tank processes a keyed event stream;
  * pattern detection over such streams is the canonical extension —
  * see jobs/src/main/kotlin/.../EventProcessorJob.kt for the keyed
  * per-user model these operators inherit).
  *
  * Two CEP contiguity modes, each as its own query:
  *  - `q_pattern_match` — STRICT contiguity ("next"): event B is the
  *    immediately-following event of the same key. Lead window over
  *    (ms, event_id); one shuffle on user_id, no join.
  *  - `q_funnel` — RELAXED contiguity ("followedBy"): stage N+1 is the
  *    first qualifying event after stage N within the window. Each
  *    stage is a filtered min-aggregate joined on the key; stage
  *    tables carry at most one row per user, so every stage join is
  *    broadcast-eligible and the whole funnel is a chain of narrow
  *    equi-joins — no window sort over the full stream.
  *
  * The streaming counterpart (true incremental state machine via
  * flatMapGroupsWithState) is [[graft.streaming.EventStream.patternDetect]].
  *
  * Scale posture: funnel and pattern match shuffle the events scan
  * exactly once on user_id; retention runs its
  * distinct/cohort/join chain as a few user-keyed exchanges over the
  * DEDUPED (user, week) activity table (user-cardinality-sized, not
  * event-sized); the two range joins scan orders/lineitem, not
  * events — q_range_join shuffles on derived week bins and
  * q_range_join_custom broadcasts a top-k of orders and shuffles
  * nothing. No query materializes the cross product of sides.
  */
object Patterns {

  private val tsMs = graft.Tables.eventTsMs
  private val DayMs = 86400000L
  private val HourMs = 3600000L

  /** Relaxed-contiguity funnel: view -> click -> purchase, where each
    * later stage must happen strictly after the previous one and the
    * whole journey within 24 h of the user's FIRST view. Output is the
    * one-row conversion report (stage user-counts + floor-quantized
    * conversion rates — floor(r*1e6)/1e6 of a bit-identical IEEE
    * division is deterministic cross-engine, unlike half-up rounding).
    */
  val funnel = QueryDef(
    "q_funnel",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), tsMs.as("ms"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ms")).as("t_view"))
      val clicks = ev.filter(col("event_type") === "click")
        .join(views, "user_id")
        .filter(col("ms") > col("t_view") && col("ms") <= col("t_view") + DayMs)
        .groupBy("user_id")
        .agg(min(col("ms")).as("t_click"), min(col("t_view")).as("t_view"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .join(clicks, "user_id")
        .filter(col("ms") > col("t_click") && col("ms") <= col("t_view") + DayMs)
        .groupBy("user_id").agg(min(col("ms")).as("t_purchase"))
      def n(df: org.apache.spark.sql.DataFrame, as: String) =
        df.agg(count(lit(1)).as(as))
      // NULL rate when the funnel base is empty (a corpus with no
      // view events) — an unguarded division is an ANSI-mode error
      def rate(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
        when(den === 0L, lit(null).cast(DoubleType))
          .otherwise(floor(num.cast(DoubleType) / den.cast(DoubleType) * 1e6) / 1e6)
      n(views, "n_view_users")
        .crossJoin(n(clicks, "n_click_users"))
        .crossJoin(n(purchases, "n_purchase_users"))
        .select(col("n_view_users"), col("n_click_users"), col("n_purchase_users"),
          rate(col("n_click_users"), col("n_view_users")).as("click_conv"),
          rate(col("n_purchase_users"), col("n_view_users")).as("purchase_conv"))
    },
    Some(s"""WITH e AS (
      SELECT user_id, event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
      FROM events),
    v AS (
      SELECT user_id, MIN(ms) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ms) AS t_click, MIN(v.t_view) AS t_view
      FROM e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ms > v.t_view
        AND e.ms <= v.t_view + $DayMs
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ms) AS t_purchase
      FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ms > c.t_click
        AND e.ms <= c.t_view + $DayMs
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
           (SELECT COUNT(*) FROM c) AS n_click_users,
           (SELECT COUNT(*) FROM p) AS n_purchase_users,
           CASE WHEN (SELECT COUNT(*) FROM v) = 0 THEN NULL
                ELSE FLOOR(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                  / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) * 1e6) / 1e6
           END AS click_conv,
           CASE WHEN (SELECT COUNT(*) FROM v) = 0 THEN NULL
                ELSE FLOOR(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                  / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) * 1e6) / 1e6
           END AS purchase_conv"""))

  /** Strict-contiguity pattern ("next" in CEP terms): a view whose
    * IMMEDIATELY following event for the same user is a purchase, at
    * most 1 h later. One lead() pass over the per-user order
    * (ms, event_id — the composite is unique, so ordering and output
    * are deterministic); emits the matched pair and its gap.
    */
  val patternMatch = QueryDef(
    "q_pattern_match",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), tsMs.as("ms"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("next_id", lead(col("event_id"), 1).over(w))
        .withColumn("next_ms", lead(col("ms"), 1).over(w))
        .filter(col("event_type") === "view" && col("next_type") === "purchase" &&
          col("next_ms") - col("ms") <= HourMs)
        .select(col("user_id"), col("event_id").as("view_event_id"),
          col("next_id").as("purchase_event_id"),
          (col("next_ms") - col("ms")).as("gap_ms"))
    },
    Some(s"""WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
      FROM events),
    led AS (
      SELECT *,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS next_type,
        lead(event_id) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS next_id,
        lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS next_ms
      FROM e)
    SELECT user_id, event_id AS view_event_id, next_id AS purchase_event_id,
           next_ms - ms AS gap_ms
    FROM led
    WHERE event_type = 'view' AND next_type = 'purchase'
      AND next_ms - ms <= $HourMs
    ORDER BY user_id, view_event_id"""))

  /** Interval-overlap (range) join, re-planned for scale as a BINNED
    * EQUI-JOIN: orders are "open" for 30 days from o_orderdate; report
    * open-order count and value per calendar week. A naive plan is a
    * range join (weeks x orders with BETWEEN — quadratic blowup and no
    * hash partitioning); graft explodes each interval into the week
    * bins it covers (bounded fan-out = interval span / bin width = at
    * most 6 here) and aggregates on the bin key — one narrow shuffle,
    * partial aggregation, no range predicate anywhere in the plan. The
    * DuckDB oracle deliberately spells the SAME semantics as a true
    * BETWEEN range join, proving the bin rewrite exact.
    */
  val rangeJoin = QueryDef(
    "q_range_join",
    (s, d) => {
      val OpenDays = 30
      // o_orderdate is TIMESTAMP_NTZ; the session runs UTC, so the
      // cast reads the wall-clock as a UTC instant (= DuckDB epoch_ms)
      val day = s"(unix_millis(cast(o_orderdate as timestamp)) div $DayMs)"
      Tables.orders(s, d)
        .select(col("o_totalprice"),
          expr(s"$day div 7").as("w0"),
          expr(s"($day + ${OpenDays - 1}) div 7").as("w1"))
        .select(col("o_totalprice"), explode(sequence(col("w0"), col("w1"))).as("week"))
        .groupBy("week")
        .agg(count(lit(1)).as("n_open_orders"),
          graft.Det.sumd(col("o_totalprice")).as("open_value"))
    },
    Some(s"""WITH iv AS (
      SELECT o_totalprice,
             (epoch_ms(o_orderdate) // $DayMs) // 7 AS w0,
             ((epoch_ms(o_orderdate) // $DayMs) + 29) // 7 AS w1
      FROM orders),
    weeks AS (
      SELECT unnest(range((SELECT MIN(w0) FROM iv), (SELECT MAX(w1) FROM iv) + 1)) AS week)
    SELECT week, COUNT(*) AS n_open_orders,
           ${graft.Det.dsum("o_totalprice")} AS open_value
    FROM weeks JOIN iv ON week BETWEEN w0 AND w1
    GROUP BY week ORDER BY week"""))

  /** The interval-overlap query again, through graft's custom
    * broadcast interval-stab operator ([[graft.plans.RangeJoin]]) —
    * the C11/C11b pairing applied to C32: same family, no bounded-
    * interval-length assumption. Audit scenario: the 20 highest-value
    * orders define 30-day audit windows; count (and sum quantity of)
    * ALL corpus ship events falling inside each window. The window
    * side is a global top-k (TakeOrdered) of at most 20 rows — the
    * legitimate broadcast build; the lineitem probe side never
    * shuffles before the final 20-group aggregate. The oracle spells
    * the raw BETWEEN range join, proving the operator's hit set
    * exactly; overlapping audit windows double-count by design (each
    * window reports its own activity).
    */
  val rangeJoinCustom = QueryDef(
    "q_range_join_custom",
    (s, d) => {
      val AuditK = 20
      val oday = s"(unix_millis(cast(o_orderdate as timestamp)) div $DayMs)"
      val sday = s"(unix_millis(cast(l_shipdate as timestamp)) div $DayMs)"
      val audits = Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(AuditK)
        .select(col("o_orderkey"), expr(oday).as("d0"))
      val ships = Tables.lineitem(s, d)
        .select(expr(sday).as("d"), col("l_quantity"))
      graft.plans.GraftOps.rangeJoin(ships, audits,
          col("d"), col("d0"), col("d0") + lit(29))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped"),
          graft.Det.sumd(col("l_quantity")).as("qty_shipped"))
    },
    Some(s"""WITH audits AS (
      SELECT o_orderkey, epoch_ms(o_orderdate) // $DayMs AS d0
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20),
    ships AS (
      SELECT epoch_ms(l_shipdate) // $DayMs AS d, l_quantity FROM lineitem)
    SELECT o_orderkey, COUNT(*) AS n_shipped,
      ${graft.Det.dsum("l_quantity")} AS qty_shipped
    FROM audits JOIN ships ON d BETWEEN d0 AND d0 + 29
    GROUP BY o_orderkey ORDER BY o_orderkey"""))

  /** Cohort retention matrix — the product-analytics staple next to
    * the funnel: users cohorted by first-active week, then for each
    * (cohort_week, week_offset) the count of still-active users.
    * Activity is first collapsed to DISTINCT (user, week) — the join
    * and the final aggregate run on user-weeks, not raw events — and
    * each user contributes once per week by construction, so the final
    * count is a plain map-combinable count(*), not a count(distinct).
    * Two shuffles total (user-week dedup; cohort/offset aggregate) —
    * the cohort join reuses the user_id partitioning.
    */
  val retention = QueryDef(
    "q_retention",
    (s, d) => {
      val WeekMs = 7L * DayMs
      val act = Tables.events(s, d)
        .select(col("user_id"), expr(s"(ts div 1000000) div $WeekMs").as("week"))
        .distinct()
      val cohorts = act.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      act.join(cohorts, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
    },
    Some(s"""WITH act AS (
      SELECT DISTINCT user_id,
             epoch_ms(CAST(ts AS TIMESTAMP)) // ${7L * DayMs} AS week
      FROM events),
    cohorts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id)
    SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
           COUNT(*) AS n_active
    FROM act a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2"""))

  val defs: Seq[QueryDef] = Seq(funnel, patternMatch, rangeJoin,
    rangeJoinCustom, retention)
}
