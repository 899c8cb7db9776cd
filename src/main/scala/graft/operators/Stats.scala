package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution statistics: histograms and exact percentiles.
  *
  * Percentiles use the explicit order-statistic formulation
  * (row_number selection at ceil(p*n)) instead of each engine's
  * `percentile`/`quantile` builtins, whose interpolation rules differ —
  * the explicit form is engine-independent AND is the shape that
  * scales (one shuffle on the group key; no global collect).
  */
object Stats {

  val histogram = QueryDef(
    "q_histogram",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(floor(col("value") / 10.0).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"),
          graft.Det.sumd(col("value")).as("sum_value"))
    },
    Some(s"""SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
      COUNT(*) AS n, ${graft.Det.dsum("value")} AS sum_value
    FROM events GROUP BY 1 ORDER BY bucket"""))

  /** Exact p50/p90/p99 of `value` per event type via order statistics:
    * the element at row ceil(p*n) in (value, event_id) order.
    */
  val percentiles = QueryDef(
    "q_percentiles",
    (s, d) => {
      val wOrder = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      val wAll = Window.partitionBy("event_type")
      def pick(p: Double) =
        max(when(col("rn") === ceil(col("n") * p).cast(LongType), col("value")))
          .as(s"p${(p * 100).toInt}")
      Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(wOrder).cast(LongType))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("event_type")
        .agg(max(col("n")).as("n_events"), pick(0.5), pick(0.9), pick(0.99))
    },
    Some("""WITH ranked AS (
      SELECT event_type, value,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, max(n) AS n_events,
      max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50,
      max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90,
      max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99
    FROM ranked GROUP BY event_type ORDER BY event_type"""))

  /** Correlated-subquery shape (TPC-H q17 family): lineitems whose
    * quantity is below 20% of their part's average. Expressed as a
    * join against the per-part aggregate — what a decorrelated plan
    * looks like — with the decimal-exact average for oracle parity.
    */
  val avgQtyFilter = QueryDef(
    "q_avg_qty_filter",
    (s, d) => {
      val perPart = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("p_key"))
        .agg(graft.Det.avgd(col("l_quantity")).as("avg_qty"))
      // no broadcast hint: perPart is one row per distinct part key
      // (unbounded at scale) - the shuffle join is the shape that
      // holds at 100 TB, and AQE can still pick broadcast locally
      Tables.lineitem(s, d)
        .join(perPart, col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
          col("l_partkey"), col("l_quantity"), col("avg_qty"))
    },
    Some(s"""WITH per_part AS (
      SELECT l_partkey AS p_key, ${graft.Det.davg("l_quantity")} AS avg_qty
      FROM lineitem GROUP BY 1)
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_partkey, l_quantity, avg_qty
    FROM lineitem JOIN per_part ON l_partkey = p_key
    WHERE l_quantity < avg_qty * 0.2
    ORDER BY l_orderkey, l_linenumber"""))

  /** Sliding-frame aggregates per user (last-4-events moving sum/avg).
    * The moving sum runs on DECIMAL so Spark's incremental frame
    * arithmetic and DuckDB's recompute agree exactly; the average is
    * derived from it in double space.
    */
  val movingAvg = QueryDef(
    "q_moving_avg",
    (s, d) => {
      val frame = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          Tables.eventTsMs.as("ms"), col("value"))
        .withColumn("mov_sum",
          sum(graft.Det.dec(col("value"))).over(frame).cast(DoubleType))
        .withColumn("mov_n", count(lit(1)).over(frame))
        .withColumn("mov_avg", col("mov_sum") / col("mov_n"))
        .select("event_id", "user_id", "ms", "value", "mov_sum", "mov_n", "mov_avg")
    },
    Some("""WITH base AS (
      SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value
      FROM events),
    framed AS (
      SELECT *,
        CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS mov_sum,
        COUNT(*) OVER w AS mov_n
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, ms, value, mov_sum, mov_n,
           mov_sum / mov_n AS mov_avg
    FROM framed ORDER BY event_id"""))

  /** Approximate distinct counting via graft's mergeable HLL sketch
    * ([[graft.functions.HllSketchAgg]], p=12 -> ~1.6% standard error).
    * Exact `count(distinct x)` at 100 TB shuffle-dedups every distinct
    * value; the sketch aggregates map-side into a fixed 4 KB register
    * array per group and merges by elementwise max, so the exchange
    * carries one sketch per group per map partition regardless of
    * cardinality.
    *
    * Rows-only check by design: no SQL engine replicates this exact
    * register layout; correctness evidence is HllSketchSpec (error
    * bound vs exact at several cardinalities, partition-independence
    * of the estimate, merge associativity) plus the exact distinct
    * count emitted alongside for scale-side comparison.
    */
  val approxDistinct = QueryDef(
    "q_approx_distinct",
    (s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          graft.functions.HllSketchAgg.approxDistinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
    },
    None)

  /** Approximate per-type quantiles via graft's mergeable DDSketch
    * aggregate ([[graft.functions.DdSketchAgg]], alpha=1% relative
    * error). The 100 TB complement to `q_percentiles`: the exact form
    * shuffles and sorts every row per group; the sketch aggregates
    * map-side into an ~18 KB bucket-count array per group and merges
    * by elementwise sum, so the exchange carries one sketch per group
    * per map partition regardless of row count.
    *
    * Rows-only by design (no SQL engine replicates the bucket
    * layout); correctness evidence is DdSketchSpec (relative-error
    * bound vs exact order statistics, merge determinism across
    * partitionings, boundary clamping) plus the exact p50 emitted
    * alongside from the same scan for scale-side comparison. Array
    * output is flattened to scalar columns so external row-compares
    * can sort every column (the multimodal_meta lesson).
    */
  val approxQuantiles = QueryDef(
    "q_approx_quantiles",
    (s, d) => {
      val qs = graft.functions.DdSketchAgg.approxQuantiles(
        col("value"), Seq(0.5, 0.9, 0.99))
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(qs.as("qarr"), count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_events"),
          element_at(col("qarr"), 1).as("p50_approx"),
          element_at(col("qarr"), 2).as("p90_approx"),
          element_at(col("qarr"), 3).as("p99_approx"))
    },
    None)

  /** Per-group correlation / covariance / least-squares regression of
    * price on quantity. Built from the five decimal-exact moment sums
    * (Sx, Sy, Sxx, Syy, Sxy) + count rather than corr()/covar_samp():
    * the builtin streaming-merge aggregates are order-dependent in
    * their float arithmetic, while moment sums under the Det rule are
    * bit-deterministic in both engines, and the closed-form
    * combinations in double space then agree exactly.
    *
    * The price column is pre-scaled by 1/1000 (one identical IEEE
    * division in both engines). Unscaled, Syy reaches ~20 significant
    * digits and the final decimal-to-double cast itself rounds
    * differently across engines (a decimal(38,6) is only cast-exact
    * while sum x 10^6 fits in double's 53 bits, ~9e9); scaled, every
    * moment stays cast-exact through sf1. The scale must be DECIMAL,
    * not binary: a 2^-k scale puts the clean cent grid on exact
    * 6th-decimal .5 ties where the engines' cast tie-breaking
    * differs, while /1000 lands on a 5-dp grid (never rounded) whose
    * squares cannot tie (5000 is not a quadratic residue mod 10^4).
    * Corr is scale-free; the other outputs multiply back by 1000.
    * One partial+final aggregate over the scan — the same cost as
    * the builtins.
    */
  val corrStats = QueryDef(
    "q_corr_stats",
    (s, d) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice") / 1000.0
      val base = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          graft.Det.sumd(x).as("sx"),
          graft.Det.sumd(y).as("sy"),
          graft.Det.sumd(x * x).as("sxx"),
          graft.Det.sumd(y * y).as("syy"),
          graft.Det.sumd(x * y).as("sxy"))
      val n = col("n_rows").cast(DoubleType)
      val covN = col("sxy") - col("sx") * col("sy") / n
      val varX = col("sxx") - col("sx") * col("sx") / n
      val varY = col("syy") - col("sy") * col("sy") / n
      base.select(
        col("l_returnflag"), col("n_rows"),
        (covN / (n - 1.0) * 1000.0).as("covar_samp"),
        (covN / sqrt(varX * varY)).as("corr"),
        (covN / varX * 1000.0).as("slope"),
        ((col("sy") - (covN / varX) * col("sx")) / n * 1000.0).as("intercept"))
    },
    Some(s"""WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n_rows,
        ${graft.Det.dsum("l_quantity")} AS sx,
        ${graft.Det.dsum("l_extendedprice / 1000.0")} AS sy,
        ${graft.Det.dsum("l_quantity * l_quantity")} AS sxx,
        ${graft.Det.dsum("(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)")} AS syy,
        ${graft.Det.dsum("l_quantity * (l_extendedprice / 1000.0)")} AS sxy
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, n_rows,
      (sxy - sx * sy / CAST(n_rows AS DOUBLE)) / (CAST(n_rows AS DOUBLE) - 1.0) * 1000.0 AS covar_samp,
      (sxy - sx * sy / CAST(n_rows AS DOUBLE))
        / SQRT((sxx - sx * sx / CAST(n_rows AS DOUBLE)) * (syy - sy * sy / CAST(n_rows AS DOUBLE))) AS corr,
      (sxy - sx * sy / CAST(n_rows AS DOUBLE)) / (sxx - sx * sx / CAST(n_rows AS DOUBLE)) * 1000.0 AS slope,
      (sy - ((sxy - sx * sy / CAST(n_rows AS DOUBLE)) / (sxx - sx * sx / CAST(n_rows AS DOUBLE))) * sx)
        / CAST(n_rows AS DOUBLE) * 1000.0 AS intercept
    FROM m"""))

  /** Time-RANGE window frame — the moving aggregate [[movingAvg]]'s
    * ROWS frame cannot express: each event's sum/count over the
    * TRAILING HOUR of the same user's events, however many rows that
    * is (irregular event spacing makes row-count frames semantically
    * wrong for time windows). RANGE frames include all ORDER-BY peers,
    * so same-millisecond ties contribute identically in both engines;
    * the frame sum is decimal-exact (order-independent) per the Det
    * rule. One shuffle + one sort on (user_id, ms) — same cost shape
    * as any per-key window.
    */
  val rangeFrame = QueryDef(
    "q_range_frame",
    (s, d) => {
      val HourMs = 3600000L
      val frame = Window.partitionBy("user_id").orderBy(col("ms"))
        .rangeBetween(-HourMs, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          Tables.eventTsMs.as("ms"), col("value"))
        .withColumn("hour_sum",
          sum(graft.Det.dec(col("value"))).over(frame).cast(DoubleType))
        .withColumn("hour_n", count(lit(1)).over(frame))
        .select("event_id", "user_id", "ms", "hour_sum", "hour_n")
    },
    Some("""WITH e AS (
      SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value
      FROM events)
    SELECT event_id, user_id, ms,
      CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS hour_sum,
      COUNT(*) OVER w AS hour_n
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ms
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id"""))

  /** Whole-table column profile — the data-quality triage every
    * pipeline runs on a new drop: per column, row/non-null/distinct
    * counts plus min/max (numeric and string kept in separate typed
    * columns). `ts` is profiled as epoch-ms — raw nanos exceed
    * double's 2^53 integer range and min/max surface as DOUBLE here.
    * At 100 TB the Expand is the dominant cost; the drop-in fix is
    * swapping each count(distinct) for the mergeable HLL
    * ([[approxDistinct]]'s aggregate]) — one pass, no Expand — kept
    * exact here so the oracle can hash-match.
    *
    * TWO aggregates over the scan, deliberately not one (r13, found
    * by the plan-budget net): min/max over the STRING columns carry
    * string aggregation buffers, and one immutable buffer demotes the
    * whole fused aggregate to SortAggregate — which sorted the
    * 7x-EXPANDED multi-distinct stream on the grouped side of the
    * exchange (the r12 spill class, riding on the profile's most
    * expensive stream). Split, the distinct/count aggregate is all
    * long buffers (HashAggregate over the Expand, no sort anywhere)
    * and the min/max aggregate is UNGROUPED — an ungrouped
    * SortAggregate has no ordering requirement, so it sorts nothing.
    * The two one-row results meet in a broadcast cross join (the
    * scalar-denominator idiom).
    */
  val profile = QueryDef(
    "q_profile", {
      val numericCols = Seq("event_id", "user_id", "ts_ms", "value")
      val stringCols = Seq("event_type", "props")
      (s, d) => {
        val e = Tables.events(s, d)
          .withColumn("ts_ms", Tables.eventTsMs).drop("ts")
        val countAggs =
          Seq(count(lit(1)).as("n")) ++
            (numericCols ++ stringCols).flatMap { c =>
              Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c"))
            }
        val minMaxAggs =
          numericCols.flatMap { c =>
            Seq(min(col(c)).cast(DoubleType).as(s"mn_$c"),
              max(col(c)).cast(DoubleType).as(s"mx_$c"))
          } ++
            stringCols.flatMap { c =>
              Seq(min(col(c)).as(s"mns_$c"), max(col(c)).as(s"mxs_$c"))
            }
        val rows =
          numericCols.map { c =>
            struct(lit(c).as("col_name"), col("n").as("n_rows"),
              col(s"nn_$c").as("n_nonnull"), col(s"nd_$c").as("n_distinct"),
              col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
              lit(null).cast(StringType).as("min_str"),
              lit(null).cast(StringType).as("max_str"))
          } ++ stringCols.map { c =>
            struct(lit(c).as("col_name"), col("n").as("n_rows"),
              col(s"nn_$c").as("n_nonnull"), col(s"nd_$c").as("n_distinct"),
              lit(null).cast(DoubleType).as("min_num"),
              lit(null).cast(DoubleType).as("max_num"),
              col(s"mns_$c").as("min_str"), col(s"mxs_$c").as("max_str"))
          }
        e.agg(countAggs.head, countAggs.tail: _*)
          .crossJoin(broadcast(e.agg(minMaxAggs.head, minMaxAggs.tail: _*)))
          .select(explode(array(rows: _*)).as("r"))
          .select("r.*")
      }
    },
    Some {
      val numericCols = Seq("event_id", "user_id", "ts_ms", "value")
      val stringCols = Seq("event_type", "props")
      val aggSelect =
        (Seq("COUNT(*) AS n") ++
          (numericCols ++ stringCols).flatMap(c =>
            Seq(s"COUNT($c) AS nn_$c", s"COUNT(DISTINCT $c) AS nd_$c")) ++
          numericCols.flatMap(c =>
            Seq(s"CAST(MIN($c) AS DOUBLE) AS mn_$c", s"CAST(MAX($c) AS DOUBLE) AS mx_$c")) ++
          stringCols.flatMap(c =>
            Seq(s"MIN($c) AS mns_$c", s"MAX($c) AS mxs_$c"))).mkString(", ")
      val branches =
        numericCols.map(c =>
          s"""SELECT '$c' AS col_name, n AS n_rows, nn_$c AS n_nonnull,
             nd_$c AS n_distinct, mn_$c AS min_num, mx_$c AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a""") ++
          stringCols.map(c =>
            s"""SELECT '$c' AS col_name, n AS n_rows, nn_$c AS n_nonnull,
               nd_$c AS n_distinct, CAST(NULL AS DOUBLE) AS min_num,
               CAST(NULL AS DOUBLE) AS max_num, mns_$c AS min_str, mxs_$c AS max_str FROM a""")
      s"""WITH e AS (
        SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
               event_type, value, props
        FROM events),
      a AS (SELECT $aggSelect FROM e)
      ${branches.mkString("\n      UNION ALL\n      ")}
      ORDER BY col_name"""
    })

  /** Robust statistics per group: exact (lower-)median and MAD
    * (median absolute deviation) — the outlier-detection pair that,
    * unlike mean/stddev, a few corrupt rows cannot drag. Same explicit
    * order-statistic formulation as [[percentiles]] (element at
    * ceil(n/2) — no interpolation, engine-independent), run twice:
    * once over values, once over |v - median| after a 5-row broadcast
    * join of the medians. Both ranking passes share the group key's
    * partitioning; ties break on event_id so the result is unique.
    */
  val mad = QueryDef(
    "q_mad",
    (s, d) => {
      val wAll = Window.partitionBy("event_type")
      def lowerMedian(order: org.apache.spark.sql.Column) =
        max(when(col("rn") === ceil(col("n") * 0.5).cast(LongType), order))
      val base = Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"))
      val meds = base
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("value"), col("event_id")))
          .cast(LongType))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("event_type")
        .agg(lowerMedian(col("value")).as("med"), max(col("n")).as("n_events"))
      base.join(broadcast(meds), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("dev"), col("event_id")))
          .cast(LongType))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("event_type")
        .agg(max(col("n_events")).as("n_events"),
          max(col("med")).as("median"),
          lowerMedian(col("dev")).as("mad"))
    },
    Some("""WITH base AS (
      SELECT event_type, value, event_id FROM events),
    ranked AS (
      SELECT event_type, value,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM base),
    meds AS (
      SELECT event_type,
        max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS med,
        max(n) AS n_events
      FROM ranked GROUP BY event_type),
    devs AS (
      SELECT b.event_type, abs(b.value - m.med) AS dev, b.event_id,
             m.med, m.n_events
      FROM base b JOIN meds m USING (event_type)),
    ranked2 AS (
      SELECT event_type, dev, med, n_events,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS BIGINT) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM devs)
    SELECT event_type, max(n_events) AS n_events, max(med) AS median,
      max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN dev END) AS mad
    FROM ranked2 GROUP BY event_type ORDER BY event_type"""))

  /** Per-user hourly-count anomaly detection — the monitoring query a
    * stream-analytics engine runs on its own event volumes: flag the
    * hours where a user's event count deviates from that user's mean
    * hourly count by more than 3 population standard deviations.
    *
    * Determinism: the z-test is done ENTIRELY in integer algebra. With
    * per-user hour count n, S1 = Σc, S2 = Σc², hour h is anomalous iff
    *
    *   (n·c_h − S1)² > 9·(n·S2 − S1²)
    *
    * which is z² > 3² with both sides multiplied by n² — every term a
    * product/sum of exact integers, so there is no float epsilon and
    * the flag bit is hash-identical cross-engine. The products run in
    * DECIMAL(38,0) (the mix_kl rule): long arithmetic would WRAP
    * silently once S1² or dev² passes 2^63 (a user with ~3.1e9 total
    * events gets there) while DuckDB's SUM promotes to HUGEINT and
    * stays exact — the flags would silently diverge. Decimal keeps
    * both engines exact to 10^38, far past any real telemetry volume.
    *
    * Scale shape: two map-side-combinable aggregates (events→hourly
    * counts, counts→per-user moments) + one broadcast-sized join back
    * on user_id — the moments table is one row per user. No window
    * functions, no sort.
    */
  val anomalyHourly = QueryDef(
    "q_anomaly_hourly",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("user_id"), expr("ts div 3600000000000").as("hour"))
        .agg(count(lit(1)).as("cnt"))
      val moments = hourly.groupBy(col("user_id").as("mu"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
          sum(col("cnt") * col("cnt")).as("s2"))
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val (n38, c38, s1d, s2d) = (col("n").cast(d38), col("cnt").cast(d38),
        col("s1").cast(d38), col("s2").cast(d38))
      val dev = n38 * c38 - s1d
      hourly.join(moments, col("user_id") === col("mu"))
        .filter(dev * dev > lit(9L).cast(d38) * (n38 * s2d - s1d * s1d))
        .select(col("user_id"), col("hour"), col("cnt"))
    },
    Some("""WITH hourly AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS hour,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    moments AS (
      SELECT user_id AS mu, COUNT(*) AS n, SUM(cnt) AS s1, SUM(cnt * cnt) AS s2
      FROM hourly GROUP BY 1)
    SELECT user_id, hour, cnt
    FROM hourly JOIN moments ON user_id = mu
    WHERE (n * cnt - s1) * (n * cnt - s1) > 9 * (n * s2 - s1 * s1)
    ORDER BY user_id, hour"""))

  /** Streaming state-store sizing audit — the capacity-planning query
    * run against history before deploying the [[graft.streaming]]
    * operators: projected state rows per stateful component, from the
    * batch events table.
    *
    *  - keyed_state_keys: distinct users = per-key state rows of the
    *    pattern detector / anomaly detector (constant bytes per key);
    *  - dedup_peak_keys_10m: UPPER BOUND on the peak keys
    *    `dropDuplicatesWithinWatermark` holds at a 10-min watermark
    *    (event ids are unique): max over adjacent-bucket-pair sums —
    *    a 10-min sliding window spans at most two tumbling buckets,
    *    so the true sliding peak is ≤ this bound (a single-bucket max
    *    would undercount a boundary-straddling burst by up to 2x, the
    *    dangerous direction for sizing);
    *  - session_peak_users_30m: the same adjacent-pair upper bound on
    *    distinct users active in any sliding 30 minutes = peak
    *    concurrently-open session windows;
    *  - tumbling_windows_total_10m: distinct (user, 10-min window)
    *    pairs = total windows the tumbling aggregate materializes
    *    over the whole history (retention upper bound).
    *
    * Four global aggregates over one pruned scan each, every one
    * map-side combinable; the unioned output is four rows. Exact
    * integer counts — trivially deterministic.
    */
  val stateSizing = QueryDef(
    "q_state_sizing",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 600000000000").as("b10"),
          expr("ts div 1800000000000").as("b30"))
      def row(name: String, v: org.apache.spark.sql.DataFrame) =
        v.select(lit(name).as("component"), col("v").cast(LongType).as("projected_rows"))
      // Peak components take the max over ADJACENT-bucket-pair sums,
      // not single tumbling buckets: a 10-min sliding window spans at
      // most two adjacent 10-min buckets, so peak ≤ max(c_t + c_t+1)
      // while max(c_t) alone UNDERCOUNTS a burst straddling a bucket
      // boundary by up to 2x — the dangerous direction for a state
      // store sized from this audit. The pair sum double-counts keys
      // present in both buckets; an over-estimate is the safe side.
      def peakPair(bucketed: org.apache.spark.sql.DataFrame) = {
        val nxt = bucketed.select((col("b") - 1).as("b"), col("c").as("cn"))
        bucketed.join(nxt, Seq("b"), "left_outer")
          .agg(max(col("c") + coalesce(col("cn"), lit(0L))).as("v"))
      }
      row("dedup_peak_keys_10m",
          peakPair(ev.groupBy(col("b10").as("b")).agg(count(lit(1)).as("c"))))
        .unionByName(row("keyed_state_keys",
          ev.agg(countDistinct(col("user_id")).as("v"))))
        .unionByName(row("session_peak_users_30m",
          peakPair(ev.groupBy(col("b30").as("b"))
            .agg(countDistinct(col("user_id")).as("c")))))
        .unionByName(row("tumbling_windows_total_10m",
          ev.agg(countDistinct(col("user_id"), col("b10")).as("v"))))
    },
    Some("""WITH ev AS (
      SELECT user_id,
        epoch_ms(CAST(ts AS TIMESTAMP)) // 600000 AS b10,
        epoch_ms(CAST(ts AS TIMESTAMP)) // 1800000 AS b30
      FROM events)
    SELECT 'dedup_peak_keys_10m' AS component,
      CAST(MAX(x.c + COALESCE(y.c, 0)) AS BIGINT) AS projected_rows
      FROM (SELECT b10, COUNT(*) AS c FROM ev GROUP BY b10) x
      LEFT JOIN (SELECT b10, COUNT(*) AS c FROM ev GROUP BY b10) y
        ON y.b10 = x.b10 + 1
    UNION ALL
    SELECT 'keyed_state_keys', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev
    UNION ALL
    SELECT 'session_peak_users_30m', CAST(MAX(x.c + COALESCE(y.c, 0)) AS BIGINT)
      FROM (SELECT b30, COUNT(DISTINCT user_id) AS c FROM ev GROUP BY b30) x
      LEFT JOIN (SELECT b30, COUNT(DISTINCT user_id) AS c FROM ev GROUP BY b30) y
        ON y.b30 = x.b30 + 1
    UNION ALL
    SELECT 'tumbling_windows_total_10m',
      CAST(COUNT(DISTINCT (user_id, b10)) AS BIGINT) FROM ev
    ORDER BY component"""))

  /** Incremental aggregate maintenance, proven exact: daily partial
    * aggregates per (day, event_type) merged up to weekly totals —
    * the two-level shape every materialized-rollup pipeline runs (the
    * daily partials persist; each new day merges in without
    * re-scanning history). The DuckDB oracle computes the weekly
    * totals DIRECTLY from the raw events, so the hash match is the
    * proof that the partial/merge decomposition loses nothing: counts
    * are associative integers and the value sums follow the
    * [[graft.Det]] decimal rule at BOTH levels (decimal sums
    * re-aggregate exactly; a double sum-of-sums would not).
    *
    * Scale shape: level 1 is a map-side-combinable aggregate on
    * (day, type) — the exchange carries one row per day×type per map
    * partition; level 2 re-aggregates the day-sized partial table.
    * At 100 TB only level 1 ever sees raw data, once per day.
    */
  val aggMerge = QueryDef(
    "q_agg_merge",
    (s, d) => {
      import graft.Det._
      val daily = Tables.events(s, d)
        .groupBy(expr("ts div 86400000000000").as("day"), col("event_type"))
        .agg(count(lit(1)).as("pc"), sum(dec(col("value"))).as("ps"))
      daily
        .groupBy(expr("day div 7").as("week"), col("event_type"))
        .agg(sum(col("pc")).as("n_events"),
          sum(col("ps")).cast(DoubleType).as("sum_value"))
    },
    Some("""SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 // 7 AS week,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY week, event_type"""))

  val defs: Seq[QueryDef] = Seq(histogram, percentiles, avgQtyFilter, movingAvg,
    approxDistinct, approxQuantiles, corrStats, rangeFrame, profile, mad,
    anomalyHourly, stateSizing, aggMerge)
}
