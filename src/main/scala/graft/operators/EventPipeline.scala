package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch re-expression of the reference's event pipeline.
  *
  * Reference semantics (flink-tank):
  *  - EventProcessorJob.kt:79-97  `ParseAndRoute`   — JSON parse, valid
  *    events forward, malformed to an error side-output.
  *  - EventProcessorJob.kt:99-128 `EnrichValidEvent` — keyed ValueState
  *    sequence counter + processingDelay + enrichment metadata.
  *  - AggregationJob.kt:109-206   `SlidingWindowAggregator` — per-user
  *    sliding window (10 min) event counts, total + per-type.
  *  - EventProducer.kt:28-51      — synthetic generator, 50 users, 5
  *    types, 5% malformed (4 shapes).
  *
  * Spark-first re-expression: the parse path is `from_json` routing on
  * null-struct (Catalyst JsonToStructs, not a UDF); keyed state
  * becomes a window-function over event time (the deterministic batch
  * analog of a ValueState counter — same per-key ordering contract as
  * EventProcessorJobTest "should assign a sequence ... per-key
  * basis"); sliding windows use `window()` which Spark expands to the
  * window-set without per-key timers; per-type maps are pivoted to
  * columns so the shuffle carries fixed-width rows.
  *
  * Streaming equivalents live in [[graft.streaming]]; bodies are
  * shared where the API allows.
  */
object EventPipeline {

  /** Event types present in the synthetic `events` table. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  // `ts` arrives as Long nanos — whatever the parquet physical
  // encoding, Tables.events normalizes it (see EncodingSpec). Integer
  // `div` keeps full precision (a double division would lose sub-ms
  // bits at 1.7e18 ns magnitudes). The DuckDB oracle's
  // CAST(ts AS TIMESTAMP) + epoch_ms truncates identically
  // (floor(ns/1e6) == floor(floor(ns/1e3)/1e3) for positive ns).
  private val tsCol = timestamp_micros(expr("ts div 1000"))
  private val tsMs = graft.Tables.eventTsMs

  private val parsedSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("ts_ms", LongType),
    StructField("k", LongType)))

  /** Reconstructs the "raw Kafka payload" view of the events table:
    * `event_type='error'` rows become malformed JSON (mirroring the
    * producer's 5% malformed share), everything else a valid JSON
    * event — only int/string fields so the string is bit-identical to
    * the DuckDB oracle's reconstruction.
    */
  private def withRaw(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).withColumn("raw",
      when(col("event_type") === "error",
        concat(lit("{invalid payload #"), col("event_id")))
        .otherwise(concat(
          lit("{\"id\": "), col("user_id"),
          lit(", \"type\": \""), col("event_type"),
          lit("\", \"ts_ms\": "), tsMs,
          // coalesce: a props payload without 'k' must not
          // null-propagate through concat and misroute the event to
          // the error stream - it becomes a JSON null instead
          lit(", \"k\": "), coalesce(get_json_object(col("props"), "$.k"), lit("null")),
          lit("}"))))

  val parseRouteValid = QueryDef(
    "ep_parse_route_valid",
    (s, d) => {
      withRaw(s, d)
        .select(col("event_id"), from_json(col("raw"), parsedSchema).as("p"))
        .filter(col("p.id").isNotNull)
        .select(col("event_id"), col("p.id").as("id"), col("p.type").as("type"),
          col("p.ts_ms").as("ts_ms"), col("p.k").as("k"))
    },
    Some("""SELECT event_id, user_id AS id, event_type AS type,
      epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
      CAST(props->>'k' AS BIGINT) AS k
    FROM events WHERE event_type <> 'error'"""))

  /** Full ErrorEvent parity with the reference (EventProcessorJob.kt:88-93
    * `ErrorEvent(rawMessage, errorType, errorMessage, timestamp)`): the
    * reference stamps wall-clock time at error creation; the
    * deterministic batch analog is the event's own timestamp (the same
    * data-derived-clock convention as [[processingDelay]]).
    */
  val parseRouteError = QueryDef(
    "ep_parse_route_error",
    (s, d) => {
      withRaw(s, d)
        .withColumn("p", from_json(col("raw"), parsedSchema))
        .filter(col("p.id").isNull)
        .select(col("event_id"), col("raw").as("raw_message"),
          lit("PARSE_ERROR").as("error_type"),
          lit("unparseable, type-corrupt, or missing id").as("error_message"),
          tsMs.as("error_ts_ms"))
    },
    Some("""SELECT event_id,
      '{invalid payload #' || event_id AS raw_message,
      'PARSE_ERROR' AS error_type,
      'unparseable, type-corrupt, or missing id' AS error_message,
      epoch_ms(CAST(ts AS TIMESTAMP)) AS error_ts_ms
    FROM events WHERE event_type = 'error'"""))

  val enrichSequence = QueryDef(
    "ep_enrich_sequence",
    (s, d) => {
      // Order on ms-truncated time both engines (DuckDB only sees us
      // after its ns->TIMESTAMP cast; ms + event_id tie-break is
      // identical on both sides).
      val w = Window.partitionBy("user_id").orderBy(tsMs, col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          row_number().over(w).cast(LongType).as("sequence"))
    },
    Some("""SELECT event_id, user_id, event_type,
      CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) AS BIGINT) AS sequence
    FROM events"""))

  val processingDelay = QueryDef(
    "ep_processing_delay",
    (s, d) => {
      val ev = Tables.events(s, d)
      // Deterministic batch "now": the max event time. The reference
      // uses wall-clock (EventProcessorJob.kt:112); a correctness-
      // checkable analog needs a data-derived clock.
      val now = ev.agg(max(tsMs).as("now_ms"))
      ev.crossJoin(broadcast(now))
        .select(col("event_id"), col("user_id"),
          (col("now_ms") - tsMs).as("delay_ms"),
          tsMs.as("original_timestamp"),
          lit("graft-event-processor").as("processing_pipeline"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
    },
    Some("""SELECT event_id, user_id,
      (SELECT max(epoch_ms(CAST(ts AS TIMESTAMP))) FROM events) - epoch_ms(CAST(ts AS TIMESTAMP)) AS delay_ms,
      epoch_ms(CAST(ts AS TIMESTAMP)) AS original_timestamp,
      'graft-event-processor' AS processing_pipeline,
      CAST(props->>'k' AS BIGINT) AS k
    FROM events"""))

  private def typeCountCols = EventTypes.map(t =>
    sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))

  private def typeCountSql = EventTypes.map(t =>
    s"COUNT(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n      ")

  val windowTumbling = QueryDef(
    "agg_window_tumbling",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), window(tsCol, "10 minutes").as("w"))
        .agg(count(lit(1)).as("total_events"), typeCountCols: _*)
        .select(col("user_id") +: unix_millis(col("w.start")).as("window_start_ms") +:
          col("total_events") +: EventTypes.map(t => col(s"n_$t")): _*)
    },
    Some(s"""SELECT user_id,
      (epoch_ms(CAST(ts AS TIMESTAMP)) // 600000) * 600000 AS window_start_ms,
      COUNT(*) AS total_events,
      $typeCountSql
    FROM events GROUP BY user_id, window_start_ms"""))

  val windowSliding = QueryDef(
    "agg_window_sliding",
    (s, d) => {
      // Reference window geometry is 10 min size / 5 s emit interval
      // (AggregationJob.kt:53-54); in Spark the emit cadence is the
      // streaming trigger's job, so the batch analog uses a 5 min
      // slide: each event lands in exactly size/slide = 2 windows and
      // the shuffle stays bounded (the 120x expansion of a 5 s slide
      // belongs to the trigger, not the data).
      Tables.events(s, d)
        .groupBy(col("user_id"), window(tsCol, "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("total_events"), typeCountCols: _*)
        .select(col("user_id") +: unix_millis(col("w.start")).as("window_start_ms") +:
          col("total_events") +: EventTypes.map(t => col(s"n_$t")): _*)
    },
    Some(s"""SELECT user_id,
      (epoch_ms(CAST(ts AS TIMESTAMP)) // 300000) * 300000 - off AS window_start_ms,
      COUNT(*) AS total_events,
      $typeCountSql
    FROM events CROSS JOIN (VALUES (0), (300000)) AS shifts(off)
    GROUP BY user_id, window_start_ms"""))

  val typeCounts = QueryDef(
    "agg_type_counts",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("total_events"), typeCountCols: _*)
    },
    Some(s"""SELECT user_id, COUNT(*) AS total_events,
      $typeCountSql
    FROM events GROUP BY user_id"""))

  /** [[typeCounts]] with two-phase SALTED aggregation: pre-aggregate
    * on (user_id, salt) first, then merge per user. On a skewed key
    * distribution the first phase spreads one hot user over 16
    * reducers; integer partial sums merge exactly, so the result (and
    * the oracle) is identical to the direct form — only the plan
    * differs. This is the documented mitigation for hot keys in any
    * of the per-user operators.
    */
  val typeCountsSalted = QueryDef(
    "agg_type_counts_salted",
    (s, d) => {
      Tables.events(s, d)
        .withColumn("_salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("user_id"), col("_salt"))
        .agg(count(lit(1)).as("cnt"), typeCountCols: _*)
        .groupBy("user_id")
        .agg(sum(col("cnt")).as("total_events"),
          EventTypes.map(t => sum(col(s"n_$t")).as(s"n_$t")): _*)
    },
    Some(s"""SELECT user_id, COUNT(*) AS total_events,
      $typeCountSql
    FROM events GROUP BY user_id"""))

  /** Deterministic replica of EventProducer.kt:28-51: 50 users, 5
    * event types, uniform value in [1,100), 5% malformed (4 shapes),
    * 2 events/s from 2024-01-01. Randomness = md5 of (tag, seq) —
    * portable across engines, seed-free, and fully parallel (generated
    * from `spark.range`, no driver-side loop).
    */
  /** Shared producer transform over (seq, ts_ms) — the single
    * definition used by BOTH the batch [[producerDatagen]] query and
    * the streaming rate-source generator
    * ([[graft.streaming.EventStream.generatorBody]]), so the payload
    * bytes cannot drift between the two.
    */
  def producerColumns(seeded: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // portable 60-bit hash; single definition in TextAnalysis.hash60
    def h(tag: String) =
      TextAnalysis.hash60(concat(lit(tag), col("seq").cast(StringType)))
    val types = array(Seq("login", "purchase", "view", "click", "logout").map(lit): _*)
    val cats = array(Seq("electronics", "books", "clothing", "food").map(lit): _*)
    seeded
      .select(
        col("seq"), col("ts_ms"),
        concat(lit("user-"), (h("user") % 50 + 1).cast(StringType)).as("user_id"),
        element_at(types, (h("type") % 5 + 1).cast(IntegerType)).as("event_type"),
        ((h("value") % 9900).cast(DoubleType) / 100.0 + 1.0).as("value"),
        // integer cents (= value*100 exactly): Spark truncates
        // double->long while DuckDB rounds, so stay in integer space
        (h("value") % 9900 + 100).as("value_cents"),
        element_at(cats, (h("cat") % 4 + 1).cast(IntegerType)).as("category"),
        (h("err") % 100 < 5).as("is_malformed"),
        (h("shape") % 4).as("shape"))
      .withColumn("raw",
        when(!col("is_malformed"), concat(
          lit("{\"id\": \""), col("user_id"),
          lit("\", \"type\": \""), col("event_type"),
          lit("\", \"timestamp\": "), col("ts_ms"),
          lit(", \"data\": {\"value_cents\": \""),
          col("value_cents"),
          lit("\", \"category\": \""), col("category"), lit("\"}}")))
          .otherwise(element_at(array(
            lit("{invalid json"),
            lit("{}"),
            lit("{\"id\": \"user-1\"}"),
            lit("{\"id\": \"user-1\", \"type\": \"\", \"timestamp\": \"not-a-number\"}")),
            (col("shape") + 1).cast(IntegerType))))
  }

  val producerDatagen = QueryDef(
    "producer_datagen",
    (s, d) => {
      val n = 10000L
      producerColumns(s.range(n).select(
        col("id").as("seq"),
        (lit(1704067200000L) + col("id") * 500L).as("ts_ms")))
        .select("seq", "ts_ms", "user_id", "event_type", "value", "category",
          "is_malformed", "raw")
    },
    Some("""WITH g AS (
      SELECT seq,
        1704067200000 + seq * 500 AS ts_ms,
        'user-' || CAST(('0x' || substr(md5('user' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 50 + 1 AS VARCHAR) AS user_id,
        (['login', 'purchase', 'view', 'click', 'logout'])[('0x' || substr(md5('type' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 5 + 1] AS event_type,
        CAST(('0x' || substr(md5('value' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 9900 AS DOUBLE) / 100.0 + 1.0 AS value,
        (['electronics', 'books', 'clothing', 'food'])[('0x' || substr(md5('cat' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 4 + 1] AS category,
        ('0x' || substr(md5('err' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 100 < 5 AS is_malformed,
        ('0x' || substr(md5('shape' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 4 AS shape
      FROM range(10000) t(seq))
    SELECT seq, ts_ms, user_id, event_type, value, category, is_malformed,
      CASE WHEN NOT is_malformed THEN
        '{"id": "' || user_id || '", "type": "' || event_type ||
        '", "timestamp": ' || CAST(ts_ms AS VARCHAR) ||
        ', "data": {"value_cents": "' || CAST(('0x' || substr(md5('value' || CAST(seq AS VARCHAR)), 1, 15))::BIGINT % 9900 + 100 AS VARCHAR) ||
        '", "category": "' || category || '"}}'
      ELSE (['{invalid json', '{}', '{"id": "user-1"}',
             '{"id": "user-1", "type": "", "timestamp": "not-a-number"}'])[shape + 1]
      END AS raw
    FROM g"""))

  /** Latest-state view of the event stream — the batch form of Kafka
    * log compaction / Flink upsert semantics: one row per user
    * carrying their most recent event (latest ms; event_id breaks
    * same-millisecond ties, so the winner is unique and
    * deterministic). ONE partial+final max_by aggregate over the scan
    * — map-side combinable, the same aggregate-only shape the OHLC
    * bars use. The streaming half of this semantic is
    * [[graft.streaming.EventStream.upsertSink]].
    *
    * Plan-shape adjudication (r13, surfaced by the plan-budget net):
    * the struct tie-order and the string payload put immutable values
    * in the aggregation buffer, so this plans as SortAggregate — the
    * PARTIAL pass sorts each scan split by user_id before combining.
    * The bounded-heap alternative (TopKPerKey k=1 for the latest row
    * + a hash-agg count + co-partitioned join) was built and MEASURED
    * both tiers: 0.36→0.41 s at sf0.1 and 1.9→2.2 s at 100x events
    * (SCALE100_r13) — the per-split sort is cheaper than a second
    * pass over the scan at every tier tried, because the sort runs in
    * split-sized memory while the alternative pays the scan twice.
    * Kept fused and pinned (sortAgg=2 in plan_budget.tsv); unlike the
    * r12 spill class, the sorted stream here is the five-column raw
    * scan, not a shuffled wide-payload candidate stream.
    */
  val latestState = QueryDef(
    "ep_latest_state",
    (s, d) => {
      val ord = struct(col("ms"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), tsMs.as("ms"),
          col("event_id"), col("event_type"), col("value"))
        .groupBy("user_id")
        .agg(max(col("ms")).as("last_ms"),
          max_by(col("event_id"), ord).as("last_event_id"),
          max_by(col("event_type"), ord).as("last_type"),
          max_by(col("value"), ord).as("last_value"),
          count(lit(1)).as("n_events"))
    },
    Some("""WITH e AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_id,
             event_type, value
      FROM events)
    SELECT user_id, MAX(ms) AS last_ms,
      arg_max(event_id, CAST(ms AS HUGEINT) * 4611686018427387904 + event_id) AS last_event_id,
      arg_max(event_type, CAST(ms AS HUGEINT) * 4611686018427387904 + event_id) AS last_type,
      arg_max(value, CAST(ms AS HUGEINT) * 4611686018427387904 + event_id) AS last_value,
      COUNT(*) AS n_events
    FROM e GROUP BY user_id ORDER BY user_id"""))

  val defs: Seq[QueryDef] = Seq(
    parseRouteValid, parseRouteError, enrichSequence, processingDelay,
    windowTumbling, windowSliding, typeCounts, typeCountsSalted,
    producerDatagen, latestState)
}
