package graft.jobs

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{EventStream, ParsedEvent}

/** Cluster entrypoints for the k8s manifests (k8s/graft-job.yaml) —
  * the `mainClass` of each SparkApplication document. Each main is
  * deliberately THIN: argument parsing plus wiring of the already
  * spec-covered [[EventStream]] builders; the testable transform
  * bodies live here as pure DataFrame functions so the sandbox (which
  * has no Kafka connector jar) exercises everything except the final
  * `format("kafka").load()/start()`, which resolves on the cluster
  * where `deps.packages` ships the connector.
  */
private[graft] object Jobs {

  /** `--key value` pairs -> map, failing loudly on stragglers so a
    * typo'd manifest argument list surfaces at submit, not as a
    * silently-defaulted topic name.
    */
  def parseArgs(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"expected --key value pairs, got odd argument list: ${args.mkString(" ")}")
    args.grouped(2).map {
      case Array(k, v) =>
        require(k.startsWith("--"), s"expected --key, got '$k'")
        // a value that looks like a flag is a dropped value upstream
        // ("--input-topic --output-topic out" must not subscribe to a
        // topic literally named "--output-topic")
        require(!v.startsWith("--"),
          s"argument $k is missing its value (got flag '$v')")
        k.stripPrefix("--") -> v
    }.toMap
  }

  def arg(m: Map[String, String], key: String): String =
    m.getOrElse(key, throw new IllegalArgumentException(
      s"missing required argument --$key"))

  /** Per-query checkpoint dir under the session's configured base
    * (`spark.sql.streaming.checkpointLocation`): Spark's own fallback
    * for that conf mints a RANDOM subdir per query — useless for
    * recovery — so each named query pins its own stable child.
    */
  def checkpoint(spark: SparkSession, query: String): String = {
    val base = spark.conf.getOption("spark.sql.streaming.checkpointLocation")
      .getOrElse(throw new IllegalArgumentException(
        "spark.sql.streaming.checkpointLocation must point at durable " +
          "shared storage (see k8s/graft-job.yaml sparkConf)"))
    s"${base.stripSuffix("/")}/$query"
  }

  def session(appName: String): SparkSession =
    SparkSession.builder().appName(appName).getOrCreate()
}

/** Event processor (reference EventProcessorJob.kt:58-78): Kafka
  * `input-events` -> parseRoute -> enrich -> JSON to the valid/error
  * topics. Manifest: k8s/graft-job.yaml `graft-event-processor`.
  *
  * Two queries, one topic, read twice — deliberately. Spark has no
  * Flink-style side outputs: one streaming query feeds one sink, and
  * the error branch cannot ride the valid query's foreachBatch
  * because [[EventStream.enrich]]'s GroupState only persists across
  * micro-batches inside a genuine streaming query (re-running the
  * stateful step on foreachBatch's batch DataFrames would reset
  * per-key sequences every trigger). So the valid route carries the
  * stateful pipeline once, the error route re-parses cheaply
  * (parse + filter, stateless), and [[EventStream.kafkaSource]]'s
  * groupIdPrefix keeps the two queries' consumer groups disjoint so
  * they never split the subscription between them.
  */
object EventProcessorMain {

  /** The testable body: raw strings in `value` -> (valid JSON rows,
    * error JSON rows), each a single `value` string column ready for
    * a Kafka sink.
    */
  def pipeline(raw: DataFrame): (DataFrame, DataFrame) = {
    import raw.sparkSession.implicits._
    val (valid, errors) = EventStream.parseRoute(raw)
    val processed = EventStream.enrich(valid.as[ParsedEvent])
    (processed.select(to_json(struct(col("*"))).as("value")),
      errors.select(to_json(struct(col("*"))).as("value")))
  }

  def main(args: Array[String]): Unit = {
    val a = Jobs.parseArgs(args)
    val spark = Jobs.session("graft-event-processor")
    val bootstrap = Jobs.arg(a, "kafka-bootstrap-servers")
    val raw = EventStream.kafkaSource(spark, bootstrap,
        Jobs.arg(a, "input-topic"), Jobs.arg(a, "consumer-group"))
      .load().selectExpr("CAST(value AS STRING) AS value")
    val (validJson, errorJson) = pipeline(raw)
    EventStream.kafkaSink(validJson, bootstrap,
      Jobs.arg(a, "output-topic"), Jobs.checkpoint(spark, "valid")).start()
    EventStream.kafkaSink(errorJson, bootstrap,
      Jobs.arg(a, "error-topic"), Jobs.checkpoint(spark, "errors")).start()
    spark.streams.awaitAnyTermination()
  }
}

/** Aggregation job (reference AggregationJob.kt:213-236): Kafka
  * `output-results` -> 10-min sliding window / 5-s emit ->
  * `aggregated-metrics`. Manifest: k8s/graft-job.yaml
  * `graft-aggregation`.
  */
object AggregationMain {

  /** The reference's per-type counters (AggregationJob.kt:118). */
  val EventTypes: Seq[String] = Seq("click", "view", "purchase", "login", "logout")

  /** The testable body: ProcessedEvent JSON strings in `value` ->
    * windowed metric rows serialized back to a `value` JSON column.
    */
  def pipeline(raw: DataFrame): DataFrame = {
    val schema = Encoders.product[graft.streaming.ProcessedEvent].schema
    val processed = raw
      .select(from_json(col("value"), schema).as("p"))
      .filter(col("p.originalId").isNotNull)
      .select(col("p.*"))
    EventStream.slidingMetrics(processed, EventTypes)
      .select(to_json(struct(col("*"))).as("value"))
  }

  def main(args: Array[String]): Unit = {
    val a = Jobs.parseArgs(args)
    val spark = Jobs.session("graft-aggregation")
    val bootstrap = Jobs.arg(a, "kafka-bootstrap-servers")
    val raw = EventStream.kafkaSource(spark, bootstrap,
        Jobs.arg(a, "input-topic"), Jobs.arg(a, "consumer-group"))
      .load().selectExpr("CAST(value AS STRING) AS value")
    EventStream.kafkaSink(pipeline(raw), bootstrap,
        Jobs.arg(a, "output-topic"), Jobs.checkpoint(spark, "metrics"))
      // update + 5 s trigger = the reference's processing-time emit
      // cadence (each refreshed window appended to the topic)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .start()
    spark.streams.awaitAnyTermination()
  }
}

/** Event producer (reference EventProducer.kt:28-51 /
  * k8s/producer/event-producer.yaml): rate source -> the shared
  * producer payload -> `input-events`. Manifest: k8s/graft-job.yaml
  * `graft-event-producer`.
  */
object ProducerMain {

  def main(args: Array[String]): Unit = {
    val a = Jobs.parseArgs(args)
    val spark = Jobs.session("graft-event-producer")
    val rps = a.get("rows-per-second").map(_.toInt).getOrElse(2)
    EventStream.kafkaSink(
        EventStream.generator(spark, rps).select(col("value")),
        Jobs.arg(a, "kafka-bootstrap-servers"),
        Jobs.arg(a, "topic"), Jobs.checkpoint(spark, "producer"))
      .start()
    spark.streams.awaitAnyTermination()
  }
}
