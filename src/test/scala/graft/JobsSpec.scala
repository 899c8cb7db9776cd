package graft

import graft.jobs.{AggregationMain, EventProcessorMain}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The k8s entrypoints' testable bodies (graft.jobs): everything up
  * to the Kafka `load()/start()` boundary — the same boundary the
  * EventStream connector-builder specs draw, since the connector jar
  * only exists on the cluster.
  */
class JobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseArgs: --key value pairs, loud on stragglers and bad keys") {
    val m = graft.jobs.Jobs.parseArgs(Array(
      "--input-topic", "input-events", "--consumer-group", "g1"))
    assert(m == Map("input-topic" -> "input-events", "consumer-group" -> "g1"))
    intercept[IllegalArgumentException] {
      graft.jobs.Jobs.parseArgs(Array("--input-topic"))
    }
    intercept[IllegalArgumentException] {
      graft.jobs.Jobs.parseArgs(Array("input-topic", "x"))
    }
    // a dropped value must raise, not subscribe to "--output-topic"
    intercept[IllegalArgumentException] {
      graft.jobs.Jobs.parseArgs(Array("--input-topic", "--output-topic"))
    }
    intercept[IllegalArgumentException] {
      graft.jobs.Jobs.arg(m, "output-topic")
    }
  }

  test("checkpoint: stable per-query child under the configured base; loud when unset") {
    val key = "spark.sql.streaming.checkpointLocation"
    val had = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "s3a://graft-state/ckpt/event-processor/")
      assert(graft.jobs.Jobs.checkpoint(spark, "valid") ==
        "s3a://graft-state/ckpt/event-processor/valid")
      spark.conf.unset(key)
      intercept[IllegalArgumentException] {
        graft.jobs.Jobs.checkpoint(spark, "valid")
      }
    } finally {
      spark.conf.unset(key)
      had.foreach(spark.conf.set(key, _))
    }
  }

  test("EventProcessorMain.pipeline: raw JSON -> routed single-column JSON streams") {
    val raw = Seq(
      """{"id":"e1","type":"click","timestamp":5,"data":{"userId":"u1"}}""",
      "garbage").toDF("value")
    val (valid, errors) = EventProcessorMain.pipeline(raw)
    assert(valid.columns.toSeq == Seq("value"))
    assert(errors.columns.toSeq == Seq("value"))
    val v = valid.select(
      get_json_object($"value", "$.originalId").as("id"),
      get_json_object($"value", "$.eventType").as("t"),
      get_json_object($"value", "$.sequence").as("seq")).collect()
    assert(v.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("e1", "click", "1")))
    val e = errors.select(
      get_json_object($"value", "$.errorType")).as[String].collect()
    assert(e.toSeq == Seq("PARSE_ERROR"))
  }

  test("AggregationMain.pipeline: ProcessedEvent JSON -> windowed metric JSON") {
    // two events for one user in one 5-minute-aligned neighborhood,
    // one unparseable row that must be dropped, not crash the job
    val raw = Seq(
      """{"originalId":"u1","eventType":"click","processedAt":600000,"processingDelay":0,"enrichedData":{},"sequence":1}""",
      """{"originalId":"u1","eventType":"view","processedAt":660000,"processingDelay":0,"enrichedData":{},"sequence":2}""",
      "garbage").toDF("value")
    val out = AggregationMain.pipeline(raw)
    assert(out.columns.toSeq == Seq("value"))
    val rows = out.select(
      get_json_object($"value", "$.userId").as("u"),
      get_json_object($"value", "$.totalEventCount").cast("long").as("n"),
      get_json_object($"value", "$.n_click").cast("long").as("clicks"),
      get_json_object($"value", "$.n_view").cast("long").as("views")).collect()
    // sliding 10m/5m: both events land in 2 shared windows
    assert(rows.forall(_.getString(0) == "u1"))
    assert(rows.map(_.getLong(1)).sum == 4L)
    assert(rows.map(_.getLong(2)).sum == 2L)
    assert(rows.map(_.getLong(3)).sum == 2L)
  }
}
