package graft

import graft.sources.Quality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inline observation metrics: accumulated during the action itself,
  * delivered through the gate.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("observed counters ride along with the action and hit the gate") {
    import spark.implicits._
    val gate = Quality.Gate(spark)
    try {
      val df = Seq(("a", Some(1.0)), ("b", None), ("c", Some(3.0)), ("d", None))
        .toDF("k", "v")
      val out = Quality.observe(df, "spec_ingest",
        count(lit(1)).as("rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("null_values"))
      out.write.format("noop").mode("overwrite").save()
      val m = gate.await("spec_ingest")
      assert(m == Map("rows" -> 4L, "null_values" -> 2L), m.toString)
    } finally gate.close()
  }

  test("empty input observes zero counters instead of stranding the gate") {
    import spark.implicits._
    val gate = Quality.Gate(spark)
    try {
      val df = Seq(("a", 1.0)).toDF("k", "v").filter(col("k") === "nope")
      Quality.observe(df, "spec_empty",
        count(lit(1)).as("rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("null_values"))
        .write.format("noop").mode("overwrite").save()
      val m = gate.await("spec_empty")
      assert(m == Map("rows" -> 0L, "null_values" -> 0L), m.toString)
    } finally gate.close()
  }

  test("arm() prevents a reused name from returning the previous action's counters") {
    import spark.implicits._
    val gate = Quality.Gate(spark)
    try {
      def run(n: Int): Unit =
        Quality.observe(Seq.fill(n)(("x", 1.0)).toDF("k", "v"), "spec_reuse",
          count(lit(1)).as("rows"))
          .write.format("noop").mode("overwrite").save()
      run(3)
      assert(gate.await("spec_reuse")("rows") == 3L)
      gate.arm("spec_reuse")
      run(5)
      assert(gate.await("spec_reuse")("rows") == 5L)
    } finally gate.close()
  }

  test("observations surface per micro-batch in streaming progress") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Long)]
    val observed = Quality.observe(input.toDF().toDF("k", "v"),
      "spec_stream",
      count(lit(1)).as("rows"),
      sum(when(col("v") < 0, 1L).otherwise(0L)).as("violations"))
    val q = observed.writeStream.format("noop").start()
    try {
      input.addData(("a", 1L), ("b", -2L), ("c", 3L))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("spec_stream")
      assert(m != null, "observation missing from streaming progress")
      assert(m.getAs[Long]("rows") == 3L && m.getAs[Long]("violations") == 1L)
    } finally q.stop()
  }

  test("observation on a real operator costs no extra scan") {
    val gate = Quality.Gate(spark)
    try {
      val df = Quality.observe(
        spark.read.parquet(s"${TestSpark.sfDir}/events.parquet"),
        "spec_events",
        count(lit(1)).as("rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_users"))
      // one action, metrics observed during it
      val n = df.count()
      val m = gate.await("spec_events")
      assert(m("rows") == n)
      assert(m("null_users") == 0L)
    } finally gate.close()
  }
}
