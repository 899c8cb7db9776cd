package graft

import graft.streaming.{EventStream, Monitor, ProcessedEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.streaming.Monitor]]: progress events become queryable
  * snapshots — cumulative input counts, an advancing watermark (hence
  * computable lag), and state-store size for a stateful query.
  */
class MonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshots carry totals, watermark, and state size") {
    implicit val sqlCtx = spark.sqlContext
    val mon = Monitor.attach(spark)
    val input = MemoryStream[ProcessedEvent]
    val agg = EventStream.slidingMetrics(input.toDF(), Seq("login"))
    val q = agg.writeStream.format("memory")
      .queryName("monitored_query").outputMode("append").start()
    try {
      input.addData(ProcessedEvent("u1", "login", 0L, 0L, Map.empty, 1))
      q.processAllAvailable()
      input.addData(ProcessedEvent("u1", "login", 40L * 60 * 1000, 0L, Map.empty, 2))
      q.processAllAvailable()

      // Listener events are delivered asynchronously on the bus thread,
      // and the advanced watermark is first REPORTED by the follow-up
      // no-data batch — poll until that progress event has landed (the
      // pattern Spark's own listener suites use) instead of reading
      // immediately after processAllAvailable().
      val deadline = System.currentTimeMillis() + 30000
      def ready: Boolean = mon.snapshot("monitored_query").exists(s =>
        s.totalInputRows >= 2L && s.watermarkMs.contains(30L * 60 * 1000))
      while (!ready && System.currentTimeMillis() < deadline) Thread.sleep(50)

      val s = mon.snapshot("monitored_query").get
      assert(s.totalInputRows === 2L, s.toString)
      assert(s.stateRows > 0, s"windowed agg must hold state: $s")
      val wm = s.watermarkMs.getOrElse(fail(s"no watermark in $s"))
      // watermark = max event time (40 min) - 10 min delay
      assert(wm === 30L * 60 * 1000, s.toString)
      assert(s.watermarkLagMs(wm + 5000).contains(5000L))
      assert(s.batchDurationMs >= 0 && s.batchId >= 0)
    } finally {
      q.stop()
      Monitor.detach(spark, mon)
    }
  }
}
