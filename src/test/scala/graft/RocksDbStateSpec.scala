package graft

import graft.streaming.{EventStream, ParsedEvent, PatternMatch, StateConfig}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The stateful operators under the production state-store config
  * ([[graft.streaming.StateConfig]]): RocksDB provider + changelog
  * checkpointing. Proves (1) the provider is actually engaged (RocksDB
  * custom metrics in query progress), (2) state stays bounded at the
  * live-key count over a long multi-batch run — matched keys release
  * their state, (3) an open prefix survives a checkpoint restart
  * through the changelog-checkpoint recovery path.
  */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: String, t: String, ts: Long) =
    ParsedEvent(id, t, ts, Map.empty)

  test("patternDetect state stays bounded under RocksDB over a long run") {
    implicit val sqlCtx = spark.sqlContext
    StateConfig.withRocksDB(spark) {
      val input = MemoryStream[ParsedEvent]
      val matches = EventStream.patternDetect(
        input.toDS(), Seq("view", "click", "purchase"), windowMs = 1000000L)
      val q = matches.writeStream.format("memory")
        .queryName("rocksdb_pattern").outputMode("append").start()
      try {
        val keys = (0 until 20).map(u => s"u$u")
        // 30 batches; each batch completes a full 3-stage match for
        // every key, so per-key state is created and released within
        // the batch — total state must NEVER exceed the live-key count
        (0 until 30).foreach { b =>
          val t0 = b * 10000L
          input.addData(keys.flatMap(k => Seq(
            ev(k, "view", t0 + 1), ev(k, "click", t0 + 2),
            ev(k, "purchase", t0 + 3))): _*)
          q.processAllAvailable()
        }
        // then 5 keys park an open (view, click) prefix
        input.addData(keys.take(5).flatMap(k => Seq(
          ev(k, "view", 400000L), ev(k, "click", 400001L))): _*)
        q.processAllAvailable()

        assert(spark.table("rocksdb_pattern").count() === 20L * 30)
        val progresses = q.recentProgress.filter(_.stateOperators.nonEmpty)
        assert(progresses.nonEmpty, "no stateful progress recorded")
        // provider engaged: RocksDB-specific custom metrics present
        val custom = progresses.last.stateOperators.head.customMetrics
        assert(custom.keySet.stream.anyMatch(_.startsWith("rocksdb")),
          s"expected rocksdb custom metrics, got: $custom")
        // bounded: never more rows of state than live keys
        val maxRows = progresses.map(_.stateOperators.head.numRowsTotal).max
        assert(maxRows <= 20,
          s"state grew past the live-key count: $maxRows")
        // exact: only the 5 parked prefixes remain
        assert(progresses.last.stateOperators.head.numRowsTotal === 5L)
      } finally q.stop()
    }
  }

  test("open prefix survives a restart via changelog checkpointing") {
    implicit val sqlCtx = spark.sqlContext
    StateConfig.withRocksDB(spark) {
      val input = MemoryStream[ParsedEvent]
      def detector() = EventStream.patternDetect(
        input.toDS(), Seq("view", "click", "purchase"), windowMs = 10000L)
      val out = java.nio.file.Files.createTempDirectory("graft_rdb_sink").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_rdb_ckpt").toString
      val q1 = EventStream.parquetSink(detector(), out, ckpt, triggerMs = 100L).start()
      try {
        input.addData(ev("u1", "view", 1000), ev("u1", "click", 2000))
        q1.processAllAvailable()
      } finally q1.stop()
      // new query, same checkpoint: the (view, click) prefix must come
      // back from the RocksDB changelog checkpoint
      input.addData(ev("u1", "purchase", 3000))
      val q2 = EventStream.parquetSink(detector(), out, ckpt, triggerMs = 100L).start()
      try q2.processAllAvailable() finally q2.stop()
      import spark.implicits._
      val rows = spark.read.parquet(out).as[PatternMatch].collect()
      assert(rows.toSeq == Seq(PatternMatch("u1", 1000, 3000, Seq(1000, 2000, 3000))),
        rows.mkString(", "))
    }
  }
}
