package graft.streaming

import java.time.Instant
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Point-in-time health of one streaming query (latest micro-batch). */
final case class QuerySnapshot(
    name: String,
    batchId: Long,
    numInputRows: Long,
    inputRowsPerSecond: Double,
    processedRowsPerSecond: Double,
    batchDurationMs: Long,
    watermarkMs: Option[Long],
    stateRows: Long,
    stateBytes: Long,
    totalInputRows: Long) {

  /** Event-time lag: how far the watermark trails `nowMs`. The number
    * an alert fires on — a healthy query's lag hovers near its
    * watermark delay; a falling-behind query's lag grows without
    * bound long before anything crashes.
    */
  def watermarkLagMs(nowMs: Long): Option[Long] = watermarkMs.map(nowMs - _)
}

/** Always-on observability for streaming queries — the ops surface a
  * long-running deployment watches (the reference gets this from the
  * Flink dashboard; Spark exposes the same numbers through
  * [[StreamingQueryListener]] progress events, this class makes them
  * a queryable in-process snapshot).
  *
  * Collected per query (latest batch + cumulative): input rows and
  * rates, batch duration, the event-time watermark (hence LAG, the
  * falling-behind alarm), and state-store rows/bytes (the
  * unbounded-state leak alarm — a stateful operator whose
  * `stateRows` grows without bound on a bounded key space is
  * mis-windowed or missing eviction; see RocksDbStateSpec's bounded
  * assertion for the healthy shape).
  *
  * Listener callbacks arrive on Spark's listener bus thread;
  * snapshots live in a [[TrieMap]], so reads from any thread are
  * lock-free and safe. Unnamed queries are keyed by their runId —
  * and evicted on termination, because every restart mints a fresh
  * runId and a crash-looping unnamed query would otherwise grow the
  * maps without bound. NAMED queries keep their last snapshot after
  * termination (bounded by name cardinality; post-mortem reads are
  * the point of naming a query).
  *
  * Watermark caveat: Spark's progress JSON reports epoch zero both
  * before any watermark is established and for a genuine watermark of
  * exactly 0 — the two are indistinguishable in the event, so
  * `watermarkMs` is None for both and the lag alarm stays silent
  * until the watermark first moves past epoch. With a real wall-clock
  * event-time domain this is the first micro-batch only.
  *
  * Usage:
  * {{{
  *   val mon = Monitor.attach(spark)
  *   ... run queries ...
  *   mon.snapshot("my_query").foreach(s => alertIf(s.watermarkLagMs(now) > SLA))
  *   Monitor.detach(spark, mon)
  * }}}
  */
final class Monitor extends StreamingQueryListener {

  private val byName = TrieMap.empty[String, QuerySnapshot]
  private val totals = TrieMap.empty[String, Long]
  private val lastBatch = TrieMap.empty[String, Long]

  def snapshot(name: String): Option[QuerySnapshot] = byName.get(name)
  def all(): Map[String, QuerySnapshot] = byName.toMap

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  /** Evict unnamed (runId-keyed) entries: each restart gets a fresh
    * runId, so without eviction a restart-looping unnamed query leaks
    * one entry per run. Named keys survive for post-mortem reads.
    */
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val k = e.runId.toString
    byName.remove(k)
    totals.remove(k)
    lastBatch.remove(k)
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val key = Option(p.name).getOrElse(p.runId.toString)
    // A restart can replay the last uncommitted batch and emit a
    // second progress event for the same batchId — count each batch
    // into the cumulative total ONCE, or restarts permanently
    // overstate ingestion.
    val replay = lastBatch.get(key).exists(p.batchId <= _)
    lastBatch.put(key, math.max(p.batchId, lastBatch.getOrElse(key, Long.MinValue)))
    val total = totals.updateWith(key) {
      case Some(t) => Some(if (replay) t else t + p.numInputRows)
      case None => Some(p.numInputRows)
    }.getOrElse(0L)
    val wm = Option(p.eventTime.get("watermark"))
      .map(Instant.parse(_).toEpochMilli)
      .filter(_ > 0) // epoch-zero = no watermark established yet
    val (rows, bytes) = p.stateOperators.foldLeft((0L, 0L)) { case ((r, b), so) =>
      (r + so.numRowsTotal, b + so.memoryUsedBytes)
    }
    byName.put(key, QuerySnapshot(
      name = key,
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      inputRowsPerSecond = p.inputRowsPerSecond,
      processedRowsPerSecond = p.processedRowsPerSecond,
      batchDurationMs = p.batchDuration,
      watermarkMs = wm,
      stateRows = rows,
      stateBytes = bytes,
      totalInputRows = total))
  }
}

object Monitor {
  /** Create a monitor and register it on the session's listener bus. */
  def attach(spark: SparkSession): Monitor = {
    val m = new Monitor
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: Monitor): Unit =
    spark.streams.removeListener(m)
}
