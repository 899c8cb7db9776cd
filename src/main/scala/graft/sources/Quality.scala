package graft.sources

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Inline data-quality observation — `Dataset.observe` surfaced as a
  * gate: named counters (null rates, violation counts, row totals)
  * are accumulated DURING whatever action runs next, with no second
  * pass over the data. At 100 TB that difference is the whole game:
  * a post-hoc validation query re-reads the table; an observation
  * rides along with the write.
  *
  * Usage:
  * {{{
  *   val gate = Quality.Gate(spark)
  *   val out = Quality.observe(df, "ingest",
  *     count(lit(1)).as("rows"),
  *     sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_values"))
  *   out.write.parquet(target)              // metrics accumulate here
  *   val m = gate.await("ingest")           // Map(rows -> ..., null_values -> ...)
  *   require(m("null_values") == 0L, s"ingest gate failed: $m")
  * }}}
  */
object Quality {

  /** Attach named inline metrics to the frame (free at action time). */
  def observe(df: DataFrame, name: String, metrics: Column*): DataFrame = {
    require(metrics.nonEmpty, "observe needs at least one metric column")
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Collects observation results from completed actions on this
    * session. Register BEFORE the action; `await` blocks until the
    * named observation arrives (listeners fire asynchronously after
    * the action returns).
    */
  final class Gate private[Quality] (spark: SparkSession) {
    private val seen = new ConcurrentHashMap[String, Map[String, Long]]()
    private val latches = new ConcurrentHashMap[String, CountDownLatch]()
    // serializes arm() against listener delivery so a re-arm can never
    // interleave between a delivery's seen.put and countDown (which
    // would either strand the new latch or hand await a null result)
    private val armLock = new Object

    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.foreach { case (name, row: Row) =>
          // empty input makes SUM/MIN/MAX observe SQL NULL — surface
          // the empty-accumulator value instead of NPE-ing the
          // listener. A non-numeric metric must not THROW here either:
          // the exception would abort delivery of every remaining
          // observation of this query and strand await on its timeout
          // with a misleading message — warn loudly and skip the
          // metric instead (the gate's contract is integral counters;
          // fractional values are floored, which the warn names).
          val m = row.schema.fieldNames.flatMap { f =>
            row.getAs[Any](f) match {
              case null => Some(f -> 0L)
              case n: java.lang.Double if n != math.floor(n) =>
                System.err.println(
                  s"[quality] observation '$name' metric '$f' is " +
                    s"fractional ($n) — the gate carries integral " +
                    "counters; flooring. Use counts/sums, not averages.")
                Some(f -> n.longValue())
              case n: Number => Some(f -> n.longValue())
              case other =>
                System.err.println(
                  s"[quality] observation '$name' metric '$f' is " +
                    s"non-numeric ($other) — skipped; the gate carries " +
                    "integral counters only")
                None
            }
          }.toMap
          armLock.synchronized {
            seen.put(name, m)
            latches.computeIfAbsent(name, _ => new CountDownLatch(1)).countDown()
          }
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    /** Metrics of observation `name`, waiting up to `timeoutSec` for
      * the asynchronous listener to deliver them.
      */
    def await(name: String, timeoutSec: Int = 30): Map[String, Long] = {
      val latch = latches.computeIfAbsent(name, _ => new CountDownLatch(1))
      require(latch.await(timeoutSec, TimeUnit.SECONDS),
        s"observation '$name' not delivered within ${timeoutSec}s — did the action run?")
      val m = seen.get(name)
      require(m != null,
        s"observation '$name' was re-armed after delivery but before its " +
          "metrics were read — arm() must precede the action, not the await")
      m
    }

    /** Re-arm a name before REUSING it for another action: clears the
      * previous delivery so `await` cannot return the earlier action's
      * counters. Call arm BEFORE starting the new action.
      */
    def arm(name: String): Unit = armLock.synchronized {
      seen.remove(name)
      latches.put(name, new CountDownLatch(1))
    }

    /** Deregister the listener (idempotent). */
    def close(): Unit = spark.listenerManager.unregister(listener)
  }

  object Gate {
    def apply(spark: SparkSession): Gate = new Gate(spark)
  }
}
