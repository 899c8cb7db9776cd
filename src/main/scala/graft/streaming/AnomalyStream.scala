package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One hourly observation entering the detector. */
final case class UserEvent(userId: Long, ms: Long)

/** Verdict for a COMPLETED hour of one user's activity. */
final case class HourVerdict(
    userId: Long,
    hour: Long,
    cnt: Long,
    nHours: Long,
    anomalous: Boolean)

/** (closed-hour moments, open hour, open count) — three longs + two,
  * constant size regardless of stream length.
  */
final case class AnomalyState(
    n: Long, s1: Long, s2: Long, openHour: Long, openCnt: Long)

/** Streaming per-user hourly-count anomaly detection — the online
  * counterpart of the batch `q_anomaly_hourly` z-test
  * ([[graft.operators.Stats.anomalyHourly]]): per user, maintain the
  * integer moments (n, S1, S2) of COMPLETED hours plus the currently
  * open hour's count; when an event for a later hour arrives, the open
  * hour closes and is judged against the user's history INCLUDING
  * itself — the same
  *
  *   (n·c − S1)² > 9·(n·S2 − S1²)
  *
  * integer algebra as the batch operator, so there is no float
  * epsilon anywhere. The one semantic difference from batch is
  * inherent to streaming: each hour is judged with the PREFIX moments
  * known at close time, not the full-history moments a batch pass
  * sees. Over in-order input where no hour's events straddle a
  * micro-batch boundary, the FINAL state moments equal the batch
  * moments exactly (what AnomalyStreamSpec asserts via the last
  * verdict's nHours); if one hour IS split across batches, the
  * remainder arrives below the already-advanced open hour and is
  * folded in as singleton hours (next paragraph), so n/S1/S2 then
  * depend on the batch cut — a documented approximation, not a bug.
  *
  * State per key is five longs — constant regardless of stream length,
  * the property that keeps the detector runnable forever. Events are
  * processed in ms order within a batch; an event for an hour EARLIER
  * than the open hour (late beyond the upstream watermark's promise)
  * is folded into the moments as its own closed singleton hour rather
  * than silently dropped — detection quality degrades gracefully,
  * counts are never lost. Replays over the SAME batch boundaries are
  * deterministic: state transitions depend only on the per-batch
  * sorted event-hour sequences.
  */
object AnomalyStream {

  private[graft] def judge(n: Long, s1: Long, s2: Long, c: Long): Boolean = {
    // moments including the closing hour itself, mirroring the batch
    // formulation where every hour is part of its own baseline
    val n1 = n + 1
    val t1 = s1 + c
    val t2 = s2 + c * c
    val dev = n1 * c - t1
    dev * dev > 9L * (n1 * t2 - t1 * t1)
  }

  def detect(events: Dataset[UserEvent]): Dataset[HourVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[AnomalyState, HourVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[UserEvent], state: GroupState[AnomalyState]) =>
          var st = state.getOption.getOrElse(AnomalyState(0L, 0L, 0L, Long.MinValue, 0L))
          val out = scala.collection.mutable.ListBuffer[HourVerdict]()
          def close(hour: Long, cnt: Long): Unit = {
            out += HourVerdict(userId, hour, cnt, st.n + 1,
              judge(st.n, st.s1, st.s2, cnt))
            st = st.copy(n = st.n + 1, s1 = st.s1 + cnt, s2 = st.s2 + cnt * cnt)
          }
          evs.toSeq.sortBy(_.ms).foreach { e =>
            val h = Math.floorDiv(e.ms, 3600000L)
            if (st.openHour == Long.MinValue) st = st.copy(openHour = h, openCnt = 1L)
            else if (h == st.openHour) st = st.copy(openCnt = st.openCnt + 1L)
            else if (h > st.openHour) {
              close(st.openHour, st.openCnt)
              st = st.copy(openHour = h, openCnt = 1L)
            } else close(h, 1L) // late beyond watermark: judged as its own hour
          }
          state.update(st)
          out.iterator
      }(Encoders.product[AnomalyState], Encoders.product[HourVerdict])
  }
}
