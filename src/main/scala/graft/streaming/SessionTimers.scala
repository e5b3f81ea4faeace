package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap sessionization with EVENT-TIME TIMERS — the transformWithState
  * facet TrackProcessor doesn't touch: sessions that close INSIDE a
  * batch (a later event proves the gap) emit immediately from
  * handleInputRows; the still-open tail session per key parks in state
  * with a timer at end + gap, and `handleExpiredTimer` emits it when
  * the WATERMARK passes that point — the push-based flush that
  * replaces session_window's operator-internal eviction with
  * user-controlled state + timers (the shape for custom session
  * semantics: caps, inactivity tiers, early previews).
  *
  * Scale: state is ONE flat row per active key (RocksDB-backed,
  * column-family handles), timers are per-key singletons (the old
  * timer is deleted before re-registering), and each batch touches
  * only keys with input or expired timers. All session arithmetic is
  * integer micros/cents, so emissions hash-compare against a DuckDB
  * replay of the same gap rule.
  *
  * Reference anchor: the reference's "30 minute" expiry comment
  * (StatefulStreamingWithMultipleStates.scala:124) that its DStream
  * API never implemented (SURVEY K4) — timers are how the modern API
  * actually delivers it.
  */
case class SEv(user_id: Long, tsUs: Long, cents: Long, event_id: Long,
               ts: java.sql.Timestamp)
case class OpenSession(startUs: Long, endUs: Long, n: Long, sumCents: Long)
case class SessionOut(user_id: Long, session_start_us: Long,
                      session_end_us: Long, n_events: Long, sum_cents: Long)

class SessionTimerProcessor(gapUs: Long)
    extends StatefulProcessor[Long, SEv, SessionOut] {
  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession](
      "open", Encoders.product[OpenSession], TTLConfig.NONE)

  private def msOf(us: Long): Long = us / 1000L

  override def handleInputRows(key: Long, rows: Iterator[SEv],
                               tv: TimerValues): Iterator[SessionOut] = {
    val evs = rows.toArray.sortBy(e => (e.tsUs, e.event_id))
    if (evs.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var cur: Option[OpenSession] =
      if (open.exists()) Some(open.get()) else None
    // single timer per key: drop the parked one, re-arm at the new tail
    cur.foreach(c => getHandle.deleteTimer(msOf(c.endUs + gapUs)))
    for (e <- evs) cur match {
      case Some(c) if e.tsUs - c.endUs < gapUs =>
        cur = Some(OpenSession(c.startUs, math.max(c.endUs, e.tsUs),
          c.n + 1, c.sumCents + e.cents))
      case Some(c) =>
        out += SessionOut(key, c.startUs, c.endUs, c.n, c.sumCents)
        cur = Some(OpenSession(e.tsUs, e.tsUs, 1L, e.cents))
      case None =>
        cur = Some(OpenSession(e.tsUs, e.tsUs, 1L, e.cents))
    }
    val c = cur.get
    open.update(c)
    getHandle.registerTimer(msOf(c.endUs + gapUs))
    out.iterator
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[SessionOut] = {
    if (!open.exists()) return Iterator.empty
    val c = open.get()
    open.clear()
    Iterator(SessionOut(key, c.startUs, c.endUs, c.n, c.sumCents))
  }
}

object SessionTimers {
  /** events (watermarked upstream) -> closed sessions; open tails flush
    * via event-time timers as the watermark passes end + gap. */
  def sessions(events: Dataset[SEv], gapUs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
