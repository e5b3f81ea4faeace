package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key LIST STATE — the last transformWithState handle type the
  * repo's processors didn't exercise (TrackProcessor: ValueState;
  * TypeCountsProcessor: MapState; SessionTimerProcessor: ValueState +
  * event-time timers). The operator is the reference's bounded
  * recent-events buffer (SURVEY §2 K5/K6) re-expressed for RocksDB:
  *
  * A ListState append is a POINT WRITE to the key's list column family
  * — O(1) per event — where a ValueState holding the same buffer
  * rewrites the whole blob on every touch (O(cap) write amplification,
  * the difference between appending 100 bytes and rewriting 1 KB per
  * event across a 100 TB key space). The trade is that eviction needs a
  * rewrite, so the buffer keeps SLACK: appends run until the stored
  * list reaches 2*cap, then one `put` compacts it back to the newest
  * cap. Amortized: one rewrite per cap appends, not one per event.
  *
  * Emissions carry a per-key monotone `seen` counter (total events
  * folded so far, a ValueState — two handles in one processor, each its
  * own RocksDB column family, is exactly the multi-state design the API
  * exists for). The newest-cap set depends only on WHICH events have
  * arrived — (tsUs, event_id) is a total order — so the emission at the
  * key's max `seen` is the answer regardless of how the input was split
  * into micro-batches, and it equals the batch top-10-per-key window
  * query, which is the oracle.
  */
case class RecentEv(user_id: Long, tsUs: Long, event_id: Long,
                    event_type: String)
case class RecentRow(user_id: Long, seen: Long, tsUs: Long,
                     event_id: Long, event_type: String)

/** Per-key state snapshot row for the warm-start (initial state) path:
  * one row per key, the key's buffer as a nested list. */
case class RecentSnapshot(user_id: Long, events: List[RecentEv])

/** The shared fold both processors run per (key, batch): merge new rows
  * into the stored list (appends while under 2*cap slack, one compacting
  * rewrite past it), bump the monotone `seen`, emit the newest-cap. */
private[streaming] object RecentFold {
  def newestFirst(e: RecentEv): (Long, Long) = (-e.tsUs, -e.event_id)

  def apply(recent: ListState[RecentEv], seen: ValueState[Long], cap: Int,
            key: Long, rows: Iterator[RecentEv]): Iterator[RecentRow] = {
    val add = rows.toVector
    val stored = recent.get().toVector
    val merged = (stored ++ add).sortBy(newestFirst)
    if (merged.size > 2 * cap) recent.put(merged.take(cap).toArray)
    else recent.appendList(add.toArray) // point appends, no rewrite
    val n = (if (seen.exists()) seen.get() else 0L) + add.size
    seen.update(n)
    merged.take(cap).iterator
      .map(e => RecentRow(key, n, e.tsUs, e.event_id, e.event_type))
  }
}

class RecentEventsProcessor(cap: Int)
    extends StatefulProcessor[Long, RecentEv, RecentRow] {
  @transient private var recent: ListState[RecentEv] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[RecentEv](
      "recent", Encoders.product[RecentEv], TTLConfig.NONE)
    seen = getHandle.getValueState[Long](
      "seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[RecentEv],
                               tv: TimerValues): Iterator[RecentRow] =
    RecentFold(recent, seen, cap, key, rows)
}

/** WARM START: the same operator bootstrapped from a batch snapshot via
  * StatefulProcessorWithInitialState — the state-bootstrap facet of
  * transformWithState. At 100 TB you do not replay history to rebuild
  * state: the initial-state dataset (a snapshot table, e.g. from the
  * statestore reader) seeds every key's RocksDB entries on the FIRST
  * batch, and the stream then folds deltas — here an out-of-order
  * backfill log, which event-time ordering absorbs by construction. */
class WarmStartProcessor(cap: Int)
    extends StatefulProcessorWithInitialState[Long, RecentEv, RecentRow, RecentSnapshot] {
  @transient private var recent: ListState[RecentEv] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[RecentEv](
      "recent", Encoders.product[RecentEv], TTLConfig.NONE)
    seen = getHandle.getValueState[Long](
      "seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInitialState(key: Long, snap: RecentSnapshot,
                                  tv: TimerValues): Unit =
    recent.put(snap.events.sortBy(RecentFold.newestFirst).take(cap).toArray)

  override def handleInputRows(key: Long, rows: Iterator[RecentEv],
                               tv: TimerValues): Iterator[RecentRow] =
    RecentFold(recent, seen, cap, key, rows)
}

object RecentEventsList {
  def recent(events: Dataset[RecentEv], cap: Int = 10): Dataset[RecentRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RecentEventsProcessor(cap),
        TimeMode.None(), OutputMode.Update())
  }

  /** Same operator, state seeded from a batch snapshot (one
    * RecentSnapshot row per key) before the first streaming batch. */
  def warmStart(events: Dataset[RecentEv], init: Dataset[RecentSnapshot],
                cap: Int = 10): Dataset[RecentRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new WarmStartProcessor(cap),
        TimeMode.None(), OutputMode.Update(),
        init.groupByKey(_.user_id))
  }
}
