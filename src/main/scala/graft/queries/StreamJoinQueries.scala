package graft.queries

import graft.{QueryPack, Tables}
import graft.tracks.TrackStateOp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-static and stream-stream joins (SURVEY.md §2.4 ABSENT→ENGINE):
  * real Structured Streaming queries run synchronously (AvailableNow),
  * hash-verified against batch SQL — with one bounded input the
  * streaming inner-join semantics coincide with the batch join, which is
  * exactly what makes them oracle-checkable.
  *
  * Scale notes: the stream-static join broadcasts the static dim per
  * micro-batch (no state); the stream-stream join keeps both sides'
  * state bounded by the watermark + time-range condition, so state size
  * is O(rate x window), not O(history).
  */
object StreamJoinQueries extends QueryPack {

  /** The outer stream-stream join, watermark-parameterized: purchases ⋈
    * clicks on user with c_ts in [p_ts - 30m, p_ts]. The watermark delay
    * sets each side's state lifetime AND when unmatched rows emit their
    * null form — the subtlest contract in the engine, so the spec drives
    * this exact builder at TWO horizons (the gate queries use "1 hour"). */
  private[graft] def streamStreamOuter(s: SparkSession, d: String,
                                       joinType: String,
                                       watermark: String): DataFrame = {
    import s.implicits._
    val purchases = TrackStateOp.eventsStream(s, d)
      .filter($"eventType" === "purchase")
      .select($"user_id".as("p_user"), timestamp_micros($"tsMicros").as("p_ts"),
              $"event_id".as("p_id"))
      .withWatermark("p_ts", watermark)
    val clicks = TrackStateOp.eventsStream(s, d)
      .filter($"eventType" === "click")
      .select($"user_id".as("c_user"), timestamp_micros($"tsMicros").as("c_ts"),
              $"event_id".as("c_id"))
      .withWatermark("c_ts", watermark)
    val joined = purchases.join(clicks,
      $"p_user" === $"c_user" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
        $"c_ts" <= $"p_ts",
      joinType)
      .select($"p_id", $"c_id")
    runToMemory(joined, "append").orderBy($"p_id", $"c_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- stream ⋈ static dimension ----
    "q_stream_static_join" -> { (s, d) =>
      import s.implicits._
      val ev = TrackStateOp.eventsStream(s, d)
      val cust = Tables.customer(s, d) // static side
      val agg = ev.join(cust, ev("user_id") === cust("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
             asDouble(sum(dec($"value"))).as("sum_value"))
      runToMemory(agg, "complete").orderBy($"c_mktsegment")
    },

    // ---- stream ⋈ stream with watermarks + time-range condition ----
    "q_stream_stream_join" -> { (s, d) =>
      import s.implicits._
      val purchases = TrackStateOp.eventsStream(s, d)
        .filter($"eventType" === "purchase")
        .select($"user_id".as("p_user"), timestamp_micros($"tsMicros").as("p_ts"),
                $"event_id".as("p_id"))
        .withWatermark("p_ts", "1 hour")
      val clicks = TrackStateOp.eventsStream(s, d)
        .filter($"eventType" === "click")
        .select($"user_id".as("c_user"), timestamp_micros($"tsMicros").as("c_ts"),
                $"event_id".as("c_id"))
        .withWatermark("c_ts", "1 hour")
      val joined = purchases.join(clicks,
        $"p_user" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
          $"c_ts" <= $"p_ts")
        .select($"p_id", $"c_id")
      runToMemory(joined, "append").orderBy($"p_id", $"c_id")
    },

    // ---- stream ⋈ stream LEFT OUTER (watermark-driven null emission) ----
    // Same join as above with outer semantics: matched pairs emit on
    // match; an unmatched purchase emits its null row only when the
    // global watermark passes its timestamp and the state store evicts
    // it (AvailableNow's trailing watermark-advance batch). That
    // emission rule — NOT the batch left join — is the streaming
    // contract, and the oracle encodes it: each side's watermark tracks
    // its own filtered max event time, so the final watermark is
    // least(max purchase ts, max click ts) - 1h, and left rows newer
    // than that are still held in state when the query drains. State
    // stays O(rate x window) exactly as the inner variant.
    "q_stream_stream_left_join" -> { (s, d) =>
      streamStreamOuter(s, d, "left_outer", "1 hour")
    },

    // ---- stream ⋈ stream FULL OUTER (both sides' watermark eviction) ----
    // Completes the streaming outer-join family: unmatched PURCHASES
    // evict (and emit their null row) once the watermark passes p_ts —
    // same as the left join — while unmatched CLICKS must be held until
    // no future purchase can match; the time-range condition admits
    // p_ts in [c_ts, c_ts + 30m], so a click's state lifetime extends
    // 30 minutes past its own timestamp and its null row emits only
    // when watermark > c_ts + 30m. The oracle encodes BOTH eviction
    // rules; state stays O(rate x window) on each side.
    "q_stream_stream_full_join" -> { (s, d) =>
      streamStreamOuter(s, d, "full_outer", "1 hour")
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q_stream_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts <= p.ts
        |ORDER BY p_id, c_id""".stripMargin,

    // streaming left-outer contract: matched rows always emit; unmatched
    // lefts emit only once evicted by the final watermark
    "q_stream_stream_left_join" ->
      """WITH wm AS (
        |  SELECT least(
        |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'click'))
        |    - INTERVAL '1 hour' AS w),
        |j AS (
        |  SELECT p.event_id AS p_id, p.ts AS p_ts, c.event_id AS c_id
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id
        |   AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts <= p.ts)
        |SELECT p_id, c_id FROM j, wm
        |WHERE c_id IS NOT NULL OR p_ts < w
        |ORDER BY p_id, c_id""".stripMargin,

    // full-outer contract: matched rows always emit; unmatched purchases
    // emit once w passes p_ts; unmatched clicks once w passes the end of
    // their match window (c_ts + 30m)
    "q_stream_stream_full_join" ->
      """WITH wm AS (
        |  SELECT least(
        |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'click'))
        |    - INTERVAL '1 hour' AS w),
        |j AS (
        |  SELECT p.event_id AS p_id, p.ts AS p_ts, c.event_id AS c_id, c.ts AS c_ts
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id
        |   AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts <= p.ts)
        |SELECT p_id, c_id FROM j, wm
        |WHERE (p_id IS NOT NULL AND c_id IS NOT NULL)
        |   OR (c_id IS NULL AND p_ts < w)
        |   OR (p_id IS NULL AND c_ts + INTERVAL '30 minutes' < w)
        |ORDER BY p_id, c_id""".stripMargin
  )
}
