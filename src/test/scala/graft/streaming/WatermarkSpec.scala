package graft.streaming

import graft.SparkSpec
import graft.tracks.EventRaw
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark semantics the reference never had (SURVEY.md §2.4
  * ABSENT→ENGINE): late-data drop in append-mode window aggregation, and
  * duplicate suppression within the watermark horizon. Batch boundaries
  * are controlled explicitly via MemoryStream + processAllAvailable. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private val HOUR = 3600L * 1000000L // micros

  private def ev(id: Long, tsHours: Double, user: Long = 1): EventRaw =
    EventRaw(id, (tsHours * HOUR).toLong, user, "click", 1.0)

  test("append-mode window agg drops events older than the watermark") {
    val input = MemoryStream[EventRaw](spark)
    val agg = input.toDS()
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"window.start").as("wstart"), $"n")
    val qn = "wm" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      input.addData(ev(1, 0.5), ev(2, 1.5)); q.processAllAvailable()
      // advance event time far ahead => watermark = 9.5h - 1h = 8.5h;
      // windows [0,1) and [1,2) close and emit
      input.addData(ev(3, 9.5)); q.processAllAvailable()
      // now inject a LATE event for window [0,1): must be dropped
      input.addData(ev(4, 0.7)); q.processAllAvailable()
      // close remaining windows
      input.addData(ev(5, 20.0)); q.processAllAvailable()

      val rows = spark.table(qn).as[(Long, Long)].collect().toMap
      assert(rows(0L) == 1L, "late event must not bump the closed [0,1) window")
      assert(rows(1L * HOUR) == 1L)
      assert(rows(9L * HOUR) == 1L)
    } finally q.stop()
  }

  test("streaming session windows MERGE adjacent sessions across batches") {
    val input = MemoryStream[EventRaw](spark)
    val agg = input.toDS()
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"session_window.start").as("sstart"), $"user_id", $"n")
    val qn = "sw" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.format("memory").queryName(qn).outputMode("complete").start()
    try {
      // batch 1: two events 20 min apart -> one open session
      input.addData(ev(1, 1.0), ev(2, 1.0 + 20.0 / 60)); q.processAllAvailable()
      // batch 2: an event 20 min after the last -> must EXTEND the same
      // session (state merge), plus a distant event -> a second session
      input.addData(ev(3, 1.0 + 40.0 / 60), ev(4, 5.0)); q.processAllAvailable()
      val rows = spark.table(qn).as[(Long, Long, Long)].collect()
        .map { case (s, _, n) => s -> n }.toMap
      assert(rows == Map(1L * HOUR -> 3L, 5L * HOUR -> 1L),
        s"sessions $rows — batch-2 event must merge into the batch-1 session")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses dups across batches") {
    val input = MemoryStream[EventRaw](spark)
    val deduped = input.toDS()
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select($"event_id")
    val qn = "dd" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = deduped.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      input.addData(ev(10, 1.0), ev(11, 1.1)); q.processAllAvailable()
      input.addData(ev(10, 1.2), ev(12, 1.3)); q.processAllAvailable() // 10 is a dup
      val ids = spark.table(qn).as[Long].collect().sorted.toSeq
      assert(ids == Seq(10L, 11L, 12L))
    } finally q.stop()
  }
}
