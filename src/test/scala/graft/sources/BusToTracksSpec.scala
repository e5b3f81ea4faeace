package graft.sources

import graft.SparkSpec
import graft.tracks.{EventRaw, TrackStateOp}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The full production ingest topology end-to-end: message bus (offset
  * log) → micro-batch stream → wire JSON decode → keyed stateful track
  * buffer → per-key snapshots. What a broker-fed deployment of the
  * reference's stateful core looks like on this engine
  * (StatefulStreamingWithMultipleStates.scala:37-58 behind a bus). */
class BusToTracksSpec extends SparkSpec {
  import spark.implicits._

  private val wireSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def wire(id: Long, ts: Long, uid: Long, typ: String, v: Double) =
    (s"$uid".getBytes("UTF-8"),
     s"""{"event_id":$id,"ts_us":$ts,"user_id":$uid,"event_type":"$typ","value":$v}"""
       .getBytes("UTF-8"),
     ts)

  test("bus -> wire decode -> stateful snapshots equals the batch fold") {
    val root = graft.TempDirs.create("graft_bus_tracks")
    val conf = spark.sparkContext.hadoopConfiguration
    // user 1 events arrive out of ts order and with a ts-duplicate;
    // user 2 on another bus partition
    BusLog.append(conf, root, 0, Seq(
      wire(1, 5000L, 1L, "a", 1.0),
      wire(2, 3000L, 1L, "b", 2.0),
      wire(3, 5000L, 1L, "c", 3.0)))  // ts collides with event 1: dedup keeps first-arrival
    BusLog.append(conf, root, 1, Seq(
      wire(4, 9000L, 2L, "d", 4.0)))

    val bus = spark.readStream.format("graft-bus").option("path", root).load()
    val events = bus
      .select(from_json($"value".cast("string"), wireSchema).as("e"))
      .select($"e.event_id", $"e.ts_us".as("tsMicros"), $"e.user_id",
              $"e.event_type".as("eventType"), $"e.value")
      .as[EventRaw]
    val qn = "bus_tracks"
    val q = TrackStateOp.trackSnapshots(events).toDF()
      .writeStream.format("memory").queryName(qn)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val latest = TrackStateOp.latestSnapshot(spark.table(qn))
      .select($"user_id", $"event_id", $"event_type")
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    // user 1's buffer: ts-sorted, the ts-5000 duplicate (event 3) dropped
    assert(latest.toSeq == Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 4L, "d")),
      s"got ${latest.toSeq}")
    // batch-fold equivalence: the same events through the pure fold
    val folded = TrackStateOp.foldGroup(1L,
      Seq(EventRaw(1, 5000L, 1, "a", 1.0), EventRaw(2, 3000L, 1, "b", 2.0),
          EventRaw(3, 5000L, 1, "c", 3.0)),
      None, hasTimedOut = false, cap = 10)._2.map(s => (s.event_id, s.event_type))
    assert(latest.filter(_._1 == 1L).map(r => (r._2, r._3)).toSeq ==
      folded.sortBy(_._1).toSeq)
    spark.catalog.dropTempView(qn)
  }
}
