package graft.streaming

import graft.SparkSpec
import graft.queries.SourceQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Multi-batch behavior of the foreachBatch CDC upsert sink — the gate
  * runs it with AvailableNow (one batch), so the cross-batch merge loop
  * (newer wins, late data loses, new keys insert) is pinned here with
  * explicit batch boundaries. */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(event_id: Long, user_id: Long, tsMicros: Long,
                        event_type: String, value: Double)

  test("upsert view across batches: newer wins, late loses, inserts land") {
    val input = MemoryStream[(Long, Long, Long, String, Double)](spark)
    val events = input.toDS()
      .toDF("event_id", "user_id", "tsMicros", "event_type", "value")
      .select($"event_id", $"user_id", timestamp_micros($"tsMicros").as("ts"),
        $"event_type", $"value")
    val run = graft.TempDirs.create("graft_upsert_spec")
    val (q, view) = SourceQueries.upsertSink(events, run, trigger = None)
    try {
      def state(): Map[Long, (Long, Double)] =
        view().select($"user_id", $"event_id", $"value")
          .as[(Long, Long, Double)].collect()
          .map { case (u, e, v) => u -> (e, v) }.toMap

      input.addData((1L, 10L, 1000L, "click", 1.0), (2L, 20L, 2000L, "view", 2.0))
      q.processAllAvailable()
      assert(state() == Map(10L -> (1L, 1.0), 20L -> (2L, 2.0)))

      // batch 2: user 10 gets a NEWER event; user 30 is a fresh insert
      input.addData((3L, 10L, 5000L, "click", 3.0), (4L, 30L, 100L, "buy", 4.0))
      q.processAllAvailable()
      assert(state() == Map(10L -> (3L, 3.0), 20L -> (2L, 2.0), 30L -> (4L, 4.0)))

      // batch 3: LATE event for user 20 (older ts) must NOT displace;
      // same-ts tie for user 30 resolves to the higher event_id
      input.addData((5L, 20L, 500L, "view", 5.0), (6L, 30L, 100L, "buy", 6.0))
      q.processAllAvailable()
      assert(state() == Map(10L -> (3L, 3.0), 20L -> (2L, 2.0), 30L -> (6L, 6.0)))

      // GC: after 3 commits only the UpsertRetainVersions newest version
      // dirs survive (v0 pruned), and a reader lagging one version behind
      // `latest` (the retention window's purpose) still reads cleanly
      def versions(): Seq[Long] = {
        val base = new java.io.File(run)
        base.listFiles().toSeq
          .filter(f => f.isDirectory && f.getName.startsWith("state_v"))
          .map(_.getName.stripPrefix("state_v").toLong).sorted
      }
      assert(versions() == Seq(1L, 2L),
        s"expected GC to retain exactly v1+v2, got ${versions()}")
      val lagging = spark.read.parquet(s"$run/state_v1")
        .select($"user_id", $"event_id").as[(Long, Long)].collect().toMap
      assert(lagging == Map(10L -> 3L, 20L -> 2L, 30L -> 4L))
    } finally q.stop()
  }
}
