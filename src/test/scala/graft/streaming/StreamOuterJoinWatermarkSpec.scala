package graft.streaming

import graft.SparkSpec
import graft.Tables
import graft.queries.StreamJoinQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the streaming outer-join null-emission contract at TWO watermark
  * horizons (the gate queries only run "1 hour"). The asymmetric rule:
  * an unmatched PURCHASE emits its null row once watermark w > p_ts; an
  * unmatched CLICK must be held 30 minutes past its own timestamp (a
  * future purchase with p_ts in [c_ts, c_ts + 30m] could still match),
  * so its null row emits only once w > c_ts + 30m. The final watermark
  * after an AvailableNow drain is least(max p_ts, max c_ts) - delay —
  * shrinking the delay strictly GROWS the emitted null set, which is the
  * regression this spec makes structural: it recomputes the expected set
  * from the batch join + eviction rule per horizon and demands exact
  * equality, so any drift in state lifetime or emission timing fails. */
class StreamOuterJoinWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  /** (matched pairs, null-form rows) expected at watermark `delay`. */
  private def expected(joinType: String, delay: String): Set[(Option[Long], Option[Long])] = {
    val ev = Tables.events(spark, SF)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val j = p.join(c,
      $"p_user" === $"c_user" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
        $"c_ts" <= $"p_ts",
      joinType)
    // global watermark after the drain = least of the per-side watermarks
    // (each side's max observed event time minus the delay)
    val w = ev.agg(
        (least(max(when($"event_type" === "purchase", $"ts")),
               max(when($"event_type" === "click", $"ts")))
          - expr(s"INTERVAL $delay")).as("w"))
      .head().getTimestamp(0)
    j.filter(
        ($"p_id".isNotNull && $"c_id".isNotNull) ||
        ($"c_id".isNull && $"p_ts" < lit(w)) ||
        ($"p_id".isNull && $"c_ts" + expr("INTERVAL 30 MINUTES") < lit(w)))
      .select($"p_id", $"c_id")
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
                 Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
  }

  private def run(joinType: String, delay: String): Set[(Option[Long], Option[Long])] =
    StreamJoinQueries.streamStreamOuter(spark, SF, joinType, delay)
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
                 Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet

  for (delay <- Seq("1 hour", "3 hours"); joinType <- Seq("left_outer", "full_outer")) {
    test(s"$joinType null emission matches the eviction rule at watermark '$delay'") {
      val got = run(joinType, delay)
      val want = expected(joinType, delay)
      // sanity on the fixture: the horizons must actually discriminate —
      // some matched rows and, at 1h, some null emissions must exist
      assert(got.exists { case (p, c) => p.isDefined && c.isDefined })
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("shrinking the watermark delay only grows the emitted null set (left_outer)") {
    def nulls(s: Set[(Option[Long], Option[Long])]) = s.filter(_._2.isEmpty)
    val at1h = nulls(run("left_outer", "1 hour"))
    val at3h = nulls(run("left_outer", "3 hours"))
    assert(at3h.subsetOf(at1h),
      s"3h-horizon nulls must be a subset of 1h-horizon nulls; extra=${(at3h -- at1h).take(5)}")
    assert(at1h.size > at3h.size,
      "fixture must discriminate the two horizons (1h should emit strictly more nulls)")
  }
}
