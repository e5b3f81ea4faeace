package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Rate source smoke (SURVEY.md §2.1 "rate source for load tests"):
  * schema and liveness of the synthetic load generator. */
class SourcesSpec extends SparkSpec {

  test("rate source produces (timestamp, value) rows") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
    assert(rate.schema.fieldNames.toSeq == Seq("timestamp", "value"))
    val qn = "rate" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = rate.writeStream.format("memory").queryName(qn)
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500); n = spark.table(qn).count()
      }
      assert(n > 0, "rate source emitted no rows in 20s")
    } finally q.stop()
  }

  test("observe: pipeline metrics collected in the SAME pass as the query") {
    // the production alternative to a second validation scan at 100 TB:
    // observe() attaches aggregates to the existing physical plan, so
    // row counts / sums / null counts ride along with the real work
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val obs = Observation("ingest_stats")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_value_nonnull"),
        max(col("event_id")).as("max_id"))
    val written = ev.filter(col("event_type") === "purchase").count()
    val m = obs.get
    // the metrics cover the FULL observed stream (pre-filter), proving
    // they piggybacked on the scan rather than re-running the query
    assert(m("n_rows").asInstanceOf[Long] == 1000L)
    assert(m("n_value_nonnull").asInstanceOf[Long] == 1000L)
    assert(written > 0 && written < m("n_rows").asInstanceOf[Long])
    assert(m("max_id").asInstanceOf[Long] > 0L)
  }
}
