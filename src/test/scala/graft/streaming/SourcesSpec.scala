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
}
