package graft.streaming

import graft.SparkSpec
import graft.flights.Flights
import graft.queries.SourceQueries
import org.apache.spark.sql.functions._
import java.io.PrintWriter
import java.net.ServerSocket

/** End-to-end ingest composition: the reference's TCP socket source
  * (S1, the closest a sandbox gets to a broker) feeding the Kafka wire
  * schema, decoded by the SAME `kafkaWireDecode` the gate query
  * (q_source_kafka_shaped) uses. Proves the wire contract holds on a
  * LIVE stream, not just the batch replay: socket line → JSON payload →
  * binary value framing (key/topic/partition/offset) → typed rows. */
class KafkaShapedBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("socket lines framed as Kafka records decode to typed events via the shared wire path") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val lines = Seq(
      """{"event_id":1,"ts_us":1000000,"user_id":10,"event_type":"click","value":1.5}""",
      """{"event_id":2,"ts_us":2000000,"user_id":11,"event_type":"view","value":2.5}""",
      """{"event_id":3,"ts_us":3000000,"user_id":10,"event_type":"buy","value":3.0}""")
    @volatile var client: java.net.Socket = null
    val feeder = new Thread(() => {
      client = server.accept()
      val out = new PrintWriter(client.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
    })
    feeder.setDaemon(true)
    feeder.start()

    // producer half: frame each socket line exactly like the gate query's
    // wire shape (the line IS the value payload; key/partition derive from
    // the payload's user_id, as a keyed producer would)
    val raw = Flights.socketLines(spark, "localhost", port)
    val keyed = raw.select(
      get_json_object($"value", "$.user_id").as("uid"), $"value")
    val wire = keyed.select(
      $"uid".cast("binary").as("key"),
      $"value".cast("binary").as("value"),
      lit("events").as("topic"),
      pmod($"uid".cast("long"), lit(8)).cast("int").as("partition"),
      get_json_object($"value", "$.event_id").cast("long").as("offset"))
    val typed = SourceQueries.kafkaWireDecode(wire)

    val qn = "kwire" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = typed.writeStream.format("memory").queryName(qn).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var got = Map.empty[Long, (Long, String, Double)]
      while (got.size < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        got = spark.table(qn)
          .select($"event_id", $"user_id", $"event_type", $"value")
          .as[(Long, Long, String, Double)].collect()
          .map { case (e, u, t, v) => e -> (u, t, v) }.toMap
      }
      assert(got == Map(
        1L -> (10L, "click", 1.5),
        2L -> (11L, "view", 2.5),
        3L -> (10L, "buy", 3.0)))
    } finally {
      q.stop()
      if (client != null) client.close()
      server.close()
    }
  }
}
