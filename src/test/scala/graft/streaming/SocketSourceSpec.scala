package graft.streaming

import graft.SparkSpec
import graft.flights.Flights
import java.io.PrintWriter
import java.net.ServerSocket

/** S1: the reference's TCP text source, driven by a real local socket
  * (the reference's `nc -kl 7777 < FlightSim.csv` harness, in-process). */
class SocketSourceSpec extends SparkSpec {
  import spark.implicits._

  test("socket source streams lines into the flight parser") {
    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    val lines = Seq(
      """"ASA2",3/16/2012 02:25:30 PM,-100.0,30.0,IAD,TPA,B733,30000""",
      """"ASA3",3/16/2012 02:25:31 PM,-101.0,31.0,IAD,TPA,B733,30100""")
    @volatile var client: java.net.Socket = null
    val feeder = new Thread(() => {
      client = server.accept()
      val out = new PrintWriter(client.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      // keep the connection open; source reads until the query stops
    })
    feeder.setDaemon(true)
    feeder.start()

    val parsed = Flights.parseCsv(Flights.socketLines(spark, "localhost", port))
    val qn = "sock" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = parsed.writeStream.format("memory").queryName(qn).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var ids = Set.empty[String]
      while (ids.size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        ids = spark.table(qn).select($"trackId").as[String].collect().toSet
      }
      assert(ids == Set("ASA2", "ASA3"))
    } finally {
      q.stop()
      if (client != null) client.close()
      server.close()
    }
  }
}
