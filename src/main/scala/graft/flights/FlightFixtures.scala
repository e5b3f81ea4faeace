package graft.flights

/** Shared synthetic feed in the reference CSV's exact shape (9 flights,
  * one position per second) — used by both FlightReplayDemo and
  * FlightSpec so the format under test cannot drift from the format the
  * demo replays. Generated, never copied from the reference fixtures. */
object FlightFixtures {
  val flightIds: Seq[String] = Seq("ASA2", "ASA3", "ASA6", "SWA510", "SWA724",
                                   "SWA992", "SWA1568", "SWA2358", "SWA2706")

  def line(id: String, sec: Int, idx: Int): String = {
    val lon = -100.0 - idx - sec * 0.01
    val lat = 30.0 + idx + sec * 0.01
    f""""$id",3/16/2012 02:25:${30 + sec}%02d PM,$lon%.6f,$lat%.6f,IAD,TPA,B733,${30000 + idx * 100}"""
  }

  def batch(sec: Int): Seq[String] =
    flightIds.zipWithIndex.map { case (id, i) => line(id, sec, i) }
}
