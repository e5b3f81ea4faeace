package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Geodesic point buffer (SURVEY.md §2.3 G3; the reference's proprietary
  * "BufferCreator" tool, whose output it never actually displays): an
  * N-gon approximating the circle of `radiusMeters` around a WGS84 point,
  * via the spherical direct problem (public great-circle formulas).
  *
  * Deliberately a UDF, not a codegen expression: it is not on any hot
  * path (the reference comments its consumer out), and the output is a
  * variable-length polygon — SURVEY.md §7 marks it low-priority.
  */
object GeodesicBuffer {
  private val EarthR = 6371008.8 // mean earth radius, meters

  case class Pt(x: Double, y: Double)

  def ngon(lon: Double, lat: Double, radiusMeters: Double, n: Int): Seq[Pt] = {
    val latR = math.toRadians(lat)
    val lonR = math.toRadians(lon)
    val d = radiusMeters / EarthR // angular distance
    (0 until n).map { i =>
      val brg = 2.0 * math.Pi * i / n
      val lat2 = math.asin(math.sin(latR) * math.cos(d) +
        math.cos(latR) * math.sin(d) * math.cos(brg))
      val lon2 = lonR + math.atan2(
        math.sin(brg) * math.sin(d) * math.cos(latR),
        math.cos(d) - math.sin(latR) * math.sin(lat2))
      Pt(math.toDegrees(lon2), math.toDegrees(lat2))
    }
  }

  /** Haversine great-circle distance in meters (for tests/validation). */
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthR * math.asin(math.sqrt(a))
  }

  val bufferUdf = udf((lon: Double, lat: Double, radius: Double, n: Int) =>
    ngon(lon, lat, radius, n))

  def buffer(lon: Column, lat: Column, radius: Column, n: Column): Column =
    bufferUdf(lon, lat, radius, n)
}
