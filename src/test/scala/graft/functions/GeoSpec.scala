package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Geometry function tests: projection known values + round-trip,
  * geodesic buffer radius accuracy. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("WebMercator: known values and codegen/interpreted parity") {
    WebMercator.register(spark)
    val df = Seq((0.0, 0.0), (180.0, 0.0), (-79.5857, 34.2655)).toDF("lon", "lat")
      .withColumn("m", expr("web_mercator(lon, lat)"))
      .select($"lon", $"lat", $"m.x", $"m.y")
    val rows = df.as[(Double, Double, Double, Double)].collect()
    val origin = rows.find(_._1 == 0.0).get
    assert(origin._3 == 0.0 && math.abs(origin._4) < 1e-9)
    val antimeridian = rows.find(_._1 == 180.0).get
    assert(math.abs(antimeridian._3 - 2.0037508342789244e7) < 1e-6)
    // interpreted eval must equal the codegen'd pipeline result
    val flight = rows.find(_._1 == -79.5857).get
    val expectX = WebMercator.R * -79.5857 * math.Pi / 180.0
    val expectY = WebMercator.R * math.log(math.tan(math.Pi / 4 + 34.2655 * math.Pi / 360.0))
    assert(flight._3 == expectX && flight._4 == expectY)
  }

  test("WebMercator inverse round-trip") {
    // inverse: lon = x/R * 180/pi ; lat = (2*atan(exp(y/R)) - pi/2) * 180/pi
    val lon = -79.5857; val lat = 34.2655
    val x = WebMercator.R * lon * math.Pi / 180.0
    val y = WebMercator.R * math.log(math.tan(math.Pi / 4 + lat * math.Pi / 360.0))
    val lonBack = x / WebMercator.R * 180.0 / math.Pi
    val latBack = (2 * math.atan(math.exp(y / WebMercator.R)) - math.Pi / 2) * 180.0 / math.Pi
    assert(math.abs(lonBack - lon) < 1e-12 && math.abs(latBack - lat) < 1e-12)
  }

  test("geodesic buffer: every vertex ~radius away, n vertices") {
    val poly = GeodesicBuffer.ngon(-79.5857, 34.2655, 100.0, 32)
    assert(poly.size == 32)
    poly.foreach { p =>
      val d = GeodesicBuffer.haversine(-79.5857, 34.2655, p.x, p.y)
      assert(math.abs(d - 100.0) < 0.01, s"vertex at $d m")
    }
  }
}
