package graft.queries

import graft.{QueryPack, Tables}
import graft.functions.{GeodesicBuffer, WebMercator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry scalar functions (SURVEY.md §2.3). The testdata has no
  * lon/lat columns, so coordinates are derived deterministically from
  * `events.value` (fmod is IEEE-exact, so both engines derive identical
  * doubles); the projection itself is the operator under test.
  */
object GeoQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- G2: WebMercator projection as a codegen'd native expression ----
    "q_geo_project" -> { (s, d) =>
      import s.implicits._
      WebMercator.register(s)
      Tables.events(s, d)
        .select(
          $"event_id",
          ($"value" % 360.0 - 180.0).as("lon"),
          ($"value" % 170.0 - 85.0).as("lat"))
        .withColumn("m", expr("web_mercator(lon, lat)"))
        .select($"event_id", $"lon", $"lat",
                round($"m.x", 6).as("mx"), round($"m.y", 6).as("my"))
        .orderBy($"event_id")
    },

    // ---- G3: geodesic buffer polygon (UDF; validated in GeoSpec) ----
    "q_geo_buffer" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .filter($"event_id" < 100)
        .select(
          $"event_id",
          ($"value" % 360.0 - 180.0).as("lon"),
          ($"value" % 170.0 - 85.0).as("lat"))
        .withColumn("poly", GeodesicBuffer.buffer($"lon", $"lat", lit(100.0), lit(16)))
        .select($"event_id",
                asLong(size($"poly")).as("n_vertices"),
                round(element_at($"poly", 1).getField("y"), 6).as("north_lat"))
        .orderBy($"event_id")
    }
  )

  override def oracles: Map[String, String] = Map(
    // same public formula inline; ln/tan differ by <= a few ulp across
    // libms -> round(6) (micrometers) absorbs it
    "q_geo_project" ->
      """SELECT event_id,
        |  fmod(value, 360.0) - 180.0 AS lon,
        |  fmod(value, 170.0) - 85.0 AS lat,
        |  round(6378137.0 * (fmod(value, 360.0) - 180.0) * pi() / 180.0, 6) AS mx,
        |  round(6378137.0 * ln(tan(pi() / 4.0 + (fmod(value, 170.0) - 85.0) * pi() / 360.0)), 6) AS my
        |FROM events
        |ORDER BY event_id""".stripMargin
    // q_geo_buffer: spherical-direct N-gon is not reasonably expressible
    // in SQL; GeoSpec asserts radius accuracy via haversine instead.
  )
}
