package graft.flights

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end port of the reference's FlightSim replay (SURVEY.md §5):
  * 9 flights x 9 timestamps, one position per flight per batch — after
  * batch k every track has size k; last-known position equals the final
  * row per flight. Data is generated synthetically in the reference CSV's
  * shape (no fixture copying). */
class FlightSpec extends SparkSpec {
  import spark.implicits._

  private val flightIds = FlightFixtures.flightIds
  private def line(id: String, sec: Int, idx: Int): String = FlightFixtures.line(id, sec, idx)

  test("parseCsv: quotes, trims, correct 12h PM parse, epoch-0 fallback") {
    val df = Seq(
      line("ASA2", 0, 0),
      """"BAD",not a time,1.0,2.0,A,B,C,100""",
      """"NOCAST",3/16/2012 02:25:30 PM,xx,2.0,A,B,C,yy"""
    ).toDF("value")
    val parsed = Flights.parseCsv(df)
    val rows = parsed.select($"trackId", unix_micros($"time").as("us"),
        $"longitude", $"altitude").collect()
    val byId = rows.map(r => r.getString(0) -> r).toMap
    // 02:25:30 PM == 14:25:30 UTC on 2012-03-16 (the CORRECT parse —
    // the reference's Simple stack would have read 02:25:30 AM)
    val expectedUs = java.time.LocalDateTime.of(2012, 3, 16, 14, 25, 30)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(byId("ASA2").getLong(1) == expectedUs)
    assert(byId("BAD").getLong(1) == 0L)         // unparseable -> epoch 0
    assert(byId("NOCAST").isNullAt(2) && byId("NOCAST").isNullAt(3)) // try_cast
  }

  test("parseCsv + flightStream survive truncated/blank lines (ANSI OOB regression)") {
    val df = Seq("", "just,two", line("ASA2", 0, 0)).toDF("value")
    val parsed = Flights.parseCsv(df) // must not throw on short lines
    assert(parsed.count() == 3)
    // typed stream drops rows whose non-nullable fields failed to parse
    val typed = Flights.flightStream(df)
    assert(typed.collect().map(_.trackId).toSeq == Seq("ASA2"))
  }

  test("schema tags resolve the TRACK_ID column (P7)") {
    val parsed = Flights.withFlightTags(Flights.parseCsv(Seq(line("ASA2", 0, 0)).toDF("value")))
    assert(Flights.taggedColumn(parsed, "TRACK_ID").contains("trackId"))
    assert(Flights.taggedColumn(parsed, "START_TIME").contains("time"))
    assert(Flights.taggedColumn(parsed, "NOPE").isEmpty)
  }

  // the reference's declarative schema format, verbatim structure
  // (reference StreamWithStates.scala:86-165): typed tagged attributes +
  // geometry descriptor + time descriptor
  private val flightsSchemaJson =
    """{
      |  "attributes": [
      |    { "name": "flightId", "dataType": "String", "nullable": false,
      |      "tags": [ { "name": "TRACK_ID", "types": [ "String" ] } ] },
      |    { "name": "flightTime", "dataType": "Date", "nullable": false,
      |      "tags": [ { "name": "START_TIME", "types": [ "Date" ] },
      |                { "name": "END_TIME", "types": [ "Date" ] } ] },
      |    { "name": "longitude", "dataType": "Float64", "nullable": false, "tags": [] },
      |    { "name": "latitude", "dataType": "Float64", "nullable": false, "tags": [] },
      |    { "name": "origin", "dataType": "String", "nullable": false, "tags": [] },
      |    { "name": "destination", "dataType": "String", "nullable": false, "tags": [] },
      |    { "name": "aircraft", "dataType": "String", "nullable": false, "tags": [] },
      |    { "name": "altitude", "dataType": "Int32", "nullable": false, "tags": [] }
      |  ],
      |  "geometry": {
      |    "geometryType": "esriGeometryPoint",
      |    "spatialReference": { "wkid": 4326 },
      |    "fieldName": "Geometry"
      |  },
      |  "time": { "timeType": "Instant" }
      |}""".stripMargin

  test("FeatureSchema: JSON-declared schema parses to tagged StructType (P7)") {
    import org.apache.spark.sql.types._
    val schema = FeatureSchema.fromJson(flightsSchemaJson)
    assert(schema.fields.length == 9) // 8 attributes + geometry descriptor
    assert(schema("flightId").dataType == StringType && !schema("flightId").nullable)
    assert(schema("flightTime").dataType == TimestampType)
    assert(schema("longitude").dataType == DoubleType)
    assert(schema("altitude").dataType == IntegerType)
    assert(schema("Geometry").dataType == StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType))))
    assert(schema("Geometry").metadata.getLong("wkid") == 4326L)
    assert(FeatureSchema.taggedField(schema, "TRACK_ID").contains("flightId"))
    assert(FeatureSchema.taggedField(schema, "START_TIME").contains("flightTime"))
    // multi-tagged attribute: EVERY declared tag must resolve, not just the first
    assert(FeatureSchema.taggedField(schema, "END_TIME").contains("flightTime"))
    assert(FeatureSchema.taggedField(schema, "GEOMETRY").contains("Geometry"))
  }

  test("FeatureSchema: tag resolution on real data driven by the JSON document (P7)") {
    // parse real lines, rename to the declared attribute names, then let
    // the USER's JSON document (not hand-built metadata) drive resolution
    val schema = FeatureSchema.fromJson(flightsSchemaJson)
    val parsed = Flights.parseCsv(Seq(line("ASA2", 0, 0)).toDF("value"))
      .drop("flightTime") // raw string column; the parsed one takes its name
      .withColumnRenamed("trackId", "flightId")
      .withColumnRenamed("time", "flightTime")
      .withColumnRenamed("geometry", "Geometry")
    val tagged = FeatureSchema.applyTags(parsed, schema)
    assert(Flights.taggedColumn(tagged, "TRACK_ID").contains("flightId"))
    assert(Flights.taggedColumn(tagged, "START_TIME").contains("flightTime"))
    val id = tagged.select(org.apache.spark.sql.functions.col(
      Flights.taggedColumn(tagged, "TRACK_ID").get)).as[String].head()
    assert(id == "ASA2")
  }

  test("geometry string renders the reference's '(x, y)' format (P9)") {
    val parsed = Flights.parseCsv(Seq(line("ASA2", 0, 0)).toDF("value"))
    val s = parsed.select(Flights.geometryString($"geometry")).as[String].head()
    assert(s == "(-100.0, 30.0)")
  }

  test("dropGeometryData nulls values, keeps schema (P6)") {
    val parsed = Flights.parseCsv(Seq(line("ASA2", 0, 0)).toDF("value"))
    val dropped = Flights.dropGeometryData(parsed)
    assert(dropped.schema("geometry").dataType == parsed.schema("geometry").dataType)
    assert(dropped.select($"geometry").head().isNullAt(0))
  }

  test("FlightSim replay: per-batch growth, bounded tracks, last-known position") {
    val input = MemoryStream[String](spark)
    val snaps = Flights.trackSnapshots(Flights.flightStream(input.toDF()))
    val qn = "fl" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = snaps.writeStream.format("memory").queryName(qn).outputMode("update").start()
    try {
      // batches 1..9, one position per flight each (the reference's batch files)
      (0 until 9).foreach { sec =>
        input.addData(flightIds.zipWithIndex.map { case (id, i) => line(id, sec, i) })
        q.processAllAvailable()
      }
      val table = spark.table(qn)
      val latest = table
        .withColumn("maxver", max($"ver").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"trackId")))
        .filter($"ver" === $"maxver")
      val sizes = latest.groupBy($"trackId").count().as[(String, Long)].collect().toMap
      assert(sizes.keySet == flightIds.toSet)
      assert(sizes.values.forall(_ == 9L)) // 9 batches, cap 10 never hit
      // last-known position per flight == the batch-9 (sec=8) row
      val last = latest.groupBy($"trackId")
        .agg(max(struct($"tsMicros", $"longitude")).getField("longitude").as("lon"))
        .as[(String, Double)].collect().toMap
      flightIds.zipWithIndex.foreach { case (id, i) =>
        assert(math.abs(last(id) - (-100.0 - i - 8 * 0.01)) < 1e-9)
      }
    } finally q.stop()
  }

  test("showTempView keeps the FULL snapshot across batches (K3 parity)") {
    val input = MemoryStream[String](spark)
    val snaps = Flights.trackSnapshots(Flights.flightStream(input.toDF()))
    val vn = "flights_view_" + java.util.UUID.randomUUID().toString.take(8)
    val q = Flights.showTempView(snaps, vn, quiet = true)
    try {
      input.addData(Seq(line("ASA2", 0, 0), line("ASA3", 0, 1))); q.processAllAvailable()
      input.addData(Seq(line("SWA510", 1, 3))); q.processAllAvailable()
      // ASA2/ASA3 were not updated in batch 2 but must still be visible
      val ids = spark.sql(s"select distinct flightId from $vn")
        .as[String].collect().toSet
      assert(ids == Set("ASA2", "ASA3", "SWA510"))
    } finally q.stop()
  }
}
