package graft

import org.apache.spark.sql.types._

/** Schema-drift regression guard (round-5 lesson): the driver regenerated
  * `/root/testdata` mid-round with `events.ts` switched from int64 nanos to
  * parquet TIMESTAMP(MICROS), and 17 streaming gate queries failed before
  * any named test did. This spec pins (a) the RAW footer types the loaders
  * are written to accept, and (b) the NORMALIZED engine-facing types every
  * query depends on — so the next silent fixture regeneration fails here,
  * by name, instead of at the gate.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).isDirectory

  /** Types `Tables.table` can absorb for a timestamp-carrying column. */
  private val absorbableTs: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("raw footer ts types are within the loaders' dispatch set") {
    assume(available)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for ((tbl, col) <- Seq("events" -> "ts", "orders" -> "o_orderdate",
                           "lineitem" -> "l_shipdate")) {
      val t = spark.read.parquet(s"$sfDir/$tbl.parquet").schema(col).dataType
      assert(absorbableTs.contains(t),
        s"$tbl.$col raw type $t is outside the set the loaders dispatch on " +
          s"($absorbableTs) — update Tables.table AND TrackStateOp.eventsStream")
    }
  }

  test("normalized engine-facing schemas match what the queries assume") {
    assume(available)
    def typeOf(tbl: String, col: String): DataType =
      Tables.table(spark, sfDir, tbl).schema(col).dataType
    assert(typeOf("events", "ts") == TimestampType)
    assert(typeOf("events", "user_id") == LongType)
    assert(typeOf("events", "value") == DoubleType)
    assert(typeOf("orders", "o_orderdate") == TimestampType)
    assert(typeOf("orders", "o_totalprice") == DoubleType)
    assert(typeOf("lineitem", "l_shipdate") == TimestampType)
    assert(typeOf("lineitem", "l_quantity") == DoubleType)
    assert(typeOf("documents", "text") == StringType)
    assert(typeOf("embeddings", "embedding") == ArrayType(FloatType, containsNull = true))
  }

  test("NTZ normalization recurses into structs and arrays") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = graft.TempDirs.create("graft_ntz_nested")
    Seq(("2024-01-01 00:00:00", 1L)).toDF("t", "id")
      .select($"id",
        struct(to_timestamp_ntz($"t").as("ts"), $"id".as(raw"v")).as("s"),
        array(to_timestamp_ntz($"t")).as("arr"),
        to_timestamp_ntz($"t").as("top"))
      .write.parquet(s"$dir/nested.parquet")
    val got = Tables.table(spark, dir, "nested")
    assert(got.schema("top").dataType == TimestampType)
    assert(got.schema("s").dataType.asInstanceOf[StructType]("ts").dataType == TimestampType)
    assert(got.schema("arr").dataType == ArrayType(TimestampType, containsNull = true))
    // value preserved: wall time reinterpreted as the same UTC instant
    val micros = got.select(unix_micros($"top"), unix_micros($"s.ts"),
        unix_micros(element_at($"arr", 1)))
      .as[(Long, Long, Long)].head()
    assert(micros._1 == micros._2 && micros._2 == micros._3)
    assert(micros._1 == 1704067200L * 1000000L) // 2024-01-01T00:00:00Z
  }

  test("eventsStream analyzes against the current fixtures") {
    assume(available)
    // Analysis alone exercises the ts-type dispatch; no stream is started.
    val ds = graft.tracks.TrackStateOp.eventsStream(spark, sfDir)
    assert(ds.schema("tsMicros").dataType == LongType)
    assert(ds.isStreaming)
  }
}
