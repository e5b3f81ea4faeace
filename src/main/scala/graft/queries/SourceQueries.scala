package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond parquet (SURVEY.md §2.1 ABSENT→ENGINE):
  * CSV and JSON-lines scans, exercised as write-then-read roundtrips so
  * the DuckDB oracle (over the original table) proves the format codecs
  * lose nothing. Schemas are declared, never inferred (the engine's
  * schema stance, SURVEY.md §1). */
object SourceQueries extends QueryPack {

  // one roundtrip dir per format per JVM (overwrite mode): repeated
  // invocations must not accumulate temp copies of the tables
  private lazy val csvDir = tempFixtureDir("graft_csv")
  private lazy val jsonDir = tempFixtureDir("graft_json")
  private lazy val orcDir = tempFixtureDir("graft_orc")
  private lazy val xmlDir = tempFixtureDir("graft_xml")
  private lazy val fileSinkDir = tempFixtureDir("graft_fsink")
  private lazy val evoDir = tempFixtureDir("graft_evo")
  // package-visible: the spec asserts the file-count collapse (the half
  // of the compaction contract the row-level oracle cannot see)
  private[queries] lazy val compactDir = tempFixtureDir("graft_compact")
  private lazy val busDir = tempFixtureDir("graft_bus")

  /** Bus-log fixture per scale dir: events keyed by user, value = the
    * kafka-wire JSON, 4 bus partitions (user_id % 4), offsets assigned in
    * event_id order. BULK-LOADED distributedly: Spark writes each
    * partition's line file in parallel jobs and only the atomic
    * segment-publish rename happens driver-side — no row ever crosses the
    * driver (the 100 TB load path for [[graft.sources.BusLog]]). */
  private val busFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def busRoot(s: SparkSession, d: String): String =
    busFixtures.computeIfAbsent(d, { _ =>
      import s.implicits._
      import org.apache.hadoop.fs.Path
      val key = java.lang.Long.toHexString(
        java.util.UUID.nameUUIDFromBytes(d.getBytes("UTF-8"))
          .getMostSignificantBits)
      val root = s"$busDir/log_$key"
      val conf = s.sparkContext.hadoopConfiguration
      val ev = Tables.events(s, d)
      (0 until 4).foreach { pid =>
        // Spark's base64() is the chunking MIME encoder (a \r\n every 76
        // chars — would split one record across lines); strip the chunk
        // breaks to plain RFC 4648, which BusLog's strict decoder expects.
        def b64(c: org.apache.spark.sql.Column) =
          regexp_replace(base64(c), "[\\r\\n]", "")
        val lines = ev.filter(pmod($"user_id", lit(4L)) === pid.toLong)
          .select($"event_id", concat_ws("\t",
            b64($"user_id".cast("string").cast("binary")),
            b64(to_json(struct($"event_id", unix_micros($"ts").as("ts_us"),
                               $"user_id", $"event_type", $"value"))
              .cast("binary")),
            unix_micros($"ts").cast("string")).as("line"))
          .repartition(1).sortWithinPartitions($"event_id")
          .select($"line")
        val load = s"$root/_load/p$pid"
        lines.write.mode("overwrite").text(load)
        val fs = new Path(load).getFileSystem(conf)
        val part = fs.listStatus(new Path(load)).map(_.getPath)
          .find(_.getName.startsWith("part-")).get
        val n = s.read.textFile(load).count()
        // min/max record ts (epoch micros) → the segment name's time
        // index, what startingTimestamp resolution plans against
        val bounds = ev.filter(pmod($"user_id", lit(4L)) === pid.toLong)
          .agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
        val tsBounds = if (bounds.isNullAt(0)) None
          else Some((bounds.getLong(0), bounds.getLong(1)))
        graft.sources.BusLog.publish(conf, root, pid, part, n, tsBounds)
      }
      root
    })

  /** COMPACTED bus fixture: three deterministic segments per partition
    * (event_id % 3 slices, event_id order within each), keyed by user —
    * then [[graft.sources.BusLog.compactKeyedAll]] rewrites the two
    * SEALED segments latest-per-key while the third stays active. The
    * gate row replays the compacted-topic contract in SQL. */
  private val busCompactFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def busCompactRoot(s: SparkSession, d: String): String =
    busCompactFixtures.computeIfAbsent(d, { _ =>
      import s.implicits._
      import org.apache.hadoop.fs.Path
      val key = java.lang.Long.toHexString(
        java.util.UUID.nameUUIDFromBytes(("compact" + d).getBytes("UTF-8"))
          .getMostSignificantBits)
      val root = s"$busDir/compact_$key"
      val conf = s.sparkContext.hadoopConfiguration
      val ev = Tables.events(s, d)
      def b64(c: org.apache.spark.sql.Column) =
        regexp_replace(base64(c), "[\\r\\n]", "")
      (0 until 4).foreach { pid =>
        (0L to 2L).foreach { slice =>
          val part = ev.filter(pmod($"user_id", lit(4L)) === pid.toLong &&
              pmod($"event_id", lit(3L)) === slice)
          val lines = part
            .select($"event_id", concat_ws("\t",
              b64($"user_id".cast("string").cast("binary")),
              b64(to_json(struct($"event_id", $"user_id", $"event_type"))
                .cast("binary")),
              unix_micros($"ts").cast("string")).as("line"))
            .repartition(1).sortWithinPartitions($"event_id")
            .select($"line")
          val load = s"$root/_load/p${pid}_s$slice"
          lines.write.mode("overwrite").text(load)
          val fs = new Path(load).getFileSystem(conf)
          val pf = fs.listStatus(new Path(load)).map(_.getPath)
            .find(_.getName.startsWith("part-")).get
          val n = s.read.textFile(load).count()
          graft.sources.BusLog.publish(conf, root, pid, pf, n)
        }
      }
      graft.sources.BusLog.compactKeyedAll(conf, root)
      root
    })

  /** A second bus root loaded through the DSv2 WRITE path (BusSink) —
    * `df.write.format("graft-bus")` — instead of the manual publish: the
    * producer side of the broker surface. Single sorted task per
    * partition keeps offset assignment deterministic (event_id rank), so
    * the same replay oracle pins the write path end-to-end. */
  private val busSinkFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def busSinkRoot(s: SparkSession, d: String): String =
    busSinkFixtures.computeIfAbsent(d, { _ =>
      import s.implicits._
      val key = java.lang.Long.toHexString(
        java.util.UUID.nameUUIDFromBytes(("sink" + d).getBytes("UTF-8"))
          .getMostSignificantBits)
      val root = s"$busDir/sink_$key"
      Tables.events(s, d)
        .select($"event_id",
          $"user_id".cast("string").cast("binary").as("key"),
          to_json(struct($"event_id", $"user_id", $"event_type", $"value"))
            .cast("binary").as("value"),
          pmod($"user_id", lit(4L)).cast("int").as("partition"),
          unix_micros($"ts").as("timestamp"))
        .coalesce(1).sortWithinPartitions($"event_id")
        .drop("event_id")
        .write.format("graft-bus").option("path", root).mode("append").save()
      root
    })

  /** FULL INGEST PIPELINE fixture: `readStream.format("graft-bus")` →
    * typed parse → `writeStream.format("graft-table")` — the first
    * pipeline every production user builds (broker in, lakehouse out),
    * run once per JVM per scale dir as one synchronous AvailableNow
    * drain with a txn-stamped exactly-once table sink. */
  private val pipelineFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pipelineTableRoot(s: SparkSession, d: String): String =
    pipelineFixtures.computeIfAbsent(d, { _ =>
      import s.implicits._
      val key = java.lang.Long.toHexString(
        java.util.UUID.nameUUIDFromBytes(("pipe" + d).getBytes("UTF-8"))
          .getMostSignificantBits)
      val table = s"$busDir/pipe_$key"
      val ckpt = s"$busDir/pipe_ckpt_$key"
      val bus = s.readStream.format("graft-bus")
        .option("path", busRoot(s, d)).load()
      val parsed = bus.select(from_json($"value".cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, ts_us BIGINT, user_id BIGINT, " +
              "event_type STRING, value DOUBLE")).as("r"))
        .select($"r.event_id".as("event_id"),
          timestamp_micros($"r.ts_us").as("ts"),
          $"r.user_id".as("user_id"), $"r.event_type".as("event_type"),
          $"r.value".as("value"))
      val q = parsed.writeStream.format("graft-table")
        .option("path", table).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      table
    })

  /** Build the once-per-JVM bus-log fixtures (bulk load, keyed
    * compaction, sink epochs, bus->table pipeline) outside any timed
    * gate (r16 directive #6). */
  override def warm(s: SparkSession, d: String): Unit = {
    busRoot(s, d); busCompactRoot(s, d); busSinkRoot(s, d)
    pipelineTableRoot(s, d)
    ()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The composed ingest pipeline (bus -> parse -> ACID table): every
    // record the bus holds lands in the table exactly once, fully typed —
    // proven piecewise in r7 (bus source, table sink), now one gate row
    // end to end.
    "q_pipeline_bus_to_table" -> { (s, d) =>
      import s.implicits._
      graft.acid.GraftTable.load(s, pipelineTableRoot(s, d))
        .snapshot().orderBy($"event_id")
    },

    // ---- schema evolution across ingest batches (mergeSchema) ----
    // The long-lived-dataset reality: batch 1 lands without a column
    // that batch 2 adds (here `lang`). A mergeSchema read unifies the
    // footers at planning time and older rows surface NULL for the new
    // column — no rewrite of the old batch, which at 100 TB is the
    // whole point (schema-on-read evolution instead of a backfill).
    "q_source_schema_evolution" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"n_chars")
        .write.mode("overwrite").parquet(s"$evoDir/batch=1")
      docs.filter($"doc_id" % 2 =!= 0).select($"doc_id", $"n_chars", $"lang")
        .write.mode("overwrite").parquet(s"$evoDir/batch=2")
      s.read.option("mergeSchema", "true").parquet(evoDir)
        .select($"doc_id", asLong($"n_chars").as("n_chars"), $"lang",
          asLong($"batch").as("batch"))
        .orderBy($"doc_id")
    },

    // ---- small-file compaction (the 100 TB ingest hygiene op) ----
    // Streaming/CDC ingest leaves thousands of KB-sized files; scans
    // then pay per-file open/footer costs and the driver pays listing.
    // Compaction rewrites a directory at a target file count with NO
    // content change — the oracle proves losslessness (rows/values
    // identical to the source table), and the spec side of the contract
    // is the file-count collapse. Production compacts per partition and
    // sorts within files (see q_zorder_key) — here the mechanism is the
    // repartition(1)-rewrite of a deliberately 64-way-fragmented copy.
    "q_source_compaction" -> { (s, d) =>
      import s.implicits._
      val src = Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
      src.repartition(64).write.mode("overwrite").parquet(s"$compactDir/small")
      val compacted = s.read.parquet(s"$compactDir/small").repartition(1)
      compacted.write.mode("overwrite").parquet(s"$compactDir/big")
      s.read.parquet(s"$compactDir/big").orderBy($"o_orderkey")
    },

    "q_source_csv_roundtrip" -> { (s, d) =>
      import s.implicits._
      val dir = csvDir
      val src = Tables.region(s, d)
      src.write.mode("overwrite").option("header", "true").csv(dir)
      s.read.schema(src.schema).option("header", "true").csv(dir)
        .orderBy($"r_regionkey")
    },
    "q_source_json_roundtrip" -> { (s, d) =>
      import s.implicits._
      val dir = jsonDir
      val src = Tables.nation(s, d)
      src.write.mode("overwrite").json(dir)
      s.read.schema(src.schema).json(dir)
        .orderBy($"n_nationkey")
    },

    // XML — built into Spark 4 (the spark-xml merge): rowTag-delimited
    // records with automatic entity escaping, read back under an
    // explicit schema. The roundtrip proves writer escaping + reader
    // unescaping compose to the identity on arbitrary text columns.
    "q_source_xml_roundtrip" -> { (s, d) =>
      import s.implicits._
      val dir = xmlDir
      val src = Tables.nation(s, d)
      src.write.mode("overwrite").option("rowTag", "nation").xml(dir)
      s.read.schema(src.schema).option("rowTag", "nation").xml(dir)
        .orderBy($"n_nationkey")
    },

    // ORC — the third columnar format beside parquet (built-in writer/
    // reader, predicate pushdown and column pruning like parquet); the
    // roundtrip proves the codec loses nothing (doubles bit-exact)
    "q_source_orc_roundtrip" -> { (s, d) =>
      import s.implicits._
      val dir = orcDir
      val src = Tables.supplier(s, d)
      src.write.mode("overwrite").orc(dir)
      s.read.schema(src.schema).orc(dir)
        .orderBy($"s_suppkey")
    },

    // Kafka wire-shape roundtrip: serialize events into the Kafka source
    // schema (key/value binary, topic, partition, offset, timestamp) and
    // consume it back by parsing the value payload — the consumer-side
    // plumbing a real Kafka topic needs, minus the broker (zero-egress
    // container). Timestamps travel as unix micros inside the payload;
    // Spark's to_json timestamp format is millisecond-lossy.
    "q_source_kafka_shaped" -> { (s, d) =>
      import s.implicits._
      val wire = Tables.events(s, d).select(
        $"user_id".cast("string").cast("binary").as("key"),
        to_json(struct($"event_id", unix_micros($"ts").as("ts_us"),
                       $"user_id", $"event_type", $"value")).cast("binary").as("value"),
        lit("events").as("topic"),
        pmod($"user_id", lit(8)).cast("int").as("partition"),
        $"event_id".as("offset"))
      kafkaWireDecode(wire).orderBy($"event_id")
    },

    // Message-bus DSv2 STREAMING source (graft.sources.BusSource): the
    // events table bulk-loaded into a 4-partition offset-addressed
    // segment log, consumed as a micro-batch stream (AvailableNow),
    // values JSON-decoded and aggregated per (partition, event_type).
    // sum(offset) is the exactly-once witness: it only matches the
    // oracle's row_number replay if every offset arrives exactly once in
    // event_id order. This is the broker integration surface minus the
    // wire protocol (no broker exists in this sandbox).
    "q_source_bus_stream" -> { (s, d) =>
      import s.implicits._
      val root = busRoot(s, d)
      val bus = s.readStream.format("graft-bus").option("path", root).load()
      val parsed = bus.select(
        $"partition".cast("long").as("bus_partition"),
        $"offset",
        get_json_object($"value".cast("string"), "$.event_type").as("event_type"))
      val agg = parsed.groupBy($"bus_partition", $"event_type")
        .agg(asLong(count(lit(1))).as("n"), asLong(sum($"offset")).as("sum_off"))
      runToMemory(agg, "complete").orderBy($"bus_partition", $"event_type")
    },

    // Bus + EVENT-TIME machinery: the bus's timestamp column (epoch
    // micros from the record header, like a broker's log-append/create
    // time) drives a watermarked tumbling-window aggregation — proving a
    // custom DSv2 streaming source composes with watermarks and windows
    // exactly like the built-in sources.
    "q_source_bus_windowed" -> { (s, d) =>
      import s.implicits._
      val root = busRoot(s, d)
      val bus = s.readStream.format("graft-bus").option("path", root).load()
      val ev = bus.select(timestamp_micros($"timestamp").as("ts"),
        get_json_object($"value".cast("string"), "$.event_type").as("event_type"))
      val agg = ev.withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(asLong(count(lit(1))).as("n"))
      runToMemory(agg, "complete")
        .select($"window.start".as("day"), $"event_type", $"n")
        .orderBy($"day", $"event_type")
    },

    // Timestamp-addressed replay (Kafka offsetsForTimes): startingTimestamp
    // resolves, per partition, to the first offset whose record ts >= T via
    // the name-carried segment time index — "replay since Jan 16" without
    // knowing offsets. BATCH read here so the gate pins the resolution
    // itself: n/sum_off/min_off only match the oracle's replay if every
    // partition started at exactly min(offset | ts >= T) — records BELOW
    // that offset (even late ones with ts >= T... none here; ts is near-
    // monotone) are excluded, records at/after it included regardless of ts.
    "q_source_bus_from_ts" -> { (s, d) =>
      import s.implicits._
      val root = busRoot(s, d)
      val t = java.time.Instant.parse("2024-01-16T00:00:00Z")
      val tMicros = t.getEpochSecond * 1000000L
      s.read.format("graft-bus").option("path", root)
        .option("startingTimestamp", tMicros.toString).load()
        .groupBy($"partition".cast("long").as("bus_partition"))
        .agg(asLong(count(lit(1))).as("n"), asLong(sum($"offset")).as("sum_off"),
          asLong(min($"offset")).as("min_off"))
        .orderBy($"bus_partition")
    },

    // KEYED LOG COMPACTION (compacted-topic semantics): two sealed
    // segments per partition rewritten latest-per-key (original offsets
    // preserved, gaps where records cleaned), the third segment active
    // and untouched. The read returns the compacted winners + the active
    // slice; event_ids only match the oracle's replay if compaction kept
    // EXACTLY the highest-offset record per user among sealed segments
    // and never touched the active one. BusCompactionSpec pins offsets,
    // tombstones and crash-swap recovery.
    "q_source_bus_compacted" -> { (s, d) =>
      import s.implicits._
      val root = busCompactRoot(s, d)
      s.read.format("graft-bus").option("path", root).load()
        .select(
          get_json_object($"value".cast("string"), "$.event_id")
            .cast("long").as("event_id"),
          $"key".cast("string").cast("long").as("user_id"),
          get_json_object($"value".cast("string"), "$.event_type").as("event_type"))
        .orderBy($"event_id")
    },

    // Producer path (BusSink): the events table written INTO a bus via
    // df.write.format("graft-bus") — executor-staged line files, driver
    // publish-by-rename — then read back and aggregated. n/sum_off match
    // the replay oracle only if the write assigned every offset exactly
    // once in event_id order and lost/duplicated nothing.
    "q_source_bus_sink_roundtrip" -> { (s, d) =>
      import s.implicits._
      val root = busSinkRoot(s, d)
      s.read.format("graft-bus").option("path", root).load()
        .select($"partition".cast("long").as("bus_partition"), $"offset",
          get_json_object($"value".cast("string"), "$.event_type").as("event_type"))
        .groupBy($"bus_partition", $"event_type")
        .agg(asLong(count(lit(1))).as("n"), asLong(sum($"offset")).as("sum_off"))
        .orderBy($"bus_partition", $"event_type")
    },

    // Durable streaming FILE sink (exactly-once): stream events into a
    // parquet sink with a checkpoint, then read the committed output
    // back and aggregate — the oracle over the original table proves the
    // sink wrote every row exactly once. Streaming file sinks APPEND
    // under a commit log (idempotent re-runs come from the log, not
    // overwrite), so each invocation gets a fresh run dir; the per-JVM
    // fixture dir cleans them all up at exit.
    "q_stream_file_sink" -> { (s, d) =>
      import s.implicits._
      import graft.tracks.TrackStateOp
      val run = s"$fileSinkDir/${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = TrackStateOp.eventsStream(s, d)
        .select($"event_id", $"user_id", $"eventType".as("event_type"), $"value")
        .writeStream.format("parquet")
        .option("path", s"$run/out")
        .option("checkpointLocation", s"$run/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$run/out")
        .groupBy($"event_type")
        .agg(asLong(count(lit(1))).as("n"),
             asDouble(sum(dec($"value"))).as("sum_value"))
        .orderBy($"event_type")
    },

    // State-store BATCH reader (Spark 4 `statestore` format): run a
    // streaming aggregation to a checkpoint, then open the committed
    // state itself as a DataFrame — the operational introspection path
    // for long-lived streaming jobs (state audits, backfills, migration
    // validation) without stopping the query or replaying the stream.
    // The oracle recomputes the same aggregation from the raw table: the
    // store's (key -> aggregation buffer) rows must equal the batch
    // answer exactly. partition_id is deliberately NOT selected — state
    // fan-out is a deployment knob (statePartitions), not part of the
    // answer. At 100 TB the reader scans state files partition-parallel,
    // so auditing a multi-TB store is an ordinary distributed scan.
    "q_source_state_reader" -> { (s, d) =>
      import s.implicits._
      import graft.tracks.TrackStateOp
      val run = s"$fileSinkDir/${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val agg = TrackStateOp.eventsStream(s, d)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum(dec($"value")).as("sum_value"))
      // state-store count sized to state, not cores — scoped to a session
      // clone so the shared conf is never mutated
      val (_, sagg) = graft.ScopedStream(agg, 8)
      val q = sagg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", s"$run/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val state = s.read.format("statestore").load(s"$run/ckpt")
      // `value.{count,sum,isEmpty}` are Spark's INTERNAL aggregation-
      // buffer field names — resolve them against the loaded schema so a
      // buffer-layout change in a future Spark minor fails with a
      // diagnostic naming the drift, not a bare column-not-found
      val bufFields = state.schema("value").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
      def buf(n: String) = {
        require(bufFields.contains(n),
          s"statestore aggregation-buffer layout changed: expected field " +
            s"'$n' in value struct, got {${bufFields.mkString(", ")}} — " +
            "Spark state-schema drift; update the q_source_state_reader mapping")
        col(s"value.$n")
      }
      state
        .filter(!buf("isEmpty"))
        .select($"key.user_id".as("user_id"),
          asLong(buf("count")).as("n_events"),
          asDouble(buf("sum")).as("sum_value"))
        .orderBy($"user_id")
    },

    // CDC-style upsert sink (foreachBatch merge): maintain a "latest
    // event per user" materialized view across micro-batches — per
    // batch, union the existing view with the new rows and keep the
    // winner per key (ts desc, event_id tiebreak). Each version writes
    // to a fresh dir (never overwrite the files a lazy reader may still
    // scan); the checkpoint gives exactly-once batch replay. At cluster
    // scale the same loop is the Delta/Iceberg MERGE pattern, with the
    // view bucketed by user_id so the merge join never reshuffles the
    // big side; sized here for the view fitting a partition set, not
    // the driver (no collect anywhere).
    "q_stream_upsert" -> { (s, d) =>
      import s.implicits._
      import graft.tracks.TrackStateOp
      val run = s"$fileSinkDir/${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val events = TrackStateOp.eventsStream(s, d)
        .select($"event_id", $"user_id", timestamp_micros($"tsMicros").as("ts"),
          $"eventType".as("event_type"), $"value")
      val (q, latestView) = upsertSink(events, run,
        Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      latestView().orderBy($"user_id")
    },

    // Full DataSource V2 connector (graft.sources.GenSource): the scan
    // below plans with 17 of 32 generator slices (the id range prunes the
    // rest BEFORE tasks launch), the id predicates pushed into the source
    // (no post-scan Filter — DsV2Spec pins all three properties), and a
    // 2-of-4-column read schema. The aggregation then proves the pruned,
    // pushed scan still produces exactly the right rows: DuckDB replays
    // the generator's integer row recipe over the same id range. All
    // per-bucket sums stay exact in binary (val has <=3 fractional and
    // <=7 integer bits), so the double sum is merge-order-insensitive.
    "q_source_dsv2" -> { (s, _) =>
      import s.implicits._
      s.read.format("graft.sources.GenSource")
        .option("rows", 100000L).option("slices", 32)
        .load()
        .filter($"id" >= 20000 && $"id" < 70000)
        .groupBy($"bucket")
        .agg(asLong(count(lit(1))).as("n"), sum($"val").as("sum_val"))
        .orderBy($"bucket")
    },

    // The reference's CSV parse stack (SURVEY.md P1-P9), hash-verified:
    // synthesize FlightSim-shaped lines from `events` (quoted track id,
    // 12-hour "M/d/yyyy hh:mm:ss a" timestamp, integer-valued lon/lat so
    // string->double parsing is exact, whitespace padding to exercise
    // trim, deterministic corruption to exercise the tolerate-garbage
    // contract), push them through Flights.parseCsv, and let the oracle
    // compute the EXPECTED parse output directly from the original
    // columns. A lenient/incorrect 12-hour parse (the reference Simple
    // stack's quirk, SURVEY.md §1.1) cannot round-trip PM timestamps, so
    // this pins P4's correct-parse semantics; rows with event_id%97==0
    // get an unparseable time (-> epoch 0, P3) and event_id%101==0 a
    // non-numeric altitude (-> null, P1 try_cast).
    "q_flights_parse" -> { (s, d) =>
      import s.implicits._
      import graft.flights.Flights
      val ev = Tables.events(s, d)
      val tsStr = when(pmod($"event_id", lit(97)) === 0, lit("not a time"))
        .otherwise(date_format($"ts", Flights.TsFormat))
      val altStr = when(pmod($"event_id", lit(101)) === 0, lit("328k5"))
        .otherwise(concat(lit(" "), pmod($"event_id", lit(40000)).cast("string")))
      val line = concat_ws(",",
        concat(lit("\"F"), $"event_id".cast("string"), lit("\"")),
        tsStr,
        (-pmod($"user_id", lit(180))).cast("string"),
        pmod($"event_id", lit(89)).cast("string"),
        lit(" IAD"), lit("TPA "), lit("B733"), altStr)
      Flights.parseCsv(ev.select(line.as("value")))
        .select($"trackId", $"time".as("event_time"), $"longitude", $"latitude",
          $"origin", $"destination", $"aircraft", $"altitude",
          Flights.geometryString($"geometry").as("geom_str"))
        .orderBy($"trackId")
    }
  )

  /** Versions kept by the upsert sink's GC: current + a lag window for
    * readers that resolved `latest` just before a commit. */
  private[graft] val UpsertRetainVersions = 2

  /** The Kafka value-payload schema for the events wire format. */
  private[graft] val KafkaPayloadSchema =
    "event_id BIGINT, ts_us BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"

  /** Decode Kafka-shaped records (binary `value` carrying the JSON
    * payload) back into typed event rows — the consumer half of the wire
    * contract. Works identically on a batch frame (q_source_kafka_shaped)
    * and a streaming one (KafkaShapedBridgeSpec drives it from the
    * reference's TCP socket source), so the same code path serves both
    * the gate replay and a live ingest. */
  private[graft] def kafkaWireDecode(wire: DataFrame): DataFrame = {
    val s = wire.sparkSession
    import s.implicits._
    wire
      .select(from_json($"value".cast("string"), KafkaPayloadSchema,
        Map.empty[String, String]).as("r"))
      .select($"r.event_id".as("event_id"), timestamp_micros($"r.ts_us").as("ts"),
              $"r.user_id".as("user_id"), $"r.event_type".as("event_type"),
              $"r.value".as("value"))
  }

  /** CDC upsert sink: foreachBatch merge of each micro-batch into a
    * versioned "latest event per user_id" materialized view (winner =
    * max (ts, event_id) per key). Fresh dir per version — a lazy reader
    * of version v never races the v+1 writer; the checkpoint replays
    * batches exactly once on restart. After each commit, versions older
    * than the [[UpsertRetainVersions]] window are deleted (the
    * Delta/Iceberg VACUUM analogue) so the versioned-view pattern holds
    * bounded storage over an unbounded stream instead of accumulating
    * one full snapshot per micro-batch. Returns the started query and a
    * thunk reading the current view (empty-schema frame before batch 0).
    * Requires columns: event_id, user_id, ts, event_type, value. */
  private[graft] def upsertSink(events: DataFrame, runDir: String,
                                trigger: Option[org.apache.spark.sql.streaming.Trigger])
      : (org.apache.spark.sql.streaming.StreamingQuery, () => DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val s = events.sparkSession
    import s.implicits._
    @volatile var latest: Option[String] = None
    val writer0 = events.writeStream
      .option("checkpointLocation", s"$runDir/ckpt")
    val writer = trigger.fold(writer0)(writer0.trigger)
    val q = writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val existing = latest.map(p => s.read.parquet(p))
          .getOrElse(batch.limit(0))
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".desc, $"event_id".desc)
        val path = s"$runDir/state_v$batchId"
        existing.unionByName(batch)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1).drop("rn")
          .write.mode("overwrite").parquet(path)
        latest = Some(path)
        // GC superseded versions beyond the retention window; runs AFTER
        // the new version is committed, so the view is never unreadable
        val fs = new org.apache.hadoop.fs.Path(runDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val base = new org.apache.hadoop.fs.Path(runDir)
        fs.listStatus(base).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("state_v"))
          .flatMap(st => scala.util.Try(
            st.getPath.getName.stripPrefix("state_v").toLong).toOption
            .map(_ -> st.getPath))
          .sortBy(_._1)
          .dropRight(UpsertRetainVersions)
          .foreach { case (_, p) => fs.delete(p, true) }
      }
      .start()
    (q, () => latest.map(p => s.read.parquet(p)).getOrElse(
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        events.schema)))
  }

  override def oracles: Map[String, String] = Map(
    // the pipeline moves every bus record into the table exactly once;
    // doubles round-trip bit-exact through JSON (shortest-repr print)
    "q_pipeline_bus_to_table" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_source_csv_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",

    // older batch surfaces NULL for the evolved column; the batch id is
    // the partition directory
    "q_source_schema_evolution" ->
      """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS batch
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // compaction must be content-lossless: identical to the source
    "q_source_compaction" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_stream_file_sink" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // the committed streaming-agg state must equal the batch aggregation
    "q_source_state_reader" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q_source_json_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "q_source_orc_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    "q_source_xml_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "q_source_kafka_shaped" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_source_bus_windowed" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |       event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,

    // replay the load's offset assignment, then each partition's start =
    // its first offset with ts >= T (Kafka offsetsForTimes semantics);
    // everything at/after that offset is read regardless of its own ts
    "q_source_bus_from_ts" ->
      """WITH p AS (
        |  SELECT user_id % 4 AS bus_partition, ts,
        |         row_number() OVER (PARTITION BY user_id % 4
        |                            ORDER BY event_id) - 1 AS off
        |  FROM events),
        |starts AS (
        |  SELECT bus_partition,
        |         min(off) FILTER (WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
        |           AS start_off
        |  FROM p GROUP BY 1)
        |SELECT p.bus_partition, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(p.off) AS BIGINT) AS sum_off,
        |       CAST(min(p.off) AS BIGINT) AS min_off
        |FROM p JOIN starts USING (bus_partition)
        |WHERE p.off >= starts.start_off
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the DSv2-writer-loaded bus replays identically: offsets = event_id
    // rank within user_id % 4 (single sorted writer task per partition)
    "q_source_bus_sink_roundtrip" ->
      """WITH p AS (
        |  SELECT user_id % 4 AS bus_partition, event_type,
        |         row_number() OVER (PARTITION BY user_id % 4
        |                            ORDER BY event_id) - 1 AS off
        |  FROM events)
        |SELECT bus_partition, event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(off) AS BIGINT) AS sum_off
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // replay the bus load: offsets = event_id rank within user_id % 4;
    // sum(off) only matches if the stream delivered each offset once
    "q_source_bus_stream" ->
      """WITH p AS (
        |  SELECT user_id % 4 AS bus_partition, event_type,
        |         row_number() OVER (PARTITION BY user_id % 4
        |                            ORDER BY event_id) - 1 AS off
        |  FROM events)
        |SELECT bus_partition, event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(off) AS BIGINT) AS sum_off
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_upsert" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM (SELECT event_id, user_id, ts, event_type, value,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // the DSv2 generator's row recipe replayed over the pushed id range
    "q_source_dsv2" ->
      """SELECT bucket, count(*) AS n, sum(val) AS sum_val
        |FROM (SELECT (id * 2654435761) % 1024 AS bucket,
        |             ((id * id) % 997) / 8.0 AS val
        |      FROM (SELECT range AS id FROM range(20000, 70000)))
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    // expected parse output computed from the ORIGINAL columns — only a
    // correct 12-hour format+parse round-trip reproduces date_trunc-to-
    // second ts for PM rows; corrupted rows fall back per contract
    "q_flights_parse" ->
      """SELECT 'F' || CAST(event_id AS VARCHAR) AS trackId,
        |  CASE WHEN event_id % 97 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
        |       ELSE date_trunc('second', CAST(ts AS TIMESTAMP)) END AS event_time,
        |  CAST(-(user_id % 180) AS DOUBLE) AS longitude,
        |  CAST(event_id % 89 AS DOUBLE) AS latitude,
        |  'IAD' AS origin, 'TPA' AS destination, 'B733' AS aircraft,
        |  CASE WHEN event_id % 101 = 0 THEN NULL ELSE event_id % 40000 END AS altitude,
        |  '(' || CAST(CAST(-(user_id % 180) AS DOUBLE) AS VARCHAR) || ', '
        |      || CAST(CAST(event_id % 89 AS DOUBLE) AS VARCHAR) || ')' AS geom_str
        |FROM events
        |ORDER BY trackId""".stripMargin,

    // compacted sealed region (event_id % 3 <= 1): latest record per user
    // = greatest (slice, event_id) since slice-1 offsets all exceed
    // slice-0's; the active slice (% 3 = 2) survives untouched
    "q_source_bus_compacted" ->
      """WITH sealed AS (SELECT event_id, user_id, event_type FROM events
        |                WHERE event_id % 3 <= 1),
        |win AS (SELECT event_id, user_id, event_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY (event_id % 3) DESC, event_id DESC) AS rn FROM sealed)
        |  WHERE rn = 1),
        |active AS (SELECT event_id, user_id, event_type FROM events
        |           WHERE event_id % 3 = 2)
        |SELECT * FROM (SELECT * FROM win UNION ALL SELECT * FROM active)
        |ORDER BY event_id""".stripMargin
  )
}
