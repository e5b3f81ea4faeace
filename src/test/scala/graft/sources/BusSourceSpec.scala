package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The message-bus DSv2 streaming source: offset resolution from segment
  * names, batch + micro-batch reads, exactly-once checkpoint resume, and
  * mid-stream partition discovery. */
class BusSourceSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def produce(root: String, pid: Int, n: Int, off: Int = 0): Unit =
    BusLog.append(conf, root, pid,
      (0 until n).map { i =>
        val id = off + i
        (s"k$id".getBytes("UTF-8"), s"""{"id":$id,"pid":$pid}""".getBytes("UTF-8"),
         1000000L + id)
      })

  test("batch read returns every record with contiguous per-partition offsets") {
    val root = graft.TempDirs.create("graft_bus_batch")
    produce(root, 0, 5)
    produce(root, 1, 3)
    produce(root, 0, 4, off = 100)   // second segment, base offset 5
    val df = spark.read.format("graft-bus").option("path", root).load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("key", "value", "partition", "offset", "timestamp"))
    val rows = df.select($"partition", $"offset",
        $"key".cast("string"), $"value".cast("string"))
      .as[(Int, Long, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(rows.length == 12)
    // offsets are 0..n-1 per partition regardless of segment boundaries
    assert(rows.filter(_._1 == 0).map(_._2).toSeq == (0L to 8L))
    assert(rows.filter(_._1 == 1).map(_._2).toSeq == (0L to 2L))
    // second segment's records carry on from the first's end offset
    assert(rows.find(r => r._1 == 0 && r._2 == 5L).get._3 == "k100")
  }

  test("null keys round-trip") {
    val root = graft.TempDirs.create("graft_bus_nullkey")
    BusLog.append(conf, root, 0, Seq((null, "v".getBytes("UTF-8"), 7L)))
    val r = spark.read.format("graft-bus").option("path", root).load()
      .select($"key", $"value".cast("string"), $"timestamp")
      .as[(Array[Byte], String, Long)].collect()
    assert(r.length == 1 && r.head._1 == null && r.head._2 == "v" && r.head._3 == 7L)
  }

  /** Run the bus stream AvailableNow against `ckpt` (the memory sink
    * refuses checkpoint recovery, so deliveries accumulate through
    * foreachBatch — the production restart-capable sink shape) and
    * return the (partition, offset) pairs THIS run delivered. */
  private def runOnce(root: String, ckpt: String): Set[(Int, Long)] = {
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Long)]()
    val q = spark.readStream.format("graft-bus").option("path", root).load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select($"partition", $"offset").as[(Int, Long)]
          .collect().foreach(seen.add)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    seen.asScala.toSet
  }

  test("micro-batch stream is exactly-once across a checkpoint restart") {
    val root = graft.TempDirs.create("graft_bus_stream")
    val ckpt = graft.TempDirs.create("graft_bus_ckpt")
    produce(root, 0, 6)
    produce(root, 1, 4)
    val first = runOnce(root, ckpt)
    assert(first.size == 10, "first run must deliver all 10 records once")
    // new data lands between runs; the resumed stream must deliver ONLY it
    produce(root, 0, 3, off = 50)
    val second = runOnce(root, ckpt)
    assert(second == Set((0, 6L), (0, 7L), (0, 8L)),
      s"resume must start after the committed offsets, got $second")
  }

  test("a partition appearing mid-stream is picked up from its earliest offset") {
    val root = graft.TempDirs.create("graft_bus_newpart")
    val ckpt = graft.TempDirs.create("graft_bus_ckpt2")
    produce(root, 0, 2)
    assert(runOnce(root, ckpt) == Set((0, 0L), (0, 1L)))
    produce(root, 3, 2)   // partition p3 did not exist during run 1
    assert(runOnce(root, ckpt) == Set((3, 0L), (3, 1L)))
  }

  test("maxRecordsPerBatch rate-limits the catch-up into bounded batches") {
    val root = graft.TempDirs.create("graft_bus_limit")
    val ckpt = graft.TempDirs.create("graft_bus_limit_ckpt")
    produce(root, 0, 9)
    produce(root, 1, 5)
    val batchSizes = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val q = spark.readStream.format("graft-bus")
      .option("path", root).option("maxRecordsPerBatch", "4").load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(batch.count()); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
    assert(sizes.sum == 14, s"all records exactly once, got $sizes")
    assert(sizes.forall(_ <= 4), s"every batch within the cap, got $sizes")
    assert(sizes.length >= 4, s"catch-up must split into bounded batches, got $sizes")
  }

  test("batch-path column pruning reaches the scan") {
    val root = graft.TempDirs.create("graft_bus_prune")
    produce(root, 0, 3)
    val pruned = spark.read.format("graft-bus").option("path", root).load()
      .select($"partition", $"offset")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("partition", "offset"),
      s"required-schema handshake must prune key/value, got ${scan.scan.readSchema()}")
    assert(pruned.count() == 3)
  }

  test("truncate drops whole old segments and consumers start at the new earliest") {
    val root = graft.TempDirs.create("graft_bus_trunc")
    produce(root, 0, 4)              // seg [0,4)
    produce(root, 0, 3, off = 100)   // seg [4,7)
    produce(root, 0, 2, off = 200)   // seg [7,9)
    // retain offsets >= 5: the [4,7) segment is partially needed → kept
    val gone = BusLog.truncate(conf, root, 0, beforeOffset = 5L)
    assert(gone.map(_.getName) ==
      Seq("seg-00000000000000000000-4-ts1000000-1000003.log"))
    val df = spark.read.format("graft-bus").option("path", root).load()
    val offs = df.select($"offset").as[Long].collect().sorted.toSeq
    assert(offs == (4L to 8L), s"retained offsets intact, got $offs")
    // a fresh stream starts at the post-truncation earliest (4), not 0
    val ckpt = graft.TempDirs.create("graft_bus_trunc_ckpt")
    assert(runOnce(root, ckpt).map(_._2).min == 4L)
  }

  test("startingOffsets/endingOffsets bound batch reads and stream starts (Kafka parity)") {
    val root = graft.TempDirs.create("graft_bus_bounds")
    produce(root, 0, 6)
    produce(root, 1, 4)
    // batch: explicit window [2,5) on p0, full range on p1 via fallback
    val windowed = spark.read.format("graft-bus").option("path", root)
      .option("startingOffsets", """{"0":2}""")
      .option("endingOffsets", """{"0":5}""")
      .load().select($"partition", $"offset").as[(Int, Long)].collect().toSet
    assert(windowed == Set((0, 2L), (0, 3L), (0, 4L),
      (1, 0L), (1, 1L), (1, 2L), (1, 3L)), s"got $windowed")
    // stream: startingOffsets=latest on a fresh checkpoint skips the backlog
    val ckpt = graft.TempDirs.create("graft_bus_bounds_ckpt")
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val q = spark.readStream.format("graft-bus").option("path", root)
      .option("startingOffsets", "latest").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(b.count()); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(seen.get() == 0L, "latest start on a drained log delivers nothing")
  }

  test("safeTruncate retires only segments every registered consumer has passed") {
    // progress is recorded from each batch plan's durable START offsets,
    // so a consumer's registry entry reflects its last completed run
    val root = graft.TempDirs.create("graft_bus_safetrunc")
    val ckptA = graft.TempDirs.create("graft_bus_ckA")
    val ckptB = graft.TempDirs.create("graft_bus_ckB")
    produce(root, 0, 4)                        // seg [0,4)
    assert(runOnce(root, ckptA).size == 4)     // A drains [0,4)
    produce(root, 0, 3, off = 50)              // seg [4,7)
    assert(runOnce(root, ckptA).size == 3)     // A's restart records A@4
    assert(runOnce(root, ckptB).size == 7)     // B drains from scratch (@0)
    produce(root, 0, 1, off = 90)              // seg [7,8)
    assert(runOnce(root, ckptB).size == 1)     // B's restart records B@7
    val consumers = BusLog.consumerOffsets(conf, root)
    assert(consumers.size == 2, s"got $consumers")
    assert(consumers.values.map(_(0)).toSet == Set(4L, 7L), s"got $consumers")
    // cutoff = slowest registered consumer (A @4): only seg [0,4) retires
    val gone = BusLog.safeTruncate(conf, root)
    assert(gone(0).map(_.getName) ==
      Seq("seg-00000000000000000000-4-ts1000000-1000003.log"))
    // A resumes from its own checkpoint (@7) and reads the retained tail
    assert(runOnce(root, ckptA).map(_._2).toSeq.sorted == Seq(7L))
  }

  test("offsets stay monotone after FULL truncation (high-water-mark survives)") {
    // the data-loss scenario: every consumer caught up → safeTruncate
    // retires ALL segments → without a persisted log-end, the next append
    // would re-base at 0 and a checkpointed consumer holding start=5 would
    // silently never see the re-based records
    val root = graft.TempDirs.create("graft_bus_hwm")
    val ckpt = graft.TempDirs.create("graft_bus_hwm_ckpt")
    produce(root, 0, 5)                          // seg [0,5)
    assert(runOnce(root, ckpt).size == 5)        // consumer checkpoint → 5
    // the consumer's CHECKPOINT is at 5 but its advisory registry entry
    // lags at its last batch START (0); catch the registry up to match the
    // all-consumers-caught-up steady state the scenario needs
    BusLog.consumerOffsets(conf, root).keys.foreach(id =>
      BusLog.recordConsumer(conf, root, id, Map(0 -> 5L)))
    BusLog.recordConsumer(conf, root, "drained", Map(0 -> 5L))
    val gone = BusLog.safeTruncate(conf, root)   // cutoff = log end → all retire
    assert(gone(0).size == 1)
    val pdir = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), "p0")
    val fs = pdir.getFileSystem(conf)
    assert(BusLog.segments(fs, pdir).isEmpty, "partition fully truncated")
    assert(BusLog.range(fs, new org.apache.hadoop.fs.Path(root))(0) == (5L, 5L),
      "a drained partition reports (end, end), never a regressed (0, 0)")
    produce(root, 0, 3, off = 50)                // append AFTER full truncation
    assert(BusLog.segments(fs, pdir).head.base == 5L,
      "new segment must continue at the high-water-mark, not re-base at 0")
    // the checkpointed consumer (start=5) receives exactly the new records
    assert(runOnce(root, ckpt) == Set((0, 5L), (0, 6L), (0, 7L)))
  }

  test("startingTimestamp/endingTimestamp resolve time→offset via the segment index") {
    val root = graft.TempDirs.create("graft_bus_ts")
    produce(root, 0, 3)              // ts 1000000..1000002, offsets [0,3)
    produce(root, 0, 3, off = 3)     // ts 1000003..1000005, offsets [3,6)
    def offs(opts: (String, String)*): Seq[Long] = {
      val r = opts.foldLeft(spark.read.format("graft-bus").option("path", root)) {
        case (b, (k, v)) => b.option(k, v)
      }
      r.load().select($"offset").as[Long].collect().sorted.toSeq
    }
    // start mid-segment-2: only the second segment is opened (first's
    // name-carried tsMax=1000002 < 1000004 → skipped without a read)
    assert(offs("startingTimestamp" -> "1000004") == Seq(4L, 5L))
    // exclusive end at the first offset with ts >= endingTimestamp
    assert(offs("startingTimestamp" -> "1000001",
                "endingTimestamp" -> "1000004") == Seq(1L, 2L, 3L))
    // a timestamp beyond every record resolves to the log end → empty
    assert(offs("startingTimestamp" -> "9999999").isEmpty)
    // records below the resolved offset are excluded even though a ts
    // index miss would have included them
    assert(offs("startingTimestamp" -> "1000000") == (0L to 5L))
    // mutual exclusion, Kafka-style
    val err = intercept[Throwable] {
      spark.read.format("graft-bus").option("path", root)
        .option("startingOffsets", "earliest")
        .option("startingTimestamp", "1000000").load().collect()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("mutually exclusive"), s"got: $msgs")
  }

  test("startingTimestamp falls back to a scan for index-less legacy segments") {
    val root = graft.TempDirs.create("graft_bus_ts_legacy")
    // publish WITHOUT tsBounds → old-format name, no time index
    val load = new org.apache.hadoop.fs.Path(root, "_load")
    val fs = load.getFileSystem(conf)
    fs.mkdirs(load)
    val f = new org.apache.hadoop.fs.Path(load, "lines")
    val out = fs.create(f, true)
    val b64 = java.util.Base64.getEncoder
    out.write((0 until 4).map { i =>
      s"${b64.encodeToString(s"k$i".getBytes)}\t${b64.encodeToString(s"v$i".getBytes)}\t${2000000L + i}"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
    BusLog.publish(conf, root, 0, f, 4)
    val pdir = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), "p0")
    assert(BusLog.segments(fs, pdir).head.tsMax.isEmpty, "legacy name has no index")
    val offs = spark.read.format("graft-bus").option("path", root)
      .option("startingTimestamp", "2000002").load()
      .select($"offset").as[Long].collect().sorted.toSeq
    assert(offs == Seq(2L, 3L))
  }

  test("a fresh stream with startingTimestamp begins at the resolved offset") {
    val root = graft.TempDirs.create("graft_bus_ts_stream")
    val ckpt = graft.TempDirs.create("graft_bus_ts_stream_ckpt")
    produce(root, 0, 5)    // ts 1000000..1000004
    produce(root, 1, 5)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Long)]()
    val q = spark.readStream.format("graft-bus").option("path", root)
      .option("startingTimestamp", "1000003").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select($"partition", $"offset").as[(Int, Long)].collect().foreach(seen.add)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet ==
      Set((0, 3L), (0, 4L), (1, 3L), (1, 4L)),
      s"stream must start at first offset with ts >= T per partition, got $seen")
  }

  test("offset json round-trips") {
    val o = BusOffset(Map(0 -> 12L, 7 -> 0L, 21 -> 9999999999L))
    assert(BusOffset.fromJson(o.json()) == o)
    assert(o.json() == """{"0":12,"7":0,"21":9999999999}""")
  }
}
