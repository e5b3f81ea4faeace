package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `writeStream.format("graft-table")` — the ACID table as a streaming
  * SINK: per-batch txn-stamped commits, replay idempotence, Complete-mode
  * overwrite, and config recovery on a fresh root. */
class GraftTableSinkSpec extends SparkSpec {
  import spark.implicits._

  test("append mode commits one txn-stamped version per batch; replayed batches are no-ops") {
    val input = MemoryStream[(Long, Long)](spark)
    val root = graft.TempDirs.create("graft_tsink")
    val ckpt = graft.TempDirs.create("graft_tsink_ckpt")
    val q = input.toDS().toDF("id", "day")
      .writeStream.format("graft-table")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .option("partitionCol", "day")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      input.addData((1L, 0L), (2L, 1L))
      q.processAllAvailable()
      input.addData((3L, 0L))
      q.processAllAvailable()
    } finally q.stop()
    val t = GraftTable.load(spark, root)
    assert(t.versions == Seq(1L, 2L), s"one commit per batch, got ${t.versions}")
    assert(t.history().map(_.op) == Seq("append", "append"))
    assert(t.snapshot().orderBy($"id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 0L)))
    // txn stamps recorded: the writer's last epoch is batch 1
    val writerId = java.util.UUID.nameUUIDFromBytes(
      ckpt.getBytes("UTF-8")).toString
    assert(t.lastTxn(writerId).contains(1L))
    // the sink-configured partitionCol persisted into the log
    assert(t.partitionColName.contains("day"))
    // direct replay of a landed batch (the engine's restart path for the
    // last un-logged batch) commits nothing
    val sink = new GraftTableSink(spark, root, Map.empty,
      overwriteEachBatch = false, writerId)
    sink.addBatch(1L, Seq((99L, 9L)).toDF("id", "day"))
    assert(GraftTable.load(spark, root).versions == Seq(1L, 2L),
      "replayed batch must not commit")
    assert(GraftTable.load(spark, root).snapshot().count() == 3L)
    // a NEW batch from the same writer does commit
    sink.addBatch(2L, Seq((4L, 1L)).toDF("id", "day"))
    assert(GraftTable.load(spark, root).snapshot().count() == 4L)
  }

  test("lastTxn answers O(1) from the latest header's carried txns map") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_txns"))
    t.append(Seq((1L, "a")).toDF("id", "v"), txn = Some(("writer-A", 7L)))
    t.append(Seq((2L, "b")).toDF("id", "v"), txn = Some(("writer-B", 1L)))
    (1 to 10).foreach(i => t.append(Seq((10L + i, "x")).toDF("id", "v")))
    t.append(Seq((99L, "z")).toDF("id", "v"), txn = Some(("writer-B", 2L)))
    // both writers' newest epochs resolve; A's stamp is 12 versions back
    assert(t.lastTxn("writer-A").contains(7L))
    assert(t.lastTxn("writer-B").contains(2L))
    // PROOF the answer comes from the LATEST header alone: vacuum away
    // every older manifest — a header walk would now find nothing for
    // writer-A, the carried map still answers
    t.vacuum(1)
    val fresh = GraftTable.load(spark, t.root)
    assert(fresh.versions.size == 1)
    assert(fresh.lastTxn("writer-A").contains(7L),
      "lastTxn must read the carried txns map, not walk vacuumed headers")
    assert(fresh.lastTxn("writer-B").contains(2L))
    assert(fresh.lastTxn("writer-C").isEmpty)
  }

  test("dedupKey lands overlapping batches exactly once (ingest-time exact dedup)") {
    val input = MemoryStream[(Long, String)](spark)
    val root = graft.TempDirs.create("graft_tsink_dedup")
    val ckpt = graft.TempDirs.create("graft_tsink_dedup_ckpt")
    val q = input.toDS().toDF("id", "s")
      .writeStream.format("graft-table")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .option("dedupKey", "id")
      .option("statsCol", "id")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      // batch 0: within-batch dup of id=2
      input.addData((1L, "a"), (2L, "b"), (2L, "b2"))
      q.processAllAvailable()
      // batch 1: re-delivers 1 and 2 (crawler re-fetch), adds 3
      input.addData((1L, "a-again"), (2L, "b-again"), (3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val t = GraftTable.load(spark, root)
    val ids = t.snapshot().select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"every key exactly once across overlapping batches: $ids")
    // the first delivery won (dedup keeps the incumbent, not the re-fetch)
    assert(t.snapshot().filter($"id" === 1L).select("s").as[String]
      .head() == "a")
    // Complete mode + dedupKey refuses loudly
    val bad = intercept[Exception] {
      val in2 = MemoryStream[(Long, Long)](spark)
      in2.addData((1L, 1L))
      val qq = in2.toDS().toDF("id", "n").groupBy($"id")
        .agg(count(lit(1)).as("n"))
        .writeStream.format("graft-table")
        .option("path", graft.TempDirs.create("graft_tsink_dedup_bad"))
        .option("checkpointLocation",
          graft.TempDirs.create("graft_tsink_dedup_bad_ckpt"))
        .option("dedupKey", "id")
        .outputMode("complete")
        .trigger(Trigger.ProcessingTime(50))
        .start()
      try qq.processAllAvailable() finally qq.stop()
    }
    def chain(e: Throwable): String =
      if (e == null) "" else e.getMessage + "\n" + chain(e.getCause)
    assert(chain(bad).contains("dedupKey requires Append mode"))
  }

  test("complete mode overwrites the table with each batch's full state") {
    val input = MemoryStream[(String, Long)](spark)
    val root = graft.TempDirs.create("graft_tsink_complete")
    val ckpt = graft.TempDirs.create("graft_tsink_complete_ckpt")
    val agg = input.toDS().toDF("k", "n").groupBy($"k")
      .agg(sum($"n").as("total"))
    val q = agg.writeStream.format("graft-table")
      .outputMode("complete")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      input.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      input.addData(("a", 10L))
      q.processAllAvailable()
    } finally q.stop()
    val t = GraftTable.load(spark, root)
    assert(t.snapshot().orderBy($"k").as[(String, Long)].collect().toSeq ==
      Seq(("a", 11L), ("b", 2L)), "latest batch's full state")
    assert(t.history().map(_.op).forall(_ == "overwrite"))
    // time travel over the state timeline: batch 0's aggregation state
    assert(t.snapshot(Some(1L)).orderBy($"k").as[(String, Long)].collect().toSeq ==
      Seq(("a", 1L), ("b", 2L)))
  }

  test("source-to-sink pipeline is exactly-once across a restart") {
    // upstream table commits flow through readStream(graft-table) into a
    // downstream mirror table via the sink — no foreachBatch anywhere
    val upRoot = graft.TempDirs.create("graft_tsink_up")
    val downRoot = graft.TempDirs.create("graft_tsink_down")
    val ckpt = graft.TempDirs.create("graft_tsink_pipe_ckpt")
    val up = new GraftTable(spark, upRoot)
    up.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    def pump(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("path", upRoot).load()
        .filter($"_change" === "insert")
        .select($"id", $"name")
        .writeStream.format("graft-table")
        .option("path", downRoot)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    pump()
    val down = GraftTable.load(spark, downRoot)
    assert(down.snapshot().count() == 2L)
    // restart with new upstream data: only the delta flows
    up.append(Seq((3L, "c")).toDF("id", "name"))
    pump()
    assert(GraftTable.load(spark, downRoot).snapshot()
      .orderBy($"id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // idle restart moves nothing
    pump()
    assert(GraftTable.load(spark, downRoot).snapshot().count() == 3L)
  }

  test("update output mode is rejected") {
    val input = MemoryStream[(Long, Long)](spark)
    val err = intercept[Throwable] {
      input.toDS().toDF("id", "day").groupBy($"id").count()
        .writeStream.format("graft-table")
        .outputMode("update")
        .option("path", graft.TempDirs.create("graft_tsink_bad"))
        .option("checkpointLocation", graft.TempDirs.create("graft_tsink_bad_ckpt"))
        .start()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.toLowerCase.contains("append and complete"), s"got: $msgs")
  }

  test("autoCompactFiles bounds the active file count across many tiny batches") {
    val input = MemoryStream[Long](spark)
    val root = graft.TempDirs.create("graft_tsink_ac")
    val ckpt = graft.TempDirs.create("graft_tsink_ac_ckpt")
    val q = input.toDS().toDF("id").repartition(4)
      .writeStream.format("graft-table")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .option("autoCompactFiles", "10")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    try {
      (0 until 6).foreach { b =>
        input.addData((b * 10L) until (b * 10L + 10L): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val t = GraftTable.load(spark, root)
    // 6 batches x 4 files/batch = 24 files raw; compaction must have
    // kept the active set bounded near the threshold
    val files = t.activeFiles(t.latestVersion.get).size
    assert(files <= 14, s"auto-compaction must bound the file count, got $files")
    assert(t.history().exists(_.op == "compact"), "a compact commit landed")
    // content-lossless: every row exactly once
    assert(t.snapshot().select($"id").as[Long].collect().sorted.toSeq ==
      (0L until 60L))
  }

  test("autoZOrderBy keeps 2-D pruning bounded across 30 tiny appends, no manual OPTIMIZE") {
    val input = MemoryStream[(Long, Long, Long)](spark)
    val root = graft.TempDirs.create("graft_tsink_az")
    val ckpt = graft.TempDirs.create("graft_tsink_az_ckpt")
    val q = input.toDS().toDF("id", "x", "y").repartition(2)
      .writeStream.format("graft-table")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .option("indexCols", "x,y")
      .option("autoZOrderBy", "x,y")
      .option("autoZOrderFiles", "8")
      .option("autoZOrderTailShare", "0.3")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    try {
      (0 until 30).foreach { b =>
        // each batch scatters across the full (x, y) grid, so an unlaid
        // table would answer any 2-D range from EVERY file
        input.addData((0 until 32).map { i =>
          val id = b * 32L + i
          (id, (id * 131) % 1024, (id * 191) % 1024)
        }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val t = GraftTable.load(spark, root)
    assert(t.history().exists(_.op == "zorder"),
      "the sink must have re-clustered on its own")
    // the layout keeps a narrow 2-D range read bounded: without it every
    // file intersects (each batch spans the grid); with the incremental
    // cadence, only the laid files covering the window + the small
    // untagged tail survive pruning
    val all = t.activeFiles(t.latestVersion.get).size
    val pred = col("x") >= 0L && col("x") <= 255L &&
      col("y") >= 0L && col("y") <= 255L
    val hit = t.filesForPredicate(pred).size
    assert(hit < all, s"2-D range read must prune: $hit of $all files")
    // the untagged tail stays below ~the threshold share at all times
    assert(t.zorderTailShare(Seq("x", "y")).exists(_ < 0.5),
      s"tail share ${t.zorderTailShare(Seq("x", "y"))} unbounded")
    // content-lossless across every auto-layout pass
    assert(t.snapshot().select($"id").as[Long].collect().sorted.toSeq ==
      (0L until 960L))
    assert(t.snapshotWhere(pred).count() ==
      (0L until 960L).count(id => (id * 131) % 1024 <= 255 &&
        (id * 191) % 1024 <= 255))
  }

  test("autoZOrderCurve=hilbert re-clusters along the Hilbert curve") {
    val input = MemoryStream[(Long, Long, Long)](spark)
    val root = graft.TempDirs.create("graft_tsink_ah")
    val ckpt = graft.TempDirs.create("graft_tsink_ah_ckpt")
    val q = input.toDS().toDF("id", "x", "y").repartition(2)
      .writeStream.format("graft-table")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .option("indexCols", "x,y")
      .option("autoZOrderBy", "x,y")
      .option("autoZOrderCurve", "hilbert")
      .option("autoZOrderFiles", "8")
      .option("autoZOrderTailShare", "0.3")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    try {
      (0 until 12).foreach { b =>
        input.addData((0 until 32).map { i =>
          val id = b * 32L + i
          (id, (id * 131) % 1024, (id * 191) % 1024)
        }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val t = GraftTable.load(spark, root)
    assert(t.history().exists(_.op == "hilbert"),
      "the sink must have Hilbert-clustered on its own")
    assert(t.hilbertTailShare(Seq("x", "y")).exists(_ < 0.5))
    assert(t.snapshot().count() == 12L * 32L)
    val all = t.activeFiles(t.latestVersion.get).size
    val pred = col("x") >= 0L && col("x") <= 255L &&
      col("y") >= 0L && col("y") <= 255L
    assert(t.filesForPredicate(pred).size < all)
    assert(t.snapshotWhere(pred).count() ==
      (0L until 384L).count(id => (id * 131) % 1024 <= 255 &&
        (id * 191) % 1024 <= 255))
  }
}
