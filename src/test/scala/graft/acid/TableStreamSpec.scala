package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The ACID table as a streaming source (`format("graft-table")`):
  * change-feed batches, restart resume from the committed version, and
  * the net-per-batch apply contract. */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Seq[Long], tag: String) =
    ids.map(i => (i, tag, i * 1.0)).toDF("id", "name", "v")

  /** Drain the table stream AvailableNow against `ckpt` through
    * foreachBatch (restart-capable sink shape) and return the delivered
    * (change, version, id) triples of THIS run. */
  private def runOnce(root: String, ckpt: String,
                      opts: Map[String, String] = Map.empty): Seq[(String, Long, Long)] = {
    val seen = new java.util.concurrent.CopyOnWriteArrayList[(String, Long, Long)]()
    var reader = spark.readStream.format("graft-table").option("path", root)
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select($"_change", $"_commit_version", $"id")
          .as[(String, Long, Long)].collect().foreach(seen.add)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq
  }

  test("append-only ranges diff from delta manifests: zero entry-list resolutions per batch") {
    val root = graft.TempDirs.create("graft_tstream_fast")
    val t0 = new GraftTable(spark, root)
    (1 to 3).foreach(b => t0.append(rows((b * 10L) to (b * 10L + 2L), s"b$b")))
    t0.delete(org.apache.spark.sql.functions.col("id") === 10L)   // v4: DV
    val cold = GraftTable.load(spark, root)
    val r0 = cold.fullResolutions.get()
    // the fast path serves exactly the range's appended entries
    val fast = cold.appendOnlyAdds(1L, 3L)
    assert(fast.isDefined, "an append-only range must take the fast path")
    assert(cold.fullResolutions.get() == r0,
      "the fast path must not resolve any entry list")
    val expect = cold.entries(3L).map(_.line).toSet --
      cold.entries(1L).map(_.line).toSet
    assert(fast.get.map(_.line).toSet == expect,
      "fast-path adds must equal the endpoint diff exactly")
    // a range containing the DV commit declines (it has remove lines)
    assert(cold.appendOnlyAdds(3L, 4L).isEmpty,
      "a DV/rewrite range must fall back to the endpoint diff")
    // end-to-end: the streamed content is unchanged by the fast path
    val seen = runOnce(root, graft.TempDirs.create("graft_tstream_fast_ck"),
      Map("maxVersionsPerBatch" -> "1"))
    val inserts = seen.filter(_._1 == "insert").map(_._3).toSet
    assert(inserts == ((10L to 12L) ++ (20L to 22L) ++ (30L to 32L)).toSet)
    assert(seen.filter(_._1 == "delete").map(_._3) == Seq(10L))
  }

  test("restart resumes from the committed version and delivers only new commits") {
    val root = graft.TempDirs.create("graft_tstream")
    val ckpt = graft.TempDirs.create("graft_tstream_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L, 3L), "a"))                    // v1
    val first = runOnce(root, ckpt)
    assert(first.map(r => (r._1, r._2, r._3)).sorted ==
      Seq(("insert", 1L, 1L), ("insert", 1L, 2L), ("insert", 1L, 3L)),
      s"first run must deliver v1's content as inserts, got $first")
    // two more commits land while the stream is down
    t.append(rows(Seq(4L), "b"))                            // v2
    t.delete($"id" === 1L)                                  // v3 (full rewrite)
    val second = runOnce(root, ckpt)
    assert(second.forall(_._2 == 3L), "_commit_version = the batch's target version")
    // file-level diff v1 -> v3: the delete rewrote every file, so carried
    // rows appear as self-canceling delete+insert pairs; the multiset
    // APPLY of the batch must land exactly on the v1 -> v3 row change
    val ins = second.filter(_._1 == "insert").map(_._3).groupBy(identity)
    val del = second.filter(_._1 == "delete").map(_._3).groupBy(identity)
    val net = (ins.keySet ++ del.keySet).toSeq.map(id =>
      id -> (ins.getOrElse(id, Nil).size - del.getOrElse(id, Nil).size))
      .filter(_._2 != 0).sortBy(_._1)
    assert(net == Seq(1L -> -1, 4L -> 1),
      s"batch must net to the v1->v3 change (+4, -1), got $net from $second")
    // nothing new → an empty run
    assert(runOnce(root, ckpt).isEmpty)
  }

  test("a column rename mid-stream keeps the pinned schema and keeps delivering values") {
    // the stream's schema is fixed at query start (old logical names);
    // a rename is metadata-only, files keep the original physical name —
    // so the stream's reads of post-rename appends still resolve: the
    // old name is not a mapping KEY and reads its physical column
    // straight through
    val root = graft.TempDirs.create("graft_tstream_cm")
    val ckpt = graft.TempDirs.create("graft_tstream_cm_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L), "a"))                        // v1
    assert(runOnce(root, ckpt).size == 2)
    t.renameColumn("name", "label")                         // v2, metadata-only
    t.append(Seq((3L, "c", 3.0)).toDF("id", "label", "v"))  // v3, new logical
    val seen = new java.util.concurrent.CopyOnWriteArrayList[(Long, String)]()
    val q = spark.readStream.format("graft-table").option("path", root).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the resumed stream keeps ITS checkpointed schema ('name')
        assert(batch.columns.contains("name") || batch.columns.contains("label"))
        val nameCol = if (batch.columns.contains("name")) "name" else "label"
        batch.filter(col("_change") === "insert")
          .select(col("id"), col(nameCol))
          .as[(Long, String)].collect().foreach(seen.add)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set((3L, "c")),
      s"post-rename append must deliver its values, got ${seen.asScala}")
    // and a FRESH stream (new checkpoint) uses the renamed schema
    val seen2 = runOnce(root, graft.TempDirs.create("graft_tstream_cm_ck2"))
    assert(seen2.count(_._1 == "insert") == 3)
  }

  test("a replayed batch resolves columns through the batch-endpoint mapping, not the latest") {
    // checkpoint-recovery shape: batch (fromV, toV) is re-read AFTER a
    // later drop+re-add commits — the latest mapping points the stream's
    // pinned 'name' at a FRESH physical column (all NULL in the old
    // files); batch content must depend only on the endpoints
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val root = graft.TempDirs.create("graft_tstream_replay")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L), "a"))                        // v1
    // the stream's schema, pinned at query start
    val schema = t.snapshot().schema
      .add("_change", org.apache.spark.sql.types.StringType)
      .add("_commit_version", org.apache.spark.sql.types.LongType)
    def replayV1(): Seq[(Long, String)] = {
      val df = new GraftTableStreamSource(spark.sqlContext, t, schema, Map.empty)
        .getBatch(None, TableVersionOffset(1L))
      // strip the streaming tag so the spec can collect the batch
      val plan = df.queryExecution.analyzed.transform {
        case lr: LogicalRelation if lr.isStreaming =>
          lr.copy(isStreaming = false, stream = None)
      }
      org.apache.spark.sql.GraftPlanBridge.ofRows(spark, plan)
        .select($"id", $"name").as[(Long, String)].collect().toSeq.sortBy(_._1)
    }
    assert(replayV1() == Seq((1L, "a"), (2L, "a")))
    t.dropColumn("name")                                    // v2
    t.addColumn("name", org.apache.spark.sql.types.StringType) // v3: fresh physical
    t.append(Seq((9L, 9.0, "fresh")).toDF("id", "v", "name"))  // v4
    // the replay must still read v1's values — NOT all-NULL through the
    // latest mapping's fresh physical column
    assert(replayV1() == Seq((1L, "a"), (2L, "a")),
      "replayed batch content must be a pure function of (fromV, toV)")
  }

  test("a deletion-vector commit surfaces in the stream as a net delete") {
    val root = graft.TempDirs.create("graft_tstream_dv")
    val ckpt = graft.TempDirs.create("graft_tstream_dv_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L, 3L), "a").coalesce(1)) // v1: ONE file
    assert(runOnce(root, ckpt).size == 3)
    t.delete($"id" === 2L)                    // v2: DV-only (no data files)
    assert(t.entries(2L).exists(_.dvRef.isDefined), "fixture must take the DV path")
    val got = runOnce(root, ckpt)
    // the masked file appears on both sides, each under its mask:
    // inserts = survivors {1,3}, deletes = pre-mask {1,2,3} → net -2
    val ins = got.filter(_._1 == "insert").map(_._3).sorted
    val del = got.filter(_._1 == "delete").map(_._3).sorted
    assert(ins == Seq(1L, 3L), s"insert side must be the masked view, got $got")
    assert(del == Seq(1L, 2L, 3L), s"delete side must be the pre-mask rows, got $got")
  }

  test("readChangeFeed nets rewrites to row-level changes; DV deletes classify exactly") {
    val root = graft.TempDirs.create("graft_cdc_net")
    val ckpt = graft.TempDirs.create("graft_cdc_net_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L, 3L), "a").coalesce(1))   // v1: ONE file
    t.delete($"id" === 2L)                             // v2: DV path
    assert(t.entries(2L).exists(_.dvRef.isDefined), "fixture must take the DV path")
    val opts = Map("readChangeFeed" -> "true", "maxVersionsPerBatch" -> "1")
    val got = runOnce(root, ckpt, opts)
    // v1 batch = pure inserts; the DV batch nets the masked-file pair to
    // EXACTLY the newly-masked row (raw mode emits 1,2,3 delete + 1,3
    // insert — the netted CDC must not)
    assert(got.sorted == Seq(("delete", 2L, 2L), ("insert", 1L, 1L),
      ("insert", 1L, 2L), ("insert", 1L, 3L)), s"got $got")
    // a full-rewrite overwrite nets to its actual row changes only
    t.overwrite(rows(Seq(1L, 3L, 4L), "a"))            // v3: net +4
    val third = runOnce(root, ckpt, opts)
    assert(third == Seq(("insert", 3L, 4L)),
      s"carried rows must cancel in the netted feed, got $third")
    // layout-only commits stay EMPTY in CDC mode too
    t.compact(targetFiles = 1)
    assert(runOnce(root, ckpt, opts).isEmpty)
  }

  test("keyed readChangeFeed classifies update pairs; applyChangesKeyed mirrors the source") {
    val root = graft.TempDirs.create("graft_cdc_keyed")
    val ckpt = graft.TempDirs.create("graft_cdc_keyed_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L, 3L), "a"))                     // v1
    t.overwrite(Seq((1L, "a", 1.0), (2L, "B", 2.5), (4L, "d", 4.0))
      .toDF("id", "name", "v"))                              // v2
    val opts = Map("readChangeFeed" -> "true", "changeFeedKeys" -> "id",
      "maxVersionsPerBatch" -> "1")
    val got = runOnce(root, ckpt, opts)
    val batch2 = got.filter(_._2 == 2L).map(r => (r._1, r._3)).sorted
    assert(batch2 == Seq(("delete", 3L), ("insert", 4L),
      ("update_postimage", 2L), ("update_preimage", 2L)),
      s"keyed classification must pair key 2's update, got $got")
    assert(got.filter(_._2 == 1L).forall(_._1 == "insert"))
    // the BOUNDED mirror loop: per batch, one key-scoped apply — on a
    // key-indexed mirror each batch rewrites only files that can hold a
    // touched key (the 100 TB CDC-mirror shape)
    val mirror = new GraftTable(spark,
      graft.TempDirs.create("graft_cdc_keyed_mir"), statsCol = Some("id"))
    val ckpt2 = graft.TempDirs.create("graft_cdc_keyed_ckpt2")
    var reader = spark.readStream.format("graft-table").option("path", root)
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream.option("checkpointLocation", ckpt2)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          mirror.applyChangesKeyed(batch.drop("_commit_version"), "id")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(mirror.snapshot().exceptAll(t.snapshot()).isEmpty &&
           t.snapshot().exceptAll(mirror.snapshot()).isEmpty,
      "the keyed CDC mirror must hash-match the source snapshot")
  }

  test("applyChangesKeyed refuses a feed whose rows carry no non-null keys") {
    val t = new GraftTable(spark,
      graft.TempDirs.create("graft_apply_nullkey"))
    t.append(rows(Seq(1L, 2L), "a"))
    // post-image rows present, every key NULL: silently publishing a
    // no-op version would drop them — the apply must fail loudly
    val badFeed = Seq((null.asInstanceOf[java.lang.Long], "x", 9.0, "insert"))
      .toDF("id", "name", "v", "_change")
    val e = intercept[IllegalArgumentException](
      t.applyChangesKeyed(badFeed, "id"))
    assert(e.getMessage.contains("non-null"), e.getMessage)
    // a genuinely EMPTY feed still publishes the monotone no-op version
    val before = t.latestVersion.get
    t.applyChangesKeyed(badFeed.limit(0), "id")
    assert(t.latestVersion.contains(before + 1) &&
      t.snapshot().count() == 2L)
  }

  test("applyChangesKeyed >1024 fractional keys: range probe stays in the key's native type") {
    // 1500 DOUBLE keys with fractional parts — the >1024 fallback used to
    // cast min/max to long, truncating the bounds; the probe must stay in
    // the native type (here: no integral bound at all → conservative full
    // candidate set), leaving exactly one live row per key after apply
    val t = new GraftTable(spark,
      graft.TempDirs.create("graft_apply_frackey"), statsCol = Some("k"))
    val seed = (1 to 1500).map(i => (i + 0.3, s"r$i", 0.0))
      .toDF("k", "name", "v")
    t.append(seed.repartitionByRange(4, col("k")))
    val feed = (1 to 1500).map(i =>
        (i + 0.3, s"r$i", 1.0, "update_postimage"))
      .toDF("k", "name", "v", "_change")
    t.applyChangesKeyed(feed, "k")
    val snap = t.snapshot()
    assert(snap.count() == 1500L, "one live row per key")
    assert(snap.filter(col("v") =!= 1.0).isEmpty,
      "every key must carry its post-image (no file may escape the rewrite)")
  }

  test("a keyed CDC replay resolves through the batch-endpoint mapping after a mid-stream re-add") {
    val root = graft.TempDirs.create("graft_cdc_replay")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L), "a"))                         // v1
    val schema = t.snapshot().schema
      .add("_change", org.apache.spark.sql.types.StringType)
      .add("_commit_version", org.apache.spark.sql.types.LongType)
    val opts = Map("readChangeFeed" -> "true", "changeFeedKeys" -> "id")
    def replayV1(): Seq[(Long, String, String)] = {
      val df = new GraftTableStreamSource(spark.sqlContext, t, schema, opts)
        .getBatch(None, TableVersionOffset(1L))
      // the CDC batch is a streaming-tagged LogicalRDD: strip the tag so
      // the spec can collect it outside a streaming query
      import org.apache.spark.sql.execution.LogicalRDD
      val plan = df.queryExecution.analyzed.transform {
        case lr: LogicalRDD if lr.isStreaming =>
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, isStreaming = false, None)(
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      }
      org.apache.spark.sql.GraftPlanBridge.ofRows(spark, plan)
        .select($"id", $"name", $"_change")
        .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    }
    assert(replayV1() == Seq((1L, "a", "insert"), (2L, "a", "insert")))
    t.dropColumn("name")                                     // v2
    t.addColumn("name", org.apache.spark.sql.types.StringType) // v3: fresh physical
    t.append(Seq((9L, 9.0, "fresh")).toDF("id", "v", "name"))  // v4
    // checkpoint-recovery replay of (0,1] must still read v1's values
    // through v1's mapping — never all-NULL via the latest's fresh column
    assert(replayV1() == Seq((1L, "a", "insert"), (2L, "a", "insert")),
      "replayed CDC batch content must be a pure function of (fromV, toV)")
  }

  test("layout-only commits (compact/zorder/reorg) stream as EMPTY batches") {
    val root = graft.TempDirs.create("graft_tstream_layout")
    val ckpt = graft.TempDirs.create("graft_tstream_layout_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L), "a"))
    t.append(rows(Seq(3L), "b"))
    assert(runOnce(root, ckpt).size == 3)
    // a compaction rewrites every byte but changes NO logical content:
    // the stream must not re-emit the table as a self-canceling pair
    t.compact(targetFiles = 1)
    assert(runOnce(root, ckpt).isEmpty,
      "a compact-only range must be an empty batch (dataChange=false)")
    // a data commit AFTER the compaction still streams normally
    t.append(rows(Seq(4L), "c"))
    val got = runOnce(root, ckpt)
    assert(got.map(r => (r._1, r._3)) == Seq(("insert", 4L)), s"got $got")
  }

  test("maxVersionsPerBatch=1 yields per-commit change batches") {
    val root = graft.TempDirs.create("graft_tstream_percommit")
    val ckpt = graft.TempDirs.create("graft_tstream_percommit_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L), "a"))        // v1
    t.append(rows(Seq(3L), "b"))            // v2: append shares v1's files
    val got = runOnce(root, ckpt, Map("maxVersionsPerBatch" -> "1"))
    assert(got.toSet == Set(
      ("insert", 1L, 1L), ("insert", 1L, 2L),   // v1's commit
      ("insert", 2L, 3L)),                      // v2's commit, its file only
      s"per-commit batches must tag each commit's own delta, got $got")
    assert(got.map(_._2).distinct.size == 2,
      "rate limit must split the catch-up into one batch per commit")
  }

  test("a batch spanning versions nets out churn, so applyChanges mirrors any cut") {
    val root = graft.TempDirs.create("graft_tstream_net")
    val ckpt = graft.TempDirs.create("graft_tstream_net_ckpt")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L), "a"))                          // v1: {1}
    t.overwrite(rows(Seq(2L), "b"))                       // v2: {2}
    t.overwrite(rows(Seq(3L), "c"))                       // v3: {3}
    // one batch [0 -> 3]: the intermediate {1},{2} churn must cancel
    val got = runOnce(root, ckpt)
    assert(got == Seq(("insert", 3L, 3L)),
      s"net feed over [0,3] is just v3's content, got $got")
    // the mirror loop: foreachBatch applyChanges lands on source content
    val mirror = new GraftTable(spark, graft.TempDirs.create("graft_tstream_mir"))
    val ckpt2 = graft.TempDirs.create("graft_tstream_ckpt2")
    val q = spark.readStream.format("graft-table").option("path", root).load()
      .writeStream.option("checkpointLocation", ckpt2)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) mirror.applyChanges(batch.drop("_commit_version"))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(mirror.snapshot().exceptAll(t.snapshot()).isEmpty &&
           t.snapshot().exceptAll(mirror.snapshot()).isEmpty,
      "readStream + foreachBatch applyChanges = the streaming mirror loop")
  }

  test("startingVersion bounds the first batch (latest skips the backlog)") {
    val root = graft.TempDirs.create("graft_tstream_start")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L, 2L), "a"))        // v1
    t.append(rows(Seq(3L), "b"))            // v2
    // latest on a fresh checkpoint: nothing until a NEW commit lands
    val ckptL = graft.TempDirs.create("graft_tstream_start_l")
    assert(runOnce(root, ckptL, Map("startingVersion" -> "latest")).isEmpty)
    t.append(rows(Seq(4L), "c"))            // v3, after stream start
    assert(runOnce(root, ckptL, Map("startingVersion" -> "latest"))
      .map(_._3) == Seq(4L))
    // explicit startingVersion=2: deliver version 2 onward
    val ckptE = graft.TempDirs.create("graft_tstream_start_e")
    assert(runOnce(root, ckptE, Map("startingVersion" -> "2"))
      .map(_._3).sorted == Seq(3L, 4L))
  }

  test("startingTimestamp delivers commits at or after the instant (inclusive)") {
    val root = graft.TempDirs.create("graft_tstream_ts")
    val t = new GraftTable(spark, root)
    t.append(rows(Seq(1L), "a"))            // v1
    Thread.sleep(5)
    val cutAfterV1 = t.history().last.commitMs + 1L // strictly after v1
    Thread.sleep(5)
    t.append(rows(Seq(2L), "b"))            // v2
    t.append(rows(Seq(3L), "c"))            // v3
    val ckpt = graft.TempDirs.create("graft_tstream_ts_ck")
    assert(runOnce(root, ckpt, Map("startingTimestamp" -> cutAfterV1.toString))
      .map(_._3).sorted == Seq(2L, 3L))
    // the boundary is INCLUSIVE (the Delta contract): a commit at exactly
    // the given timestamp IS delivered
    val ckptB = graft.TempDirs.create("graft_tstream_ts_ckb")
    val exactlyV1 = t.history().head.commitMs
    assert(runOnce(root, ckptB, Map("startingTimestamp" -> exactlyV1.toString))
      .map(_._3).sorted == Seq(1L, 2L, 3L))
    // a timestamp before every commit replays from the beginning
    val ckpt0 = graft.TempDirs.create("graft_tstream_ts_ck0")
    assert(runOnce(root, ckpt0, Map("startingTimestamp" -> "0"))
      .map(_._3).sorted == Seq(1L, 2L, 3L))
    intercept[Exception] {
      runOnce(root, graft.TempDirs.create("graft_tstream_ts_x"),
        Map("startingTimestamp" -> "0", "startingVersion" -> "1"))
    }
  }

  test("bus -> table pipeline survives the restart-kill matrix exactly once") {
    // The COMPOSED exactly-once contract (q_pipeline_bus_to_table's
    // restart-kill twin): bus offsets ride the engine checkpoint, table
    // commits carry txn stamps — together every matrix cell (clean
    // restart, crash-before-commit-log replay, replay + new data) must
    // land every bus record exactly once.
    import org.apache.hadoop.fs.Path
    val bus = graft.TempDirs.create("graft_pipe_bus")
    val table = graft.TempDirs.create("graft_pipe_table")
    val ckpt = graft.TempDirs.create("graft_pipe_ckpt")
    val fs = new Path(ckpt).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def feed(ids: Range): Unit = ids.toDF("i")
      .select($"i".cast("string").cast("binary").as("value"))
      .coalesce(1).write.format("graft-bus").option("path", bus)
      .mode("append").save()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-bus").option("path", bus).load()
        .select($"value".cast("string").cast("bigint").as("id"))
        .writeStream.format("graft-table")
        .option("path", table).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def tableIds(): Seq[Long] = {
      val t = GraftTable.load(spark, table)
      t.snapshot().select($"id").as[Long].collect().toSeq.sorted
    }
    // cell 1: clean run
    feed(1 to 10); drain()
    assert(tableIds() == (1L to 10L))
    // cell 2: clean restart with new data (offsets resume from checkpoint)
    feed(11 to 20); drain()
    assert(tableIds() == (1L to 20L))
    val versionsAfter2 = GraftTable.load(spark, table).versions
    // cell 3: crash AFTER the table commit but BEFORE the engine logged
    // the batch — simulated by deleting the checkpoint's newest commit
    // marker. The restart REPLAYS the batch; the table's txn stamp must
    // skip it (no new version, no duplicate rows).
    val commits = fs.listStatus(new Path(ckpt, "commits"))
      .map(_.getPath).filter(_.getName.forall(_.isDigit))
    fs.delete(commits.maxBy(_.getName.toInt), false)
    drain()
    assert(tableIds() == (1L to 20L), "a replayed batch re-landed rows")
    assert(GraftTable.load(spark, table).versions == versionsAfter2,
      "a replayed batch must not commit a new version")
    // cell 4: the same torn-checkpoint crash WITH new bus data — the
    // replayed batch skips, the new records land once
    feed(21 to 25)
    val commits2 = fs.listStatus(new Path(ckpt, "commits"))
      .map(_.getPath).filter(_.getName.forall(_.isDigit))
    fs.delete(commits2.maxBy(_.getName.toInt), false)
    drain()
    assert(tableIds() == (1L to 25L),
      "replay + fresh data must land exactly the new records")
  }

  test("batch path reads: spark.read.format(graft-table) with time travel, pruning, DVs") {
    val root = graft.TempDirs.create("graft_pathread")
    val t = new GraftTable(spark, root, statsCol = Some("id"))
    t.append((1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"))   // v1
    Thread.sleep(5); val betweenMs = System.currentTimeMillis(); Thread.sleep(5)
    t.append((101L to 200L).map(i => (i, s"n$i")).toDF("id", "name")) // v2
    // plain load = latest snapshot, no catalog registration anywhere
    val df = spark.read.format("graft-table").load(root)
    assert(df.count() == 200L)
    // manifest pruning + pushdown work through the path read: the scan's
    // static file list (Dataset.inputFiles is blind to non-FileTable V2
    // relations) must cover fewer files than the active set
    val narrow = df.filter($"id".between(150L, 160L)).select($"id")
    assert(narrow.count() == 11L)
    val scan = narrow.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get.scan.asInstanceOf[org.apache.spark.sql.GraftStatsScan]
    val allFiles = GraftTable.load(spark, root).activeFiles(2L).size
    assert(scan.staticFiles.size < allFiles,
      s"range read covers ${scan.staticFiles.size} of $allFiles files")
    // versionAsOf / timestampAsOf time travel
    assert(spark.read.format("graft-table").option("versionAsOf", "1")
      .load(root).count() == 100L)
    assert(spark.read.format("graft-table")
      .option("timestampAsOf", betweenMs.toString).load(root).count() == 100L)
    // batch APPEND through the same face
    (201L to 210L).map(i => (i, s"n$i")).toDF("id", "name")
      .write.format("graft-table").mode("append").save(root)
    assert(spark.read.format("graft-table").load(root).count() == 210L)
    assert(GraftTable.load(spark, root).versions == Seq(1L, 2L, 3L))
    // a DV-masked table reads through the path surface (the provider
    // installs the rewrite itself — no catalog, no extension configured)
    t.delete($"id" === 7L)
    assert(GraftTable.load(spark, root)
      .entries(4L).exists(_.dvRef.isDefined), "fixture must carry a DV")
    val masked = spark.read.format("graft-table").load(root)
    assert(masked.count() == 209L)
    assert(masked.filter($"id" === 7L).count() == 0L,
      "the DV-masked row resurrected through the path read")
    // time-travel pins refuse writes
    intercept[Exception] {
      Seq((999L, "x")).toDF("id", "name").write.format("graft-table")
        .option("versionAsOf", "1").mode("append").save(root)
    }
    // SQL path identifiers: with a graft catalog configured, an
    // absolute-path table name reads any on-disk table — no
    // registration under the warehouse root (the Delta
    // `delta.`/path`` pattern). A DEDICATED catalog name: catalog
    // plugin instances are cached per session by name, so hijacking
    // `graft` here would pin other suites to this warehouse root.
    spark.conf.set("spark.sql.catalog.gpath", "graft.acid.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpath.root",
      graft.TempDirs.create("graft_pathsql_wh"))
    val viaSql = spark.sql(s"SELECT count(*) AS n FROM gpath.`$root`")
    assert(viaSql.collect().head.getLong(0) == 209L)
    assert(spark.sql(s"SELECT count(*) AS n FROM gpath.`$root` VERSION AS OF 2")
      .collect().head.getLong(0) == 200L)
    // mergeSchema append evolves the schema; old rows project NULL
    (301L to 305L).map(i => (i, s"n$i", i * 2L)).toDF("id", "name", "extra")
      .write.format("graft-table").option("mergeSchema", "true")
      .mode("append").save(root)
    val evolved = spark.read.format("graft-table").load(root)
    assert(evolved.columns.toSeq == Seq("id", "name", "extra"))
    assert(evolved.filter($"extra".isNotNull).count() == 5L)
  }
}
